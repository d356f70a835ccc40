"""Lightweight timing / tracing utilities.

The reference annotates hot functions with a TimerOutputs-based `@timing`
macro (DFTK `src/common/timer.jl`).  The JAX equivalent has two layers:
  * `timed` / `Timer`: wall-clock accumulation per label on the host side
    (blocks on device results, so only wrap at natural sync points)
  * `trace_scope`: `jax.profiler.TraceAnnotation` pass-through so sections
    show up in TensorBoard/perfetto traces captured with
    `jax.profiler.start_trace`.
"""
import collections
import contextlib
import time

import jax


class Timer:
    def __init__(self):
        self.totals = collections.defaultdict(float)
        self.counts = collections.defaultdict(int)

    @contextlib.contextmanager
    def section(self, label):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[label] += time.perf_counter() - t0
            self.counts[label] += 1

    def report(self):
        lines = ["timer:"]
        for label in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(f"  {label:<40s} {self.totals[label]:10.3f}s "
                         f"x{self.counts[label]}")
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


timer = Timer()


@contextlib.contextmanager
def trace_scope(label):
    """Annotate a region for the jax profiler (and the global timer)."""
    with jax.profiler.TraceAnnotation(label):
        with timer.section(label):
            yield


def versioninfo():
    """Environment report (analogue of DFTK.versioninfo())."""
    import jax as _jax
    import jaxlib
    import numpy as _np
    import dftk_tpu
    lines = [
        f"dftk_tpu {dftk_tpu.__version__}",
        f"jax {_jax.__version__} / jaxlib {jaxlib.__version__}",
        f"numpy {_np.__version__}",
        f"devices: {_jax.devices()}",
        f"x64: {_jax.config.read('jax_enable_x64')}",
    ]
    return "\n".join(lines)


def memory_usage(obj, _seen=None):
    """Rough deep memory of a basis/scfres-like object (device + host arrays)."""
    import numpy as np
    if _seen is None:
        _seen = set()
    oid = id(obj)
    if oid in _seen:
        return 0
    _seen.add(oid)
    total = 0
    if isinstance(obj, (np.ndarray,)):
        return obj.nbytes
    if isinstance(obj, jax.Array):
        return obj.size * obj.dtype.itemsize
    if isinstance(obj, dict):
        return sum(memory_usage(v, _seen) for v in obj.values())
    if isinstance(obj, (list, tuple)):
        return sum(memory_usage(v, _seen) for v in obj)
    if hasattr(obj, "__dict__"):
        return sum(memory_usage(v, _seen) for v in vars(obj).values())
    if hasattr(obj, "_fields"):  # namedtuple
        return sum(memory_usage(getattr(obj, f), _seen) for f in obj._fields)
    return total
