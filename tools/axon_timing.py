"""Slope-based timing for the axon tunnel backend.

The tunnel has a ~27 ms fixed host-fetch round trip and block_until_ready
does not reliably synchronize pallas-containing programs, so measure a
chained fori_loop at two loop counts with a forced scalar fetch and report
the SLOPE (per-iteration cost) - fixed costs cancel exactly.
"""
import time

import jax
import jax.numpy as jnp


def time_chain(step, x0, lo=10, hi=50, reps=2):
    """Per-iteration seconds of a shape-preserving step, slope method."""
    ts = {}
    for loop in (lo, hi):
        g = jax.jit(lambda a, n=loop: jax.lax.fori_loop(
            0, n, lambda i, acc: step(acc), a).sum())
        float(g(x0))                      # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            float(g(x0))
            best = min(best, time.time() - t0)
        ts[loop] = best
    return (ts[hi] - ts[lo]) / (hi - lo)


def report(name, step, x0, flops=0, **kw):
    dt = time_chain(step, x0, **kw)
    tf = flops / dt / 1e12 if flops else 0.0
    print(f"{name:56s}: {dt*1e3:8.3f} ms"
          + (f"  {tf:6.1f} TF/s" if flops else ""), flush=True)
    return dt
