"""Global dtype / precision policy for dftk_tpu.

Plane-wave DFT needs ~1e-10 relative accuracy on energies.  The default policy
is float64/complex128 end-to-end ("x64"); this works on CPU and on TPU (where
f64 runs at reduced throughput).  For benchmarking the hot path we support a
mixed policy where the FFT + GEMM heavy H*psi apply runs in complex64 while all
reductions, Rayleigh-Ritz and energy accumulations stay in float64.

The x64 flag must be set before JAX is first used; importing dftk_tpu does it.
"""
import os
import dataclasses

import jax

# x64 is the default (DFT accuracy); disable with DFTK_TPU_X64=0 for TPU
# hardware without f64 support (e.g. v5e), where the SCF runs in f32/c64 -
# the same reduced-precision mode the reference supports as Model{Float32}.
X64 = os.environ.get("DFTK_TPU_X64", "1") not in ("0", "false", "False")
if X64:
    jax.config.update("jax_enable_x64", True)

# DFT needs full f32 matmul accuracy: on TPU the MXU would otherwise run
# f32 contractions in bf16 passes.  (The matmul-based DFT makes this the
# precision-critical path; "highest" = 6-pass bf16 ~ true f32.)
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: SCF-step programs take 100-300 s to
# compile at Si256 scale and dominate single-run wall time; the cache cuts
# repeat runs to milliseconds (measured 1.74 s -> 0.11 s across processes
# on the tunneled TPU backend).  Disable with DFTK_TPU_COMPILE_CACHE=0 or
# point it elsewhere with DFTK_TPU_COMPILE_CACHE=<dir>.
#
# Deferred to first basis construction so the decision uses the RESOLVED
# backend (a default CPU backend with JAX_PLATFORMS unset must also skip:
# XLA:CPU AOT cache loads re-check host features and warn loudly, and the
# win is on the accelerator side), and so importing dftk_tpu does not
# write to ~/.cache as a side effect.
_cache_configured = False


def maybe_enable_compile_cache():
    global _cache_configured
    if _cache_configured:
        return
    _cache_configured = True
    cache = os.environ.get("DFTK_TPU_COMPILE_CACHE", "")
    if cache in ("0", "false", "False"):
        return
    try:
        backend = jax.default_backend()
    except Exception:   # no backend available at all
        return
    if backend == "cpu":
        return
    jax.config.update("jax_compilation_cache_dir",
                      cache or os.path.expanduser("~/.cache/dftk_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@dataclasses.dataclass
class Precision:
    """Dtype policy carried by a PlaneWaveBasis."""
    real: object = None       # jnp.float64
    complex: object = None    # jnp.complex128

    def __post_init__(self):
        import jax.numpy as jnp
        if self.real is None:
            self.real = jnp.float64
        if self.complex is None:
            self.complex = jnp.complex128


def default_precision():
    return Precision()


def mixed_precision():
    """f32 wavefunctions / FFTs, f64 accumulation (set where supported)."""
    import jax.numpy as jnp
    return Precision(real=jnp.float32, complex=jnp.complex64)
