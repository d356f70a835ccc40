"""Multi-host (DCN) setup helpers.

The single-host story shards k-points/spin over the ICI-connected chips of
one host via `parallel/mesh.py`.  Across hosts the same program runs under
`jax.distributed` (the reference's MPI world becomes the JAX process group;
DCN replaces the inter-node fabric):

    import dftk_tpu.parallel.multihost as mh
    mh.initialize()                       # reads the cluster env by default
    mesh = mh.global_kpoint_mesh()        # all devices across all hosts
    # ... run the same mesh-sharded SCF as single-host; XLA routes the
    # k-point psum over ICI within a host and DCN across hosts.

Exercised in CI by tests/test_multihost.py: two OS processes (2 virtual
CPU devices each) form one 4-device global mesh with gloo cross-process
collectives — the CPU stand-in for DCN — and the sharded split SCF matches
the single-process run to 1e-10.  Single-host sharding equality is covered
separately on an 8-device mesh (tests/test_parallel.py).
"""
import jax
import numpy as np


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               **kwargs):
    """jax.distributed.initialize with explicit or env-provided topology.

    On managed TPU pods all three arguments are auto-detected; pass them
    explicitly for manual clusters (the analogue of mpiexec wiring).
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)


def global_kpoint_mesh(axis_name="kpts"):
    """1D mesh over every device of every process (k-point data parallel).

    With k-points as the only distributed axis this mirrors the reference's
    MPI design (SURVEY 2.9): each device owns a contiguous slice of the
    (phantom-padded) k-point list; the density reduction is one psum.
    """
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (axis_name,))


def local_kpoint_slice(n_kpoints_padded, axis_name="kpts"):
    """Index range of the k-points this process touches (for host-side IO)."""
    n_dev = jax.device_count()
    per = n_kpoints_padded // n_dev
    lo = jax.process_index() * jax.local_device_count() * per
    hi = lo + jax.local_device_count() * per
    return lo, hi


def fetch(arr):
    """Device array -> host numpy, multi-process safe.

    Fully-addressable (single-process) and fully-replicated arrays fetch
    directly; k-sharded global arrays are allgathered across processes
    first (the analogue of the reference's MPI gather of per-rank k-point
    blocks before host-side postprocessing, src/common/mpi.jl).
    """
    import jax.numpy as jnp
    if not isinstance(arr, jax.Array):
        return np.asarray(arr)
    if arr.is_fully_addressable or arr.is_fully_replicated:
        return np.asarray(jax.device_get(arr))
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
