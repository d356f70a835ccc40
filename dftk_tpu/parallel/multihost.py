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

Nothing here can be exercised in a single-host CI - the sharded compute
itself is covered by the virtual-device equality tests (tests/
test_parallel.py), which validate the identical program on an 8-device
mesh.
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
