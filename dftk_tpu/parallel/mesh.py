"""Device-mesh parallelism over k-points (and spin, which rides the k axis).

The TPU-native replacement for the reference's MPI k-point distribution
(DFTK `src/common/mpi.jl`, `PlaneWaveBasis.jl:186-230`): instead of explicit
communicators, every [nk, ...] array is sharded over a 1D `jax.sharding.Mesh`
axis "kpts"; XLA inserts the psum/all-gather collectives (over ICI on real
hardware) wherever the jitted SCF step reduces over k - density accumulation,
Fermi-level electron counts, energy sums.

The reference pads by duplicating the highest-weight k-point when ranks >
k-points; here we pad with zero-weight phantom k-points instead, which is
exact (zero weight => zero contribution everywhere) and keeps shapes static.
"""
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def kpoint_mesh(n_devices: Optional[int] = None, devices=None):
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("kpts",))


def maybe_auto_distribute(basis):
    """Whole-suite mesh mode: if DFTK_TPU_MESH=N is set, shard the freshly
    built basis over a k-point mesh of the largest divisor of n_kpoints
    that is <= min(N, available devices).

    This is the analogue of the reference re-executing its ENTIRE test
    suite under `mpiexec -n 2` (test/runtests.jl:26-33): with the switch
    on, every SCF/response/postprocess path in the suite runs on sharded
    arrays.  A divisor (not phantom padding) is chosen so array shapes are
    untouched and every shape/eigenvalue assert stays green; the padded
    path has its own targeted tests (tests/test_parallel.py).
    """
    import os
    val = os.environ.get("DFTK_TPU_MESH")
    if not val:
        return basis
    want = min(int(val), len(jax.devices()))
    size = 1
    for d in range(min(basis.n_kpoints, want), 1, -1):
        if basis.n_kpoints % d == 0:
            size = d
            break
    if size < 2:
        return basis
    return shard_basis(basis, kpoint_mesh(size))


def pad_basis_kpoints(basis, multiple):
    """Pad the k-point axis of a basis to a multiple of the mesh size.

    Phantom k-points get weight 0, kinetic 0 and empty spheres; they
    contribute nothing to any reduction.  Returns the padded count.
    """
    nk = basis.n_kpoints
    nk_pad = -(-nk // multiple) * multiple
    if nk_pad == nk:
        return nk
    pad = nk_pad - nk

    def pad0(arr):
        widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
        return np.pad(arr, widths)

    # phantom k-points replicate the first k-point's sphere but with zero
    # weight; keeping a valid mask avoids degenerate Gram matrices
    basis.mask_np = np.concatenate(
        [basis.mask_np, np.repeat(basis.mask_np[:1], pad, axis=0)], axis=0)
    basis.Gidx_np = np.concatenate(
        [basis.Gidx_np, np.repeat(basis.Gidx_np[:1], pad, axis=0)], axis=0)
    basis.kin_np = np.concatenate(
        [basis.kin_np, np.repeat(basis.kin_np[:1], pad, axis=0)], axis=0)
    basis.Gpk_cart_np = np.concatenate(
        [basis.Gpk_cart_np, np.repeat(basis.Gpk_cart_np[:1], pad, axis=0)], axis=0)
    basis.Gred_np = np.concatenate(
        [basis.Gred_np, np.repeat(basis.Gred_np[:1], pad, axis=0)], axis=0)
    basis.nG_per_k = np.concatenate(
        [basis.nG_per_k, np.repeat(basis.nG_per_k[:1], pad)], axis=0)
    basis.kweights = pad0(basis.kweights)
    basis.kspin = pad0(basis.kspin)
    basis.kcoords_spin = np.concatenate(
        [basis.kcoords_spin, np.repeat(basis.kcoords_spin[:1], pad, axis=0)], axis=0)
    basis.n_kpoints = nk_pad

    from ..basis import BasisData
    basis.data = BasisData(
        Gidx=jnp.asarray(basis.Gidx_np), mask=jnp.asarray(basis.mask_np),
        kin=jnp.asarray(basis.kin_np), Gpk_cart=jnp.asarray(basis.Gpk_cart_np),
        kweights=jnp.asarray(basis.kweights), kspin=jnp.asarray(basis.kspin))
    # re-instantiate k-dependent term data (projectors)
    from ..ops.terms import instantiate_terms
    basis.terms = instantiate_terms(basis)
    return nk_pad


def shard_basis(basis, mesh: Mesh):
    """Move the basis + term device arrays onto the mesh, k-axis sharded.

    Requires n_kpoints to be a multiple of the mesh size
    (use pad_basis_kpoints first).
    """
    ksharded = NamedSharding(mesh, P("kpts"))
    replicated = NamedSharding(mesh, P())

    def put_k(arr):
        return jax.device_put(arr, ksharded)

    def put_r(arr):
        return jax.device_put(arr, replicated)

    basis.data = basis.data._replace(
        Gidx=put_k(basis.data.Gidx), mask=put_k(basis.data.mask),
        kin=put_k(basis.data.kin), Gpk_cart=put_k(basis.data.Gpk_cart),
        kweights=put_k(basis.data.kweights), kspin=put_k(basis.data.kspin))
    td = basis.terms.data
    basis.terms._data = td._replace(
        vloc_static=put_r(td.vloc_static),
        hartree_coeffs=put_r(td.hartree_coeffs),
        P=put_k(td.P), D=put_r(td.D), Gsq_cart=put_r(td.Gsq_cart),
        kinetic_scale=put_r(td.kinetic_scale),
        kin=(None if td.kin is None else put_k(td.kin)))
    basis.mesh = mesh
    return basis


def shard_split_data(sd, mesh: Mesh):
    """Shard a SplitTermsData pytree over the mesh's "kpts" axis.

    The split-real engine's analogue of shard_basis: every [nk, ...] array
    shards over "kpts" (including the pruned-DFT scatter indices); grid
    fields, DFT factor matrices and the nonlocal D block replicate.
    """
    ks = NamedSharding(mesh, P("kpts"))
    rs = NamedSharding(mesh, P())

    def put_k(arr):
        return jax.device_put(arr, ks)

    def put_r(arr):
        return jax.device_put(arr, rs)

    pruned = sd.pruned
    if pruned is not None:
        pruned = pruned._replace(
            Gidx_c=put_k(pruned.Gidx_c),
            inv_idx=(put_k(pruned.inv_idx)
                     if pruned.inv_idx is not None else None),
            Ff=tuple(put_r(F) for F in pruned.Ff),
            Fb=tuple(put_r(F) for F in pruned.Fb),
            Fblk_f=tuple(put_r(F) for F in pruned.Fblk_f),
            Fblk_b=tuple(put_r(F) for F in pruned.Fblk_b))
    return sd._replace(
        vloc_static=put_r(sd.vloc_static),
        hartree_coeffs=put_r(sd.hartree_coeffs),
        P_split=put_k(sd.P_split), D=put_r(sd.D),
        kin=put_k(sd.kin), Gidx=put_k(sd.Gidx), mask=put_k(sd.mask),
        kspin=put_k(sd.kspin), kweights=put_k(sd.kweights),
        G_cart=put_r(sd.G_cart), pruned=pruned,
        rho_core=(None if sd.rho_core is None else put_r(sd.rho_core)),
        Gpk_cart=(None if sd.Gpk_cart is None else put_k(sd.Gpk_cart)),
        tau_core=(None if sd.tau_core is None else put_r(sd.tau_core)))


def orbital_sharding(mesh: Mesh):
    """NamedSharding for psi/U [nk, nb, ...]: kpts x optional bands axis."""
    band_ax = "bands" if "bands" in mesh.axis_names else None
    return NamedSharding(mesh, P("kpts", band_ax))


def distribute(basis, mesh: Mesh):
    """Pad + shard a basis for k-point parallel execution on `mesh`."""
    pad_basis_kpoints(basis, mesh.devices.size)
    return shard_basis(basis, mesh)


def shard_orbitals(psi, mesh: Mesh):
    return jax.device_put(psi, NamedSharding(mesh, P("kpts")))


def replicate(arr, mesh: Mesh):
    return jax.device_put(arr, NamedSharding(mesh, P()))
