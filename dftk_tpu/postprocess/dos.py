"""Density of states: total, local and projected.

Mirrors DFTK `src/postprocess/dos.jl:18-118`:
  DOS(eps)  = sum_kn w_k (-f'((eps_kn - eps)/T)) / T * filled
  LDOS(eps, r) = same sum weighted by |psi_kn(r)|^2
PDOS requires atomic pseudo-orbitals (UPF); HGH psps carry none, so PDOS is
available once UPF support lands.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..models.smearing import Gaussian


def compute_dos(eps, basis, eigenvalues, smearing=None, temperature=None):
    """Total DOS at energies eps (scalar or array) per unit cell."""
    model = basis.model
    if temperature is None:
        temperature = model.temperature if model.temperature > 0 else 1e-3
    if smearing is None:
        smearing = model.smearing if model.temperature > 0 else Gaussian()
    filled = model.filled_occupation
    eps = jnp.atleast_1d(jnp.asarray(eps))
    ev = jnp.asarray(eigenvalues)                       # [nk, nb]
    w = jnp.asarray(basis.kweights)

    x = (ev[None, :, :] - eps[:, None, None]) / temperature

    docc = jax.vmap(jax.vmap(jax.vmap(
        jax.grad(lambda t: smearing.occupation(t)))))(x)
    dos = -filled / temperature * jnp.einsum("k,ekn->e", w, docc)
    return np.asarray(dos)


def compute_ldos(eps, basis, eigenvalues, psi, smearing=None, temperature=None):
    """Local DOS on the real-space grid, [n_eps, n1, n2, n3] (spin-summed)."""
    from ..ops import fft as fftops
    model = basis.model
    if temperature is None:
        temperature = model.temperature if model.temperature > 0 else 1e-3
    if smearing is None:
        smearing = model.smearing if model.temperature > 0 else Gaussian()
    filled = model.filled_occupation
    eps = jnp.atleast_1d(jnp.asarray(eps))
    ev = jnp.asarray(eigenvalues)
    bd = basis.data
    N = int(np.prod(basis.fft_size))
    vol = model.unit_cell_volume

    cube = jax.vmap(lambda c, idx, m: fftops.scatter_to_cube(
        c, idx, m, basis.fft_size))(psi, bd.Gidx, bd.mask)
    psir2 = jnp.abs(jnp.fft.ifftn(cube, axes=(-3, -2, -1))
                    * (N / np.sqrt(vol))) ** 2            # [nk, nb, grid]

    x = (ev[None, :, :] - eps[:, None, None]) / temperature
    docc = jax.vmap(jax.vmap(jax.vmap(
        jax.grad(lambda t: smearing.occupation(t)))))(x)   # [ne, nk, nb]
    weights = -filled / temperature * docc * bd.kweights[None, :, None]
    ldos = jnp.einsum("ekn,knxyz->exyz", weights, psir2)
    return np.asarray(ldos)


def compute_pdos(eps, basis, eigenvalues, psi, manifolds=None,
                 smearing=None, temperature=None):
    """Projected DOS onto pseudo-atomic orbitals (UPF pswfcs).

    manifolds: list of (atom_index, l, i) selecting orbitals; defaults to
    every pswfc of every atom.  Returns dict label -> [n_eps] array
    (reference dos.jl:88-203).
    """
    import jax
    from ..ops.hubbard import build_hubbard_projectors, HubbardManifold
    model = basis.model
    if temperature is None:
        temperature = model.temperature if model.temperature > 0 else 1e-3
    if smearing is None:
        smearing = model.smearing if model.temperature > 0 else Gaussian()
    filled = model.filled_occupation

    if manifolds is None:
        manifolds = []
        for ia, at in enumerate(model.atoms):
            psp = getattr(at, "psp", None)
            if psp is None or not hasattr(psp, "n_pswfc_radial"):
                continue
            for l in range(len(psp.r2_pswfcs)):
                for i in range(1, psp.n_pswfc_radial(l) + 1):
                    manifolds.append((ia, l, i))
    mfs = [HubbardManifold(atom_index=ia, l=l, U=0.0, i=i)
           for (ia, l, i) in manifolds]
    Phi, slices = build_hubbard_projectors(basis, mfs)

    proj = jnp.einsum("kgm,kng->knm", Phi.conj(), jnp.asarray(psi))
    weights = np.abs(np.asarray(proj)) ** 2            # [nk, nb, n_orb]

    eps = np.atleast_1d(np.asarray(eps))
    ev = np.asarray(eigenvalues)
    w_k = np.asarray(basis.kweights)
    x = (ev[None] - eps[:, None, None]) / temperature
    docc = np.asarray(jax.vmap(jax.vmap(jax.vmap(
        jax.grad(lambda t: smearing.occupation(t)))))(jnp.asarray(x)))

    out = {}
    labels = []
    for (ia, l, i), (a, b) in zip(manifolds, slices):
        sym = getattr(model.atoms[ia], "symbol", "X")
        lab = f"{sym}{ia}_l{l}_{i}"
        pw = weights[:, :, a:b].sum(axis=2)            # sum over m
        out[lab] = -filled / temperature * np.einsum(
            "k,ekn,kn->e", w_k, docc, pw)
        labels.append(lab)
    return out


def plot_dos_data(basis, eigenvalues, n_points=200, margin=0.1, **kwargs):
    """Convenience: energy grid + DOS values spanning the eigenvalue range."""
    lo = float(np.min(eigenvalues)) - margin
    hi = float(np.max(eigenvalues)) + margin
    eps = np.linspace(lo, hi, n_points)
    return eps, compute_dos(eps, basis, eigenvalues, **kwargs)
