"""Hamiltonian assembly and application (the hot path).

TPU-native redesign of DFTK's `terms/Hamiltonian.jl:86-192` "DftHamiltonian"
fast path.  One batched function applies H to ALL k-points and bands at once:

    H psi = kin .* psi  +  FFT_sphere(V(r) * iFFT_sphere(psi))  +  P D P^dag psi

shapes: psi [nk, nb, nG];  scatter -> [nk, nb, n1, n2, n3] -> batched 3D FFT
(XLA TPU FFT) -> pointwise multiply by the fused local potential -> FFT back
-> gather;  the nonlocal part is two dense GEMMs contracting the G axis.
Bands are optionally processed in chunks (lax.map) to bound the cube-space
working set for large systems.

The total local potential V fuses AtomicLocal + Hartree(rho) + Xc(rho)
(DFTK `optimize_operators` does the same fusion, operators.jl:213-222).
"""
import math
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import fft as fftops
from .terms import Terms, TermsData


class Ham(NamedTuple):
    """Everything needed to apply H at fixed potential (a jit-able pytree)."""
    Gidx: Any            # [nk, nG] int32
    mask: Any            # [nk, nG]
    kin: Any             # [nk, nG] (includes kinetic scaling)
    kspin: Any           # [nk] int32
    V: Any               # [nspin, n1, n2, n3] total local potential
    P: Any               # [nk, nG, nproj]
    D: Any               # [nproj, nproj]
    Vtau: Any = None     # [nspin, grid] meta-GGA tau potential (or None)
    Gpk: Any = None      # [nk, nG, 3] Cartesian k+G (needed with Vtau)
    Apot: Any = None     # [n1,n2,n3,3] vector potential (Magnetic term)
    exx_kernel: Any = None   # [n1,n2,n3] Fourier exchange kernel (or None);
                             # with exx_iq set: [nq, n1,n2,n3] kernels at G+q
    exx_psi: Any = None      # [nk, nb_x, nG] orbitals generating the exchange
    exx_occ: Any = None      # [nk, nb_x] their GENERATOR weights
                             # (w_k * occ / filled; w_k == 1 at Gamma)
    exx_iq: Any = None       # [nk, nk] int32 q-kernel index map (k-grid EXX)
    fft_pruned: Any = None   # split-engine pruned matmul-DFT data


def build_ham(basis_data, terms_data: TermsData, V_local, kin_override=None,
              Vtau=None, Apot=None, exx_kernel=None, exx_psi=None,
              exx_occ=None, exx_iq=None):
    if kin_override is not None:
        kin = kin_override
    elif getattr(terms_data, "kin", None) is not None:
        kin = terms_data.kin          # blow-up kinetic (BlowupCHV/Abinit)
    else:
        kin = terms_data.kinetic_scale * basis_data.kin
    if Apot is None:
        # default to the terms' vector potential: every solver/response
        # caller gets the Magnetic term without having to remember to
        # thread it (direct_minimization/newton silently dropped it before)
        Apot = getattr(terms_data, "Apot", None)
    need_gpk = Vtau is not None or Apot is not None
    return Ham(Gidx=basis_data.Gidx, mask=basis_data.mask, kin=kin,
               kspin=basis_data.kspin,
               V=V_local, P=terms_data.P, D=terms_data.D,
               Vtau=Vtau, Apot=Apot,
               Gpk=basis_data.Gpk_cart if need_gpk else None,
               exx_kernel=exx_kernel, exx_psi=exx_psi, exx_occ=exx_occ,
               exx_iq=exx_iq)


def apply_H(ham: Ham, psi, fft_size, volume, band_chunk: Optional[int] = None):
    """H @ psi for psi [nk, nb, nG] -> [nk, nb, nG]."""
    out = ham.kin[:, None, :] * psi

    # ---- local potential: sphere -> cube -> r-space -> cube -> sphere -------
    Vk = ham.V[ham.kspin]                                   # [nk, n1,n2,n3]

    def local_block(psi_blk):
        cube = jax.vmap(
            lambda c, idx, m: fftops.scatter_to_cube(c, idx, m, fft_size)
        )(psi_blk, ham.Gidx, ham.mask)
        psir = jnp.fft.ifftn(cube, axes=(-3, -2, -1))       # norms cancel
        vpsir = Vk[:, None] * psir
        vcube = jnp.fft.fftn(vpsir, axes=(-3, -2, -1))
        return jax.vmap(fftops.gather_from_cube)(vcube, ham.Gidx, ham.mask)

    nb = psi.shape[1]
    if band_chunk is None or band_chunk >= nb:
        out = out + local_block(psi)
    else:
        nblk = -(-nb // band_chunk)
        pad = nblk * band_chunk - nb
        psi_p = jnp.pad(psi, ((0, 0), (0, pad), (0, 0)))
        blocks = psi_p.reshape(psi.shape[0], nblk, band_chunk, psi.shape[2])
        res = jax.lax.map(lambda b: local_block(b),
                          jnp.moveaxis(blocks, 1, 0))
        res = jnp.moveaxis(res, 0, 1).reshape(psi.shape[0], nblk * band_chunk, -1)
        out = out + res[:, :nb]

    # ---- meta-GGA: -1/2 div(Vtau grad psi)  (DivAgradOperator) --------------
    if ham.Vtau is not None:
        Vtau_k = ham.Vtau[ham.kspin]                        # [nk, grid]
        acc = 0.0
        for a in range(3):
            da = jax.vmap(
                lambda c, idx, m: fftops.scatter_to_cube(c, idx, m, fft_size)
            )(1j * ham.Gpk[:, None, :, a] * psi, ham.Gidx, ham.mask)
            dpsir = jnp.fft.ifftn(da, axes=(-3, -2, -1))
            back = jnp.fft.fftn(Vtau_k[:, None] * dpsir, axes=(-3, -2, -1))
            ga = jax.vmap(fftops.gather_from_cube)(back, ham.Gidx, ham.mask)
            acc = acc + 1j * ham.Gpk[:, None, :, a] * ga
        # (H_tau psi)_G = 1/2 sum_a p_a F[Vtau F^-1[p_a psi]], p = k+G;
        # acc carries (i p)(i p) = -p p, hence the minus sign
        out = out - 0.5 * acc

    # ---- nonlocal: P D P^dag (two GEMMs over the G axis) ---------------------
    if ham.P.shape[-1] > 0:
        Pd = jnp.einsum("kgp,kng->knp", ham.P.conj(), psi)
        out = out + jnp.einsum("kgp,pq,knq->kng", ham.P, ham.D.astype(ham.P.dtype), Pd)

    # ---- magnetic: A.(-i grad) = sum_a A_a(r) (k+G)_a (symmetrised) ---------
    if ham.Apot is not None:
        out = out + _apply_magnetic(ham, psi, fft_size)

    # ---- exact exchange (Gamma-only): Hphi -= sum_n f_n psi_n K[psi_n* phi] --
    if ham.exx_kernel is not None:
        out = out + _apply_exchange(ham, psi, fft_size, volume)

    return out * ham.mask[:, None, :]


def _apply_magnetic(ham: Ham, psi, fft_size):
    """Symmetrised 1/2 {A, p} (reference terms/magnetic.jl A.(-i grad),
    exact when div A = 0)."""
    out = 0.0
    for a in range(3):
        pa_psi = ham.Gpk[:, None, :, a] * psi
        cube = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(
            c, i, m, fft_size))(pa_psi, ham.Gidx, ham.mask)
        Apa = ham.Apot[..., a][None, None] * jnp.fft.ifftn(
            cube, axes=(-3, -2, -1))
        g1 = jax.vmap(fftops.gather_from_cube)(
            jnp.fft.fftn(Apa, axes=(-3, -2, -1)), ham.Gidx, ham.mask)
        cube2 = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(
            c, i, m, fft_size))(psi, ham.Gidx, ham.mask)
        Apsi = ham.Apot[..., a][None, None] * jnp.fft.ifftn(
            cube2, axes=(-3, -2, -1))
        g2 = ham.Gpk[:, None, :, a] * jax.vmap(fftops.gather_from_cube)(
            jnp.fft.fftn(Apsi, axes=(-3, -2, -1)), ham.Gidx, ham.mask)
        out = out + 0.5 * (g1 + g2)
    return out


def _apply_exchange(ham: Ham, phi, fft_size, volume):
    """Fock exchange contribution (operators.jl:192-210 semantics):
        (Vx phi)_{kn}(r) = - sum_{k'm} w_{k'} (f_{k'm}/filled) u_{k'm}(r)
                             Poisson_{k-k'}[u_{k'm}^* u_{kn}](r)
    on the PERIODIC parts u; the Bloch phase difference q = k - k' moves
    into the kernel, evaluated at G+q (ham.exx_kernel[ham.exx_iq[k, k']],
    coulomb.exx_q_kernels).  One batched Poisson solve per generating
    orbital (lax.scan).  At Gamma (exx_iq None) exchange is k-diagonal and
    the scan runs over bands only, batched element-wise in k -- the
    reference's Gamma-only operator; the k-grid path is the TODO it names
    (src/terms/exact_exchange.jl:31,52)."""
    import numpy as np
    N = int(np.prod(fft_size))
    scale = N / math.sqrt(volume)

    phir = jnp.fft.ifftn(
        jax.vmap(lambda c, i, m: fftops.scatter_to_cube(c, i, m, fft_size)
                 )(phi, ham.Gidx, ham.mask), axes=(-3, -2, -1)) * scale
    psir = jnp.fft.ifftn(
        jax.vmap(lambda c, i, m: fftops.scatter_to_cube(c, i, m, fft_size)
                 )(ham.exx_psi, ham.Gidx, ham.mask), axes=(-3, -2, -1)) * scale

    kern = ham.exx_kernel
    acc0 = jnp.zeros_like(phir)

    if ham.exx_iq is None:
        def one_orbital(acc, inp):
            psin, fn = inp      # [nk, grid], [nk]
            pair = psin.conj()[:, None] * phir              # [nk, nb, grid]
            V = jnp.fft.ifftn(kern * jnp.fft.fftn(pair, axes=(-3, -2, -1)),
                              axes=(-3, -2, -1))
            acc = acc - fn[:, None, None, None, None] * psin[:, None] * V
            return acc, None

        acc, _ = jax.lax.scan(one_orbital, acc0,
                              (jnp.moveaxis(psir, 1, 0),
                               jnp.moveaxis(ham.exx_occ, 1, 0)))
    else:
        # k-grid exchange: every generating orbital (k', m) acts on the
        # bands of EVERY same-spin k; scan over the flattened generator
        # list, batched over (k, n) inside each step.
        nk, nx = psir.shape[:2]
        gen_psi = psir.reshape((nk * nx,) + psir.shape[2:])
        gen_f = ham.exx_occ.reshape(nk * nx)
        gen_k = jnp.repeat(jnp.arange(nk, dtype=jnp.int32), nx)

        def one_generator(acc, inp):
            psin, fn, kp = inp  # [grid], scalar, int32
            vqs = kern[ham.exx_iq[:, kp]]                   # [nk, n1,n2,n3]
            ss = (ham.kspin == ham.kspin[kp]).astype(acc.real.dtype)
            pair = psin.conj()[None, None] * phir           # [nk, nb, grid]
            V = jnp.fft.ifftn(vqs[:, None] * jnp.fft.fftn(
                pair, axes=(-3, -2, -1)), axes=(-3, -2, -1))
            w = fn * ss                                     # [nk]
            acc = acc - w[:, None, None, None, None] * psin[None, None] * V
            return acc, None

        acc, _ = jax.lax.scan(one_generator, acc0, (gen_psi, gen_f, gen_k))
    back = jnp.fft.fftn(acc, axes=(-3, -2, -1)) * (math.sqrt(volume) / N)
    return jax.vmap(fftops.gather_from_cube)(back, ham.Gidx, ham.mask)


def exchange_energy(ham: Ham, psi, occupation, kweights, fft_size, volume,
                    filled):
    """E_x = 1/2 sum_m w f_m <psi_m | Vx psi_m> (operator-consistent)."""
    vx = _apply_exchange(ham, psi, fft_size, volume)
    band_e = jnp.einsum("kng,kng->kn", psi.conj(), vx).real
    return 0.5 * jnp.sum(kweights[:, None] * occupation * band_e)


# ---------------------------------------------------------------------------
# Density-dependent potential assembly + energies
# ---------------------------------------------------------------------------

def xc_energy(functionals, rho, G_cube_cart, volume, scaling=1.0, tau=None):
    """Total XC energy for rho [nspin, n1,n2,n3]; fully differentiable.

    For GGA functionals the density gradient is computed spectrally inside
    this function, so jax.grad of it yields the full GGA potential
    (the AD replacement for DFTK's divergence-theorem potential assembly,
    terms/xc.jl:84-160).
    """
    if not functionals:
        return jnp.asarray(0.0)
    N = rho.shape[-1] * rho.shape[-2] * rho.shape[-3]
    dvol = volume / N

    sigma = None
    if any(f.family in ("gga", "mgga") for f, _ in functionals):
        rho_G = jnp.fft.fftn(rho, axes=(-3, -2, -1))
        # grad_a rho_s(r); G_cube_cart [n1,n2,n3,3] includes the 2 pi factor
        grads = jnp.stack([
            jnp.fft.ifftn(1j * G_cube_cart[..., a] * rho_G, axes=(-3, -2, -1)).real
            for a in range(3)], axis=-1)                    # [nspin, n1,n2,n3, 3]
        if rho.shape[0] == 1:
            sigma = jnp.sum(grads * grads, axis=-1)         # [1, grid]
        else:
            saa = jnp.sum(grads[0] * grads[0], axis=-1)
            sab = jnp.sum(grads[0] * grads[1], axis=-1)
            sbb = jnp.sum(grads[1] * grads[1], axis=-1)
            sigma = jnp.stack([saa, sab, sbb])

    E = 0.0
    for f, fscale in functionals:
        if f.energy is None:           # potential-only (TB09): no energy
            continue
        if f.family == "mgga":
            E = E + fscale * jnp.sum(f.energy(rho, sigma, tau))
        else:
            E = E + fscale * jnp.sum(f.energy(rho, sigma))
    return scaling * E * dvol


def total_potential(terms: Terms, rho, G_cube_cart, volume, tau=None):
    """Fused local potential V [nspin, grid] + rho-dependent energy pieces.

    rho: [nspin, n1, n2, n3]; tau (same shape) required for meta-GGA.
    Returns (V, energies) - or (V, Vtau, energies) when tau is given.
    """
    td = terms.data
    nspin = rho.shape[0]
    N = rho.shape[-1] * rho.shape[-2] * rho.shape[-3]
    dvol = volume / N

    rho_tot = jnp.sum(rho, axis=0)
    energies = {}

    V = jnp.broadcast_to(td.vloc_static, rho.shape).astype(rho.dtype)
    energies["AtomicLocal"] = jnp.sum(rho_tot * td.vloc_static) * dvol

    # Hartree
    rho_G = jnp.fft.fftn(rho_tot)
    VH = jnp.fft.ifftn(td.hartree_coeffs * rho_G).real
    energies["Hartree"] = 0.5 * jnp.sum(VH * rho_tot) * dvol
    V = V + VH[None]

    # Xc via AD (with the NLCC core density added to the XC density)
    Vtau = None
    if terms.xc:
        if terms.rho_core_np is not None:
            rho_core = jnp.asarray(terms.rho_core_np, dtype=rho.dtype)
            rho_xc = rho + rho_core[None] / nspin
        else:
            rho_xc = rho
        if tau is not None:
            # NLCC for mGGA: the core kinetic-energy density shifts the tau
            # seen by the functional (reference src/terms/xc.jl:100-104);
            # d/dtau is unchanged by the constant shift, so Vtau stays exact.
            if terms.tau_core_np is not None:
                tau_core = jnp.asarray(terms.tau_core_np, dtype=rho.dtype)
                tau_shift = tau_core[None] / nspin
            else:
                tau_shift = 0.0
            (exc, (Vxc, Vtau)) = jax.value_and_grad(
                lambda r, t: xc_energy(terms.xc, r, G_cube_cart, volume,
                                       terms.xc_scaling, tau=t + tau_shift),
                argnums=(0, 1))(rho_xc, tau)
            Vtau = Vtau / dvol
        else:
            exc, Vxc = jax.value_and_grad(
                lambda r: xc_energy(terms.xc, r, G_cube_cart, volume,
                                    terms.xc_scaling))(rho_xc)
        energies["Xc"] = exc
        V = V + Vxc / dvol
        # potential-only functionals (TB09/mBJ): multiplicative V added
        # directly -- no energy term exists (documented non-variational)
        for f, fscale in terms.xc:
            if f.potential is not None:
                tau_po = None if tau is None else tau + (
                    tau_shift if terms.tau_core_np is not None else 0.0)
                V = V + (terms.xc_scaling * fscale) * f.potential(
                    rho_xc, G_cube_cart, tau_po)

    # Local nonlinearity (Gross-Pitaevskii style)
    if terms.local_nonlinearity is not None:
        f = terms.local_nonlinearity
        en = lambda r: jnp.sum(f(jnp.sum(r, axis=0))) * dvol
        e_val, v_nl = jax.value_and_grad(en)(rho)
        energies["LocalNonlinearity"] = e_val
        V = V + v_nl / dvol

    if tau is not None:
        return V, Vtau, energies
    return V, energies


def psi_energies(ham: Ham, terms: Terms, psi, occupation, kweights,
                 fft_size=None):
    """Kinetic + nonlocal (+ magnetic) energies from orbitals."""
    energies = {}
    wocc = kweights[:, None] * occupation
    abs2 = (psi.conj() * psi).real
    energies["Kinetic"] = jnp.sum(wocc[:, :, None] * ham.kin[:, None, :] * abs2)
    if ham.P.shape[-1] > 0:
        Pd = jnp.einsum("kgp,kng->knp", ham.P.conj(), psi)
        band_e = jnp.einsum("knp,pq,knq->kn", Pd.conj(),
                            ham.D.astype(Pd.dtype), Pd).real
        energies["AtomicNonlocal"] = jnp.sum(wocc * band_e)
    if ham.Apot is not None:
        if fft_size is None:
            fft_size = tuple(ham.Apot.shape[:3])
        band_m = jnp.einsum("kng,kng->kn", psi.conj(),
                            _apply_magnetic(ham, psi, fft_size)).real
        energies["Magnetic"] = jnp.sum(wocc * band_m)
    return energies
