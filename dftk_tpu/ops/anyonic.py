"""Anyonic term: average-field almost-bosonic anyons in 2D.

Counterpart of the reference `src/terms/anyonic.jl` (arXiv:1901.10739):
electrons couple to the self-consistent Chern-Simons gauge field

    curl A = 2 pi rho,   div A = 0
    =>  A_hat(G) = 2 pi i (G_2, -G_1, 0) / |G|^2  rho_hat(G)

through  E[psi] = sum_n f_n <psi_n| 2 hbar beta A.p + beta^2 |A|^2 |psi_n>
(the kinetic term is added separately by the user with scaling_factor=2,
exactly like the reference example examples/anyons.jl).

Numerics follow the reference's long/short-range split (anyonic.jl:13-41):
A = A_SR[rho - rho_ref] + A_ref, where rho_ref is a mass-M Gaussian at the
cell center and A_ref its ANALYTIC gauge field phi(r) (-y, x) — the
spectral solve then acts on a zero-mass density, and A_ref is projected
divergence-free in the finite basis (anyonic.jl:44-61).

TPU-first design: the term is a pure ENERGY functional of the orbitals;
`scf/direct.py` minimizes it with jax.grad, which produces the current-
response effective potential  -2 beta xperp/|x|^2 * (hbar J + beta rho A)
AUTOMATICALLY — the reference derives that operator by hand
(anyonic.jl:136-152).  `apply_anyonic` keeps the hand-derived operator and
tests/test_anyonic.py proves the AD gradient and the hand operator agree,
validating both.

Restrictions (same as reference anyonic.jl:68-76): Gamma-only, n_dim == 2,
square lattice, one spin component.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import fft as fftops

SIGMA_REF = 2.0


# ---------------------------------------------------------------------------
# Reference (long-range) fields: setup-time numpy
# ---------------------------------------------------------------------------

def reference_fields(lattice, fft_size, M, sigma=SIGMA_REF):
    """(rho_ref [grid], Aref [grid, 2]) for a mass-M Gaussian at the cell
    center; Aref is the analytic solution of curl A = 2 pi rho_ref,
    projected divergence-free in the finite basis."""
    n1, n2, n3 = fft_size
    red = np.stack(np.meshgrid(np.arange(n1) / n1, np.arange(n2) / n2,
                               np.arange(n3) / max(n3, 1), indexing="ij"),
                   axis=-1)
    red = red - np.array([0.5, 0.5, 0.0])
    rcart = np.einsum("ab,ijkb->ijka", np.asarray(lattice, dtype=float), red)
    x, y = rcart[..., 0], rcart[..., 1]
    r2 = x * x + y * y

    rho_ref = M * np.exp(-r2 / (2 * sigma ** 2)) / (2 * math.pi * sigma ** 2)

    # curl(phi(r) (-y, x)) = 2 phi + r phi'; the ODE r phi' + 2 phi =
    # 2 pi rho_ref has the smooth solution below (anyonic.jl:25-41)
    alpha = 1.0 / (2 * sigma ** 2)
    C = M / sigma ** 2
    with np.errstate(invalid="ignore", divide="ignore"):
        phi = np.where(r2 > 1e-14,
                       0.5 * C / alpha / np.where(r2 > 1e-14, r2, 1.0)
                       * (1 - np.exp(-alpha * r2)),
                       0.5 * C)                          # r->0 limit
    Aref = phi[..., None] * np.stack([-y, x], axis=-1)
    return rho_ref, Aref


def nyquist_mask(fft_size):
    """[grid] mask that zeroes the Nyquist planes of even in-plane axes.

    On an even grid the mode k = n/2 is its own conjugate partner
    (G(-k) != -G(k)); real-field vector calculus (curl/div identities,
    Hermitian A.p) cannot hold there, so the field solvers below project
    those modes out (standard spectral dealiasing choice)."""
    m = np.ones(fft_size)
    for ax in range(2):
        n = fft_size[ax]
        if n % 2 == 0:
            sl = [slice(None)] * 3
            sl[ax] = n // 2
            m[tuple(sl)] = 0.0
    return m


def make_div_free(A, G_cube_cart):
    """Project A [grid, 2] onto divergence-free fields (Fourier: remove the
    G-parallel component; G=0 kept, Nyquist planes zeroed).
    anyonic.jl:44-61."""
    Gx = np.asarray(G_cube_cart[..., 0])
    Gy = np.asarray(G_cube_cart[..., 1])
    G2 = Gx * Gx + Gy * Gy
    inv = np.where(G2 > 0, 1.0 / np.where(G2 > 0, G2, 1.0), 0.0)
    nyq = nyquist_mask(Gx.shape)
    Ax = np.fft.fftn(A[..., 0]) * nyq
    Ay = np.fft.fftn(A[..., 1]) * nyq
    dot = Gx * Ax + Gy * Ay
    Ax = Ax - dot * Gx * inv
    Ay = Ay - dot * Gy * inv
    return np.stack([np.fft.ifftn(Ax).real, np.fft.ifftn(Ay).real], axis=-1)


# ---------------------------------------------------------------------------
# Self-consistent gauge field (jax, differentiable in rho)
# ---------------------------------------------------------------------------

def gauge_field(rho_tot, rho_ref, Aref, G_cube_cart):
    """A [grid, 2] with curl A = 2 pi rho_tot, div A = 0: spectral solve on
    the zero-mass rho_tot - rho_ref plus the analytic Aref."""
    Gx = G_cube_cart[..., 0]
    Gy = G_cube_cart[..., 1]
    G2 = Gx * Gx + Gy * Gy
    inv = jnp.where(G2 > 0, 1.0 / jnp.where(G2 > 0, G2, 1.0), 0.0)
    d_G = jnp.fft.fftn(rho_tot - rho_ref) * jnp.asarray(
        nyquist_mask(rho_tot.shape))
    Ax = jnp.fft.ifftn(2j * math.pi * Gy * inv * d_G).real
    Ay = jnp.fft.ifftn(-2j * math.pi * Gx * inv * d_G).real
    return jnp.stack([Ax, Ay], axis=-1) + Aref


# ---------------------------------------------------------------------------
# Energy functional (pure in psi; AD gives the full Hamiltonian)
# ---------------------------------------------------------------------------

def _psi_real(bd, psi, fft_size, volume):
    N = int(np.prod(fft_size))
    scale = N / math.sqrt(volume)
    cube = jax.vmap(lambda c, i, m: fftops.scatter_to_cube(
        c, i, m, fft_size))(psi, bd.Gidx, bd.mask)
    return jnp.fft.ifftn(cube, axes=(-3, -2, -1)) * scale


def anyonic_energy(bd, psi, occupation, rho_tot, rho_ref, Aref, G_cube_cart,
                   hbar, beta, fft_size, volume):
    """E = sum_kn w f <psi| 2 hbar beta A.p + beta^2 |A|^2 |psi>.

    rho_tot must be the density OF psi for the variational property; pass
    it explicitly so callers reuse their existing density."""
    A = gauge_field(rho_tot, rho_ref, Aref, G_cube_cart)
    dvol = volume / int(np.prod(fft_size))
    w = bd.kweights[:, None] * occupation                      # [nk, nb]

    psir = _psi_real(bd, psi, fft_size, volume)
    E = jnp.sum(w[:, :, None, None, None]
                * (psir.conj() * psir).real
                * (beta ** 2) * jnp.sum(A * A, axis=-1)) * dvol
    for a in range(2):
        pa = _psi_real(bd, bd.Gpk_cart[:, None, :, a] * psi, fft_size, volume)
        E = E + 2 * hbar * beta * jnp.sum(
            w[:, :, None, None, None]
            * (psir.conj() * pa).real * A[..., a]) * dvol
    return E


# ---------------------------------------------------------------------------
# Hand-derived Hamiltonian action (reference anyonic.jl:103-152); kept for
# cross-validation against the AD gradient and for operator-based solvers
# ---------------------------------------------------------------------------

def current_density(bd, psi, occupation, fft_size, volume):
    """J [2, grid] = sum w f Im(psi* grad psi) (hbar factored out)."""
    psir = _psi_real(bd, psi, fft_size, volume)
    w = bd.kweights[:, None] * occupation
    out = []
    for a in range(2):
        da = _psi_real(bd, 1j * bd.Gpk_cart[:, None, :, a] * psi,
                       fft_size, volume)
        out.append(jnp.einsum("kn,knxyz->xyz", w,
                              jnp.imag(psir.conj() * da)))
    return jnp.stack(out, axis=0)


def effective_potential(J_eff, G_cube_cart):
    """V(r) with curl V-source relation  -2 beta xperp/|x|^2 * J_eff:
    V_hat = 4 pi i (G_2 ec_1 - G_1 ec_2)/|G|^2 ... (anyonic.jl:136-152);
    the beta prefactor is applied by the caller."""
    Gx = G_cube_cart[..., 0]
    Gy = G_cube_cart[..., 1]
    G2 = Gx * Gx + Gy * Gy
    inv = jnp.where(G2 > 0, 1.0 / jnp.where(G2 > 0, G2, 1.0), 0.0)
    nyq = jnp.asarray(nyquist_mask(J_eff.shape[1:]))
    ec1 = jnp.fft.fftn(J_eff[0]) * nyq
    ec2 = jnp.fft.fftn(J_eff[1]) * nyq
    pot_G = (-4j * math.pi) * (Gy * ec1 - Gx * ec2) * inv
    return jnp.fft.ifftn(pot_G).real


def apply_anyonic(bd, psi, occupation, rho_tot, rho_ref, Aref, G_cube_cart,
                  hbar, beta, fft_size, volume):
    """(H_anyonic psi) [nk, nb, nG]: 2 hbar beta sym(A.p) + beta^2|A|^2
    + the current-response effective potential."""
    A = gauge_field(rho_tot, rho_ref, Aref, G_cube_cart)
    J = current_density(bd, psi, occupation, fft_size, volume)
    eff_current = jnp.stack([hbar * J[a] + beta * rho_tot * A[..., a]
                             for a in range(2)], axis=0)
    Vloc = (beta ** 2) * jnp.sum(A * A, axis=-1) \
        + beta * effective_potential(eff_current, G_cube_cart)

    N = int(np.prod(fft_size))
    scale = N / math.sqrt(volume)
    psir = _psi_real(bd, psi, fft_size, volume)

    def back(cube_r):
        g = jnp.fft.fftn(cube_r / scale, axes=(-3, -2, -1))
        return jax.vmap(fftops.gather_from_cube)(g, bd.Gidx, bd.mask)

    out = back(Vloc[None, None] * psir)
    for a in range(2):
        pa = _psi_real(bd, bd.Gpk_cart[:, None, :, a] * psi, fft_size, volume)
        # symmetrised hbar beta {A_a, p_a} == 2 hbar beta A.p for div-free A
        out = out + hbar * beta * back(A[..., a][None, None] * pa)
        half = back(A[..., a][None, None] * psir)
        out = out + hbar * beta * bd.Gpk_cart[:, None, :, a] * half
    return out * bd.mask[:, None, :]
