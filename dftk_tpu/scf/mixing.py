"""SCF mixing preconditioners (DFTK `src/scf/mixing.jl`).

A mixing maps the density residual delta_F = rho_out - rho_in to a
preconditioned residual delta_rho before damping/acceleration:
  * SimpleMixing:  identity (times a factor)
  * KerkerMixing:  G^2 / (kTF^2 + G^2) screening in Fourier space - removes
    the long-wavelength charge-sloshing modes of metals
  * DielectricMixing: Levitt-style model dielectric eps(G)

All are elementwise multiplies on the Fourier cube (jit-friendly).  The
spin-density channel is passed through unmixed (the reference does the same
for Kerker, mixing.jl:54-103).
"""
import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SimpleMixing:
    alpha: float = 0.8

    def mix_density(self, delta_F, Gsq):
        return delta_F


@dataclasses.dataclass(frozen=True)
class KerkerMixing:
    """delta_rho(G) = delta_F(G) * G^2/(kTF^2 + G^2); DC component killed."""
    kTF: float = 0.8
    alpha: float = 0.8

    def mix_density(self, delta_F, Gsq):
        factor = Gsq / (self.kTF ** 2 + Gsq)
        return _apply_fourier_factor_total(delta_F, factor)


@dataclasses.dataclass(frozen=True)
class DielectricMixing:
    """Model dielectric of Levitt: eps^-1 with parameters (epsilon_r, kTF)."""
    epsilon_r: float = 10.0
    kTF: float = 0.8
    alpha: float = 0.8

    def mix_density(self, delta_F, Gsq):
        # eps(G) = 1 + (eps_r - 1) kTF^2 / (kTF^2 + G^2); mix with 1/eps
        eps = 1 + (self.epsilon_r - 1) * self.kTF ** 2 / (self.kTF ** 2 + Gsq)
        return _apply_fourier_factor_total(delta_F, 1.0 / eps)


@dataclasses.dataclass(frozen=True)
class LdosMixing:
    """chi0-model mixing (the reference default, mixing.jl:196-233):
    delta_rho solves  (1 - K chi0_model) delta_rho = delta_F  with the
    LDOS rank-1 + diagonal model
        chi0(dV) = -ldos dV + ldos <ldos, dV> / dos
    and K the RPA (Hartree) kernel.  Solved by a short host-side GMRES of
    cheap elementwise+FFT matvecs.  Falls back to Kerker-like behaviour in
    metals and ~identity in insulators (ldos -> 0)."""
    alpha: float = 0.8
    tol: float = 1e-5
    maxiter: int = 20

    def mix_density(self, delta_F, Gsq, ldos=None, dvol=None):
        if ldos is None or dvol is None:
            return delta_F
        import numpy as np
        total = jnp.sum(delta_F, axis=0)
        ldos_tot = jnp.sum(ldos, axis=0)
        dos = jnp.sum(ldos_tot) * dvol

        vc = jnp.where(Gsq > 0, 4 * jnp.pi / jnp.where(Gsq > 0, Gsq, 1.0), 0.0)

        def K(drho):        # Hartree kernel
            return jnp.fft.ifftn(vc * jnp.fft.fftn(drho)).real

        def chi0(dV):
            t = -ldos_tot * dV
            corr = ldos_tot * (jnp.sum(ldos_tot * dV) * dvol
                               / jnp.maximum(dos, 1e-14))
            return t + corr

        def eps(drho):      # (1 - K chi0)... acting on drho: drho - chi0(K drho)
            return drho - chi0(K(drho))

        from ..response.hessian import gmres
        mixed_tot = gmres(eps, total, tol=self.tol, maxiter=self.maxiter)
        if delta_F.shape[0] == 1:
            return mixed_tot[None]
        spin = delta_F[0] - delta_F[1]
        return jnp.stack([(mixed_tot + spin) / 2, (mixed_tot - spin) / 2])


def _apply_fourier_factor_total(delta_F, factor):
    """Apply a Fourier-space factor to the *total* density channel only.

    delta_F [nspin, n1,n2,n3]; for collinear spin the (alpha - beta) channel
    passes through unchanged.
    """
    total = jnp.sum(delta_F, axis=0)
    mixed_tot = jnp.fft.ifftn(factor * jnp.fft.fftn(total)).real
    if delta_F.shape[0] == 1:
        return mixed_tot[None]
    spin = delta_F[0] - delta_F[1]
    return jnp.stack([(mixed_tot + spin) / 2, (mixed_tot - spin) / 2])


@dataclasses.dataclass(frozen=True)
class KerkerDosMixing:
    """Kerker with kTF^2 = 4 pi (DOS_a + DOS_b)/Omega from the CURRENT
    spectrum, and the spin-channel Delta-DOS coupling
        drho_spin = dF_spin - 4 pi (DDOS/Omega) dF_tot / (kTF^2 + G^2)
    (reference mixing.jl:54-121).  Receives the per-spin LDOS from the
    driver (needs_ldos)."""
    alpha: float = 0.8
    needs_ldos = True

    def mix_density(self, delta_F, Gsq, ldos=None, dvol=None, volume=None):
        if ldos is None:
            return delta_F
        dos_sigma = jnp.sum(ldos, axis=(1, 2, 3)) * dvol   # [nspin]
        vol = volume if volume is not None else 1.0
        dos_tot = jnp.sum(dos_sigma)
        kTF2 = jnp.maximum(4 * jnp.pi * dos_tot / vol, 1e-8)
        total = jnp.sum(delta_F, axis=0)
        tot_F = jnp.fft.fftn(total)
        mixed_tot = jnp.fft.ifftn(tot_F * Gsq / (kTF2 + Gsq)).real
        if delta_F.shape[0] == 1:
            return mixed_tot[None]
        ddos = (dos_sigma[0] - dos_sigma[1]) / vol
        spin = delta_F[0] - delta_F[1]
        spin_F = jnp.fft.fftn(spin) - tot_F * (4 * jnp.pi * ddos) \
            / (kTF2 + Gsq)
        mixed_spin = jnp.fft.ifftn(spin_F).real
        return jnp.stack([(mixed_tot + mixed_spin) / 2,
                          (mixed_tot - mixed_spin) / 2])


@dataclasses.dataclass(frozen=True)
class HybridMixing:
    """chi0-model mixing with LDOS + model-dielectric terms (reference
    mixing.jl:196: chi0terms = [DielectricModel, LdosModel]):

        chi0(dV) = -ldos dV + ldos <ldos,dV>/D
                 + IFFT[ C0 G^2 / (4 pi (1 - C0 G^2/kTF^2)) ] FFT dV

    with C0 = 1 - eps_r; solves (1 - K chi0) drho = dF by GMRES."""
    epsilon_r: float = 10.0
    kTF: float = 0.8
    alpha: float = 0.8
    tol: float = 1e-5
    maxiter: int = 20
    needs_ldos = True

    def mix_density(self, delta_F, Gsq, ldos=None, dvol=None, volume=None):
        total = jnp.sum(delta_F, axis=0)
        C0 = 1.0 - self.epsilon_r
        diel = C0 * Gsq / (4 * jnp.pi * (1 - C0 * Gsq / self.kTF ** 2))
        vc = jnp.where(Gsq > 0, 4 * jnp.pi / jnp.where(Gsq > 0, Gsq, 1.0),
                       0.0)
        if ldos is not None:
            ldos_tot = jnp.sum(ldos, axis=0)
            dos = jnp.sum(ldos_tot) * dvol
        else:
            ldos_tot, dos = None, 0.0

        def K(drho):
            return jnp.fft.ifftn(vc * jnp.fft.fftn(drho)).real

        def chi0(dV):
            out = jnp.fft.ifftn(diel * jnp.fft.fftn(dV)).real
            if ldos_tot is not None:
                out = out - ldos_tot * dV + ldos_tot * (
                    jnp.sum(ldos_tot * dV) * dvol / jnp.maximum(dos, 1e-14))
            return out

        def eps(drho):
            return drho - chi0(K(drho))

        from ..response.hessian import gmres
        mixed_tot = gmres(eps, total, tol=self.tol, maxiter=self.maxiter)
        if delta_F.shape[0] == 1:
            return mixed_tot[None]
        spin = delta_F[0] - delta_F[1]
        return jnp.stack([(mixed_tot + spin) / 2, (mixed_tot - spin) / 2])


@dataclasses.dataclass(frozen=True)
class Chi0Mixing:
    """EXACT chi0 mixing (reference Applychi0Model, chi0models.jl:45):
    solves (1 - K chi0) drho = dF with chi0 applied through the actual
    Sternheimer equations of the current iterate.  Expensive (a batched CG
    per GMRES matvec) but parameter-free; useful as a reference mixing for
    hard cases.  needs_state: the driver passes the current iterate."""
    alpha: float = 0.8
    tol: float = 1e-3
    maxiter: int = 6
    sternheimer_tol: float = 1e-6
    needs_state = True

    def mix_density(self, delta_F, Gsq, basis=None, ctx=None):
        from ..response.chi0 import apply_chi0
        from ..response.hessian import gmres

        vc = jnp.where(Gsq > 0, 4 * jnp.pi / jnp.where(Gsq > 0, Gsq, 1.0),
                       0.0)

        def K(drho):   # RPA (Hartree) kernel, spin-summed
            tot = jnp.sum(drho, axis=0)
            out = jnp.fft.ifftn(vc * jnp.fft.fftn(tot)).real
            return jnp.broadcast_to(out, drho.shape)

        def eps(drho):
            return drho - apply_chi0(ctx, basis, K(drho),
                                     tol=self.sternheimer_tol)

        return gmres(eps, delta_F, tol=self.tol, maxiter=self.maxiter)
