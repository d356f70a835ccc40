"""Self-consistent field driver.

Mirrors the structure of DFTK `src/scf/self_consistent_field.jl:80-289`:
an outer Python fixed-point loop around ONE jitted step

    rho_in -> V(rho_in) -> LOBPCG (warm-started) -> occupations / Fermi level
           -> rho_out -> energies at rho_out

with Anderson-accelerated, Kerker/Simple-preconditioned density updates and
an adaptive eigensolver tolerance schedule (AdaptiveDiagtol,
scf_callbacks.jl:191-230).  The step is one compiled XLA program; only the
small mixing/convergence logic runs in Python between steps.
"""
import dataclasses
import math
import time
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hamiltonian as hamops
from ..ops.density import (compute_density, compute_kinetic_energy_density,
                           guess_density, make_symmetrizer,
                           von_weizsaecker_tau)
from ..ops.eigen.lobpcg import lobpcg, ortho_qr
from ..ops.occupation import compute_occupation, entropy_energy
from .anderson import AndersonAcceleration
from .mixing import KerkerMixing, LdosMixing, SimpleMixing


@dataclasses.dataclass
class SCFResult:
    basis: Any
    energies: Dict[str, float]
    eigenvalues: np.ndarray      # [nk, nb]
    occupation: np.ndarray       # [nk, nb]
    psi: Any                     # [nk, nb, nG] device array
    rho: Any                     # [nspin, n1,n2,n3]
    epsF: float
    converged: bool
    n_iter: int
    n_bands_converge: int
    history_Etot: list
    history_Drho: list
    n_matvec: int
    runtime_s: float
    V_local: Any = None          # total local potential at convergence
    tau: Any = None              # kinetic-energy density (mGGA only)

    @property
    def total_energy(self):
        return self.energies["total"]


def random_orbitals(basis, n_bands, seed=42):
    key = jax.random.PRNGKey(seed)
    shape = (basis.n_kpoints, n_bands, basis.nG_max)
    k1, k2 = jax.random.split(key)
    X = (jax.random.normal(k1, shape) + 1j * jax.random.normal(k2, shape))
    X = X * basis.data.mask[:, None, :]
    return ortho_qr(X)


class ScfConvergenceEnergy:
    """Converged when |E_n - E_{n-1}| < tol (scf_callbacks.jl:138-166)."""
    def __init__(self, tol):
        self.tol = tol
        self._prev = None

    def __call__(self, info):
        E = info["E"]
        done = self._prev is not None and abs(E - self._prev) < self.tol
        self._prev = E
        return done


class ScfConvergenceDensity:
    """Converged when ||rho_out - rho_in|| sqrt(dvol) < tol."""
    def __init__(self, tol):
        self.tol = tol

    def __call__(self, info):
        return info["drho"] < self.tol


class ScfConvergenceForce:
    """Converged when the force change between iterations is below tol.

    Note: evaluates forces each iteration (expensive); reference
    scf_callbacks.jl:158-166.
    """
    def __init__(self, tol):
        self.tol = tol
        self._prev = None

    def __call__(self, info):
        scfres_like = info.get("partial_scfres")
        if scfres_like is None:
            return False
        from ..postprocess.forces import compute_forces
        F = compute_forces(scfres_like)
        done = self._prev is not None and             float(np.abs(F - self._prev).max()) < self.tol
        self._prev = F
        return done


class ScfDefaultCallback:
    """Iteration table printer (reference scf_callbacks.jl:30-136)."""

    def __init__(self, show_time=True):
        self.t0 = None
        self.show_time = show_time

    def __call__(self, info):
        import time as _t
        if self.t0 is None:
            self.t0 = _t.time()
            print(f"{'n':>3s}  {'energy':>16s}  {'log10(drho)':>11s}"
                  f"  {'eig_it':>6s}  {'t/s':>6s}")
        drho = info.get("drho", float("nan"))
        print(f"{info['n_iter']:3d}  {info['E']:16.10f}  "
              f"{np.log10(max(drho, 1e-300)):11.2f}  "
              f"{info.get('eig_iters', 0):6d}  {_t.time()-self.t0:6.1f}")


def default_mixing(model):
    if model.temperature > 0:
        return KerkerMixing()
    return SimpleMixing()


def self_consistent_field(
        basis,
        tol: float = 1e-6,
        maxiter: int = 100,
        rho=None,
        psi=None,
        n_bands: Optional[int] = None,
        n_extra_bands: Optional[int] = None,
        nbandsalg=None,
        mixing=None,
        damping: float = 0.8,
        anderson_depth: int = 10,
        eigensolver_maxiter: int = 100,
        diagtol_max: float = 5e-3,
        diagtol_min: float = None,
        diagtol_ratio: float = 0.2,
        is_converged="density",   # "density" | "energy" | callable(info)->bool
        band_chunk: Optional[int] = None,
        callback: Optional[Callable] = None,
        maxtime: Optional[float] = None,      # seconds; soft SCF timeout
        seed: int = 42,
        use_ace: bool = True,    # compress Fock exchange (Lin Lin ACE)
) -> SCFResult:
    t0 = time.time()
    model = basis.model
    terms = basis.terms
    nspin = model.n_spin_components
    if terms.anyonic is not None:
        raise NotImplementedError(
            "the Anyonic term is solved by direct_minimization (its "
            "Hamiltonian depends on the orbitals through the current); "
            "see examples in tests/test_anyonic.py and the reference "
            "examples/anyons.jl, which does the same")

    if nbandsalg is not None:
        n_bands, nb_total = nbandsalg.bands(model)
        n_extra_bands = nb_total - n_bands
    else:
        if n_bands is None:
            n_bands = model.default_n_bands()
        if n_extra_bands is None:
            n_extra_bands = max(3, n_bands // 10)
        nb_total = n_bands + n_extra_bands

    if rho is None:
        rho = guess_density(basis)
    if psi is None:
        psi = random_orbitals(basis, nb_total, seed=seed)
    if mixing is None:
        mixing = default_mixing(model)
    if diagtol_min is None:
        eps = float(jnp.finfo(jnp.zeros(0).dtype).eps)   # working precision
        diagtol_min = max(tol / 100, 100 * eps)

    symmetrizer = make_symmetrizer(basis)
    # NOTE on potentials and symmetry: rho is symmetrized (with the grid
    # lowpass), V is applied RAW pointwise - exactly like the reference
    # (src/terms/xc.jl:84-160) and ABINIT.  With fractional translations
    # that do not map the real-space grid onto itself the pointwise V of a
    # symmetric rho is NOT symmetric at the aliasing level, so eigenstates
    # are stationary points of E[Sym rho] only up to ~1e-6 (LDA/PBE) /
    # ~1e-4 (SCAN) - an inconsistency the reference inherits too.
    # Symmetrizing V instead was measured to move the SCAN ABINIT-golden
    # eigenvalues by up to 6e-4 (the lowpass changes the potential), so
    # golden parity wins: keep V raw.
    bd = basis.data
    td = terms.data
    needs_tau = any(f.family == "mgga" for f, _ in terms.xc)
    has_exx = terms.exx_kernel_np is not None
    has_hubbard = terms.hubbard_manifolds is not None
    if has_hubbard:
        from ..ops.hubbard import (apply_hubbard, build_hubbard_projectors,
                                   build_occupation_symmetrization,
                                   hubbard_energy, hubbard_potential_matrix,
                                   occupation_matrix,
                                   symmetrize_occupation_matrix)
        hub_Phi, hub_slices = build_hubbard_projectors(
            basis, terms.hubbard_manifolds)
        hub_plan = build_occupation_symmetrization(
            basis, terms.hubbard_manifolds, hub_slices)
    exx_iq = None
    if has_exx:
        # Gamma: one kernel cube, k-diagonal exchange (the reference's only
        # mode, terms/exact_exchange.jl:52).  k-grids (BEYOND the
        # reference): kernels at every G+q difference + the index map; the
        # generator sum then runs over the full same-spin k' list, so the
        # k-point set must be an unreduced (symmetries=False) uniform grid.
        exx_kernel = jnp.asarray(terms.exx_kernel_np[0])
        if basis.n_kpoints != nspin:
            # the generator sum over k' is only complete on the FULL
            # reducible grid; equal weights are NOT sufficient (a TR-only
            # reduced grid has every weight 1/2N and still misses k'
            # points).  Require the stored spatial k-set to be a complete
            # diagonal Monkhorst-Pack grid.
            from ..ops.coulomb import _infer_kgrid_dims, _wrap_frac
            kc_sp = np.unique(_wrap_frac(np.asarray(basis.kcoords_spin)),
                              axis=0)
            dims = _infer_kgrid_dims(kc_sp)
            assert dims is not None, \
                "k-grid ExactExchange needs the full (unreduced) uniform " \
                "k-point set (build the basis with symmetries=False)"
            exx_kernel = jnp.asarray(terms.exx_kernel_np)
            exx_iq = jnp.asarray(terms.exx_iq_np)
    fft_size = basis.fft_size
    volume = model.unit_cell_volume
    dvol = basis.dvol
    Gcart = jnp.asarray(basis.G_cube_cart)
    filled = model.filled_occupation
    temperature = model.temperature
    smearing = model.smearing

    Apot = None
    if terms.Apot_np is not None:
        Apot = jnp.asarray(terms.Apot_np)

    def scf_step(rho_in, psi_in, diagtol, tau_in=None, exx_occ_in=None):
        exx_kw = {"Apot": Apot}
        if has_exx:
            # generator weights w_k' f/filled (w == 1 at Gamma)
            exx_kw.update(exx_kernel=exx_kernel, exx_psi=psi_in,
                          exx_occ=bd.kweights[:, None] * exx_occ_in / filled,
                          exx_iq=exx_iq)
        if needs_tau:
            V, Vtau, _ = hamops.total_potential(terms, rho_in, Gcart, volume,
                                                tau=tau_in)
            ham = hamops.build_ham(bd, td, V, Vtau=Vtau, **exx_kw)
        else:
            V, _ = hamops.total_potential(terms, rho_in, Gcart, volume)
            ham = hamops.build_ham(bd, td, V, **exx_kw)
        ace_xi = None
        if has_exx and use_ace:
            # compress the Fock operator once per step; the eigensolver then
            # applies two GEMMs instead of one Poisson solve per orbital
            from ..ops.exx_ace import apply_ace, build_ace
            ace_xi = build_ace(ham, fft_size, volume)
            ham = ham._replace(exx_kernel=None, exx_psi=None, exx_occ=None)
        Vhub = None
        if has_hubbard:
            occ_in = exx_occ_in if exx_occ_in is not None else \
                jnp.zeros(psi_in.shape[:2])
            n_hub = occupation_matrix(hub_Phi, psi_in, occ_in, bd.kweights,
                                      bd.kspin, nspin)
            n_hub = symmetrize_occupation_matrix(n_hub, hub_slices, hub_plan)
            Vhub = hubbard_potential_matrix(n_hub, terms.hubbard_manifolds,
                                            hub_slices, filled)

        def applyH(p):
            out = hamops.apply_H(ham, p, fft_size, volume,
                                 band_chunk=band_chunk)
            if Vhub is not None:
                out = out + apply_hubbard(hub_Phi, Vhub, bd.kspin, p) \
                    * bd.mask[:, None, :]
            if ace_xi is not None:
                out = out + apply_ace(ace_xi, p) * bd.mask[:, None, :]
            return out
        res = lobpcg(applyH, psi_in, ham.kin, bd.mask, tol=diagtol,
                     maxiter=eigensolver_maxiter, n_conv=n_bands)
        occ, epsF = compute_occupation(res.eigenvalues, bd.kweights,
                                       model.n_electrons, filled,
                                       temperature, smearing)
        rho_out = compute_density(bd, res.X, occ, fft_size, volume, nspin,
                                  symmetrizer=symmetrizer)
        tau_out = None
        if needs_tau:
            tau_out = compute_kinetic_energy_density(
                bd, bd.Gpk_cart, res.X, occ, fft_size, volume, nspin)
            if symmetrizer is not None:
                tau_out = symmetrizer(tau_out)

        # energies evaluated at rho_out (consistent at convergence)
        if needs_tau:
            V_out, Vtau_out, energies = hamops.total_potential(
                terms, rho_out, Gcart, volume, tau=tau_out)
            ham_out = hamops.build_ham(bd, td, V_out, Vtau=Vtau_out,
                                       Apot=Apot)
        else:
            V_out, energies = hamops.total_potential(terms, rho_out, Gcart,
                                                     volume)
            ham_out = hamops.build_ham(bd, td, V_out, Apot=Apot)
        energies.update(hamops.psi_energies(ham_out, terms, res.X, occ,
                                            bd.kweights))
        if has_exx:
            ham_x = ham_out._replace(
                exx_kernel=exx_kernel, exx_psi=res.X,
                exx_occ=bd.kweights[:, None] * occ / filled, exx_iq=exx_iq)
            energies["ExactExchange"] = hamops.exchange_energy(
                ham_x, res.X, occ, bd.kweights, fft_size, volume, filled)
        if has_hubbard:
            n_out = occupation_matrix(hub_Phi, res.X, occ, bd.kweights,
                                      bd.kspin, nspin)
            n_out = symmetrize_occupation_matrix(n_out, hub_slices, hub_plan)
            energies["Hubbard"] = hubbard_energy(
                n_out, terms.hubbard_manifolds, hub_slices, filled)
        if terms.has_entropy:
            energies["Entropy"] = entropy_energy(
                res.eigenvalues, bd.kweights, epsF, temperature, smearing, filled)
        return (rho_out, res.X, res.eigenvalues, occ, epsF, energies,
                res.n_iter, res.n_matvec, V_out, tau_out)

    scf_step = jax.jit(scf_step)

    anderson = AndersonAcceleration(m=anderson_depth)
    Gsq = td.Gsq_cart
    is_ldos_mixing = (isinstance(mixing, LdosMixing)
                      or getattr(mixing, "needs_ldos", False))
    needs_state = getattr(mixing, "needs_state", False)
    if not is_ldos_mixing and not needs_state:
        # iteration-aware mixings (reference scf/mixing.jl passes n_iter to
        # mix_density) run unjitted so Python-level schedules work; the
        # stateless built-ins keep the jitted fast path.
        import inspect
        if "n_iter" in inspect.signature(mixing.mix_density).parameters:
            mix = lambda dF, it: mixing.mix_density(dF, Gsq, n_iter=it)
        else:
            _mixj = jax.jit(lambda dF: mixing.mix_density(dF, Gsq))
            mix = lambda dF, it: _mixj(dF)

    @jax.jit
    def _ldos_at(psi_c, eigvals_c, epsF_c):
        from ..ops import fft as fftops_
        import numpy as _np
        N = int(np.prod(fft_size))
        scale = N / np.sqrt(volume)
        cube = jax.vmap(lambda c, i, m: fftops_.scatter_to_cube(
            c, i, m, fft_size))(psi_c, bd.Gidx, bd.mask)
        psir2 = jnp.abs(jnp.fft.ifftn(cube, axes=(-3, -2, -1)) * scale) ** 2
        T_eff = temperature if temperature > 0 else 1e-3
        x = (eigvals_c - epsF_c) / T_eff
        docc = jax.vmap(jax.vmap(jax.grad(
            lambda t: smearing.occupation(t) if temperature > 0
            else jax.nn.sigmoid(-t))))(x)
        w = -filled / T_eff * bd.kweights[:, None] * docc
        ld = jnp.einsum("kn,knxyz->xyz", w, psir2)
        return ld[None]

    history_E, history_drho = [], []
    E_prev = None
    converged = False
    diagtol = diagtol_max
    n_matvec_total = 0
    info = None

    tau = None
    if needs_tau:
        tau = von_weizsaecker_tau(rho, Gcart)
    exx_occ = None
    if has_exx or has_hubbard:
        # start from the aufbau guess (exchange needs occupations of psi_in)
        from ..ops.occupation import compute_occupation as _co
        nb0 = psi.shape[1]
        n_occ0 = int(round(model.n_electrons / filled))
        exx_occ = jnp.where(jnp.arange(nb0)[None, :] < n_occ0,
                            float(filled), 0.0)
        exx_occ = jnp.broadcast_to(exx_occ, (basis.n_kpoints, nb0))
    for it in range(maxiter):
        (rho_out, psi, eigvals, occ, epsF, energies, eig_iters, nmv,
         V_out, tau_out) = scf_step(rho, psi, diagtol, tau, exx_occ)
        if has_exx or has_hubbard:
            exx_occ = occ

        E_const = {"Ewald": terms.E_ewald, "PspCorrection": terms.E_psp_correction}
        if terms.E_pairwise:
            E_const["PairwisePotential"] = terms.E_pairwise
        delta_F = rho_out - rho
        # batch the scalar fetches: one round trip per iteration
        energies_h, drho_h, epsF, nmv, eig_iters = jax.device_get(
            (energies, jnp.linalg.norm(delta_F), epsF, nmv, eig_iters))
        n_matvec_total += int(nmv)
        E_total = float(sum(energies_h.values()) + sum(E_const.values()))
        drho = float(drho_h) * np.sqrt(dvol)
        history_E.append(E_total)
        history_drho.append(drho)

        if callback is not None:
            callback(dict(n_iter=it + 1, E=E_total, drho=drho, epsF=float(epsF),
                          eig_iters=int(eig_iters)))

        if callable(is_converged):
            converged = bool(is_converged(dict(E=E_total, drho=drho,
                                               n_iter=it + 1)))
        elif is_converged == "density":
            converged = drho < tol
        else:
            converged = E_prev is not None and abs(E_total - E_prev) < tol
        E_prev = E_total
        # keep the freshest iterate before any early exit (a timeout on the
        # very first iteration must not leave info unset)
        info = (rho_out, eigvals, occ, epsF, energies, E_const, V_out)
        if maxtime is not None and time.time() - t0 > maxtime:
            break

        # adaptive band growth (AdaptiveBands): if the top computed band is
        # still occupied, enlarge the block (static shapes per jit; growth
        # recompiles, which is rare)
        if nbandsalg is not None and not converged:
            grown = nbandsalg.update(jax.device_get(occ), None)
            if grown is not None:
                n_bands, nb_total_new = grown
                extra = nb_total_new - psi.shape[1]
                if extra > 0:
                    pad = random_orbitals(basis, extra, seed=seed + it + 1)
                    psi = jnp.concatenate([psi, pad], axis=1)
                    from ..ops.eigen.lobpcg import ortho_qr as _oq
                    psi = _oq(psi)
                    nb_total = nb_total_new
                    if exx_occ is not None:
                        # new bands are unoccupied by construction; keep the
                        # exchange/Hubbard occupation in sync with psi's width
                        exx_occ = jnp.pad(jnp.asarray(exx_occ),
                                          ((0, 0), (0, extra)))
        if converged:
            rho = rho_out
            break
        if needs_tau:
            tau = tau_out      # tau follows psi (no separate mixing)

        # density update: precondition + Anderson + damping
        if needs_state:
            from ..response.chi0 import Chi0Context
            ctx = Chi0Context(
                ham=hamops.build_ham(bd, td, V_out), psi=psi,
                occupation=jnp.asarray(occ),
                eigenvalues=jnp.asarray(eigvals),
                epsF=jnp.asarray(epsF))
            delta_rho = mixing.mix_density(delta_F, Gsq, basis=basis,
                                           ctx=ctx)
        elif is_ldos_mixing:
            ldos = _ldos_at(psi, jnp.asarray(eigvals), jnp.asarray(epsF))
            kw = dict(ldos=ldos, dvol=dvol)
            if not isinstance(mixing, LdosMixing):
                kw["volume"] = volume
            delta_rho = mixing.mix_density(delta_F, Gsq, **kw)
        else:
            delta_rho = mix(delta_F, it + 1)
        rho = anderson(rho, delta_rho, damping)
        # adaptive eigensolver tolerance, tightening with density residual
        diagtol = min(diagtol, max(diagtol_ratio * drho, diagtol_min))

    rho_out, eigvals, occ, epsF, energies, E_const, V_out = info
    energies_out = {k: float(jax.device_get(v)) for k, v in energies.items()}
    energies_out.update(E_const)
    energies_out["total"] = float(sum(energies_out.values()))

    if not converged or not math.isfinite(energies_out["total"]):
        from ..utils.debugdump import debug_dump
        path = debug_dump(
            "scf-not-converged",
            meta=dict(energies=energies_out, n_iter=it + 1, epsF=float(epsF),
                      history_E=history_E, history_drho=history_drho),
            rho=rho_out, eigenvalues=eigvals, occupation=occ)
        if path:
            print(f"SCF debug state dumped to {path}")

    return SCFResult(
        basis=basis, energies=energies_out,
        eigenvalues=np.asarray(jax.device_get(eigvals)),
        occupation=np.asarray(jax.device_get(occ)),
        psi=psi, rho=rho_out, epsF=float(epsF), converged=bool(converged),
        n_iter=it + 1, n_bands_converge=n_bands,
        history_Etot=history_E, history_Drho=history_drho,
        n_matvec=n_matvec_total, runtime_s=time.time() - t0,
        V_local=V_out, tau=tau_out if needs_tau else None)
