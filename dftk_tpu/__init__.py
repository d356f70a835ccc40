"""dftk_tpu: a TPU-native plane-wave density-functional theory framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of DFTK.jl
(reference layout documented in SURVEY.md): plane-wave Kohn-Sham DFT with
norm-conserving pseudopotentials, solved self-consistently with a batched
LOBPCG eigensolver, k-point/spin parallelism over a jax.sharding device
mesh, and derivatives (forces/stresses/response) via jax autodiff.

Importing this package enables float64 (required for DFT accuracy).
"""
from . import config  # noqa: F401  (sets jax_enable_x64)

from .models.model import Model
from .models.standard import (HSE06, LDA, PBE, PBE0, PBEsol, model_DFT,
                              model_atomic, model_HF)
from .models.elements import (ElementCoulomb, ElementGaussian, ElementPsp,
                              atomic_symbol)
from .models.psp_hgh import (PspHgh, list_psp, load_psp, load_psp_hgh,
                             parse_hgh)
from .models import smearing as Smearing
from .basis import PlaneWaveBasis
from .bzmesh import ExplicitKpoints, MonkhorstPack, kgrid_from_maximal_spacing
from .ops.terms import (Anyonic, AtomicLocal, AtomicNonlocal, BlowupAbinit,
                        BlowupCHV, BlowupIdentity, Entropy, Ewald,
                        ExactExchange, ExternalFromFourier, ExternalFromReal,
                        ExternalFromValues,
                        Hartree, Kinetic, LocalNonlinearity, Magnetic,
                        PairwisePotential, PspCorrection, Xc)
from .ops.terms import Hubbard
from .ops.hubbard import HubbardManifold
from .ops.coulomb import (Coulomb, LongRangeCoulomb, ProbeCharge,
                          ReplaceSingularity, ShortRangeCoulomb,
                          SphericallyTruncatedCoulomb, VoxelAveraged,
                          WignerSeitzTruncatedCoulomb)
from .ops.density import (compute_density, guess_density, random_density,
                          total_density)
from .models.psp_lincomb import PspLinComb, virtual_crystal_approximation
from .scf.driver import self_consistent_field, SCFResult
from .scf.direct import direct_minimization
from .scf.mixing import (Chi0Mixing, DielectricMixing, HybridMixing,
                         KerkerDosMixing, KerkerMixing, LdosMixing,
                         SimpleMixing)
from .symmetry import SymOp
from .models.psp_upf import PspUpf, load_psp_upf, parse_upf
from .postprocess.forces import compute_forces, compute_forces_cart
from .postprocess.stresses import compute_stresses_cart
from .postprocess.bands import compute_bands, irrfbz_path
from .postprocess.unfold import unfold_bz
from .postprocess.geometry import optimize_geometry
from .postprocess.dos import compute_dos, compute_ldos
from .postprocess.phonon import phonon_modes_finite_diff
from .response.hessian import (compute_polarizability, solve_dyson,
                               solve_omega_plus_k)
from .response.chi0 import apply_chi0, make_chi0_context
from .postprocess.elastic_response import elastic_tensor_response
from .postprocess.refine import (refine_scfres, refine_forces,
                                 refine_forces_cart)
from .scf.energy_eval import (evaluate_total_energy, refine_split_energy,
                              refine_split_state)
from .io.scfres import load_scfres, save_scfres, todict
from .io.vtk import save_vts
from .standardize import find_primitive, minkowski_reduce, standardize_atoms
from .transfer import transfer_blochwave, transfer_density
from .utils.timer import memory_usage, timer, versioninfo

__version__ = "0.1.0"
