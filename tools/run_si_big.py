"""Si-N supercell Gamma-point SCF on the TPU chip (split engine + CheFSI).

The BASELINE north-star configuration family (Si256 ~ 1024 electrons).
Usage: python tools/run_si_big.py [cells_x cells_y cells_z] [Ecut]
"""
import os, sys, time
os.environ.setdefault("DFTK_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

cells = tuple(int(x) for x in sys.argv[1:4]) if len(sys.argv) > 3 else (2, 2, 2)
Ecut = float(sys.argv[4]) if len(sys.argv) > 4 else 10.0
# optional: run the Chebyshev filter applies at reduced matmul precision
filter_precision = os.environ.get("DFTK_FILTER_PRECISION") or None
cheb_degree = int(os.environ.get("DFTK_CHEB_DEGREE", "10"))
cheb_cycles = int(os.environ.get("DFTK_CHEB_CYCLES", "2"))
max_iter = int(os.environ.get("DFTK_MAXITER", "40"))

import dftk_tpu as dftk
from dftk_tpu.supercell import create_supercell
from dftk_tpu.ops.engine_split import self_consistent_field_split

a = 10.263141334305942           # conventional cubic Si lattice (bohr)
conv_lattice = np.eye(3) * a
Si = dftk.ElementPsp.from_symbol("Si", psp="lda/si-q4")
conv_pos = [np.array(p) for p in
            [[0, 0, 0], [.5, .5, 0], [.5, 0, .5], [0, .5, .5],
             [.25, .25, .25], [.75, .75, .25], [.75, .25, .75], [.25, .75, .75]]]
sc = create_supercell(conv_lattice, [Si] * 8, conv_pos, cells)
natoms = len(sc["atoms"])
print(f"Si{natoms}: {natoms*4} electrons, cells={cells}, Ecut={Ecut}", flush=True)

t0 = time.time()
model = dftk.model_DFT(sc["lattice"], sc["atoms"], sc["positions"],
                       functionals=["lda_x", "lda_c_vwn"], symmetries=False)
basis = dftk.PlaneWaveBasis(model, Ecut=Ecut, kgrid=(1, 1, 1))
print(f"basis: fft={basis.fft_size} nG={basis.nG_max} "
      f"(setup {time.time()-t0:.0f}s)", flush=True)

nb = natoms * 2 + max(8, natoms // 4)      # n_occ + extra
res = self_consistent_field_split(
    basis, tol=5e-7 * natoms, maxiter=max_iter, n_bands=natoms * 2,
    n_extra_bands=nb - natoms * 2, eigensolver="chefsi", chebyshev_degree=cheb_degree,
    chefsi_cycles=cheb_cycles, mixing_eps_r=12.0, damping=0.6,
    band_chunk=256, is_converged="energy", filter_precision=filter_precision,
    callback=lambda i: print(f"  it={i['n_iter']} E={i['E']:.6f} "
                             f"drho={i['drho']:.2e} [{time.time()-t0:.0f}s]",
                             flush=True))
print(f"FINAL Si{natoms}: E = {res['energies']['total']:.6f} Ha "
      f"({res['energies']['total']/natoms:.6f} Ha/atom), converged="
      f"{res['converged']}, wall = {time.time()-t0:.0f}s", flush=True)
