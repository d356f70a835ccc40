#!/usr/bin/env python
"""Measure the CPU (complex-f64) H*Psi throughput for the bench workload.

This number is the reference point recorded as BASELINE_CPU_APPLIES_PER_S in
bench.py: it represents the reference implementation's production habitat
(one CPU process, complex f64 arithmetic, FFTW-style FFTs).
"""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax, jax.numpy as jnp

import bench
from dftk_tpu.ops import hamiltonian as hamops
from dftk_tpu.ops.density import guess_density
from dftk_tpu.scf.driver import random_orbitals

n_rep = int(os.environ.get("DFTK_BENCH_NREP", "2"))
Ecut = float(os.environ.get("DFTK_BENCH_ECUT", "10"))
nb = int(os.environ.get("DFTK_BENCH_NBANDS", "64"))

basis = bench.build_problem(n_rep=n_rep, Ecut=Ecut)
model = basis.model
print("fft:", basis.fft_size, "nG:", basis.nG_max, "atoms:", len(model.atoms))
rho = guess_density(basis)
V, _ = hamops.total_potential(basis.terms, rho, jnp.asarray(basis.G_cube_cart),
                              model.unit_cell_volume)
ham = hamops.build_ham(basis.data, basis.terms.data, V)
psi = random_orbitals(basis, nb)
f = jax.jit(lambda h, p: hamops.apply_H(h, p, basis.fft_size,
                                        model.unit_cell_volume))
out = jax.block_until_ready(f(ham, psi))
for _ in range(2):
    out = f(ham, out)
jax.block_until_ready(out)
n_iter = 10
t0 = time.time(); o = psi
for _ in range(n_iter):
    o = f(ham, o)
jax.block_until_ready(o)
dt = time.time() - t0
print("CPU c128 band-applies/s:", round(n_iter * basis.n_kpoints * nb / dt, 1))
