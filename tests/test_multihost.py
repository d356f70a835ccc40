"""Multi-process (multi-host) k-point distribution over jax.distributed.

The real-machine analogue of the reference running its suite under
`mpiexec -n 2` (test/runtests.jl:26-33) ACROSS HOSTS: two OS processes,
each owning 2 virtual CPU devices, form one 4-device global mesh with
gloo-backed cross-process collectives (the CPU stand-in for DCN).  The
sharded split SCF must produce the single-process answer bit-for-bit at
f64 print precision.

Exercises dftk_tpu/parallel/multihost.py end to end: initialize(),
global_kpoint_mesh(), fetch() (cross-process eigenvalue allgather).
"""
import json
import os
import pathlib
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys, json
pid = int(sys.argv[1]); n_proc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
if n_proc > 1:
    from dftk_tpu.parallel import multihost as mh
    mh.initialize(f"localhost:{port}", num_processes=n_proc, process_id=pid)
import numpy as np, jax.numpy as jnp
import dftk_tpu as dftk
from dftk_tpu.parallel import multihost as mh
from dftk_tpu.parallel.mesh import pad_basis_kpoints, shard_basis
from dftk_tpu.ops.engine_split import self_consistent_field_split
from testcases import silicon

Si = dftk.ElementPsp.from_symbol("Si", psp=silicon["psp"])
m = dftk.model_DFT(silicon["lattice"], [Si, Si], silicon["positions"],
                   functionals="LDA")
b = dftk.PlaneWaveBasis(m, Ecut=7.0, kgrid=(2, 2, 2))
mesh = mh.global_kpoint_mesh()
pad_basis_kpoints(b, jax.device_count())
shard_basis(b, mesh)
r = self_consistent_field_split(b, tol=1e-10, maxiter=40, dtype=jnp.float64,
                                eigensolver="lobpcg", mesh=mesh,
                                is_converged="energy")
out = {"E": float(r["energies"]["total"]), "converged": bool(r["converged"]),
       "ev0": np.asarray(r["eigenvalues"])[0, :4].tolist()}
if pid == 0:
    json.dump(out, open(sys.argv[4], "w"))
"""


@pytest.mark.slow
def test_two_process_split_scf_matches_single():
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    tests = str(pathlib.Path(__file__).resolve().parent)
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + tests
    env.pop("XLA_FLAGS", None)

    def run(n_proc, port, tag):
        outs = [f"/tmp/mh_test_{tag}_{n_proc}.json"]
        procs = [subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), str(n_proc), port,
             outs[0]], env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT) for pid in range(n_proc)]
        logs = [p.communicate(timeout=1500)[0].decode() for p in procs]
        for p, log in zip(procs, logs):
            assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
        return json.load(open(outs[0]))

    r1 = run(1, "0", "single")
    r2 = run(2, "9531", "dual")
    assert r1["converged"] and r2["converged"]
    assert abs(r1["E"] - r2["E"]) < 1e-10
    for a, b in zip(r1["ev0"], r2["ev0"]):
        assert abs(a - b) < 1e-8
