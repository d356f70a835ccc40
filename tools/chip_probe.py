import os; os.environ["DFTK_TPU_X64"]="0"
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
print("start", flush=True)
for m in (256, 512, 1024):
    a = np.random.randn(m, m).astype(np.float32); a = a + a.T
    f = jax.jit(lambda x: jnp.linalg.eigh(x)[0])
    t0=time.time()
    w = jax.block_until_ready(f(jnp.asarray(a)))
    t1=time.time()
    for _ in range(3): w = f(jnp.asarray(a))
    jax.block_until_ready(w)
    print(f"eigh {m}: compile {t1-t0:.1f}s run {(time.time()-t1)/3:.2f}s", flush=True)

import dftk_tpu as dftk
from dftk_tpu.ops.engine_split import (apply_H_split, make_split_ham, prepare_split_data,
                                       total_potential_split)
from dftk_tpu.ops.density import guess_density
import bench
for nrep, Ecut, nb in [(3, 10.0, 128), (4, 10.0, 300)]:
    t0=time.time()
    basis = bench.build_problem(n_rep=nrep, Ecut=Ecut)
    sd = prepare_split_data(basis, dtype=jnp.float32)
    t1=time.time()
    rho = jnp.asarray(np.asarray(jax.device_get(guess_density(basis))), dtype=jnp.float32)
    V, _ = jax.jit(lambda r: total_potential_split(basis.terms, sd, r, basis.model.unit_cell_volume))(rho)
    ham = make_split_ham(sd, V)
    U = jnp.zeros((1, 2*nb, 2*basis.nG_max), jnp.float32)
    f = jax.jit(lambda h, u: apply_H_split(h, u, basis.fft_size, basis.model.unit_cell_volume))
    out = jax.block_until_ready(f(ham, U)); t2=time.time()
    t3=time.time()
    for _ in range(3): out = f(ham, out)
    jax.block_until_ready(out); t4=time.time()
    natoms = 2*nrep**3
    print(f"Si{natoms}: fft={basis.fft_size} nG={basis.nG_max} nb={nb}: setup={t1-t0:.0f}s compile={t2-t1:.0f}s apply={(t4-t3)/3:.2f}s -> {3*nb/(t4-t3):.0f} band-applies/s", flush=True)
