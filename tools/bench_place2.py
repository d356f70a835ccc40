#!/usr/bin/env python
"""Microbench: sphere->compact placement variants + reduced-precision chain.

The round-3 stage anatomy (tools/bench_stages.py) shows the placement
(stack to [...,2] + gather) costing ~3.3 ms of the 8.6 ms Si54 apply: this
probes cheaper formulations on the real chip.
"""
import os
import sys
import time

os.environ.setdefault("DFTK_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(f, U, n=10):
    g = jax.jit(lambda u: jax.lax.fori_loop(
        0, n, lambda i, a: a + jnp.sum(f(a).reshape(-1)[:1]) * 0.0, u))
    jax.block_until_ready(g(U))
    t0 = time.time()
    jax.block_until_ready(g(U))
    return (time.time() - t0) / n


def main():
    import dftk_tpu  # noqa
    from bench import build_problem
    from dftk_tpu.ops.engine_split import (_place_compact, make_split_ham,
                                           prepare_split_data,
                                           total_potential_split,
                                           sphere_to_real_pruned,
                                           real_to_sphere_pruned)
    from dftk_tpu.ops.density import guess_density
    from dftk_tpu.ops.eigen.lobpcg import ortho_qr

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + "/tests")
    basis = build_problem(n_rep=3, Ecut=10.0)
    model = basis.model
    sd = prepare_split_data(basis, dtype=jnp.float32)
    rho = jnp.asarray(np.asarray(jax.device_get(guess_density(basis))),
                      dtype=jnp.float32)
    V, _ = jax.jit(lambda r: total_potential_split(
        basis.terms, sd, r, model.unit_cell_volume))(rho)
    ham = make_split_ham(sd, V)
    pf = sd.pruned
    nb = 256
    nG = basis.nG_max
    mask2 = jnp.concatenate([sd.mask, sd.mask], axis=-1)
    U = jax.random.normal(jax.random.PRNGKey(0), (1, nb, 2 * nG),
                          jnp.float32) * mask2[:, None, :]
    U = ortho_qr(U)
    m_shape = tuple(F.shape[0] for F in pf.Ff)
    Ncomp = int(np.prod(m_shape))
    print("nG", nG, "m_shape", m_shape, "Ncomp", Ncomp)

    inv = np.asarray(jax.device_get(pf.inv_idx))          # [nk, Ncomp]
    # combined re/im index into U's [2nG] layout (+ dump slot 2nG)
    inv2 = np.where(inv[..., None] >= nG, 2 * nG,
                    np.stack([inv, inv + nG], axis=-1))   # [nk, Ncomp, 2]
    inv2_j = jnp.asarray(inv2.astype(np.int32))

    def xy_of(u):
        return jnp.stack([u[..., :nG], u[..., nG:]], axis=-1)

    def place_now(u):
        return _place_compact(xy_of(u), pf, m_shape)

    def place_direct(u):
        pad = jnp.zeros(u.shape[:2] + (1,), u.dtype)
        up = jnp.concatenate([u, pad], axis=2)            # [nk, nb, 2nG+1]
        out = jax.vmap(lambda p, ix: p[:, ix])(up, inv2_j)
        return out.reshape(u.shape[:2] + m_shape + (2,))

    def place_sep(u):
        pad = jnp.zeros(u.shape[:2] + (1,), u.dtype)
        up = jnp.concatenate([u, pad], axis=2)
        outr = jax.vmap(lambda p, ix: p[:, ix])(up, jnp.asarray(
            np.where(inv >= nG, 2 * nG, inv).astype(np.int32)))
        outi = jax.vmap(lambda p, ix: p[:, ix])(up, jnp.asarray(
            np.where(inv >= nG, 2 * nG, inv + nG).astype(np.int32)))
        return outr.reshape(u.shape[:2] + m_shape), \
            outi.reshape(u.shape[:2] + m_shape)

    Vk_rev = jnp.transpose(ham.V[ham.kspin], (0, 3, 2, 1))

    def chain_full(u, prec=None):
        psir = sphere_to_real_pruned(xy_of(u), pf, ham.mask, precision=prec)
        vpsir = Vk_rev[:, None, :, :, :, None] * psir
        out = real_to_sphere_pruned(vpsir, pf, ham.mask, basis.fft_size,
                                    precision=prec)
        return jnp.concatenate([out[..., 0], out[..., 1]], axis=-1)

    for name, f in [
        ("place (current)", place_now),
        ("place direct-from-U", place_direct),
        ("place sep re/im", lambda u: place_sep(u)[0]),
        ("local chain f32", lambda u: chain_full(u, None)),
        ("local chain bf16(default)", lambda u: chain_full(u, "default")),
    ]:
        try:
            dt = timed(f, U)
            print(f"{name:28s}: {dt*1e3:7.2f} ms")
        except Exception as e:
            print(f"{name:28s}: FAIL {str(e)[:120]}")


if __name__ == "__main__":
    main()
