#!/usr/bin/env python
"""Per-stage timing of the XLA split-engine local apply chain (real chip).

Times cumulative prefixes of the chain, each chained on device 10x, so
stage cost = difference of consecutive prefixes.
"""
import os
import sys
import time

os.environ.setdefault("DFTK_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                + "/tests")


def main():
    import dftk_tpu  # noqa
    from bench import build_problem
    from dftk_tpu.ops.engine_split import (_place_compact, _scatter_compact,
                                           make_split_ham, prepare_split_data,
                                           total_potential_split)
    from dftk_tpu.kernels.dft_matmul import cdft_axis, as_precision
    from dftk_tpu.ops.density import guess_density
    from dftk_tpu.ops.eigen.lobpcg import ortho_qr

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
    mask2 = jnp.concatenate([sd.mask, sd.mask], axis=-1)
    U = jax.random.normal(jax.random.PRNGKey(0),
                          (1, nb, 2 * basis.nG_max), jnp.float32) \
        * mask2[:, None, :]
    U = ortho_qr(U)
    nG = basis.nG_max
    m_shape = tuple(F.shape[0] for F in pf.Ff)
    Vk = ham.V[ham.kspin]
    Vk_rev = jnp.transpose(Vk, (0, 3, 2, 1))
    N = float(np.prod(basis.fft_size))

    def stage_fns():
        def xy_of(U):
            return jnp.stack([U[..., :nG], U[..., nG:]], axis=-1)

        def sc(U):
            return _place_compact(xy_of(U), pf, m_shape)

        def sc_old(U):
            return _scatter_compact(xy_of(U), pf.Gidx_c, ham.mask, m_shape)

        def g1(U):
            return cdft_axis(sc(U), pf.Ff[2], 4, None)

        def g2(U):
            return cdft_axis(g1(U), pf.Ff[1], 3, None)

        def g3(U):
            return cdft_axis(g2(U), pf.Ff[0], 2, None)

        def vm(U):
            return Vk_rev[:, None, :, :, :, None] * g3(U)

        def b1(U):
            return cdft_axis(vm(U), pf.Fb[0], 4, None)

        def b2(U):
            return cdft_axis(b1(U), pf.Fb[1], 3, None)

        def b3(U):
            return cdft_axis(b2(U), pf.Fb[2], 2, None)

        def gth(U):
            x = b3(U)
            flat = x.reshape(x.shape[:2] + (-1, 2))
            out = jax.vmap(lambda f, idx: f[:, idx, :])(flat, pf.Gidx_c)
            out = out * ham.mask[:, None, :, None]
            return jnp.concatenate([out[..., 0], out[..., 1]], axis=-1)

        def full(U):
            from dftk_tpu.ops.engine_split import apply_H_split
            return apply_H_split(ham, U, basis.fft_size,
                                 model.unit_cell_volume, pallas=False)

        def full_pallas(U):
            from dftk_tpu.ops.engine_split import apply_H_split
            return apply_H_split(ham, U, basis.fft_size,
                                 model.unit_cell_volume, pallas=True)

        return [("stack+scatter(old)", sc_old), ("stack+place(gather)", sc), ("+G1", g1), ("+G2", g2), ("+G3", g3),
                ("+Vmul", vm), ("+B1", b1), ("+B2", b2), ("+B3", b3),
                ("+gather+concat", gth), ("full apply (XLA)", full),
                ("full apply (pallas)", full_pallas)]

    prev = 0.0
    for name, fn in stage_fns():
        # chain on device via dummy data dependence: re-inject a scalar
        def chain(U, fn=fn):
            def body(i, u):
                r = fn(u)
                # fold result back into u to serialize (cheap add of a scalar)
                s = jnp.sum(r.reshape(-1)[:1]) * 0.0
                return u + s
            return jax.lax.fori_loop(0, 10, body, U)
        f = jax.jit(chain)
        try:
            jax.block_until_ready(f(U))
        except Exception as e:
            print(f"[FAIL] {name}: {str(e)[:200]}")
            continue
        t0 = time.time()
        jax.block_until_ready(f(U))
        dt = (time.time() - t0) / 10
        print(f"{name:22s}: {dt*1e3:7.2f} ms  (delta {1e3*(dt-prev):+6.2f})")
        prev = dt


if __name__ == "__main__":
    main()
