"""Anderson (DIIS / Pulay) acceleration of the SCF fixed point.

Adaptive-depth Anderson following DFTK `src/scf/anderson.jl:37-130`: keep a
sliding window of (x_i, f_i = g(x_i) - x_i) pairs, solve the least-squares
problem  min || f_n - sum_i gamma_i (f_n - f_i) ||  and extrapolate

    x_{n+1} = x_n + beta f_n - sum_i gamma_i [ (x_n - x_i) + beta (f_n - f_i) ].

The LS solve regularises by column-norm scaling + ridge instead of the
reference's condition-number pruning; the window is a fixed-size ring buffer
so the whole update stays static-shape.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class AndersonAcceleration:
    m: int = 10                # history window
    ridge: float = None        # default: 100 * eps of the working dtype

    def __post_init__(self):
        self._xs = []
        self._fs = []

    def reset(self):
        self._xs.clear()
        self._fs.clear()

    def __call__(self, x, f, beta):
        """x, f: pytree-free arrays (any shape); returns accelerated x_{n+1}."""
        x = jnp.asarray(x)
        f = jnp.asarray(f)
        xnext = x + beta * f
        if self._xs:
            dX = jnp.stack([x - xi for xi in self._xs], axis=0)
            dF = jnp.stack([f - fi for fi in self._fs], axis=0)
            M = dF.reshape(len(self._fs), -1).T           # [N, m]
            rhs = f.reshape(-1)
            # scaled ridge least squares
            colnorm = jnp.linalg.norm(M, axis=0)
            scale = jnp.where(colnorm > 0, 1.0 / jnp.maximum(colnorm, 1e-300), 0.0)
            Ms = M * scale[None, :]
            ridge = self.ridge
            if ridge is None:
                ridge = 100 * float(jnp.finfo(Ms.dtype).eps)
            A = Ms.T @ Ms + ridge * jnp.eye(Ms.shape[1], dtype=Ms.dtype)
            b = Ms.T @ rhs
            gammas = jnp.linalg.solve(A, b) * scale
            corr = jnp.tensordot(gammas, dX + beta * dF, axes=(0, 0))
            xnext = xnext - corr
        self._xs.append(x)
        self._fs.append(f)
        if len(self._xs) > self.m:
            self._xs.pop(0)
            self._fs.pop(0)
        return xnext
