"""Smearing (finite-temperature occupation) functions, vectorised in jnp.

Occupation f(x) and entropy s(x) as functions of x = (eps - epsF)/T, matching
the reference definitions (DFTK `src/Smearing.jl:24-167`):
  * None           - step function (zero temperature)
  * FermiDirac     - 1/(1+e^x),  s = -(f ln f + (1-f) ln(1-f))
  * Gaussian       - erfc(x)/2,  s = exp(-x^2) / (2 sqrt(pi))
  * MarzariVanderbilt (cold smearing)
  * MethfesselPaxton(order)

All functions are smooth jnp code (safe under jit/grad); the x -> +-inf limits
are handled by the underlying primitives.
"""
import dataclasses
import math

import jax
import jax.numpy as jnp
from jax.scipy.special import erf, erfc


class SmearingFunction:
    def occupation(self, x):
        raise NotImplementedError

    def entropy(self, x):
        raise NotImplementedError

    def occupation_derivative(self, x):
        return jax.grad(lambda t: self.occupation(t))(x) if jnp.ndim(x) == 0 else \
            jax.vmap(jax.grad(lambda t: self.occupation(t)))(jnp.ravel(x)).reshape(jnp.shape(x))

    # Whether occupation is monotone in x (Fermi bisection valid)
    monotone = True


@dataclasses.dataclass(frozen=True)
class NoSmearing(SmearingFunction):
    def occupation(self, x):
        return jnp.where(x > 0, 0.0, 1.0)

    def entropy(self, x):
        return jnp.zeros_like(x)


@dataclasses.dataclass(frozen=True)
class FermiDirac(SmearingFunction):
    def occupation(self, x):
        # stable sigmoid of -x
        return jax.nn.sigmoid(-x)

    def entropy(self, x):
        f = self.occupation(x)

        def xlogx(t):
            return jnp.where(t <= 0, 0.0, t * jnp.log(jnp.where(t <= 0, 1.0, t)))

        return -(xlogx(f) + xlogx(1 - f))


@dataclasses.dataclass(frozen=True)
class Gaussian(SmearingFunction):
    def occupation(self, x):
        return erfc(x) / 2

    def entropy(self, x):
        return jnp.exp(-x * x) / (2 * math.sqrt(math.pi))


@dataclasses.dataclass(frozen=True)
class MarzariVanderbilt(SmearingFunction):
    """Cold smearing; Fermi level is *not* unique with this smearing."""
    monotone = False

    def occupation(self, x):
        s2 = 1 / math.sqrt(2.0)
        return (-erf(x + s2) / 2
                + jnp.exp(-((-x - s2) ** 2)) / math.sqrt(2 * math.pi) + 0.5)

    def entropy(self, x):
        s2 = 1 / math.sqrt(2.0)
        return (x + s2) * jnp.exp(-((-x - s2) ** 2)) / math.sqrt(2 * math.pi)


def _hermite(x, n):
    """Physicists' Hermite polynomial H_n(x) (unrolled recursion, static n)."""
    if n < 0:
        return jnp.zeros_like(x)
    h_prev, h = jnp.zeros_like(x), jnp.ones_like(x)
    for k in range(n):
        h_prev, h = h, 2 * x * h - 2 * k * h_prev
    return h


@dataclasses.dataclass(frozen=True)
class MethfesselPaxton(SmearingFunction):
    order: int = 1
    monotone = False

    def _A(self, n):
        return (-1) ** n / (math.factorial(n) * 4 ** n * math.sqrt(math.pi))

    def occupation(self, x):
        f0 = erfc(x) / 2
        corr = sum(self._A(i) * _hermite(x, 2 * i - 1) for i in range(1, self.order + 1))
        return f0 + corr * jnp.exp(-x * x)

    def entropy(self, x):
        s = sum(self._A(i) * (_hermite(x, 2 * i) / 2 + 2 * i * _hermite(x, 2 * i - 2))
                for i in range(0, self.order + 1))
        return s * jnp.exp(-x * x)


def occupation_divided_difference(smearing, x, y, epsF, temperature):
    """(f(x) - f(y)) / (x - y) computed stably when x ~ y
    (reference src/Smearing.jl:34).

    f(z) = occupation((z - epsF)/T).  For |x - y| below sqrt(eps)*scale the
    direct quotient loses all accuracy; switch to the midpoint derivative
    (error O(h^2) for the true divided difference).  Vectorized jnp; at
    T = 0 returns 0 for degenerate pairs and the step quotient otherwise.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if temperature == 0 or isinstance(smearing, NoSmearing):
        fx = jnp.where(x < epsF, 1.0, 0.0)
        fy = jnp.where(y < epsF, 1.0, 0.0)
        d = x - y
        return jnp.where(jnp.abs(d) > 1e-30, (fx - fy) / jnp.where(
            jnp.abs(d) > 1e-30, d, 1.0), 0.0)

    T = temperature
    f = lambda z: smearing.occupation((z - epsF) / T)
    fder = lambda z: smearing.occupation_derivative((z - epsF) / T) / T
    d = x - y
    small = jnp.abs(d) < 1e-7 * jnp.maximum(jnp.maximum(jnp.abs(x),
                                                        jnp.abs(y)), T)
    d_safe = jnp.where(small, 1.0, d)
    direct = (f(x) - f(y)) / d_safe
    mid = fder((x + y) / 2)
    return jnp.where(small, mid, direct)
