"""Analytic 1-D / 2-D distribution library (P11).

JAX re-design of `/root/reference/learning_repo_cleanup/utils/distribution.py:9-207`:
each distribution exposes pdf / icdf / sample where sampling is a
stratified-lattice inverse-CDF draw (the reference's `sample` builds a
jittered lattice then maps through icdf). Used by the 1-D toy pipeline
(BASELINE config 1) and as ground truths in tests.

Pure functions + NamedTuple params instead of classes: jit/vmap friendly.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import erf, erfinv
from jax.scipy.stats import norm


def stratified_uniform(key: jax.Array, n: int) -> jnp.ndarray:
    """Jittered lattice on [0,1): (i + u_i)/n, shuffled."""
    k_j, k_p = jax.random.split(key)
    u = (jnp.arange(n) + jax.random.uniform(k_j, (n,))) / n
    return jax.random.permutation(k_p, u)


class Uniform(NamedTuple):
    lo: float = 0.0
    hi: float = 1.0

    def pdf(self, x):
        inside = (x >= self.lo) & (x <= self.hi)
        return jnp.where(inside, 1.0 / (self.hi - self.lo), 0.0)

    def icdf(self, u):
        return self.lo + u * (self.hi - self.lo)

    def sample(self, key, n):
        return self.icdf(stratified_uniform(key, n))


class Gaussian(NamedTuple):
    loc: float = 0.0
    scale: float = 1.0

    def pdf(self, x):
        return norm.pdf(x, self.loc, self.scale)

    def icdf(self, u):
        return self.loc + self.scale * jnp.sqrt(2.0) * erfinv(2.0 * u - 1.0)

    def sample(self, key, n):
        u = jnp.clip(stratified_uniform(key, n), 1e-7, 1 - 1e-7)
        return self.icdf(u)


class TruncatedGaussian(NamedTuple):
    loc: float = 0.0
    scale: float = 1.0
    lo: float = -1.0
    hi: float = 1.0

    def _cdf(self, x):
        return 0.5 * (1.0 + erf((x - self.loc) / (self.scale * jnp.sqrt(2.0))))

    def pdf(self, x):
        z = self._cdf(self.hi) - self._cdf(self.lo)
        inside = (x >= self.lo) & (x <= self.hi)
        return jnp.where(inside, norm.pdf(x, self.loc, self.scale) / z, 0.0)

    def icdf(self, u):
        c_lo, c_hi = self._cdf(self.lo), self._cdf(self.hi)
        uu = c_lo + u * (c_hi - c_lo)
        return self.loc + self.scale * jnp.sqrt(2.0) * erfinv(2.0 * uu - 1.0)

    def sample(self, key, n):
        u = jnp.clip(stratified_uniform(key, n), 1e-7, 1 - 1e-7)
        return self.icdf(u)


class Beta(NamedTuple):
    """Beta via Kumaraswamy-free numeric icdf: tabulated inverse on [0,1]."""

    a: float = 2.0
    b: float = 2.0
    table_size: int = 4096

    def pdf(self, x):
        from jax.scipy.stats import beta as jbeta

        return jbeta.pdf(x, self.a, self.b)

    def _tables(self):
        xs = jnp.linspace(1e-6, 1.0 - 1e-6, self.table_size)
        p = self.pdf(xs)
        cdf = jnp.cumsum(p)
        cdf = cdf / cdf[-1]
        return xs, cdf

    def icdf(self, u):
        xs, cdf = self._tables()
        idx = jnp.clip(jnp.searchsorted(cdf, u), 1, self.table_size - 1)
        c0, c1 = cdf[idx - 1], cdf[idx]
        t = (u - c0) / jnp.maximum(c1 - c0, 1e-12)
        return xs[idx - 1] + t * (xs[idx] - xs[idx - 1])

    def sample(self, key, n):
        return self.icdf(stratified_uniform(key, n))


class StraightLine(NamedTuple):
    """Linear density p(x) = 2x on [0,1] (`distribution.py` StraightLine)."""

    def pdf(self, x):
        return jnp.where((x >= 0) & (x <= 1), 2.0 * x, 0.0)

    def icdf(self, u):
        return jnp.sqrt(u)

    def sample(self, key, n):
        return self.icdf(stratified_uniform(key, n))


class TwoDCombination(NamedTuple):
    """Independent product of two 1-D distributions over [lo,hi]^2."""

    dist_x: object
    dist_y: object

    def pdf(self, xy):
        return self.dist_x.pdf(xy[..., 0]) * self.dist_y.pdf(xy[..., 1])

    def sample(self, key, n):
        kx, ky = jax.random.split(key)
        return jnp.stack(
            [self.dist_x.sample(kx, n), self.dist_y.sample(ky, n)], axis=-1
        )


class CustomDistribution(NamedTuple):
    """Arbitrary 1-D density on [lo, hi] via tabulated inverse CDF — the
    reference's `CustomDistribution` (`distribution.py:168-207`), and the
    vectorized-searchsorted replacement for the missing native `samplewi`
    module (N3, `utils_sampling_torch_brdf.py:6`)."""

    pdf_fn: Callable
    lo: float
    hi: float
    table_size: int = 4096

    def _tables(self):
        xs = jnp.linspace(self.lo, self.hi, self.table_size)
        p = jnp.maximum(self.pdf_fn(xs), 0.0)
        seg = 0.5 * (p[:-1] + p[1:])
        cdf = jnp.concatenate([jnp.zeros(1), jnp.cumsum(seg)])
        return xs, p, cdf / cdf[-1]

    def pdf(self, x):
        xs, p, _ = self._tables()
        norm_c = jnp.trapezoid(p, xs)
        return jnp.interp(x, xs, p) / norm_c

    def icdf(self, u):
        xs, p, cdf = self._tables()
        idx = jnp.clip(jnp.searchsorted(cdf, u), 1, self.table_size - 1)
        c0, c1 = cdf[idx - 1], cdf[idx]
        t = (u - c0) / jnp.maximum(c1 - c0, 1e-12)
        return xs[idx - 1] + t * (xs[idx] - xs[idx - 1])

    def sample(self, key, n):
        return self.icdf(stratified_uniform(key, n))
