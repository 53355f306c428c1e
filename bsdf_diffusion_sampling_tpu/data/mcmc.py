"""Device-resident affine-invariant ensemble MCMC (Goodman-Weare 2010).

TPU-native replacement for the reference's emcee + multiprocessing.Pool
dataset generator (`/root/reference/learning_repo_cleanup/utils/emcee_sampling.py:84-170`):
the reference evaluates a *scalar* Mitsuba BSDF oracle per walker in worker
processes (10 bands x 50k steps x 49 walkers of python calls); here the
whole ensemble advances inside one `lax.scan` with a *batched* jnp log-prob
oracle, so a 19.6M-sample dataset is minutes of single-chip work instead of
hours of host MCMC.

Implementation: the classic red-black ("parallel stretch move") scheme —
walkers split into two halves; each half proposes stretch moves through
partners drawn from the *other* half, preserving detailed balance for the
whole ensemble (Foreman-Mackey et al. 2013, the algorithm emcee implements).
Stretch scale a=2 (emcee default): z ~ g(z) prop. 1/sqrt(z) on [1/a, a],
acceptance ln u < (d-1) ln z + lnp(y) - lnp(x).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def _half_step(key, active, other, logp_active, log_prob_fn, args, a, ndim):
    n = active.shape[0]
    k_pick, k_z, k_u = jax.random.split(key, 3)
    partners = jax.random.randint(k_pick, (n,), 0, other.shape[0])
    u = jax.random.uniform(k_z, (n,))
    z = ((a - 1.0) * u + 1.0) ** 2 / a
    proposal = other[partners] + z[:, None] * (active - other[partners])
    logp_prop = log_prob_fn(proposal, *args)
    log_accept = (ndim - 1) * jnp.log(z) + logp_prop - logp_active
    accept = jnp.log(jax.random.uniform(k_u, (n,), minval=1e-38)) < log_accept
    new = jnp.where(accept[:, None], proposal, active)
    new_logp = jnp.where(accept, logp_prop, logp_active)
    return new, new_logp, accept


@partial(jax.jit, static_argnames=("log_prob_fn", "nsteps", "burn_in", "thin"))
def ensemble_mcmc(
    key: jax.Array,
    log_prob_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    nsteps: int,
    burn_in: int = 0,
    a: float = 2.0,
    thin: int = 1,
    log_prob_args: tuple = (),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the ensemble for burn_in + nsteps sweeps.

    x0: (nwalkers, ndim) initial positions (nwalkers must be even).
    log_prob_args: extra *traced* arguments forwarded to log_prob_fn — pass
    per-band bounds here so all bands share one compiled program.
    Returns (chain, accept_rate): chain (nsteps//thin, nwalkers, ndim).
    """
    nwalkers, ndim = x0.shape
    assert nwalkers % 2 == 0, "red-black scheme needs an even walker count"
    half = nwalkers // 2
    logp0 = log_prob_fn(x0, *log_prob_args)

    def sweep(carry, k):
        x, logp = carry
        k1, k2 = jax.random.split(k)
        first, second = x[:half], x[half:]
        lp1, lp2 = logp[:half], logp[half:]
        first, lp1, acc1 = _half_step(k1, first, second, lp1, log_prob_fn, log_prob_args, a, ndim)
        second, lp2, acc2 = _half_step(k2, second, first, lp2, log_prob_fn, log_prob_args, a, ndim)
        x = jnp.concatenate([first, second])
        logp = jnp.concatenate([lp1, lp2])
        acc = jnp.concatenate([acc1, acc2])
        return (x, logp), (x, acc)

    # burn-in: same sweeps, samples discarded
    if burn_in > 0:
        (x0, logp0), _ = jax.lax.scan(
            lambda c, k: (sweep(c, k)[0], None),
            (x0, logp0),
            jax.random.split(jax.random.fold_in(key, 0), burn_in),
        )

    (_, _), (chain, accepts) = jax.lax.scan(
        sweep, (x0, logp0), jax.random.split(jax.random.fold_in(key, 1), nsteps)
    )
    if thin > 1:
        chain = chain[::thin]
    return chain, jnp.mean(accepts)


def make_domain_log_prob(
    pdf_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    domain: str,
) -> Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Wrap a batched target density f(omega_i, omega_o) -> (n,) with the
    per-domain support masks of the reference's lnprob guards:

    - disk (`emcee_sampling.py:11-22`): omega_i radius in (r_min, r_max],
      omega_o inside the unit disk;
    - spherical hemisphere (`:24-34`): theta_i in band, theta_o in (0, pi/2),
      both phis in (-pi, pi);
    - full sphere (`:36-46`): theta_o in (0, pi).

    The band bounds (r_min, r_max) are call-time *traced* arguments so the
    10-band sweep reuses one compiled MCMC program.
    """

    def log_prob(p: jnp.ndarray, r_min, r_max) -> jnp.ndarray:
        wi, wo = p[:, 0:2], p[:, 2:4]
        if domain == "disk":
            ri2 = jnp.sum(wi**2, axis=-1)
            valid = (ri2 <= r_max**2) & (ri2 > r_min**2)
            valid &= jnp.sum(wo**2, axis=-1) <= 1.0
        else:
            theta_max = jnp.pi / 2 if domain == "spherical" else jnp.pi
            valid = (wi[:, 0] > r_min) & (wi[:, 0] < r_max)
            valid &= (wo[:, 0] > 0) & (wo[:, 0] < theta_max)
            valid &= (jnp.abs(wi[:, 1]) < jnp.pi) & (jnp.abs(wo[:, 1]) < jnp.pi)
        f = pdf_fn(wi, wo)
        f = jnp.where(valid & (f > 0), f, 0.0)
        return jnp.where(f > 0, jnp.log(jnp.maximum(f, 1e-38)), -jnp.inf)

    return log_prob
