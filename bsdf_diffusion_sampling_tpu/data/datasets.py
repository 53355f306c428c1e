"""Banded MCMC dataset generation + caching.

The full pipeline of the reference's `emcee_mcmc_brdf_disk/spherical/bsdf`
(`/root/reference/learning_repo_cleanup/utils/emcee_sampling.py:84-170`):
omega_i space is stratified into `piecewise` radial/theta bands; per band an
ensemble is initialized from stratified proposals (rejection-resampled until
the target is nonzero) and run for burn_in + nsteps sweeps; all band chains
concatenate into an (N, 4) table of (omega_i, omega_o) rows distributed
proportional to BSDF x domain Jacobian.

Differences by design: walker initialization draws a *batch* of proposals
and picks positive-density ones (no scalar rejection loop), and everything
runs jitted on device. Datasets cache to .npy like the reference
(`disk_domain_sampling.py:174-179`).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bsdf_diffusion_sampling_tpu.data.mcmc import ensemble_mcmc, make_domain_log_prob
from bsdf_diffusion_sampling_tpu.geometry.sampling import (
    stratified_disk,
    stratified_hemisphere_angles,
)


def _init_walkers(key, pdf_fn, domain, r_min, r_max, nwalkers, theta_max):
    """Positive-density (omega_i, omega_o) starting points within the band."""
    n_prop = max(nwalkers * 64, 4096)
    k_i, k_o, k_pick = jax.random.split(key, 3)
    if domain == "disk":
        wi = stratified_disk(k_i, n_prop)
        r2 = jnp.sum(wi**2, axis=-1)
        # map radii into the band (keeps stratification, guarantees support)
        r = jnp.sqrt(r2)
        r_band = r_min + (r_max - r_min) * jnp.clip(r, 1e-3, 1.0)
        wi = wi * (r_band / jnp.maximum(r, 1e-6))[:, None]
        wo = stratified_disk(k_o, n_prop) * 0.999
    else:
        wi = stratified_hemisphere_angles(k_i, n_prop, theta_max)
        wi = wi.at[:, 0].set(r_min + (r_max - r_min) * jnp.clip(wi[:, 0] / theta_max, 1e-3, 1.0 - 1e-3))
        wo = stratified_hemisphere_angles(k_o, n_prop, theta_max)
    f = pdf_fn(wi, wo)
    # order by density so picked walkers start in-support
    idx = jnp.argsort(-f)[: nwalkers * 4]
    idx = jax.random.permutation(k_pick, idx)[:nwalkers]
    return jnp.concatenate([wi[idx], wo[idx]], axis=-1)


def generate_brdf_dataset(
    key: jax.Array,
    pdf_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    domain: str = "disk",
    nsteps: int = 40_000,
    nwalkers: int = 50,
    piecewise: int = 10,
    burn_in: int = 10_000,
    cache_path: Optional[str] = None,
    theta_max: Optional[float] = None,
) -> np.ndarray:
    """Returns (piecewise * nsteps * nwalkers, 4) float32 samples.

    Reference defaults: nsteps=40000, nwalkers=49 (we use 50: the red-black
    ensemble needs an even count), piecewise=10, burn_in=10000
    (`emcee_sampling.py:84,113,142`).
    """
    if cache_path is not None and os.path.exists(cache_path):
        return np.load(cache_path)
    if theta_max is None:
        theta_max = float(jnp.pi) if domain == "sphere_full" else float(jnp.pi / 2)
    if nwalkers % 2:
        nwalkers += 1

    band_edge = (1.0 if domain == "disk" else theta_max) / piecewise
    log_prob = make_domain_log_prob(pdf_fn, domain)
    all_samples = []
    for band in range(piecewise):
        r_min, r_max = band * band_edge, (band + 1) * band_edge
        k_band = jax.random.fold_in(key, band)
        k_init, k_run = jax.random.split(k_band)
        x0 = _init_walkers(k_init, pdf_fn, domain, r_min, r_max, nwalkers, theta_max)
        chain, acc = ensemble_mcmc(
            k_run, log_prob, x0, nsteps, burn_in=burn_in,
            log_prob_args=(jnp.float32(r_min), jnp.float32(r_max)),
        )
        all_samples.append(np.asarray(chain.reshape(-1, 4)))
    samples = np.concatenate(all_samples).astype(np.float32)
    if cache_path is not None:
        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        np.save(cache_path, samples)
    return samples
