"""Conditional base densities p0(x | omega_i) for the flow ODE.

Two families, matching the reference's "pretrain" nets head-for-head so the
learned densities (and thus the change-of-variables PDFs) are numerically
interchangeable:

- disk: diagonal 2-D Gaussian; heads (loc2, log_scale2) from a 1x16 SiLU MLP
  over PE(omega_i, 3 bands)
  (`/root/reference/learning_repo_cleanup/utils/model.py:374-398`).
- spherical: Gaussian over theta x von Mises over phi; heads
  (loc, log_scale, loc_von, softplus(conc)+eps), eps=1e-3
  (`model.py:277-317`). Note the reference's Gaussian log_prob uses
  `- log_scale` as the normalizer but `exp(log_scale)+eps` in the quadratic
  term; we reproduce that exactly — it is the density the checkpoints were
  trained under, and sample()/pdf() consistency only needs the same function
  on both sides.

Both expose pure functions: init / sample / log_prob, with params a pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bsdf_diffusion_sampling_tpu.core.pytree import Static
from bsdf_diffusion_sampling_tpu.models.encoding import encoded_dim, positional_encoding
from bsdf_diffusion_sampling_tpu.models.mlp import init_mlp, mlp_apply
from bsdf_diffusion_sampling_tpu.models.von_mises import von_mises_log_prob, von_mises_sample

_EPS_SPHERICAL = 1e-3  # `model.py:287`


class BaseDensity(NamedTuple):
    """Bundles the pure functions for one base-density family."""

    domain: str
    init: callable
    sample: callable
    log_prob: callable


# ---------------------------------------------------------------- disk ----


def _disk_heads(params, omega_i):
    enc = positional_encoding(omega_i, params["pe_bands"].value)
    out = mlp_apply(params["net"], enc)
    return out[..., :2], out[..., 2:]


def disk_base_init(key: jax.Array, hidden: int = 16, pe_bands: int = 3) -> dict:
    in_dim = encoded_dim(2, pe_bands)
    return {"net": init_mlp(key, [in_dim, hidden, 4], bias=True), "pe_bands": Static(pe_bands)}


def disk_base_sample(params: dict, omega_i: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    loc, log_scale = _disk_heads(params, omega_i)
    eps = jax.random.normal(key, loc.shape, loc.dtype)
    return loc + eps * jnp.exp(log_scale)


def disk_base_log_prob(params: dict, x: jnp.ndarray, omega_i: jnp.ndarray) -> jnp.ndarray:
    loc, log_scale = _disk_heads(params, omega_i)
    z = (x - loc) / jnp.exp(log_scale)
    return (
        -jnp.log(2.0 * jnp.pi)
        - jnp.sum(log_scale, axis=-1)
        - 0.5 * jnp.sum(z * z, axis=-1)
    )


# ----------------------------------------------------------- spherical ----


def _spherical_heads(params, omega_i):
    enc = positional_encoding(omega_i, params["pe_bands"].value)
    out = mlp_apply(params["net"], enc)
    loc, log_scale = out[..., 0], out[..., 1]
    loc_von = out[..., 2]
    conc = jax.nn.softplus(out[..., 3]) + _EPS_SPHERICAL
    return loc, log_scale, loc_von, conc


def spherical_base_init(key: jax.Array, hidden: int = 16, pe_bands: int = 3) -> dict:
    in_dim = encoded_dim(2, pe_bands)
    return {"net": init_mlp(key, [in_dim, hidden, 4], bias=True), "pe_bands": Static(pe_bands)}


def spherical_base_sample(params: dict, omega_i: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    loc, log_scale, loc_von, conc = _spherical_heads(params, omega_i)
    k_gauss, k_von = jax.random.split(key)
    eps = jax.random.normal(k_gauss, loc.shape, loc.dtype)
    theta = loc + eps * (jnp.exp(log_scale) + _EPS_SPHERICAL)
    phi = von_mises_sample(k_von, loc_von, conc)
    return jnp.stack([theta, phi], axis=-1)


def spherical_base_log_prob(params: dict, x: jnp.ndarray, omega_i: jnp.ndarray) -> jnp.ndarray:
    loc, log_scale, loc_von, conc = _spherical_heads(params, omega_i)
    z = (x[..., 0] - loc) / (jnp.exp(log_scale) + _EPS_SPHERICAL)
    loggau = -0.5 * jnp.log(2.0 * jnp.pi) - log_scale - 0.5 * z * z
    logvon = von_mises_log_prob(x[..., 1], loc_von, conc)
    return loggau + logvon


DISK_BASE = BaseDensity("disk", disk_base_init, disk_base_sample, disk_base_log_prob)
SPHERICAL_BASE = BaseDensity(
    "spherical", spherical_base_init, spherical_base_sample, spherical_base_log_prob
)


def get_base(domain: str) -> BaseDensity:
    if domain == "disk":
        return DISK_BASE
    if domain in ("spherical", "sphere_full"):
        return SPHERICAL_BASE
    raise ValueError(f"unknown domain {domain!r}")
