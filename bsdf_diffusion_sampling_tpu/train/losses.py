"""Training losses for the three stages.

Loss semantics mirror the reference scripts exactly (so trained models are
interchangeable) while being pure jnp functions of (params, batch, key):

- pretrain: mean negative log-likelihood of omega_o under the conditional
  base density (`/root/reference/learning_repo_cleanup/disk_domain_sampling.py:25-26`).
- diffusion (flow matching): draw x0 ~ base(omega_i), interpolate
  x_alpha = (1-alpha) x0 + alpha x1, regress v(x_alpha, alpha, omega_i)
  onto (x1 - x0) with MSE (`disk_domain_sampling.py:49-58`). For periodic
  domains, x1's phi is first wrapped to the shortest arc from x0's phi and
  the phi velocity target is that wrapped difference
  (`spherical_domain_sampling.py:62-72`).

alpha is the reference's deterministic linspace(0,1,batch) grid
(`disk_domain_sampling.py:51`) — with the batch randomly drawn, pairing the
i-th sample with alpha_i = i/(B-1) is a stratified draw of alpha, which has
strictly lower estimator variance than iid uniform; we keep it.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from bsdf_diffusion_sampling_tpu.geometry.coords import shortest_arc_delta
from bsdf_diffusion_sampling_tpu.models.base_density import BaseDensity
from bsdf_diffusion_sampling_tpu.models.velocity import velocity_apply
from bsdf_diffusion_sampling_tpu.ode.flow import _encode_x


def pretrain_nll(base: BaseDensity, params: dict, batch: jnp.ndarray) -> jnp.ndarray:
    """batch: (N, 4) rows of (omega_i, omega_o)."""
    omega_i, omega_o = batch[:, 0:2], batch[:, 2:4]
    return -jnp.mean(base.log_prob(params, omega_o, omega_i))


def flow_matching_targets(
    domain: str,
    x0: jnp.ndarray,
    x1: jnp.ndarray,
    alpha: jnp.ndarray,
):
    """Returns (x_alpha, v_target) with periodic-phi care for spherical
    domains (`spherical_domain_sampling.py:62-72`)."""
    if domain != "disk":
        dphi = shortest_arc_delta(x1[:, 1], x0[:, 1])
        x1 = jnp.stack([x1[:, 0], x0[:, 1] + dphi], axis=-1)
    x_alpha = (1.0 - alpha) * x0 + alpha * x1
    return x_alpha, x1 - x0


def flow_matching_mse(
    domain: str,
    v_params: List[dict],
    x0: jnp.ndarray,
    x1: jnp.ndarray,
    alpha: jnp.ndarray,
    cond_enc: jnp.ndarray,
) -> jnp.ndarray:
    x_alpha, v_target = flow_matching_targets(domain, x0, x1, alpha)
    pred = velocity_apply(v_params, _encode_x(domain, x_alpha), alpha, cond_enc)
    return jnp.mean((pred - v_target) ** 2)


def linspace_alpha(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """The reference's stratified alpha grid, shape (n, 1)."""
    return jnp.linspace(0.0, 1.0, n, dtype=dtype).reshape(-1, 1)
