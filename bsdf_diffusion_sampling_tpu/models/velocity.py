"""Conditional velocity (flow) networks v(x_alpha, alpha, omega_i) -> R^2.

Bias-free SiLU MLPs over [x_enc, alpha, PE(omega_i, 5 bands)] — the same
parameterization as the reference's velocity zoo so architectures map 1:1:
- disk "simpler": 3 hidden x32, input 25 (`model.py:479-501`)
- spherical "simpler": 4 hidden x32, input 26 (`model.py:422-446`)
- spherical "complex": 6 hidden x64, input 26 (`model.py:449-477`)

The conditioning encoding PE(omega_i) is hoisted out of the per-step apply:
at inference the ODE re-evaluates the net T times with the same omega_i, so
the caller encodes once and passes `cond_enc` (the reference recomputes the
torch PE every step; tcnn's rectify path also pre-encodes —
`disk_domain_sampling.py:100`).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from bsdf_diffusion_sampling_tpu.core.config import ModelConfig
from bsdf_diffusion_sampling_tpu.models.encoding import positional_encoding
from bsdf_diffusion_sampling_tpu.models.mlp import init_mlp, mlp_apply


def velocity_init(key: jax.Array, cfg: ModelConfig) -> List[dict]:
    dims = [cfg.velocity_in_dim] + [cfg.velocity_hidden] * cfg.velocity_layers + [2]
    return init_mlp(key, dims, bias=False)


def encode_condition(omega_i: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    return positional_encoding(omega_i, cfg.velocity_pe_bands)


def velocity_apply(
    params: List[dict],
    x_enc: jnp.ndarray,
    alpha: jnp.ndarray,
    cond_enc: jnp.ndarray,
) -> jnp.ndarray:
    """x_enc: (N, 2|3); alpha: (N, 1) or scalar; cond_enc: (N, 22)."""
    if jnp.ndim(alpha) == 0:
        alpha = jnp.full(x_enc.shape[:-1] + (1,), alpha, x_enc.dtype)
    inp = jnp.concatenate([x_enc, alpha, cond_enc], axis=-1)
    return mlp_apply(params, inp)
