"""Rough conductor / rough dielectric microfacet evaluators.

JAX equivalents of Mitsuba's `roughconductor` and `roughdielectric`
plugins, used by the reference as training oracles
(`/root/reference/learning_repo_cleanup/utils/mitsuba_brdf_scalar.py:27-45,90-107`;
the full-sphere material table appends three Beckmann bk7 roughdielectrics,
`learning_repo_cleanup/utils/bsdf_dict.py:342-344`).

Both return f * |cos_theta_o| (Mitsuba eval convention).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp

from bsdf_diffusion_sampling_tpu.bsdf.microfacet import (
    CONDUCTOR_IOR,
    DIELECTRIC_IOR,
    beckmann_d,
    beckmann_smith_g1,
    fresnel_conductor,
    fresnel_dielectric,
    ggx_d,
    ggx_smith_g1,
)

_NDF = {"ggx": (ggx_d, ggx_smith_g1), "beckmann": (beckmann_d, beckmann_smith_g1)}


@dataclass(frozen=True)
class RoughConductorParams:
    material: str = "Cu"
    alpha_u: float = 0.1
    alpha_v: float = 0.1
    distribution: str = "ggx"


def eval_roughconductor(
    p: RoughConductorParams, wi: jnp.ndarray, wo: jnp.ndarray
) -> jnp.ndarray:
    """(N, 3) spectral f * cos_theta_o; zero below the surface."""
    d_fn, g1_fn = _NDF[p.distribution]
    eta, k = CONDUCTOR_IOR[p.material]
    cos_i, cos_o = wi[..., 2], wo[..., 2]
    active = (cos_i > 0) & (cos_o > 0)
    wh = wi + wo
    wh = wh / jnp.maximum(jnp.linalg.norm(wh, axis=-1, keepdims=True), 1e-12)
    d = d_fn(wh, p.alpha_u, p.alpha_v)
    g = g1_fn(wi, wh, p.alpha_u, p.alpha_v) * g1_fn(wo, wh, p.alpha_u, p.alpha_v)
    f = fresnel_conductor(jnp.sum(wi * wh, axis=-1), eta, k)
    val = f * (d * g / (4.0 * jnp.maximum(jnp.abs(cos_i), 1e-8)))[..., None]
    return jnp.where(active[..., None], jnp.maximum(val, 0.0), 0.0)


@dataclass(frozen=True)
class RoughDielectricParams:
    alpha: float = 0.2
    int_ior: float | str = "bk7"
    ext_ior: float | str = "air"
    distribution: str = "beckmann"

    @property
    def eta(self) -> float:
        def _resolve(x):
            return DIELECTRIC_IOR[x] if isinstance(x, str) else float(x)

        return _resolve(self.int_ior) / _resolve(self.ext_ior)


def eval_roughdielectric(
    p: RoughDielectricParams, wi: jnp.ndarray, wo: jnp.ndarray
) -> jnp.ndarray:
    """Scalar f * |cos_theta_o|, reflection AND transmission lobes
    (Walter et al. 2007), both hemispheres."""
    d_fn, g1_fn = _NDF[p.distribution]
    eta = p.eta
    cos_i, cos_o = wi[..., 2], wo[..., 2]
    front = cos_i > 0
    eta_p = jnp.where(front, eta, 1.0 / eta)
    reflect = cos_i * cos_o > 0
    refract = cos_i * cos_o < 0

    mult = jnp.where(reflect, 1.0, eta_p)
    wh = wi + mult[..., None] * wo
    wh = wh / jnp.maximum(jnp.linalg.norm(wh, axis=-1, keepdims=True), 1e-12)
    wh = wh * jnp.sign(wh[..., 2:3])

    d = d_fn(wh, p.alpha, p.alpha)
    g = g1_fn(wi, wh, p.alpha, p.alpha) * g1_fn(wo, wh, p.alpha, p.alpha)
    cos_ih = jnp.sum(wi * wh, axis=-1)
    cos_oh = jnp.sum(wo * wh, axis=-1)
    f, _, _ = fresnel_dielectric(cos_ih, eta)

    refl = f * d * g / (4.0 * jnp.maximum(jnp.abs(cos_i), 1e-8))
    denom = jnp.maximum((cos_ih + eta_p * cos_oh) ** 2, 1e-10)
    # eta^2 half-vector jacobian cancels the 1/eta^2 radiance compression
    trans = (1.0 - f) * d * g * jnp.abs(
        cos_ih * cos_oh / jnp.maximum(jnp.abs(cos_i), 1e-8) / denom
    )
    val = jnp.where(reflect, refl, 0.0) + jnp.where(refract, trans, 0.0)
    return jnp.maximum(val, 0.0)
