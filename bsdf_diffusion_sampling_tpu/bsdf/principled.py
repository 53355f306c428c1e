"""Disney principled BSDF evaluator (reflection + rough transmission).

JAX equivalent of Mitsuba's `principled` plugin, which the reference loads
as its full-sphere training oracle and render-time ground truth
(`/root/reference/rendering/utils/bsdf_dict.py:135-156`,
`/root/reference/rendering/bsdf_myresult.py:46,96`). The material tables
(P8) fix base_color to white (1,1,1) and exercise: metallic, specular,
roughness, spec_tint, anisotropic, sheen, sheen_tint, clearcoat,
clearcoat_gloss, spec_trans, flatness.

Lobe structure follows Burley 2012/2015 as implemented by Mitsuba:
- main specular: anisotropic GGX x Smith G x principled Fresnel
  (dielectric/metallic/spec-tint blend), weight 1 (plus transmission pair)
- microfacet transmission: weight (1-metallic)*spec_trans, dielectric
  Fresnel complement, generalized half-vector wh = wi + eta*wo
- diffuse + retro-reflection + flatness (fake subsurface), weight
  (1-metallic)*(1-spec_trans)
- sheen: (1-metallic)*sheen, Schlick grazing weight
- clearcoat: GTR1 NDF, fixed 0.04 Fresnel, Smith G at alpha 0.25

`eval` returns f * |cos_theta_o| (Mitsuba eval convention — the same
quantity the reference feeds to rgb2lum, `mitsuba_brdf_scalar.py:58-62`).
Mitsuba itself isn't available in-image; correctness is anchored by limit
tests (metallic=1 -> pure GGX; spec_trans=0 -> no transmission; energy
bounds) in tests/test_principled.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from bsdf_diffusion_sampling_tpu.bsdf.microfacet import (
    clearcoat_g,
    fresnel_dielectric,
    fresnel_schlick,
    ggx_d,
    ggx_smith_g1,
    gtr1_d,
    schlick_r0_eta,
    schlick_weight,
)


@dataclass(frozen=True)
class PrincipledParams:
    metallic: float = 0.0
    specular: float = 0.5
    roughness: float = 0.5
    spec_tint: float = 0.0
    anisotropic: float = 0.0
    sheen: float = 0.0
    sheen_tint: float = 0.0
    clearcoat: float = 0.0
    clearcoat_gloss: float = 0.0
    spec_trans: float = 0.0
    flatness: float = 0.0
    # base_color fixed at white, matching the reference tables
    # (`rendering/utils/bsdf_dict.py:139-142`)

    @property
    def eta(self) -> float:
        # specular -> relative IOR (Mitsuba's principled mapping)
        return 2.0 / (1.0 - (0.08 * self.specular) ** 0.5) - 1.0

    @property
    def alphas(self):
        r2 = max(self.roughness**2, 1e-4)
        if self.anisotropic <= 0.0:
            return r2, r2
        aspect = (1.0 - 0.9 * self.anisotropic) ** 0.5
        return max(r2 / aspect, 1e-4), max(r2 * aspect, 1e-4)


def _principled_fresnel(p: PrincipledParams, f_dielectric, cos_d, front, eta_p):
    """Front-side Fresnel blend (white base color => metallic Schlick = 1)."""
    f0_tint = schlick_r0_eta(eta_p)
    f_tint = fresnel_schlick(f0_tint, jnp.abs(cos_d))
    f_front = (
        (1.0 - p.metallic) * (1.0 - p.spec_tint) * f_dielectric
        + p.metallic
        + (1.0 - p.metallic) * p.spec_tint * f_tint
    )
    bsdf_w = (1.0 - p.metallic) * p.spec_trans
    return jnp.where(front, f_front, bsdf_w * f_dielectric)


def eval_principled(p: PrincipledParams, wi: jnp.ndarray, wo: jnp.ndarray) -> jnp.ndarray:
    """f(wi, wo) * |cos_theta_o| (scalar; white base color => all channels
    equal except spec-tint/sheen-tint, which are also white here)."""
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    front = cos_i > 0
    eta = p.eta
    eta_p = jnp.where(front, eta, 1.0 / eta)
    brdf_w = (1.0 - p.metallic) * (1.0 - p.spec_trans)
    bsdf_w = (1.0 - p.metallic) * p.spec_trans

    reflect = cos_i * cos_o > 0
    refract = cos_i * cos_o < 0

    # generalized half-vector (Walter 2007): wi + eta_p * wo for refraction
    mult = jnp.where(reflect, 1.0, eta_p)
    wh = wi + mult[..., None] * wo
    wh = wh / jnp.maximum(jnp.linalg.norm(wh, axis=-1, keepdims=True), 1e-12)
    wh = wh * jnp.sign(wh[..., 2:3])

    ax, ay = p.alphas
    d = ggx_d(wh, ax, ay)
    g = ggx_smith_g1(wi, wh, ax, ay) * ggx_smith_g1(wo, wh, ax, ay)
    cos_ih = jnp.sum(wi * wh, axis=-1)
    cos_oh = jnp.sum(wo * wh, axis=-1)
    f_diel, _, _ = fresnel_dielectric(cos_ih, eta)

    value = jnp.zeros_like(cos_i)

    # ---- main specular reflection
    f_pr = _principled_fresnel(p, f_diel, cos_ih, front, eta_p)
    spec = f_pr * d * g / (4.0 * jnp.maximum(jnp.abs(cos_i), 1e-8))
    value = value + jnp.where(reflect, spec, 0.0)

    # ---- microfacet transmission
    if p.spec_trans > 0:
        # Walter 2007 eq. 21 times |cos_o|; the eta_p^2 half-vector
        # jacobian cancels against the 1/eta_p^2 radiance compression.
        denom = jnp.maximum((cos_ih + eta_p * cos_oh) ** 2, 1e-10)
        trans = (
            bsdf_w
            * (1.0 - f_diel)
            * d
            * g
            * jnp.abs(cos_ih * cos_oh / jnp.maximum(jnp.abs(cos_i), 1e-8) / denom)
        )
        value = value + jnp.where(refract, trans, 0.0)

    # ---- diffuse family (front-side reflection only)
    both_up = front & (cos_o > 0)
    aci, aco = jnp.abs(cos_i), jnp.abs(cos_o)
    fo = schlick_weight(aco)
    fi = schlick_weight(aci)
    f_diff = (1.0 - 0.5 * fo) * (1.0 - 0.5 * fi)
    cos_d = cos_oh  # angle between wo and half vector
    rr = 2.0 * p.roughness * cos_d * cos_d
    f_retro = rr * (fo + fi + fo * fi * (rr - 1.0))
    fss90 = 0.5 * rr
    fss = (1.0 + (fss90 - 1.0) * fo) * (1.0 + (fss90 - 1.0) * fi)
    f_ss = 1.25 * (fss * (1.0 / jnp.maximum(aci + aco, 1e-6) - 0.5) + 0.5)
    diffuse = (
        brdf_w
        * aco
        / jnp.pi
        * ((1.0 - p.flatness) * f_diff + p.flatness * f_ss + f_retro)
    )
    value = value + jnp.where(both_up, diffuse, 0.0)

    # ---- sheen (white sheen color for white base)
    if p.sheen > 0:
        sheen_v = (1.0 - p.metallic) * p.sheen * schlick_weight(jnp.abs(cos_d)) * aco
        value = value + jnp.where(both_up, sheen_v, 0.0)

    # ---- clearcoat
    if p.clearcoat > 0:
        alpha_cc = (1.0 - p.clearcoat_gloss) * 0.1 + p.clearcoat_gloss * 0.001
        d_cc = gtr1_d(wh, alpha_cc)
        g_cc = clearcoat_g(wi, wh) * clearcoat_g(wo, wh)
        f_cc = fresnel_schlick(0.04, jnp.abs(cos_d))
        cc = 0.25 * p.clearcoat * d_cc * f_cc * g_cc * aco
        value = value + jnp.where(both_up, cc, 0.0)

    return jnp.maximum(value, 0.0)
