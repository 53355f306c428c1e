"""Microfacet building blocks: NDFs, Smith shadowing, Fresnel terms.

Shared by the principled / roughconductor / roughdielectric evaluators —
the JAX equivalents of the Mitsuba plugins the reference loads as oracles
(`/root/reference/learning_repo_cleanup/utils/mitsuba_brdf_scalar.py:27-107`).

Conventions: shading frame with n = +z; directions unit, z-up;
`cos_theta(w) = w[..., 2]`. All functions batched and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def cos_theta(w):
    return w[..., 2]


def _sqr(x):
    return x * x


# ------------------------------------------------------------------ NDFs


def ggx_d(wh, alpha_u, alpha_v):
    """Anisotropic GGX (Trowbridge-Reitz) NDF."""
    x, y, z = wh[..., 0], wh[..., 1], wh[..., 2]
    t = _sqr(x / alpha_u) + _sqr(y / alpha_v) + _sqr(z)
    return jnp.where(
        z > 0, 1.0 / (jnp.pi * alpha_u * alpha_v * _sqr(t)), 0.0
    )


def beckmann_d(wh, alpha_u, alpha_v):
    x, y, z = wh[..., 0], wh[..., 1], wh[..., 2]
    z2 = jnp.maximum(_sqr(z), 1e-12)
    e = (_sqr(x / alpha_u) + _sqr(y / alpha_v)) / z2
    return jnp.where(
        z > 0, jnp.exp(-e) / (jnp.pi * alpha_u * alpha_v * _sqr(z2)), 0.0
    )


def ggx_smith_g1(w, wh, alpha_u, alpha_v):
    """Smith masking G1 for GGX, per-direction."""
    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    xy_alpha2 = _sqr(alpha_u * x) + _sqr(alpha_v * y)
    tan2 = xy_alpha2 / jnp.maximum(_sqr(z), 1e-12)
    g1 = 2.0 / (1.0 + jnp.sqrt(1.0 + tan2))
    # sidedness: wh must be on the same side as w
    side = jnp.sum(w * wh, axis=-1) * z > 0
    return jnp.where(side, g1, 0.0)


def beckmann_smith_g1(w, wh, alpha_u, alpha_v):
    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    alpha = jnp.sqrt(
        (_sqr(alpha_u * x) + _sqr(alpha_v * y)) / jnp.maximum(x * x + y * y, 1e-12)
    )
    # isotropic fallback when x=y=0
    alpha = jnp.where(x * x + y * y < 1e-12, alpha_u, alpha)
    cos2 = jnp.maximum(_sqr(z), 1e-12)
    tan_theta = jnp.sqrt(jnp.maximum(1.0 - cos2, 0.0) / cos2)
    a = 1.0 / jnp.maximum(alpha * tan_theta, 1e-12)
    # Walter's rational approximation
    g1 = jnp.where(
        a >= 1.6,
        1.0,
        (3.535 * a + 2.181 * a * a) / (1.0 + 2.276 * a + 2.577 * a * a),
    )
    side = jnp.sum(w * wh, axis=-1) * z > 0
    return jnp.where(side, g1, 0.0)


def gtr1_d(wh, alpha):
    """GTR1 (Berry) NDF — the Disney clearcoat lobe."""
    z = wh[..., 2]
    a2 = _sqr(alpha)
    t = 1.0 + (a2 - 1.0) * _sqr(z)
    d = (a2 - 1.0) / (jnp.pi * jnp.log(jnp.maximum(a2, 1e-12)) * t)
    return jnp.where(z > 0, d, 0.0)


def clearcoat_g(w, wh):
    """Separable Smith GGX with fixed alpha 0.25 (Disney clearcoat)."""
    return ggx_smith_g1(w, wh, 0.25, 0.25)


# --------------------------------------------------------------- Fresnel


def schlick_weight(cos_t):
    m = jnp.clip(1.0 - cos_t, 0.0, 1.0)
    return _sqr(_sqr(m)) * m


def fresnel_schlick(f0, cos_t):
    return f0 + (1.0 - f0) * schlick_weight(cos_t)


def schlick_r0_eta(eta):
    return _sqr((eta - 1.0) / (eta + 1.0))


def fresnel_dielectric(cos_theta_i, eta):
    """Exact unpolarized dielectric Fresnel reflectance.

    eta = n_transmitted / n_incident for cos_theta_i > 0; the sign of
    cos_theta_i selects the side (negative = hitting from inside).
    Returns (F, cos_theta_t, eta_it) with cos_theta_t <= 0.
    """
    outside = cos_theta_i >= 0
    eta_it = jnp.where(outside, eta, 1.0 / eta)
    cti = jnp.abs(cos_theta_i)
    sin2_t = (1.0 - _sqr(cti)) / jnp.maximum(_sqr(eta_it), 1e-12)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    r_s = (cti - eta_it * cos_t) / jnp.maximum(cti + eta_it * cos_t, 1e-12)
    r_p = (eta_it * cti - cos_t) / jnp.maximum(eta_it * cti + cos_t, 1e-12)
    f = 0.5 * (_sqr(r_s) + _sqr(r_p))
    f = jnp.where(tir, 1.0, f)
    return f, -cos_t, eta_it


def fresnel_conductor(cos_theta_i, eta, k):
    """Unpolarized conductor Fresnel (per channel; eta, k broadcastable)."""
    c2 = _sqr(jnp.clip(cos_theta_i, 0.0, 1.0))
    s2 = 1.0 - c2
    e2, k2 = _sqr(eta), _sqr(k)
    t0 = e2 - k2 - s2[..., None]
    a2b2 = jnp.sqrt(jnp.maximum(_sqr(t0) + 4.0 * e2 * k2, 0.0))
    t1 = a2b2 + c2[..., None]
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * jnp.sqrt(c2)[..., None]
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-12)
    t3 = c2[..., None] * a2b2 + _sqr(s2)[..., None]
    t4 = t2 * s2[..., None]
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-12)
    return 0.5 * (rs + rp)


# conductor eta/k presets (Rec.709-averaged values, matching the named
# materials Mitsuba's `roughconductor` accepts — `mitsuba_brdf_scalar.py:30`)
CONDUCTOR_IOR = {
    "Cu": (jnp.array([0.20, 0.92, 1.10]), jnp.array([3.91, 2.45, 2.14])),
    "Au": (jnp.array([0.14, 0.37, 1.44]), jnp.array([3.98, 2.39, 1.60])),
    "Al": (jnp.array([1.35, 0.97, 0.62]), jnp.array([7.47, 6.40, 5.30])),
    "Ag": (jnp.array([0.16, 0.14, 0.13]), jnp.array([3.93, 3.19, 2.38])),
}

# dielectric ior presets (Mitsuba names)
DIELECTRIC_IOR = {"air": 1.000277, "bk7": 1.5046, "water": 1.3330, "diamond": 2.419}
