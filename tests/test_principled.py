"""Analytic BSDF plugin family: principled / roughconductor /
roughdielectric + material table.

Mitsuba is not in the image; correctness is anchored by limit cases and
physical laws (the independent-implementation redundancy strategy of
SURVEY.md §4.4): GGX lobes must integrate below 1 (energy), metallic=1
principled must reduce to a pure GGX Schlick lobe, spec_trans=0 must kill
transmission, dielectric transmission must obey Snell's direction, and
everything must be finite/nonnegative.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsdf_diffusion_sampling_tpu.bsdf.materials import BSDF_MATERIALS, eval_material
from bsdf_diffusion_sampling_tpu.bsdf.microfacet import (
    fresnel_dielectric,
    ggx_d,
    ggx_smith_g1,
)
from bsdf_diffusion_sampling_tpu.bsdf.principled import PrincipledParams, eval_principled
from bsdf_diffusion_sampling_tpu.bsdf.rough import (
    RoughConductorParams,
    RoughDielectricParams,
    eval_roughconductor,
    eval_roughdielectric,
)


def _sphere_dirs(key, n, hemisphere=None):
    u = jax.random.uniform(key, (n, 2))
    ct = u[:, 0] * 2 - 1
    if hemisphere == "up":
        ct = u[:, 0]
    st = jnp.sqrt(jnp.maximum(1 - ct**2, 0))
    phi = u[:, 1] * 2 * jnp.pi
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


def test_ggx_d_normalization(key):
    """∫ D(wh) cos(th) dwh = 1 over the hemisphere (NDF law)."""
    n = 400_000
    wh = _sphere_dirs(key, n, "up")
    for a in (0.1, 0.3, 0.8):
        d = ggx_d(wh, a, a) * wh[:, 2]
        integral = float(jnp.mean(d)) * 2 * np.pi
        assert abs(integral - 1.0) < 0.05, (a, integral)


def test_principled_metallic_limit(key):
    """metallic=1: only the main specular survives; equals GGX D*G/(4 cos_i)
    (white metal => Fresnel == 1)."""
    # clearcoat=0: the clearcoat lobe is NOT scaled by (1-metallic) in
    # Disney's model, so it must be disabled for the pure-GGX limit.
    p = PrincipledParams(metallic=1.0, roughness=0.4, specular=0.6,
                         spec_trans=0.9, sheen=0.5, clearcoat=0.0,
                         flatness=1.0, spec_tint=0.5)
    n = 4096
    k1, k2 = jax.random.split(key)
    wi = _sphere_dirs(k1, n, "up")
    wo = _sphere_dirs(k2, n, "up")
    got = eval_principled(p, wi, wo)
    wh = wi + wo
    wh = wh / jnp.linalg.norm(wh, axis=-1, keepdims=True)
    a = p.alphas[0]
    expect = ggx_d(wh, a, a) * ggx_smith_g1(wi, wh, a, a) * ggx_smith_g1(wo, wh, a, a) / (
        4 * wi[:, 2]
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-4, atol=1e-6)


def test_principled_no_transmission_when_spec_trans_zero(key):
    p = PrincipledParams(metallic=0.2, roughness=0.3, spec_trans=0.0)
    n = 4096
    wi = _sphere_dirs(key, n, "up")
    wo = -_sphere_dirs(jax.random.fold_in(key, 1), n, "up")  # downward
    got = np.asarray(eval_principled(p, wi, wo))
    assert (got == 0).all()


def test_principled_energy_bound(key):
    """White-furnace style: ∫ f cos dwo <= ~1 for a lobe without emission.

    Disney's diffuse+retro can exceed 1 slightly at grazing; allow 1.3."""
    p = BSDF_MATERIALS[3]
    n = 500_000
    wo = _sphere_dirs(key, n)  # full sphere (transmission included)
    ct_i = 0.6
    wi = jnp.broadcast_to(jnp.array([np.sqrt(1 - ct_i**2), 0.0, ct_i]), (n, 3))
    f = np.asarray(eval_material(p, wi, wo))
    assert np.isfinite(f).all() and (f >= 0).all()
    integral = f.mean() * 4 * np.pi
    assert integral < 1.3, integral


def test_roughdielectric_both_hemispheres(key):
    p = RoughDielectricParams(alpha=0.3)
    n = 200_000
    wo = _sphere_dirs(key, n)
    ct_i = 0.8
    wi = jnp.broadcast_to(jnp.array([np.sqrt(1 - ct_i**2), 0.0, ct_i]), (n, 3))
    f = np.asarray(eval_roughdielectric(p, wi, wo))
    up, down = wo[:, 2] > 0, wo[:, 2] < 0
    assert f[np.asarray(up)].sum() > 0, "no reflection lobe"
    assert f[np.asarray(down)].sum() > 0, "no transmission lobe"
    # transmission concentrates near the Snell direction
    eta = p.eta
    st_i = np.sqrt(1 - ct_i**2)
    st_t = st_i / eta
    snell = np.array([-st_t, 0.0, -np.sqrt(1 - st_t**2)])
    f_down = f[np.asarray(down)]
    wo_down = np.asarray(wo)[np.asarray(down)]
    best = wo_down[np.argsort(f_down)[-200:]]
    assert np.dot(best.mean(0) / np.linalg.norm(best.mean(0)), snell) > 0.95


def test_roughdielectric_energy(key):
    """Reflection + transmission must not exceed incoming energy."""
    for alpha in (0.2, 0.5):
        p = RoughDielectricParams(alpha=alpha)
        n = 400_000
        wo = _sphere_dirs(key, n)
        ct_i = 0.7
        wi = jnp.broadcast_to(jnp.array([np.sqrt(1 - ct_i**2), 0.0, ct_i]), (n, 3))
        f = np.asarray(eval_roughdielectric(p, wi, wo))
        integral = f.mean() * 4 * np.pi
        assert integral < 1.1, (alpha, integral)


def test_roughconductor_fresnel_bound(key):
    p = RoughConductorParams(material="Cu", alpha_u=0.2, alpha_v=0.2)
    n = 100_000
    wo = _sphere_dirs(key, n, "up")
    ct_i = 0.8
    wi = jnp.broadcast_to(jnp.array([np.sqrt(1 - ct_i**2), 0.0, ct_i]), (n, 3))
    f = np.asarray(eval_roughconductor(p, wi, wo))
    assert f.shape == (n, 3)
    assert np.isfinite(f).all() and (f >= 0).all()
    integral = f.mean(axis=0) * 2 * np.pi
    assert (integral < 1.0).all(), integral  # conductors absorb


def test_fresnel_dielectric_limits():
    f0, _, _ = fresnel_dielectric(jnp.array([1.0]), 1.5)
    np.testing.assert_allclose(f0, ((1.5 - 1) / (1.5 + 1)) ** 2, rtol=1e-5)
    fg, _, _ = fresnel_dielectric(jnp.array([1e-4]), 1.5)
    np.testing.assert_allclose(fg, 1.0, atol=1e-2)  # grazing -> 1
    # total internal reflection from inside
    ftir, _, _ = fresnel_dielectric(jnp.array([-0.3]), 1.5)
    np.testing.assert_allclose(ftir, 1.0)


def test_material_table_shape():
    assert len(BSDF_MATERIALS) == 26  # 23 principled + 3 roughdielectric
    assert isinstance(BSDF_MATERIALS[3], PrincipledParams)
    assert BSDF_MATERIALS[3].metallic == 0.2  # second dict4 definition wins
    assert isinstance(BSDF_MATERIALS[23], RoughDielectricParams)
    assert BSDF_MATERIALS[25].alpha == 0.5
