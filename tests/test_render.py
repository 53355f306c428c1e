"""Renderer integration tests: scene parsing, envmap laws, low-res renders.

Golden-number checks are statistical (renders are Monte Carlo): envmap
sample/pdf consistency, film accumulation sanity, and a tiny GT render
that must be finite, non-black, and show the matball silhouette darker /
different from the background checkerboard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsdf_diffusion_sampling_tpu.bsdf import load_measured
from bsdf_diffusion_sampling_tpu.render.envmap import (
    eval_env,
    load_envmap,
    pdf_env,
    sample_env,
)
from bsdf_diffusion_sampling_tpu.render.integrator import (
    measured_matball,
    mis_weight,
    render,
)
from bsdf_diffusion_sampling_tpu.render.scene import load_scene, parse_scene_xml

SCENE = "/root/reference/rendering/matpreview/scene_measured.xml"
ENVMAP = "/root/reference/rendering/matpreview/envmap.exr"
BSDF = "/root/reference/rendering/measuredbsdfs/chm_mint_rgb.bsdf"


def test_parse_scene():
    d = parse_scene_xml(SCENE)
    assert (d.width, d.height, d.spp) == (512, 512, 64)
    assert len(d.shapes) == 3
    assert d.envmap_scale == 3.0
    assert d.shapes[2]["material"] == 2  # matball


def test_envmap_sample_pdf_consistency(key):
    env = load_envmap(ENVMAP, scale=3.0)
    n = 50_000
    u = jax.random.uniform(key, (n, 2), minval=1e-5, maxval=1 - 1e-5)
    d, rad, pdf_s = sample_env(env, u)
    # directions unit
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-4)
    pdf_q = pdf_env(env, d)
    rel = np.abs(np.asarray(pdf_q) / np.asarray(pdf_s) - 1.0)
    assert np.median(rel) < 0.02, np.median(rel)


def test_envmap_pdf_integrates_to_one(key):
    env = load_envmap(ENVMAP)
    n = 200_000
    # uniform sphere proposals
    u = jax.random.uniform(key, (n, 2))
    ct = u[:, 0] * 2 - 1
    st = jnp.sqrt(1 - ct**2)
    phi = u[:, 1] * 2 * jnp.pi
    d = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)
    integral = float(jnp.mean(pdf_env(env, d))) * 4 * np.pi
    assert 0.9 < integral < 1.1, integral


def test_envmap_importance_matches_radiance(key):
    """Bright directions must be sampled more: correlation between sample
    density and luminance."""
    env = load_envmap(ENVMAP)
    n = 100_000
    u = jax.random.uniform(key, (n, 2))
    d, rad, pdf = sample_env(env, u)
    lum = np.asarray(0.2126 * rad[:, 0] + 0.7152 * rad[:, 1] + 0.0722 * rad[:, 2])
    # pdf should be roughly proportional to luminance
    ratio = lum / np.maximum(np.asarray(pdf), 1e-9)
    assert np.std(np.log(np.maximum(ratio, 1e-9))) < 1.0


def test_mis_weight_properties():
    a = jnp.array([1.0, 2.0, 0.0, 5.0])
    b = jnp.array([1.0, 0.0, 3.0, 5.0])
    w = mis_weight(a, b)
    np.testing.assert_allclose(w[0], 0.5)
    np.testing.assert_allclose(w[1], 1.0)
    np.testing.assert_allclose(w[2], 0.0)
    # complementary weights sum to 1
    np.testing.assert_allclose(mis_weight(a, b) + mis_weight(b, a),
                               [1, 1, 1, 1], atol=1e-6)


@pytest.fixture(scope="module")
def tiny_scene():
    return load_scene(SCENE, width=48, height=48)


@pytest.mark.slow
def test_gt_render_smoke(tiny_scene):
    brdf = load_measured(BSDF)
    mb = measured_matball(brdf)
    img = render(tiny_scene, mb, spp=4, spp_chunk=4, max_depth=3)
    assert img.shape == (48, 48, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0.05  # lit scene
    # matball (center) is green-tinted mint: G channel dominates R there
    center = img[20:30, 20:30]
    assert center[..., 1].mean() > center[..., 0].mean()


def test_env_eval_pairs_matches_plain(key):
    """The paired-texel eval path (2 gathers) must equal the 4-gather
    bilinear path exactly."""
    from bsdf_diffusion_sampling_tpu.render.envmap import envmap_from_image, eval_env

    rng = np.random.default_rng(4)
    img = rng.random((64, 128, 3)).astype(np.float32)
    env = envmap_from_image(img)
    assert env.data_pairs is not None
    d = jax.random.normal(key, (4096, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    fast = eval_env(env, d)
    slow = eval_env(env._replace(data_pairs=None), d)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=1e-6, atol=1e-7)
