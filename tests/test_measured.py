"""Measured-BSDF stack: tensor-file parsing, Marginal2D warp laws,
sample/pdf/eval self-consistency on a real RGL file.

Mitsuba isn't available in this image, so (per SURVEY.md §4's strategy of
independent-implementation cross-checks) correctness is established by
internal mathematical laws: warp_sample must be distributed per warp_eval,
warp_invert must be its exact inverse, pdf_brdf must integrate to ~1 over
the sampled lobe, and the sample histogram must match pdf_brdf.
"""

import glob

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsdf_diffusion_sampling_tpu.bsdf.marginal2d import (
    build_warp2d,
    warp_eval,
    warp_invert,
    warp_sample,
)
from bsdf_diffusion_sampling_tpu.bsdf.measured import (
    eval_brdf,
    load_measured,
    pdf_brdf,
    rgb_to_luminance,
    sample_brdf,
)
from bsdf_diffusion_sampling_tpu.bsdf.tensorfile import read_tensor_file

BSDF_FILES = sorted(glob.glob("/root/reference/rendering/measuredbsdfs/*.bsdf"))


@pytest.fixture(scope="module")
def brdf():
    return load_measured(BSDF_FILES[0])


def test_tensorfile_fields():
    tf = read_tensor_file(BSDF_FILES[0])
    for name in ("theta_i", "phi_i", "sigma", "ndf", "vndf", "luminance", "rgb"):
        assert name in tf, name
    assert tf["vndf"].ndim == 4 and tf["vndf"].shape[-1] == 128
    assert tf["rgb"].shape[2] == 3
    assert np.all(np.diff(tf["theta_i"]) > 0)


# ------------------------------------------------------------- Marginal2D


def _toy_warp():
    # two param slices with different anisotropic bumps
    H = W = 33
    y, x = np.meshgrid(np.linspace(0, 1, H), np.linspace(0, 1, W), indexing="ij")
    g0 = np.exp(-((x - 0.3) ** 2 + (y - 0.6) ** 2) / 0.02) + 0.05
    g1 = np.exp(-((x - 0.7) ** 2 + (y - 0.2) ** 2) / 0.05) + 0.1
    return build_warp2d(np.stack([g0, g1]), np.array([0.0, 1.0]))


def test_warp_sample_invert_roundtrip(key):
    warp = _toy_warp()
    n = 4096
    u = jax.random.uniform(key, (n, 2), minval=1e-4, maxval=1.0 - 1e-4)
    theta = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    pos, pdf_s = warp_sample(warp, u, theta)
    u_back, pdf_i = warp_invert(warp, pos, theta)
    np.testing.assert_allclose(np.asarray(u_back), np.asarray(u), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pdf_i), np.asarray(pdf_s), rtol=2e-4)
    # eval agrees with the density both paths report
    pdf_e = warp_eval(warp, pos, theta)
    np.testing.assert_allclose(np.asarray(pdf_e), np.asarray(pdf_s), rtol=2e-4)


def test_warp_sample_histogram_matches_eval(key):
    warp = _toy_warp()
    n = 400_000
    u = jax.random.uniform(key, (n, 2))
    theta = jnp.full((n,), 0.25)
    pos, _ = warp_sample(warp, u, theta)
    pos = np.asarray(pos)
    bins = 16
    hist, xe, ye = np.histogram2d(
        pos[:, 0], pos[:, 1], bins=bins, range=[[0, 1], [0, 1]], density=True
    )
    cx = 0.5 * (xe[1:] + xe[:-1])
    cy = 0.5 * (ye[1:] + ye[:-1])
    gx, gy = np.meshgrid(cx, cy, indexing="ij")
    grid = jnp.stack([jnp.asarray(gx.ravel()), jnp.asarray(gy.ravel())], axis=-1)
    pdf = np.asarray(
        warp_eval(warp, grid.astype(jnp.float32), jnp.full((bins * bins,), 0.25))
    ).reshape(bins, bins)
    mask = hist > 0.3
    rel = np.abs(pdf[mask] - hist[mask]) / hist[mask]
    assert np.median(rel) < 0.05, np.median(rel)


def test_warp_pdf_normalization(key):
    """warp density must integrate to 1 over the unit square (per slice and
    between slices)."""
    warp = _toy_warp()
    n = 200_000
    u = jax.random.uniform(key, (n, 2))
    for th in (0.0, 0.5, 1.0):
        vals = warp_eval(warp, u, jnp.full((n,), th))
        integral = float(jnp.mean(vals))
        assert abs(integral - 1.0) < 0.02, (th, integral)


# ------------------------------------------------------------ measured BRDF


def test_eval_basic_properties(brdf, key):
    n = 2048
    k1, k2 = jax.random.split(key)

    def rand_dirs(k):
        u = jax.random.uniform(k, (n, 2))
        ct = u[:, 0] * 0.95 + 0.05
        st = jnp.sqrt(1 - ct**2)
        phi = u[:, 1] * 2 * jnp.pi
        return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)

    wi, wo = rand_dirs(k1), rand_dirs(k2)
    f = eval_brdf(brdf, wi, wo)
    assert f.shape == (n, 3)
    f = np.asarray(f)
    assert np.isfinite(f).all()
    assert (f >= 0).all()
    # reciprocity is approximate for measured data; check same order of magnitude
    f_swap = np.asarray(eval_brdf(brdf, wo, wi))
    lum, lum_s = rgb_to_luminance(f), rgb_to_luminance(f_swap)
    mask = (lum > 1e-4) & (lum_s > 1e-4)
    assert mask.mean() > 0.5
    # downward directions are zero
    f_down = np.asarray(eval_brdf(brdf, wi, -wo))
    assert (f_down == 0).all()


def test_sample_invert_consistency(brdf, key):
    """pdf_brdf(wi, sample_brdf(u, wi)) must equal the pdf returned by
    sampling (the sample<->query contract the renderer's MIS relies on)."""
    n = 4096
    k1, k2 = jax.random.split(key)
    ct = 0.8
    wi = jnp.broadcast_to(jnp.array([np.sqrt(1 - ct**2), 0.0, ct]), (n, 3))
    u = jax.random.uniform(k2, (n, 2), minval=1e-4, maxval=1 - 1e-4)
    wo, pdf_s = sample_brdf(brdf, u, wi)
    valid = np.asarray(pdf_s) > 1e-6
    assert valid.mean() > 0.9
    pdf_q = pdf_brdf(brdf, wi, wo)
    rel = np.abs(np.asarray(pdf_q)[valid] / np.asarray(pdf_s)[valid] - 1.0)
    assert np.median(rel) < 0.02, np.median(rel)


def test_pdf_integrates_to_one(brdf, key):
    """Monte-Carlo integral of pdf_brdf over the hemisphere ~ 1 (sampling
    covers the lobe, so the pdf must be a normalized solid-angle density)."""
    n = 200_000
    ct_i = 0.7
    wi = jnp.broadcast_to(jnp.array([np.sqrt(1 - ct_i**2), 0.0, ct_i]), (n, 3))
    # uniform hemisphere proposals
    u = jax.random.uniform(key, (n, 2))
    ct = u[:, 0]
    st = jnp.sqrt(1 - ct**2)
    phi = u[:, 1] * 2 * jnp.pi
    wo = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)
    pdf = np.asarray(pdf_brdf(brdf, wi, wo))
    integral = pdf.mean() * 2 * np.pi
    assert 0.85 < integral < 1.15, integral


def test_sample_histogram_matches_pdf(brdf, key):
    """2D histogram of sampled wo (projected to the disk) vs pdf_brdf."""
    n = 500_000
    ct_i = 0.9
    wi = jnp.broadcast_to(jnp.array([np.sqrt(1 - ct_i**2), 0.0, ct_i]), (n, 3))
    u = jax.random.uniform(key, (n, 2), minval=1e-5, maxval=1 - 1e-5)
    wo, pdf_s = sample_brdf(brdf, u, wi)
    wo = np.asarray(wo)
    ok = np.asarray(pdf_s) > 0
    wo = wo[ok]
    bins = 24
    hist, xe, ye = np.histogram2d(
        wo[:, 0], wo[:, 1], bins=bins, range=[[-1, 1], [-1, 1]], density=True
    )
    hist *= ok.mean()  # histogram over accepted; rescale to full density
    cx = 0.5 * (xe[1:] + xe[:-1])
    cy = 0.5 * (ye[1:] + ye[:-1])
    gx, gy = np.meshgrid(cx, cy, indexing="ij")
    r2 = gx**2 + gy**2
    inside = r2 < 0.9
    gz = np.sqrt(np.maximum(1 - r2, 1e-9))
    wo_grid = jnp.asarray(np.stack([gx, gy, gz], -1).reshape(-1, 3), jnp.float32)
    wi_g = jnp.broadcast_to(jnp.array([np.sqrt(1 - ct_i**2), 0.0, ct_i]), wo_grid.shape)
    # disk-area density = solid-angle pdf / cos(theta_o)
    pdf = np.asarray(pdf_brdf(brdf, wi_g, wo_grid)).reshape(bins, bins) / gz
    mask = inside & (hist > 0.05 * hist.max())
    rel = np.abs(pdf[mask] - hist[mask]) / hist[mask]
    assert np.median(rel) < 0.15, np.median(rel)


def test_all_materials_load():
    for path in BSDF_FILES:
        b = load_measured(path)
        assert b.rgb.shape[1] == 3


def test_rgb_rows_packed_path_matches_per_channel(brdf, key):
    """The channel-packed rgb row lookup (4 gathers) must equal the
    per-channel fallback (24 scalar gathers)."""
    from bsdf_diffusion_sampling_tpu.bsdf import measured as me

    assert brdf.rgb_rows is not None
    s = jax.random.uniform(key, (4096, 2))
    theta = jax.random.uniform(jax.random.fold_in(key, 1), (4096,),
                               minval=0.0, maxval=1.5)
    fast = me._rgb_lookup(brdf, s, theta)
    slow_brdf = brdf._replace(rgb_rows=None)
    slow = me._rgb_lookup(slow_brdf, s, theta)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=2e-5, atol=1e-7)


def test_eval_pdf_brdf_matches_separate(brdf, key):
    from bsdf_diffusion_sampling_tpu.bsdf import measured as me

    k1, k2 = jax.random.split(key)
    def dirs(k, n=2048):
        u = jax.random.uniform(k, (n, 2))
        ct = 0.05 + 0.9 * u[:, 0]
        st = jnp.sqrt(1 - ct**2)
        phi = u[:, 1] * 2 * jnp.pi
        return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], -1)
    wi, wo = dirs(k1), dirs(k2)
    f, p = me.eval_pdf_brdf(brdf, wi, wo)
    np.testing.assert_allclose(np.asarray(f),
                               np.asarray(me.eval_brdf(brdf, wi, wo)),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(p),
                               np.asarray(me.pdf_brdf(brdf, wi, wo)),
                               rtol=1e-6, atol=1e-9)
