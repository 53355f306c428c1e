"""Row fast path of the Marginal2D warp vs the generic gather path.

The fast path (row gathers + lane counts/selects, bit-compatible blending)
must reproduce the generic binary-search path on the same tables — it is
the production path for every RGL measured table (all rows <= 128 lanes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsdf_diffusion_sampling_tpu.bsdf import marginal2d as m2


@pytest.fixture(scope="module")
def warp():
    rng = np.random.default_rng(3)
    grids = rng.random((5, 33, 65)).astype(np.float32) ** 2 + 1e-3
    params = np.linspace(0.0, 1.4, 5).astype(np.float32)
    return m2.build_warp2d(grids, params)


@pytest.fixture
def slow(monkeypatch):
    monkeypatch.setattr(m2, "_fast_ok", lambda w: False)
    return None


def _inputs(key, n=2048):
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (n, 2), minval=1e-4, maxval=1.0 - 1e-4)
    theta = jax.random.uniform(k2, (n,), minval=-0.1, maxval=1.6)
    return u, theta


def test_sample_fast_matches_generic(warp, key, slow):
    u, theta = _inputs(key)
    pos_s, pdf_s = m2.warp_sample(warp, u, theta)
    pos_f, pdf_f = m2._warp_sample_fast(warp, u, theta)
    np.testing.assert_allclose(np.asarray(pos_f), np.asarray(pos_s),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(pdf_f), np.asarray(pdf_s),
                               rtol=2e-4)


def test_invert_fast_matches_generic(warp, key, slow):
    u, theta = _inputs(key)
    pos = jax.random.uniform(jax.random.fold_in(key, 1), (2048, 2),
                             minval=1e-4, maxval=1.0 - 1e-4)
    u_s, pdf_s = m2.warp_invert(warp, pos, theta)
    u_f, pdf_f = m2._warp_invert_fast(warp, pos, theta)
    np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_s),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(pdf_f), np.asarray(pdf_s),
                               rtol=2e-4)


def test_eval_fast_matches_generic(warp, key, slow):
    _, theta = _inputs(key)
    pos = jax.random.uniform(jax.random.fold_in(key, 2), (2048, 2))
    d_s = m2.warp_eval(warp, pos, theta)
    d_f = m2._warp_eval_fast(warp, pos, theta)
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_s), rtol=2e-4)


def test_fast_roundtrip(warp, key):
    """sample -> invert must round-trip through the fast path."""
    u, theta = _inputs(key)
    pos, pdf_s = m2.warp_sample(warp, u, theta)
    u_rec, pdf_i = m2.warp_invert(warp, pos, theta)
    np.testing.assert_allclose(np.asarray(u_rec), np.asarray(u),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pdf_i), np.asarray(pdf_s),
                               rtol=1e-4)


def test_wide1_matches_generic(key):
    """Single-slice wide-table path (the envmap case, H/W > 128) vs the
    generic binary-search path."""
    rng = np.random.default_rng(5)
    grids = rng.random((1, 200, 300)).astype(np.float32) + 1e-3
    warp = m2.build_warp2d(grids, np.array([0.0]))
    assert not m2._fast_ok(warp) and m2._wide1_ok(warp)
    u = jax.random.uniform(key, (4096, 2), minval=1e-4, maxval=1 - 1e-4)
    theta = jnp.zeros((4096,))
    pos_w, pdf_w = m2._warp_sample_wide1(warp, u)
    # generic path, forced
    import contextlib

    orig = m2._wide1_ok
    m2._wide1_ok = lambda w: False
    try:
        pos_s, pdf_s = m2.warp_sample(warp, u, theta)
    finally:
        m2._wide1_ok = orig
    np.testing.assert_allclose(np.asarray(pos_w), np.asarray(pos_s),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(pdf_w), np.asarray(pdf_s),
                               rtol=2e-4)


def test_wide1_eval_matches_generic(key):
    rng = np.random.default_rng(7)
    grids = rng.random((1, 200, 300)).astype(np.float32) + 1e-3
    warp = m2.build_warp2d(grids, np.array([0.0]))
    pos = jax.random.uniform(key, (4096, 2))
    theta = jnp.zeros((4096,))
    d_w = m2._warp_eval_wide1(warp, pos)
    orig = m2._wide1_ok
    m2._wide1_ok = lambda w: False
    try:
        d_s = m2.warp_eval(warp, pos, theta)
    finally:
        m2._wide1_ok = orig
    np.testing.assert_allclose(np.asarray(d_w), np.asarray(d_s), rtol=2e-4)
