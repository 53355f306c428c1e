"""Anisotropic measured-BSDF support (VERDICT r3 item 8).

No shipped .bsdf exercises |phi_i| > 1, so the tensors are synthesized:
(a) an aniso file whose phi slices are identical must reproduce the
isotropic evaluator exactly; (b) a genuinely varying file must stay
self-consistent (pdf(sample) == sample pdf; invert(sample) round-trips)
and actually respond to phi_i.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsdf_diffusion_sampling_tpu.bsdf import measured as me
from bsdf_diffusion_sampling_tpu.bsdf.tensorfile import read_tensor_file

PATH = "/root/reference/rendering/measuredbsdfs/chm_mint_rgb.bsdf"


@pytest.fixture(scope="module")
def tensors():
    return read_tensor_file(PATH)


def _aniso_from(tf, pp=3, perturb=0.0):
    """Stack pp phi_i slices of the isotropic tables, optionally scaled
    per-slice so the material genuinely varies with phi_i."""
    phi = np.linspace(-np.pi, np.pi, pp).astype(np.float32)
    scale = 1.0 + perturb * np.arange(pp, dtype=np.float32)[:, None, None, None]
    tf2 = dict(tf.fields)
    tf2["phi_i"] = phi
    tf2["vndf"] = np.repeat(np.asarray(tf["vndf"]), pp, axis=0) * scale
    tf2["luminance"] = np.repeat(np.asarray(tf["luminance"]), pp, axis=0) * scale
    tf2["rgb"] = np.repeat(np.asarray(tf["rgb"]), pp, axis=0) * scale[..., None]
    return me.measured_from_tensors(tf2, name="synth_aniso")


def _dirs(key, n=1024):
    u = jax.random.uniform(key, (n, 2))
    ct = 0.1 + 0.85 * u[:, 0]
    st = jnp.sqrt(1 - ct**2)
    phi = u[:, 1] * 2 * jnp.pi
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], -1)


def test_identical_slices_reduce_to_isotropic(tensors, key):
    iso = me.measured_from_tensors(tensors, name="iso")
    ani = _aniso_from(tensors, pp=3, perturb=0.0)
    assert ani.phi_i_grid is not None
    wi = _dirs(key)
    wo = _dirs(jax.random.fold_in(key, 1))
    np.testing.assert_allclose(
        np.asarray(me.eval_brdf(ani, wi, wo)),
        np.asarray(me.eval_brdf(iso, wi, wo)), rtol=2e-4, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(me.pdf_brdf(ani, wi, wo)),
        np.asarray(me.pdf_brdf(iso, wi, wo)), rtol=2e-4, atol=1e-8)
    u = jax.random.uniform(jax.random.fold_in(key, 2), (1024, 2),
                           minval=1e-4, maxval=1 - 1e-4)
    wo_a, pdf_a = me.sample_brdf(ani, u, wi)
    wo_i, pdf_i = me.sample_brdf(iso, u, wi)
    np.testing.assert_allclose(np.asarray(wo_a), np.asarray(wo_i),
                               rtol=1e-4, atol=1e-5)
    # the 4-slice blend reassociates fp sums vs the 2-slice blend, which
    # can flip a cell-search tie for a handful of boundary draws — compare
    # in quantiles (p99 tight, worst case bounded)
    pa, pi2 = np.asarray(pdf_a), np.asarray(pdf_i)
    valid = pi2 > 0  # invalid draws carry pdf 0 on both paths
    np.testing.assert_array_equal(pa > 0, valid)
    rel = np.abs(pa[valid] / pi2[valid] - 1)
    assert np.quantile(rel, 0.99) < 2e-4, np.quantile(rel, 0.99)
    assert rel.max() < 0.05, rel.max()


def test_varying_slices_self_consistent(tensors, key):
    ani = _aniso_from(tensors, pp=4, perturb=0.6)
    wi = _dirs(key)
    u = jax.random.uniform(jax.random.fold_in(key, 3), (1024, 2),
                           minval=1e-3, maxval=1 - 1e-3)
    wo, pdf_s = me.sample_brdf(ani, u, wi)
    ok = np.asarray(pdf_s) > 1e-5
    assert ok.mean() > 0.8
    pdf_q = np.asarray(me.pdf_brdf(ani, wi, wo))
    rel = np.abs(pdf_q[ok] / np.asarray(pdf_s)[ok] - 1.0)
    assert np.median(rel) < 2e-3, np.median(rel)
    f = np.asarray(me.eval_brdf(ani, wi, wo))
    assert np.isfinite(f).all() and (f >= 0).all()


def test_varying_slices_respond_to_phi(tensors, key):
    """Rotating wi in azimuth must change the result when slices differ
    (and must NOT when they are identical)."""
    ani = _aniso_from(tensors, pp=4, perturb=0.6)
    iso_like = _aniso_from(tensors, pp=4, perturb=0.0)
    n = 512
    ct = jnp.full((n,), 0.7)
    st = jnp.sqrt(1 - ct**2)
    phi1 = jnp.zeros((n,))
    phi2 = jnp.full((n,), 2.0)

    def mk(phi):
        return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], -1)

    # same RELATIVE wo geometry for both phis (rotate wo with wi)
    dphi = 0.3
    wo1 = jnp.stack([st * jnp.cos(phi1 + dphi), st * jnp.sin(phi1 + dphi), ct], -1)
    wo2 = jnp.stack([st * jnp.cos(phi2 + dphi), st * jnp.sin(phi2 + dphi), ct], -1)
    e1 = np.asarray(me.eval_brdf(ani, mk(phi1), wo1))
    e2 = np.asarray(me.eval_brdf(ani, mk(phi2), wo2))
    assert np.abs(e1 - e2).max() > 1e-4  # phi_i dependence is real
    i1 = np.asarray(me.eval_brdf(iso_like, mk(phi1), wo1))
    i2 = np.asarray(me.eval_brdf(iso_like, mk(phi2), wo2))
    np.testing.assert_allclose(i1, i2, rtol=2e-4, atol=1e-8)
