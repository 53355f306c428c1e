"""Tabulated inverse-CDF sampling (data/tabulated.py + native samplewi).

Validation mirrors the reference's own hand-run checks
(`utils_sampling_torch_brdf.py:365-388`: histogram vs analytic pdf grid),
made automatic: chi-square/KL of sampled histograms against the tabulated
density, device-vs-native distribution agreement, pdf normalization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsdf_diffusion_sampling_tpu.data.tabulated import (
    Tabulated2D,
    build_tabulated,
    domain_grid,
    online_sampling,
    sample_tabulated,
    tabulated_pdf,
)
from bsdf_diffusion_sampling_tpu.native.samplewilib import samplewi_native


def _gauss_vertices(domain, res, mu, sig):
    grid = np.asarray(domain_grid(domain, res))
    d2 = ((grid - np.asarray(mu)) ** 2).sum(-1)
    return jnp.asarray(np.exp(-d2 / (2 * sig**2)).reshape(1, res + 1, res + 1))


def test_tabulated_pdf_normalizes(key):
    res = 64
    tab = build_tabulated(_gauss_vertices("hemisphere", res, [0.7, 0.3], 0.3),
                          "hemisphere")
    # integral of tabulated_pdf over the rectangle = sum(pmf) = 1
    assert np.isclose(float(tab.pmf.sum()), 1.0, atol=1e-5)
    x = sample_tabulated(key, tab, 4096)
    assert x.shape == (1, 4096, 2)
    # samples stay inside the domain rectangle
    assert float(x[..., 0].min()) >= 0.0 and float(x[..., 0].max()) <= np.pi / 2
    assert float(x[..., 1].min()) >= -np.pi and float(x[..., 1].max()) <= np.pi
    p = tabulated_pdf(tab, x)
    assert bool(jnp.all(p > 0))


def test_sampler_histogram_matches_density(key):
    res = 32
    tab = build_tabulated(_gauss_vertices("disk", res, [0.2, -0.1], 0.25), "disk")
    n = 1 << 16
    x = np.asarray(sample_tabulated(key, tab, n))[0]
    hist, _, _ = np.histogram2d(x[:, 0], x[:, 1], bins=res, range=[[-1, 1], [-1, 1]])
    q = hist / hist.sum()
    p = np.asarray(tab.pmf[0])
    mask = p > p.max() * 1e-4
    kl = float(np.sum(p[mask] * np.log((p[mask] + 1e-12) / (q[mask] + 1e-12))))
    # purely statistical gap: ~nbins/2N plus fp32 cdf rounding in the tail
    assert kl < 0.05, kl


def test_disk_mask_zeroes_outside(key):
    res = 32
    flat = jnp.ones((1, res + 1, res + 1))
    tab = build_tabulated(flat, "disk")
    x = np.asarray(sample_tabulated(key, tab, 8192))[0]
    # all cell centers outside r^2>0.995 are masked; a sample can overshoot
    # by at most half a cell diagonal past the unit circle
    r_max = np.sqrt(0.995) + np.sqrt(2.0) / res
    r2 = (x**2).sum(-1)
    assert np.all(r2 < r_max**2 + 1e-6), r2.max()


def test_native_matches_device_distribution(key):
    res = 48
    vert = _gauss_vertices("disk", res, [-0.3, 0.4], 0.35)
    tab = build_tabulated(vert, "disk")
    n = 1 << 15

    x_dev = np.asarray(sample_tabulated(key, tab, n))[0]
    x_nat = samplewi_native(np.asarray(tab.pmf), n, seed=7)[0]
    # same distribution: compare histograms of the two samplers
    h_dev, _, _ = np.histogram2d(x_dev[:, 0], x_dev[:, 1], bins=16,
                                 range=[[-1, 1], [-1, 1]])
    h_nat, _, _ = np.histogram2d(x_nat[:, 0], x_nat[:, 1], bins=16,
                                 range=[[-1, 1], [-1, 1]])
    p = h_dev / h_dev.sum()
    q = h_nat / h_nat.sum()
    # expected statistical L1 between two 32k-sample histograms over 256
    # bins is ~0.08; systematic disagreement would be O(1)
    l1 = np.abs(p - q).sum()
    assert l1 < 0.15, l1
    assert np.allclose(x_dev.mean(0), x_nat.mean(0), atol=0.02)


def test_native_zero_row_raises():
    pdf = np.zeros((1, 16 * 16), np.float32)
    with pytest.raises(ValueError, match="zero"):
        samplewi_native(pdf, 8)


def test_online_sampling_end_to_end(key):
    """Dataset generation from an analytic GGX-like density: the generated
    (wi, wo) pairs must concentrate where the density is high."""

    def pdf_fn(wi, wo):
        # mirror-lobe toy density on the disk: peak at wo == -wi
        d2 = ((wo + wi) ** 2).sum(-1)
        return jnp.exp(-d2 / 0.05)

    omega_i, omega_o = online_sampling(pdf_fn, "disk", key, n_wi=8,
                                       n_samples_per_wi=2048, res=64)
    assert omega_i.shape == omega_o.shape == (8 * 2048, 2)
    d2 = np.asarray(((omega_o + omega_i) ** 2).sum(-1))
    # ~all mass within a few sigma of the lobe center
    assert np.mean(d2 < 0.05 * 9) > 0.95
