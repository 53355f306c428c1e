"""Independent-implementation cross-checks (utils/reference_np.py, P23).

The reference validates its densities by maintaining numpy/torch/Stan/PyMC
implementations side by side (SURVEY.md section 4, item 4). Here the numpy
implementations are asserted allclose against the JAX modules — the
automatic version of that redundancy.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bsdf_diffusion_sampling_tpu.bsdf.analytic import (
    ggx_shading_disk,
    ggx_shading_spherical,
)
from bsdf_diffusion_sampling_tpu.bsdf.microfacet import (
    fresnel_conductor,
    ggx_d,
    ggx_smith_g1,
)
from bsdf_diffusion_sampling_tpu.geometry.coords import disk_to_cart, spher_to_cart
from bsdf_diffusion_sampling_tpu.utils import reference_np as ref


def _disk_dirs(key, n):
    u = jax.random.uniform(key, (n, 2), minval=-0.75, maxval=0.75)
    keep = (u**2).sum(-1) < 0.95
    return u[keep]


def test_coords_cross_check(key):
    w = _disk_dirs(key, 500)
    np.testing.assert_allclose(
        np.asarray(disk_to_cart(w)), ref.disk_to_cart_np(np.asarray(w)),
        rtol=1e-6, atol=1e-6,
    )
    theta = np.linspace(0.01, np.pi - 0.01, 64)
    phi = np.linspace(-np.pi, np.pi, 64)
    np.testing.assert_allclose(
        np.asarray(spher_to_cart(jnp.asarray(theta), jnp.asarray(phi))),
        ref.spher_to_cart_np(theta, phi),
        rtol=1e-6, atol=1e-6,
    )


def test_ggx_shading_cross_check(key):
    k1, k2 = jax.random.split(key)
    wi = _disk_dirs(k1, 600)
    wo = _disk_dirs(k2, 600)
    m = min(len(wi), len(wo))
    wi, wo = wi[:m], wo[:m]
    for rough in (0.1, 0.4, 0.8):
        ours = ggx_shading_disk(wi, wo, rough, f0=0.04, diffuse_prob=0.3)
        theirs = ref.ggx_shading_np(
            ref.disk_to_cart_np(np.asarray(wi)),
            ref.disk_to_cart_np(np.asarray(wo)),
            rough, f0=0.04, diffuse_prob=0.3,
        )
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-6)


def test_ggx_shading_spherical_cross_check(key):
    k1, k2 = jax.random.split(key)
    n = 400
    ti = jax.random.uniform(k1, (n,), minval=0.05, maxval=1.4)
    pi_ = jax.random.uniform(k1, (n,), minval=-3.1, maxval=3.1)
    to = jax.random.uniform(k2, (n,), minval=0.05, maxval=1.4)
    po = jax.random.uniform(k2, (n,), minval=-3.1, maxval=3.1)
    wi = jnp.stack([ti, pi_], -1)
    wo = jnp.stack([to, po], -1)
    ours = ggx_shading_spherical(wi, wo, 0.3)
    theirs = ref.ggx_shading_np(
        ref.spher_to_cart_np(np.asarray(ti), np.asarray(pi_)),
        ref.spher_to_cart_np(np.asarray(to), np.asarray(po)),
        0.3,
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-6)


def test_anisotropic_ggx_pieces_cross_check(key):
    k1, k2 = jax.random.split(key)
    n = 300
    wh = np.asarray(ref.spher_to_cart_np(
        np.random.RandomState(0).uniform(0.05, 1.5, n),
        np.random.RandomState(1).uniform(-3.1, 3.1, n),
    ), np.float32)
    w = np.asarray(ref.spher_to_cart_np(
        np.random.RandomState(2).uniform(0.05, 1.5, n),
        np.random.RandomState(3).uniform(-3.1, 3.1, n),
    ), np.float32)
    au, av = 0.2, 0.5
    np.testing.assert_allclose(
        np.asarray(ggx_d(jnp.asarray(wh), au, av)),
        ref.ggx_d_np(wh, au, av), rtol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ggx_smith_g1(jnp.asarray(w), jnp.asarray(wh), au, av)),
        ref.ggx_smith_g1_np(w, wh, au, av), rtol=2e-4, atol=1e-6,
    )
    cos_i = np.linspace(0.02, 1.0, 128, dtype=np.float32)
    ours_f = np.asarray(
        fresnel_conductor(jnp.asarray(cos_i), 0.2, 3.9)
    ).reshape(-1)  # ours carries a trailing per-channel axis
    np.testing.assert_allclose(
        ours_f, ref.fresnel_conductor_np(cos_i, 0.2, 3.9), rtol=1e-4,
    )


def test_ggx_pdf_grid_normalizes():
    g = ref.ggx_pdf_grid_np(np.asarray([0.3, 0.1], np.float32), 0.4, res=96)
    cell = (2.0 / 96) ** 2
    assert np.isclose(g.sum() * cell, 1.0, atol=1e-6)
    assert np.all(g >= 0)
