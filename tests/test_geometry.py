import jax
import jax.numpy as jnp
import numpy as np

from bsdf_diffusion_sampling_tpu.geometry import (
    cart_to_spher,
    concentric_square_to_disk,
    disk_to_cart,
    spher_to_cart,
    stratified_disk,
    stratified_sampling_2d,
)
from bsdf_diffusion_sampling_tpu.geometry.coords import (
    encode_spherical_x,
    shortest_arc_delta,
    wrap_angle,
)


def test_disk_to_cart_unit_norm(key):
    w2 = jax.random.uniform(key, (1000, 2), minval=-0.7, maxval=0.7)
    w3 = disk_to_cart(w2)
    np.testing.assert_allclose(np.linalg.norm(w3, axis=-1), 1.0, atol=1e-6)
    assert (w3[:, 2] >= 0).all()


def test_disk_to_cart_outside_disk_clamps():
    w2 = jnp.array([[0.9, 0.9]])
    w3 = disk_to_cart(w2)
    assert w3[0, 2] == 0.0


def test_spher_cart_roundtrip(key):
    k1, k2 = jax.random.split(key)
    theta = jax.random.uniform(k1, (500,), minval=0.01, maxval=jnp.pi - 0.01)
    phi = jax.random.uniform(k2, (500,), minval=-jnp.pi + 0.01, maxval=jnp.pi - 0.01)
    w = spher_to_cart(theta, phi)
    tp = cart_to_spher(w)
    np.testing.assert_allclose(tp[:, 0], theta, atol=1e-4)
    np.testing.assert_allclose(tp[:, 1], phi, atol=1e-4)


def test_wrap_angle():
    np.testing.assert_allclose(wrap_angle(jnp.array(3 * jnp.pi / 2)), -jnp.pi / 2, atol=1e-6)
    np.testing.assert_allclose(
        shortest_arc_delta(jnp.array(3.0), jnp.array(-3.0)), 3.0 - (-3.0) - 2 * np.pi, atol=1e-6
    )


def test_stratified_2d_in_unit_square(key):
    s = stratified_sampling_2d(key, 1000)
    assert s.shape == (1000, 2)
    assert (s >= 0).all() and (s <= 1.0 + 1e-6).all()
    # stratification: mean close to 0.5 with tiny variance of the mean
    np.testing.assert_allclose(s.mean(axis=0), 0.5, atol=0.02)


def test_concentric_map_in_disk(key):
    uv = jax.random.uniform(key, (2000, 2), minval=-1, maxval=1)
    d = concentric_square_to_disk(uv)
    assert (jnp.sum(d**2, axis=-1) <= 1.0 + 1e-6).all()
    # origin maps to origin
    np.testing.assert_allclose(concentric_square_to_disk(jnp.zeros((1, 2))), 0.0)


def test_concentric_map_is_area_preserving(key):
    # uniform on square -> uniform on disk: radial CDF of r^2 is uniform
    uv = jax.random.uniform(key, (20000, 2), minval=-1, maxval=1)
    d = concentric_square_to_disk(uv)
    r2 = np.asarray(jnp.sum(d**2, axis=-1))
    hist, _ = np.histogram(r2, bins=10, range=(0, 1))
    np.testing.assert_allclose(hist / len(r2), 0.1, atol=0.01)


def test_stratified_disk(key):
    d = stratified_disk(key, 4096)
    assert (jnp.sum(d**2, axis=-1) <= 1.0 + 1e-6).all()


def test_encode_spherical_x():
    x = jnp.array([[0.3, 2.0]])
    e = encode_spherical_x(x)
    np.testing.assert_allclose(e, [[0.3, np.sin(2.0), np.cos(2.0)]], rtol=1e-6)
