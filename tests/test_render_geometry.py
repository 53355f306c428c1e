"""Mesh loading + BVH traversal correctness.

BVH closest-hit must agree with brute-force Möller-Trumbore over all
triangles — checked on the real matpreview geometry (small shape) and on
random soups.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsdf_diffusion_sampling_tpu.render.bvh import build_bvh, intersect, occluded
from bsdf_diffusion_sampling_tpu.render.mesh import (
    build_soup,
    load_serialized,
    transform_mesh,
)

SERIALIZED = "/root/reference/rendering/matpreview/matpreview.serialized"


def test_load_serialized_shapes():
    for i, (vc, fc) in enumerate([(289, 512), (2078, 3936), (29439, 57152)]):
        m = load_serialized(SERIALIZED, i)
        assert m.positions.shape == (vc, 3)
        assert m.faces.shape == (fc, 3)
        assert m.normals is not None and m.uvs is not None
        assert np.isfinite(m.positions).all()
        assert m.faces.max() < vc


def test_bad_shape_index():
    with pytest.raises(IndexError):
        load_serialized(SERIALIZED, 7)


def _brute_force(soup, ro, rd):
    v0 = jnp.asarray(soup.v0)[None]
    e1 = jnp.asarray(soup.e1)[None]
    e2 = jnp.asarray(soup.e2)[None]
    ro_, rd_ = ro[:, None], rd[:, None]
    p = jnp.cross(rd_, e2)
    det = jnp.sum(e1 * p, axis=-1)
    inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    s = ro_ - v0
    u = jnp.sum(s * p, axis=-1) * inv
    q = jnp.cross(s, e1)
    v = jnp.sum(rd_ * q, axis=-1) * inv
    t = jnp.sum(e2 * q, axis=-1) * inv
    ok = (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4)
    t = jnp.where(ok, t, 1e30)
    return jnp.min(t, axis=-1)


def test_bvh_matches_brute_force_matpreview(key):
    mesh = transform_mesh(load_serialized(SERIALIZED, 1), np.eye(4))
    soup = build_soup([mesh], [0])
    bvh = build_bvh(soup)
    n = 512
    k1, k2 = jax.random.split(key)
    # rays from a sphere around the object, pointed inward with jitter
    center = jnp.asarray(soup.v0.mean(axis=0))
    dirs = jax.random.normal(k1, (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    ro = center + dirs * 3.0
    jitter = jax.random.normal(k2, (n, 3)) * 0.1
    rd = -dirs + jitter
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    hit = intersect(bvh, ro, rd)
    t_ref = _brute_force(soup, ro, rd)
    hit_mask = np.asarray(t_ref) < 1e29
    assert hit_mask.mean() > 0.5  # rays actually hit the object
    np.testing.assert_allclose(
        np.asarray(hit.t)[hit_mask], np.asarray(t_ref)[hit_mask], rtol=1e-4
    )
    # misses agree too
    assert (np.asarray(hit.t)[~hit_mask] > 1e29).all()


def test_occlusion(key):
    mesh = transform_mesh(load_serialized(SERIALIZED, 1), np.eye(4))
    soup = build_soup([mesh], [0])
    bvh = build_bvh(soup)
    center = jnp.asarray(soup.v0.mean(axis=0))
    n = 128
    dirs = jax.random.normal(key, (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    ro = center + dirs * 3.0
    # towards center: occluded; away: clear
    occ_in = occluded(bvh, ro, -dirs, jnp.full((n,), 6.0))
    occ_out = occluded(bvh, ro, dirs, jnp.full((n,), 6.0))
    assert np.asarray(occ_in).mean() > 0.9
    assert not np.asarray(occ_out).any()


def test_bvh_hit_attributes(key):
    """Barycentrics + prim index reconstruct the hit point."""
    mesh = transform_mesh(load_serialized(SERIALIZED, 0), np.eye(4))
    soup = build_soup([mesh], [0])
    bvh = build_bvh(soup)
    center = jnp.asarray(soup.v0.mean(axis=0)) + jnp.array([0.0, 0.0, 0.0])
    n = 256
    dirs = jax.random.normal(key, (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    ro = center + dirs * 2.0
    rd = -dirs
    hit = intersect(bvh, ro, rd)
    m = np.asarray(hit.t) < 1e29
    p_ray = np.asarray(ro + rd * hit.t[:, None])[m]
    v0 = np.asarray(bvh.v0)[np.asarray(hit.prim)[m]]
    e1 = np.asarray(bvh.e1)[np.asarray(hit.prim)[m]]
    e2 = np.asarray(bvh.e2)[np.asarray(hit.prim)[m]]
    u = np.asarray(hit.u)[m][:, None]
    v = np.asarray(hit.v)[m][:, None]
    p_tri = v0 + u * e1 + v * e2
    np.testing.assert_allclose(p_ray, p_tri, atol=2e-3)
