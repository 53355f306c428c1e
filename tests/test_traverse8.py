"""Packet-traversal kernel (render/traverse8.py) parity vs the binary XLA
traversal oracle, run in Pallas interpret mode on the CPU mesh.

The two accelerators are built independently (different prim permutations),
so parity is checked on hit distances, occlusion booleans, and hit-point
reconstruction — the quantities the integrator consumes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsdf_diffusion_sampling_tpu.render import traverse8
from bsdf_diffusion_sampling_tpu.render.bvh import build_bvh, intersect, occluded
from bsdf_diffusion_sampling_tpu.render.bvh8 import build_bvh8
from bsdf_diffusion_sampling_tpu.render.mesh import (
    build_soup,
    load_serialized,
    transform_mesh,
)
from bsdf_diffusion_sampling_tpu.render.traverse8 import intersect8, occluded8

SERIALIZED = "/root/reference/rendering/matpreview/matpreview.serialized"

traverse8._INTERPRET = True


@pytest.fixture(scope="module")
def small_scene():
    mesh = transform_mesh(load_serialized(SERIALIZED, 0), np.eye(4))
    soup = build_soup([mesh], [0])
    return soup, build_bvh(soup), build_bvh8(soup)


def _rays(key, soup, n):
    k1, k2 = jax.random.split(key)
    center = jnp.asarray(soup.v0.mean(axis=0))
    dirs = jax.random.normal(k1, (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    ro = center + dirs * 2.5
    jitter = jax.random.normal(k2, (n, 3)) * 0.15
    rd = -dirs + jitter
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd


def test_bvh8_table_shapes(small_scene):
    soup, _, b8 = small_scene
    n_prims = soup.v0.shape[0]
    tab = np.asarray(b8.table)
    assert tab.shape[1] == 128
    # every tri row carries a prim id < n_prims
    prim_rows = tab[:, 9][np.any(tab[:, 0:9] != 0, axis=1) & (tab[:, 12] == 0)]
    assert b8.max_depth >= 1
    assert (b8.root_meta & 1) == 0  # root block is an inner block


def test_closest_hit_matches_binary(small_scene, key):
    soup, bvh, b8 = small_scene
    ro, rd = _rays(key, soup, 256)
    h1 = intersect(bvh, ro, rd)
    h8 = intersect8(b8, ro, rd)
    t1, t8 = np.asarray(h1.t), np.asarray(h8.t)
    hits = t1 < 1e29
    assert hits.mean() > 0.5
    assert bool(np.asarray(h8.truncated)) is False
    np.testing.assert_allclose(t8[hits], t1[hits], rtol=1e-4)
    assert (t8[~hits] > 1e29).all()


def test_hit_attributes_reconstruct_point(small_scene, key):
    soup, _, b8 = small_scene
    ro, rd = _rays(key, soup, 128)
    h8 = intersect8(b8, ro, rd)
    m = np.asarray(h8.t) < 1e29
    # reconstruct via the kernel's own tri rows: prim p -> row tri0 + p
    tab = np.asarray(b8.table)
    tri_rows = tab[b8.tri0 :]
    prim = np.asarray(h8.prim)[m]
    v0 = tri_rows[prim, 0:3]
    e1 = tri_rows[prim, 3:6]
    e2 = tri_rows[prim, 6:9]
    u = np.asarray(h8.u)[m][:, None]
    v = np.asarray(h8.v)[m][:, None]
    p_tri = v0 + u * e1 + v * e2
    p_ray = np.asarray(ro + rd * h8.t[:, None])[m]
    np.testing.assert_allclose(p_ray, p_tri, atol=2e-3)


def test_occlusion_matches_binary(small_scene, key):
    soup, bvh, b8 = small_scene
    ro, rd = _rays(key, soup, 128)
    t_max = jnp.full((128,), 6.0)
    o1 = np.asarray(occluded(bvh, ro, rd, t_max))
    o8 = np.asarray(occluded8(b8, ro, rd, t_max))
    np.testing.assert_array_equal(o8, o1)


def test_active_mask_and_tmax(small_scene, key):
    soup, bvh, b8 = small_scene
    ro, rd = _rays(key, soup, 128)
    active = jnp.arange(128) % 3 != 0
    h1 = intersect(bvh, ro, rd, active=active)
    h8 = intersect8(b8, ro, rd, active=active)
    act = np.asarray(active)
    t1, t8 = np.asarray(h1.t), np.asarray(h8.t)
    hits = (t1 < 1e29) & act
    np.testing.assert_allclose(t8[hits], t1[hits], rtol=1e-4)
    assert (t8[~act] > 1e29).all()


def test_multi_packet_sizes(small_scene, key):
    """Ray counts that are not multiples of the packet/group size pad
    correctly (content-identical results for the real rays)."""
    soup, _, b8 = small_scene
    ro, rd = _rays(key, soup, 300)
    h_full = intersect8(b8, ro, rd)
    h_head = intersect8(b8, ro[:130], rd[:130])
    np.testing.assert_allclose(
        np.asarray(h_full.t)[:130], np.asarray(h_head.t), rtol=1e-5
    )
