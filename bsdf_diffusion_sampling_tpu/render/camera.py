"""Perspective camera + film sampling.

Equivalent of the reference's sensor setup: perspective lookat camera with
fov on the smaller axis, independent sampler, hdrfilm with a gaussian
reconstruction filter (`/root/reference/rendering/matpreview/
scene_measured.xml:12-31`; ray-gen semantics from
`rendering/utils/mitsuba_helper.py:60-136`).

The gaussian filter is applied by *filter importance sampling*: pixel
offsets are drawn from a truncated gaussian (stddev 0.5, radius 2 — the
Mitsuba defaults), so every sample splats with weight 1 and the film is a
plain masked average — no splat-weight atomics, which keeps film
accumulation a single segment-sum on TPU.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Camera(NamedTuple):
    origin: jnp.ndarray  # (3,)
    right: jnp.ndarray  # (3,) scaled by tan(fov/2) * aspect
    up: jnp.ndarray  # (3,) scaled by tan(fov/2)
    forward: jnp.ndarray  # (3,) unit
    width: int
    height: int

    @property
    def vectors(self) -> jnp.ndarray:
        """(4, 3) [origin, right, up, forward] — the traced-array half of
        the camera, so jitted code can take it as a pytree leaf while
        width/height stay static."""
        return jnp.stack([self.origin, self.right, self.up, self.forward])


def make_camera(
    origin, target, up, fov_deg: float, width: int, height: int
) -> Camera:
    o = np.asarray(origin, np.float64)
    fwd = np.asarray(target, np.float64) - o
    fwd /= np.linalg.norm(fwd)
    r = np.cross(fwd, np.asarray(up, np.float64))
    r /= np.linalg.norm(r)
    u = np.cross(r, fwd)
    tan_half = np.tan(np.deg2rad(fov_deg) / 2.0)
    aspect = width / height
    # fov applies to the smaller axis (fov_axis="smaller")
    if width <= height:
        r_scale, u_scale = tan_half, tan_half * height / width
    else:
        r_scale, u_scale = tan_half * aspect, tan_half
    return Camera(
        origin=jnp.asarray(o, jnp.float32),
        right=jnp.asarray(r * r_scale, jnp.float32),
        up=jnp.asarray(u * u_scale, jnp.float32),
        forward=jnp.asarray(fwd, jnp.float32),
        width=width,
        height=height,
    )


def _truncated_gaussian(key, shape, stddev=0.5, radius=2.0):
    """Box-Muller gaussian folded back into [-radius, radius]."""
    u = jax.random.uniform(key, shape + (2,), minval=1e-7, maxval=1.0)
    r = stddev * jnp.sqrt(-2.0 * jnp.log(u[..., 0]))
    phi = 2.0 * jnp.pi * u[..., 1]
    g = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)
    return jnp.clip(g, -radius, radius)


def generate_rays(
    cam_vectors: jnp.ndarray, width: int, height: int, key: jax.Array,
    spp_chunk: int, row0: int = 0, rows: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One sample per pixel per call (pass a fresh key per spp pass, the
    reference's seed-increment loop, `brdf_measured_disk.py:149-155`).

    cam_vectors: Camera.vectors (4, 3). Returns (ro, rd, pixel_index),
    each (W*rows*spp_chunk, ...). `row0`/`rows` select a horizontal film
    tile, so huge frames can render in bounded wavefronts; `rows` is
    static (it sets shapes) but `row0` may be a traced scalar — all tiles
    of a frame share one executable. pixel_index stays global so tiles
    splat into the same film.
    """
    origin, right, up, forward = cam_vectors
    w, h = width, height
    rows = h if rows is None else rows
    n = w * rows * spp_chunk
    px = jnp.tile(jnp.arange(rows * w, dtype=jnp.int32), spp_chunk) + (
        jnp.asarray(row0, jnp.int32) * w
    )
    x = (px % w).astype(jnp.float32)
    y = (px // w).astype(jnp.float32)
    jit = _truncated_gaussian(key, (n,))
    sx = (x + 0.5 + jit[:, 0]) / w * 2.0 - 1.0
    sy = (y + 0.5 + jit[:, 1]) / h * 2.0 - 1.0
    d = forward[None, :] + sx[:, None] * right[None, :] - sy[:, None] * up[None, :]
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ro = jnp.broadcast_to(origin, d.shape)
    return ro, d, px


def accumulate_film(
    pixel_index: jnp.ndarray, radiance: jnp.ndarray, width: int, height: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Segment-sum samples into an (H, W, 3) film + per-pixel counts."""
    img = jax.ops.segment_sum(radiance, pixel_index, num_segments=width * height)
    cnt = jax.ops.segment_sum(
        jnp.ones(pixel_index.shape[0], jnp.float32), pixel_index,
        num_segments=width * height,
    )
    return img.reshape(height, width, 3), cnt.reshape(height, width)
