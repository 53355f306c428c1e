"""Diffuse (Lambertian) BSDF + checkerboard texture + shading frames.

The two non-neural materials of the matpreview scene: a 0.18-gray diffuse
interior and a checkerboard-textured diffuse ground plane
(`/root/reference/rendering/matpreview/scene_measured.xml:45-61`).
Cosine-weighted hemisphere sampling; all functions in the local shading
frame (n = +z) like the bsdf/ evaluators.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def make_frame(n: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Orthonormal tangent/bitangent for unit normals (Duff et al. 2017,
    branchless)."""
    z = n[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + sign * n[..., 0] ** 2 * a, sign * b, -sign * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, sign + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return t, bt


def to_local(n, t, bt, w_world):
    return jnp.stack(
        [
            jnp.sum(w_world * t, axis=-1),
            jnp.sum(w_world * bt, axis=-1),
            jnp.sum(w_world * n, axis=-1),
        ],
        axis=-1,
    )


def to_world(n, t, bt, w_local):
    return (
        w_local[..., 0:1] * t + w_local[..., 1:2] * bt + w_local[..., 2:3] * n
    )


def cosine_sample(key: jax.Array, shape) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cosine-weighted hemisphere directions + pdf."""
    u = jax.random.uniform(key, shape + (2,))
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u[..., 0], 1e-9))
    return jnp.stack([x, y, z], axis=-1), z / jnp.pi


def diffuse_eval(albedo: jnp.ndarray, wo_local: jnp.ndarray) -> jnp.ndarray:
    """f * cos_o (Mitsuba eval convention) for upper-hemisphere wo."""
    cos_o = jnp.maximum(wo_local[..., 2], 0.0)
    return albedo * (cos_o / jnp.pi)[..., None]


def diffuse_pdf(wo_local: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(wo_local[..., 2], 0.0) / jnp.pi


def checkerboard(uv: jnp.ndarray, color0=0.4, color1=0.2, scale=8.0) -> jnp.ndarray:
    """Mitsuba checkerboard: to_uv scale, color0 on even parity
    (`scene_measured.xml:52-58`)."""
    st = jnp.floor(uv * scale).astype(jnp.int32)
    even = (st[..., 0] + st[..., 1]) % 2 == 0
    v = jnp.where(even, color0, color1)
    return jnp.stack([v, v, v], axis=-1)
