"""Environment-map emitter: lat-long eval, importance sampling, pdf.

Replaces Mitsuba's `envmap` plugin for the matpreview scenes
(`/root/reference/rendering/matpreview/scene_measured.xml:36-43`: an EXR in
lat-long parameterization with a to_world rotation and a scalar intensity
scale). Directions map to texture coordinates in env-local space with Y up:
u = (1 + atan2(x, -z)/pi)/2, v = acos(clamp(y))/pi — Mitsuba's convention,
so the same scene XML produces the same orientation.

Importance sampling reuses the framework's Marginal2D warp (one parameter
slice) over the luminance * sin(theta) grid; sample()/pdf() agree by
construction, which is all MIS needs.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from bsdf_diffusion_sampling_tpu.bsdf.marginal2d import (
    Warp2D,
    build_warp2d,
    warp_eval,
    warp_sample,
)
from bsdf_diffusion_sampling_tpu.native.exr import read_exr


class EnvMap(NamedTuple):
    data: jnp.ndarray  # (H, W, 3) radiance (already scaled)
    warp: Warp2D  # sampling distribution over (u, v)
    to_world: jnp.ndarray  # (3, 3) rotation env->world
    to_local: jnp.ndarray  # (3, 3) world->env
    # x-adjacent texel pairs, (H, W, 6): [c(y,x), c(y,x+1 clamped)] — one
    # row gather serves both x-corners of the bilinear fetch (TPU gathers
    # are row-count bound), so eval_env costs 2 gathered rows instead of 4
    data_pairs: jnp.ndarray | None = None


def envmap_from_image(img: np.ndarray, to_world: np.ndarray | None = None) -> EnvMap:
    h, w, _ = img.shape
    # pure numpy here: eager jnp ops on the tunneled-TPU backend pay
    # seconds-per-op transfer penalties for this array layout
    lum = np.maximum(
        0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2], 1e-8
    )
    theta = (np.arange(h) + 0.5) / h * np.pi
    grid = lum * np.sin(theta)[:, None]
    warp = build_warp2d(grid[None], np.array([0.0]))
    r = np.eye(3, dtype=np.float32) if to_world is None else to_world[:3, :3]
    img32 = np.asarray(img, np.float32)
    pairs = np.concatenate(
        [img32, img32[:, np.minimum(np.arange(w) + 1, w - 1)]], axis=-1
    )
    return EnvMap(
        data=jnp.asarray(img),
        warp=warp,
        to_world=jnp.asarray(r, jnp.float32),
        to_local=jnp.asarray(np.linalg.inv(r), jnp.float32),
        data_pairs=jnp.asarray(pairs),
    )


def load_envmap(path: str, to_world: np.ndarray | None = None, scale: float = 1.0) -> EnvMap:
    return envmap_from_image(read_exr(path) * scale, to_world)


def black_envmap() -> EnvMap:
    """Zero-radiance placeholder for scenes lit only by point lights
    (`disney_bsdf_array0_pointlight.xml:384`): eval returns 0, the NEE
    envmap branch contributes nothing, and the integrator needs no
    structural changes."""
    return envmap_from_image(np.zeros((2, 4, 3), np.float32))


def _dir_to_uv(d_local: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    x, y, z = d_local[..., 0], d_local[..., 1], d_local[..., 2]
    u = (1.0 + jnp.arctan2(x, -z) / jnp.pi) * 0.5
    v = jnp.arccos(jnp.clip(y, -1.0, 1.0)) / jnp.pi
    return u, v


def _uv_to_dir(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    phi = (2.0 * u - 1.0) * jnp.pi
    theta = v * jnp.pi
    st = jnp.sin(theta)
    return jnp.stack([st * jnp.sin(phi), jnp.cos(theta), -st * jnp.cos(phi)], axis=-1)


def eval_env(env: EnvMap, d_world: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) radiance arriving from direction d (pointing away from the
    shading point, world space)."""
    d_local = d_world @ env.to_local.T
    u, v = _dir_to_uv(d_local)
    h, w, _ = env.data.shape
    x = jnp.clip(u * w - 0.5, 0.0, w - 1 - 1e-3)
    y = jnp.clip(v * h - 0.5, 0.0, h - 1 - 1e-3)
    x0 = x.astype(jnp.int32)
    y0 = y.astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    if env.data_pairs is not None:
        lo = env.data_pairs[y0, x0]  # (N, 6): c(y0,x0) | c(y0,x0+1)
        hi = env.data_pairs[jnp.minimum(y0 + 1, h - 1), x0]
        row_lo = lo[..., 0:3] * (1 - fx) + lo[..., 3:6] * fx
        row_hi = hi[..., 0:3] * (1 - fx) + hi[..., 3:6] * fx
        return row_lo * (1 - fy) + row_hi * fy
    c00 = env.data[y0, x0]
    c01 = env.data[y0, jnp.minimum(x0 + 1, w - 1)]
    c10 = env.data[jnp.minimum(y0 + 1, h - 1), x0]
    c11 = env.data[jnp.minimum(y0 + 1, h - 1), jnp.minimum(x0 + 1, w - 1)]
    return (
        c00 * (1 - fx) * (1 - fy)
        + c01 * fx * (1 - fy)
        + c10 * (1 - fx) * fy
        + c11 * fx * fy
    )


def _uv_pdf_to_solid_angle(pdf_uv: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    sin_theta = jnp.maximum(jnp.sin(v * jnp.pi), 1e-6)
    return pdf_uv / (2.0 * jnp.pi * jnp.pi * sin_theta)


def sample_env(env: EnvMap, u2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """u2 (N, 2) uniforms -> (d_world, radiance, pdf_solid_angle)."""
    theta0 = jnp.zeros(u2.shape[:-1], jnp.float32)
    pos, pdf_uv = warp_sample(env.warp, u2, theta0)
    d_local = _uv_to_dir(pos[..., 0], pos[..., 1])
    d_world = d_local @ env.to_world.T
    pdf = _uv_pdf_to_solid_angle(pdf_uv, pos[..., 1])
    return d_world, eval_env(env, d_world), pdf


def pdf_env(env: EnvMap, d_world: jnp.ndarray) -> jnp.ndarray:
    """Solid-angle pdf that sample_env draws direction d."""
    d_local = d_world @ env.to_local.T
    u, v = _dir_to_uv(d_local)
    pos = jnp.stack([u, v], axis=-1)
    theta0 = jnp.zeros(u.shape, jnp.float32)
    pdf_uv = warp_eval(env.warp, pos, theta0)
    return _uv_pdf_to_solid_angle(pdf_uv, v)
