"""Stratified / low-discrepancy samplers over the conditioning domains.

JAX re-designs of the torch helpers in
`/root/reference/learning_repo_cleanup/utils/utils_sampling_torch_disk.py`:
- `stratified_sampling_2d` (:79-97): jittered lattice over [0,1)^2,
- `stratified_sample_wo` (:99-114): Shirley concentric square->disk map.

Unlike the reference (whose lattice side is found by a python while-loop and
whose permutation/jitter use global torch RNG), these take explicit keys and
static sample counts so they trace once under jit.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def stratified_sampling_2d(key: jax.Array, n: int) -> jnp.ndarray:
    """Jittered-lattice stratified samples over [0,1)^2, shape (n, 2).

    The lattice is the smallest side*side >= n grid; cells are randomly
    permuted and the first n are jittered (semantics of
    `utils_sampling_torch_disk.py:79-97`).
    """
    side = math.isqrt(n)
    if side * side < n:
        side += 1
    k_perm, k_jit = jax.random.split(key)
    us = jnp.arange(side, dtype=jnp.float32) / side
    u, v = jnp.meshgrid(us, us, indexing="ij")
    uv = jnp.stack([u.ravel(), v.ravel()], axis=-1)
    uv = jax.random.permutation(k_perm, uv, axis=0)[:n]
    jitter = jax.random.uniform(k_jit, (n, 2)) / side
    return uv + jitter


def concentric_square_to_disk(uv: jnp.ndarray) -> jnp.ndarray:
    """Shirley's low-distortion concentric map [-1,1]^2 -> unit disk.

    Branch-free jnp.where port of the masked torch version
    (`utils_sampling_torch_disk.py:99-114`).
    """
    x, y = uv[..., 0], uv[..., 1]
    zero = (x == 0) & (y == 0)
    # Avoid 0/0 in the unused branch.
    safe_x = jnp.where(x == 0, 1.0, x)
    safe_y = jnp.where(y == 0, 1.0, y)
    use_x = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(use_x, x, y)
    a = (jnp.pi / 4.0) * (y / safe_x)
    b = (jnp.pi / 2.0) - (jnp.pi / 4.0) * (x / safe_y)
    theta = jnp.where(use_x, a, b)
    out = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
    return jnp.where(zero[..., None], 0.0, out)


def stratified_disk(key: jax.Array, n: int) -> jnp.ndarray:
    """Stratified points on the unit disk (concentric map of a jittered
    lattice) — omega_i/omega_o proposal distribution for disk-domain
    pipelines (`utils_sampling_torch_disk.py:99-114`)."""
    return concentric_square_to_disk(stratified_sampling_2d(key, n) * 2.0 - 1.0)


def stratified_hemisphere_angles(key: jax.Array, n: int, theta_max: float = jnp.pi / 2) -> jnp.ndarray:
    """Stratified (theta, phi) with theta in [0, theta_max), phi in [-pi, pi).

    Uniform in angle space — the proposal the reference uses for spherical
    pipelines (`learning_repo_cleanup/spherical_domain_sampling.py:173-175`).
    Pass theta_max=pi for the full-sphere BSDF variant
    (`bsdf_correct_sampling.py:173-175`).
    """
    uv = stratified_sampling_2d(key, n)
    theta = uv[:, 0] * theta_max
    phi = uv[:, 1] * 2.0 * jnp.pi - jnp.pi
    return jnp.stack([theta, phi], axis=-1)
