"""Coordinate maps between the sampling domains and cartesian directions.

Domains (matching the reference's two model families):
- "disk": outgoing direction parameterized by its projection (x, y) onto the
  unit disk; z = sqrt(1 - x^2 - y^2) recovers the upper-hemisphere direction
  (`/root/reference/learning_repo_cleanup/utils/analytical_brdf_torch.py:30-33`).
- "spherical": (theta, phi) angles; theta in [0, pi/2] for BRDFs, [0, pi]
  for transmissive BSDFs (`analytical_brdf_torch.py:6-27`).

All functions are pure jnp, batched over the leading axis, and safe under
jit/vmap/grad.
"""

from __future__ import annotations

import jax.numpy as jnp


def disk_to_cart(wo: jnp.ndarray) -> jnp.ndarray:
    """Lift (N,2) disk coordinates to (N,3) unit directions (upper hemisphere).

    z = sqrt(max(1 - r^2, 0)), mirroring the relu-sqrt of the reference
    (`analytical_brdf_torch.py:30-33`).
    """
    rr = jnp.sum(wo[..., :2] ** 2, axis=-1, keepdims=True)
    z = jnp.sqrt(jnp.maximum(1.0 - rr, 0.0))
    return jnp.concatenate([wo[..., :2], z], axis=-1)


def cart_to_disk(w: jnp.ndarray) -> jnp.ndarray:
    """Project (N,3) directions to (N,2) disk coordinates."""
    return w[..., :2]


def spher_to_cart(theta: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """(theta, phi) -> unit (N,3) direction (z = cos theta)."""
    st = jnp.sin(theta)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)], axis=-1)


def cart_to_spher(w: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """(N,3) direction -> (N,2) (theta, phi); phi in (-pi, pi].

    Matches `rendering/bsdf_myresult.py:36-40` (acos(z/(|w|+eps)), atan2).
    """
    r = jnp.linalg.norm(w, axis=-1)
    theta = jnp.arccos(jnp.clip(w[..., 2] / (r + eps), -1.0, 1.0))
    phi = jnp.arctan2(w[..., 1], w[..., 0])
    return jnp.stack([theta, phi], axis=-1)


def wrap_angle(phi: jnp.ndarray) -> jnp.ndarray:
    """Wrap angles to [-pi, pi)."""
    return jnp.mod(phi + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def shortest_arc_delta(phi_to: jnp.ndarray, phi_from: jnp.ndarray) -> jnp.ndarray:
    """Signed shortest angular difference phi_to - phi_from in [-pi, pi).

    The flow-matching target for the periodic phi axis
    (`/root/reference/learning_repo_cleanup/spherical_domain_sampling.py:62-72`
    wraps with two torch.where's; this is the closed form).
    """
    return wrap_angle(phi_to - phi_from)


def encode_spherical_x(x: jnp.ndarray) -> jnp.ndarray:
    """ODE-state encoding for spherical velocity nets.

    (theta, phi) -> (theta, sin phi, cos phi) so the network input is periodic
    in phi (`/root/reference/rendering/utils/mlp_brdf_sampling.py:119-120`).
    """
    return jnp.stack(
        [x[..., 0], jnp.sin(x[..., 1]), jnp.cos(x[..., 1])], axis=-1
    )
