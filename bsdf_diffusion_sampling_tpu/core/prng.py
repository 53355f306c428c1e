"""PRNG discipline.

The reference seeds torch/np globally and increments an integer seed per
render pass (`/root/reference/rendering/brdf_measured_disk.py:149-155`).
Here everything flows from `jax.random` keys: one root key per run, folded
deterministically per (stage, iteration, device) so multi-chip runs are
reproducible regardless of mesh shape.
"""

from __future__ import annotations

import jax


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def stage_key(key: jax.Array, stage: str) -> jax.Array:
    """Deterministic per-stage stream, independent of call order."""
    h = hash(stage) & 0x7FFFFFFF
    return jax.random.fold_in(key, h)


def iter_key(key: jax.Array, iteration) -> jax.Array:
    return jax.random.fold_in(key, iteration)
