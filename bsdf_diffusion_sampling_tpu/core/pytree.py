"""Pytree helpers."""

from __future__ import annotations

import jax


@jax.tree_util.register_static
class Static:
    """Hashable wrapper that rides in pytree *structure* instead of being a
    traced leaf — for integer hyperparameters stored alongside weights
    (e.g. positional-encoding band counts)."""

    def __init__(self, value):
        self.value = value

    def __eq__(self, other):
        return isinstance(other, Static) and self.value == other.value

    def __hash__(self):
        return hash(("Static", self.value))

    def __repr__(self):
        return f"Static({self.value!r})"
