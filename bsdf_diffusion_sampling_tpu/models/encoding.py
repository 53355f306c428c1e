"""NeRF-style frequency encoding.

Equivalent of `positional_encoding_1`
(`/root/reference/learning_repo_cleanup/utils/model.py:9-57`): log-sampled
frequency bands 2^0..2^(B-1), sin/cos per band, input included first.
Output layout is [x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...] with
each term spanning the input feature dim — identical column order to the
reference so trained weights are interchangeable.
"""

from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(x: jnp.ndarray, num_bands: int, include_input: bool = True) -> jnp.ndarray:
    if num_bands == 0:
        return x
    freqs = 2.0 ** jnp.arange(num_bands, dtype=x.dtype)
    parts = [x] if include_input else []
    for i in range(num_bands):
        parts.append(jnp.sin(x * freqs[i]))
        parts.append(jnp.cos(x * freqs[i]))
    return jnp.concatenate(parts, axis=-1)


def encoded_dim(in_dim: int, num_bands: int, include_input: bool = True) -> int:
    return in_dim * (2 * num_bands + (1 if include_input else 0))
