"""Plain-pytree MLPs.

Models are (list-of-dict) pytrees of jnp arrays rather than framework
modules: weight layouts stay trivial to hand to Pallas kernels (the same
reason the reference keeps its velocity nets bias-free so they transplant
1:1 into tiny-cuda-nn's FullyFusedMLP —
`/root/reference/learning_repo_cleanup/utils/utils.py:13-23`).

Weights are stored [in_dim, out_dim] (column-major activations: y = x @ W),
fp32 master copies; kernels may cast to bf16 internally.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp


def init_mlp(
    key: jax.Array,
    dims: Sequence[int],
    bias: bool = False,
    dtype=jnp.float32,
) -> List[dict]:
    """Kaiming-uniform init matching torch.nn.Linear defaults so freshly
    initialized nets have the same scale statistics as the reference."""
    params = []
    keys = jax.random.split(key, len(dims) - 1)
    for k, d_in, d_out in zip(keys, dims[:-1], dims[1:]):
        bound = 1.0 / jnp.sqrt(d_in)
        kw, kb = jax.random.split(k)
        layer = {"w": jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound)}
        if bias:
            layer["b"] = jax.random.uniform(kb, (d_out,), dtype, -bound, bound)
        params.append(layer)
    return params


def mlp_apply(params: List[dict], x: jnp.ndarray, activation=jax.nn.silu) -> jnp.ndarray:
    """SiLU-hidden MLP; linear output layer (reference nets' structure,
    e.g. `model.py:479-501`)."""
    h = x
    for i, layer in enumerate(params):
        h = h @ layer["w"]
        if "b" in layer:
            h = h + layer["b"]
        if i + 1 < len(params):
            h = activation(h)
    return h


def mlp_dims(params: List[dict]) -> List[int]:
    dims = [params[0]["w"].shape[0]]
    dims += [layer["w"].shape[1] for layer in params]
    return dims


def flatten_mlp(params: List[dict]) -> jnp.ndarray:
    """Concatenate all weights into one flat vector (checkpoint/transplant
    interchange, analogous to tcnn's flat `params` buffer)."""
    leaves = []
    for layer in params:
        leaves.append(layer["w"].reshape(-1))
        if "b" in layer:
            leaves.append(layer["b"].reshape(-1))
    return jnp.concatenate(leaves)
