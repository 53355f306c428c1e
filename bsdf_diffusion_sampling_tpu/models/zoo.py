"""Model zoo: the reference's auxiliary network variants, TPU-first.

Covers the P5 inventory row — the variants the reference keeps around its
flagship nets (`/root/reference/learning_repo_cleanup/utils/model.py`):

- generic (biased) SiLU MLP regressors: ``NN``/``NN_simpler`` (unconditional
  x,alpha -> v, `model.py:78-117`), ``NN_cond_complex/simpler``
  (`model.py:638-676`), ``NN_albedo`` (sigmoid head, `model.py:59-76`) —
  all are shape presets of `make_regressor` here;
- velocity net with PE over the state as well as the condition
  (``NN_cond_pos_2``/``NN_cond_pos_neusample``, `model.py:554-576`);
- conditional Gaussian-mixture base densities: 2-D GMM on the disk
  (``NN_cond_pretrain``, `model.py:319-372`) and Gaussian(theta) x
  von-Mises(phi) mixtures on the sphere (``NN_cond_pretrain_spherical``,
  `model.py:170-234`) — exposed as `BaseDensity` bundles so they drop into
  `ode_sample`/`ode_pdf` unchanged;
- a 32x32 conv U-Net for image-domain diffusion experiments (``Unet``,
  `model.py:578-678`).

TPU-first re-design notes: mixture mode selection is one
`jax.random.categorical` over log-weights (the reference loops over modes
with boolean masks, `model.py:344-352`); mixture log_prob is one
`logsumexp` over a mode axis; the U-Net is NHWC with
`lax.conv_general_dilated` so XLA tiles channels onto the MXU. The
reference's spherical mixture normalizes with ``-log_scale`` while sampling
with ``exp(log_scale)+eps`` (`model.py:208-225`); here both use the same
scale so log_prob is the exact density of sample().
"""

from __future__ import annotations

import math
from typing import List, NamedTuple

import jax
import jax.numpy as jnp

from bsdf_diffusion_sampling_tpu.core.pytree import Static
from bsdf_diffusion_sampling_tpu.models.base_density import BaseDensity
from bsdf_diffusion_sampling_tpu.models.encoding import encoded_dim, positional_encoding
from bsdf_diffusion_sampling_tpu.models.mlp import init_mlp, mlp_apply
from bsdf_diffusion_sampling_tpu.models.von_mises import (
    von_mises_log_prob,
    von_mises_sample,
)

_LOG_2PI = math.log(2.0 * math.pi)


# ------------------------------------------------------- MLP regressors ----


def make_regressor(
    key: jax.Array,
    in_dim: int,
    out_dim: int,
    hidden: int = 64,
    n_hidden: int = 4,
    sigmoid_head: bool = False,
):
    """Biased SiLU MLP `f([x, alpha, cond...]) -> out` — the NN/NN_cond
    family. Returns (params, apply)."""
    params = init_mlp(key, [in_dim] + [hidden] * n_hidden + [out_dim], bias=True)

    def apply(params: List[dict], *inputs: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate(inputs, axis=-1) if len(inputs) > 1 else inputs[0]
        y = mlp_apply(params, x)
        return jax.nn.sigmoid(y) if sigmoid_head else y

    return params, apply


def velocity_pe_x_init(
    key: jax.Array, x_dim: int, cond_dim: int, pe_bands: int = 5,
    hidden: int = 64, n_hidden: int = 4,
) -> List[dict]:
    """Velocity net that frequency-encodes the state x as well as the
    condition (``NN_cond_pos_2``, `model.py:554-576`)."""
    in_dim = encoded_dim(x_dim, pe_bands) + 1 + encoded_dim(cond_dim, pe_bands)
    return init_mlp(key, [in_dim] + [hidden] * n_hidden + [2], bias=True)


def velocity_pe_x_apply(
    params: List[dict], x: jnp.ndarray, alpha: jnp.ndarray,
    cond: jnp.ndarray, pe_bands: int = 5,
) -> jnp.ndarray:
    if jnp.ndim(alpha) == 0:
        alpha = jnp.full(x.shape[:-1] + (1,), alpha, x.dtype)
    inp = jnp.concatenate(
        [positional_encoding(x, pe_bands), alpha, positional_encoding(cond, pe_bands)],
        axis=-1,
    )
    return mlp_apply(params, inp)


# -------------------------------------------------- GMM base densities ----


def _gmm_heads(params, omega_i, n_modes: int, event_dim: int):
    """(loc (N,K,D), log_scale (N,K,D), log_w (N,K)) from the head MLP.
    Head layout mirrors `model.py:333-340`: [locs, log_scales, weights]."""
    enc = positional_encoding(omega_i, params["pe_bands"].value)
    out = mlp_apply(params["net"], enc)
    k, d = n_modes, event_dim
    loc = out[..., : k * d].reshape(out.shape[:-1] + (k, d))
    log_scale = out[..., k * d : 2 * k * d].reshape(out.shape[:-1] + (k, d))
    w = jnp.abs(out[..., 2 * k * d : 2 * k * d + k]) + 1e-10
    log_w = jnp.log(w) - jnp.log(jnp.sum(w, axis=-1, keepdims=True))
    return loc, log_scale, log_w


def gmm_disk_base(n_modes: int = 2, hidden: int = 64, pe_bands: int = 5) -> BaseDensity:
    """Conditional 2-D diagonal-Gaussian mixture on the disk
    (``NN_cond_pretrain``, `model.py:319-372`)."""

    def init(key: jax.Array) -> dict:
        in_dim = encoded_dim(2, pe_bands)
        head_dim = n_modes * 5  # 2 loc + 2 log_scale + 1 weight per mode
        return {
            "net": init_mlp(key, [in_dim, hidden, head_dim], bias=True),
            "pe_bands": Static(pe_bands),
            "n_modes": Static(n_modes),
        }

    def sample(params: dict, omega_i: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        loc, log_scale, log_w = _gmm_heads(params, omega_i, n_modes, 2)
        k_mode, k_eps = jax.random.split(key)
        mode = jax.random.categorical(k_mode, log_w)  # (N,)
        sel = jax.nn.one_hot(mode, n_modes, dtype=loc.dtype)[..., None]  # (N,K,1)
        loc_s = jnp.sum(loc * sel, axis=-2)
        scale_s = jnp.sum(jnp.exp(log_scale) * sel, axis=-2)
        eps = jax.random.normal(k_eps, loc_s.shape, loc_s.dtype)
        return loc_s + scale_s * eps

    def log_prob(params: dict, x: jnp.ndarray, omega_i: jnp.ndarray) -> jnp.ndarray:
        loc, log_scale, log_w = _gmm_heads(params, omega_i, n_modes, 2)
        z = (x[..., None, :] - loc) / jnp.exp(log_scale)
        comp = (
            -_LOG_2PI
            - jnp.sum(log_scale, axis=-1)
            - 0.5 * jnp.sum(z * z, axis=-1)
        )
        return jax.nn.logsumexp(comp + log_w, axis=-1)

    return BaseDensity("disk", init, sample, log_prob)


def mixture_spherical_base(
    n_modes: int = 2, hidden: int = 64, pe_bands: int = 5, eps: float = 1e-6
) -> BaseDensity:
    """Mixture of Gaussian(theta) x von-Mises(phi) components
    (``NN_cond_pretrain_spherical``, `model.py:170-234`). Head layout
    [loc, log_scale, weight, loc_von, raw_conc] per `model.py:186-189`."""

    def heads(params, omega_i):
        enc = positional_encoding(omega_i, params["pe_bands"].value)
        out = mlp_apply(params["net"], enc)
        k = n_modes
        loc = out[..., :k]
        log_scale = out[..., k : 2 * k]
        w = jnp.abs(out[..., 2 * k : 3 * k]) + 1e-6
        log_w = jnp.log(w) - jnp.log(jnp.sum(w, axis=-1, keepdims=True))
        loc_von = out[..., 3 * k : 4 * k]
        conc = jax.nn.softplus(out[..., 4 * k : 5 * k]) + eps
        scale = jnp.exp(log_scale) + eps
        return loc, scale, log_w, loc_von, conc

    def init(key: jax.Array) -> dict:
        in_dim = encoded_dim(2, pe_bands)
        return {
            "net": init_mlp(key, [in_dim, hidden, n_modes * 5], bias=True),
            "pe_bands": Static(pe_bands),
            "n_modes": Static(n_modes),
        }

    def sample(params: dict, omega_i: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        loc, scale, log_w, loc_von, conc = heads(params, omega_i)
        k_mode, k_eps, k_von = jax.random.split(key, 3)
        mode = jax.random.categorical(k_mode, log_w)
        sel = jax.nn.one_hot(mode, n_modes, dtype=loc.dtype)
        loc_s = jnp.sum(loc * sel, axis=-1)
        scale_s = jnp.sum(scale * sel, axis=-1)
        loc_von_s = jnp.sum(loc_von * sel, axis=-1)
        conc_s = jnp.sum(conc * sel, axis=-1)
        theta = loc_s + scale_s * jax.random.normal(k_eps, loc_s.shape, loc_s.dtype)
        phi = von_mises_sample(k_von, loc_von_s, conc_s)
        return jnp.stack([theta, phi], axis=-1)

    def log_prob(params: dict, x: jnp.ndarray, omega_i: jnp.ndarray) -> jnp.ndarray:
        loc, scale, log_w, loc_von, conc = heads(params, omega_i)
        z = (x[..., :1] - loc) / scale
        loggau = -0.5 * _LOG_2PI - jnp.log(scale) - 0.5 * z * z
        logvon = von_mises_log_prob(x[..., 1:2], loc_von, conc)
        return jax.nn.logsumexp(loggau + logvon + log_w, axis=-1)

    return BaseDensity("spherical", init, sample, log_prob)


# --------------------------------------------------------------- U-Net ----


def _conv_init(key, k_h, k_w, c_in, c_out, dtype=jnp.float32):
    fan_in = k_h * k_w * c_in
    bound = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (k_h, k_w, c_in, c_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (c_out,), dtype, -bound, bound),
    }


def _conv(x, p, stride: int = 1):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"]


def _conv_t(x, p, stride: int = 2):
    y = jax.lax.conv_transpose(
        x, p["w"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"]


_UNET_SPEC = [
    # (name, kind, c_in, c_out, stride); mirrors the block graph of
    # `model.py:580-678` (3 down blocks, residual bottleneck, 3 up blocks)
    ("d1a", "conv", 2, 64, 1), ("d1b", "conv", 64, 64, 2),
    ("d2a", "conv", 64, 64, 1), ("d2b", "conv", 64, 64, 2),
    ("d3a", "conv", 64, 64, 1), ("d3b", "conv", 64, 64, 1),
    ("d3c", "conv", 64, 64, 1), ("d3d", "conv", 64, 64, 2),
    ("u3a", "convt", 64, 64, 2), ("u3b", "conv", 64, 64, 1),
    ("u2a", "convt", 64, 64, 2), ("u2b", "conv", 64, 64, 1),
    ("u1a", "convt", 64, 64, 2), ("u1b", "conv", 64, 64, 1),
    ("out", "conv1x1", 64, 1, 1),
]


def unet_init(key: jax.Array) -> dict:
    params = {}
    keys = jax.random.split(key, len(_UNET_SPEC))
    for k, (name, kind, c_in, c_out, _) in zip(keys, _UNET_SPEC):
        kh = kw = 1 if kind == "conv1x1" else 3
        params[name] = _conv_init(k, kh, kw, c_in, c_out)
    return params


def unet_apply(params: dict, x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """x: (N, 32, 32, 1) NHWC; alpha: (N,). Returns (N, 32, 32, 1)."""
    relu = jax.nn.relu
    a = jnp.broadcast_to(
        alpha[:, None, None, None].astype(x.dtype), x.shape[:3] + (1,)
    )
    h0 = jnp.concatenate([x, a], axis=-1)

    d1a = relu(_conv(h0, params["d1a"]))
    d1b = relu(_conv(d1a, params["d1b"], 2))
    d2a = relu(_conv(d1b, params["d2a"]))
    d2b = relu(_conv(d2a, params["d2b"], 2))
    d3a = relu(_conv(d2b, params["d3a"]))
    d3b = relu(_conv(d3a, params["d3b"]))
    d3c = relu(_conv(d3b, params["d3c"])) + d3a
    d3d = relu(_conv(d3c, params["d3d"], 2))

    u3a = relu(_conv_t(d3d, params["u3a"])) + d3c
    u3b = relu(_conv(u3a, params["u3b"])) + d2b
    u2a = relu(_conv_t(u3b, params["u2a"])) + d1b
    u2b = relu(_conv(u2a, params["u2b"]))
    u1a = relu(_conv_t(u2b, params["u1a"])) + d1a
    u1b = relu(_conv(u1a, params["u1b"]))
    return _conv(u1b, params["out"])
