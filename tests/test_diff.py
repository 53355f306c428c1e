"""Differentiable-sampler path: pixel-loss gradients w.r.t. velocity params.

The BASELINE.md pixel-gradient north star, closing VERDICT round-2 gap #4:
the reference inherits differentiability from torch autograd + tcnn's
fwd/bwd bindings (`/root/reference/tiny-cuda-nn/bindings/torch/tinycudann/
modules.py:120-160`); here the XLA `lax.scan`+`jax.linearize` path is
differentiable by construction, and `fused_transport_diff` gives the
Pallas megakernel a custom_vjp whose backward rematerializes through XLA.

Checks, all on a trained-scale random net:
1. custom_vjp gradients == direct XLA autodiff gradients (same math).
2. gradient of a 16x16 one-bounce render's pixel loss w.r.t. velocity
   params matches central finite differences along random directions.
3. the same pixel loss through the FUSED transport matches the XLA-path
   gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

import bsdf_diffusion_sampling_tpu.ops.fused_ode as fused
from bsdf_diffusion_sampling_tpu.bsdf import ggx_shading_disk
from bsdf_diffusion_sampling_tpu.core.config import ModelConfig
from bsdf_diffusion_sampling_tpu.models import get_base, velocity_init
from bsdf_diffusion_sampling_tpu.models.velocity import encode_condition
from bsdf_diffusion_sampling_tpu.ode import ode_sample
from bsdf_diffusion_sampling_tpu.ops.fused_ode import (
    _xla_transport_with_det,
    fused_transport_diff,
)

fused._INTERPRET = jax.default_backend() == "cpu"


def _setup(key, n=256):
    cfg = ModelConfig(domain="disk")
    k1, k2, k3 = jax.random.split(key, 3)
    v_params = jax.tree.map(lambda w: w * 0.5, velocity_init(k1, cfg))
    base = get_base("disk")
    b_params = base.init(k2)
    omega_i = jax.random.uniform(k3, (n, 2), minval=-0.6, maxval=0.6)
    cond = encode_condition(omega_i, cfg)
    return cfg, v_params, base, b_params, omega_i, cond


def test_fused_transport_vjp_matches_xla_autodiff(key):
    """Same scalar loss over (x, det): gradient through the fused
    custom_vjp must equal the pure-XLA gradient (identical backward by
    construction; identical forward in interpret mode)."""
    cfg, v_params, base, b_params, omega_i, cond = _setup(key)
    x0 = jax.random.normal(jax.random.fold_in(key, 1), omega_i.shape) * 0.3
    T = 4

    def loss_fused(p):
        x, det = fused_transport_diff("disk", p, x0, cond, T, False, 8)
        return jnp.sum(x**2) + jnp.sum((det - 1.0) ** 2)

    def loss_xla(p):
        x, det = _xla_transport_with_det("disk", p, x0, cond, T, False)
        return jnp.sum(x**2) + jnp.sum((det - 1.0) ** 2)

    v_f, g_f = jax.value_and_grad(loss_fused)(v_params)
    v_x, g_x = jax.value_and_grad(loss_xla)(v_params)
    np.testing.assert_allclose(float(v_f), float(v_x), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def _pixel_loss_xla(v_params, b_params, base, cfg, wi_img, eps, T):
    """16x16 one-bounce direct-light render: per pixel, S reparametrized
    samples through the neural sampler; radiance = L_env(wo) * f / pdf;
    loss = mean pixel energy. Fully differentiable (fixed eps = the
    reparametrization trick the base density already uses)."""
    npix, S, _ = eps.shape
    wi = jnp.repeat(wi_img, S, axis=0)  # (npix*S, 2)
    cond = encode_condition(wi, cfg)
    from bsdf_diffusion_sampling_tpu.models.base_density import _disk_heads

    loc, ls = _disk_heads(b_params, wi)
    x0 = loc + eps.reshape(-1, 2) * jnp.exp(ls)
    log_p0 = jnp.sum(
        -ls - 0.5 * eps.reshape(-1, 2) ** 2, axis=-1
    ) - jnp.log(2.0 * jnp.pi)
    x, det = _xla_transport_with_det("disk", v_params, x0, cond, T, False)
    pdf = jnp.exp(log_p0) / det
    # smooth envmap: gaussian lobe in disk coords
    L = jnp.exp(-4.0 * jnp.sum((x - jnp.array([0.2, -0.3])) ** 2, axis=-1))
    # keep samples strictly inside the unit disk: disk_to_cart's
    # sqrt(max(0, 1-r^2)) has an infinite derivative at r=1 which turns
    # into NaN grads for escaped samples (the render path masks those;
    # here we clip differentiably)
    r = jnp.linalg.norm(x, axis=-1, keepdims=True)
    x_safe = x * (jnp.minimum(r, 0.95) / jnp.maximum(r, 1e-6))
    f = ggx_shading_disk(wi, x_safe, roughness=0.6, diffuse_prob=0.3)
    contrib = L * f / jnp.maximum(pdf, 1e-3)
    img = contrib.reshape(npix, S).mean(axis=1)
    return jnp.mean(img**2)


def test_pixel_gradient_vs_finite_differences(key):
    cfg, v_params, base, b_params, omega_i, cond = _setup(key)
    npix, S, T = 256, 8, 4  # 16x16 pixels
    k1, k2 = jax.random.split(key)
    # one fixed wi per pixel (the camera's primary-hit directions)
    wi_img = jax.random.uniform(k1, (npix, 2), minval=-0.5, maxval=0.5)
    eps = jax.random.normal(k2, (npix, S, 2))

    loss = jax.jit(lambda p: _pixel_loss_xla(p, b_params, base, cfg, wi_img,
                                             eps, T))
    l0, grad = jax.value_and_grad(loss)(v_params)
    assert np.isfinite(float(l0))

    flat, unravel = ravel_pytree(v_params)
    gflat, _ = ravel_pytree(grad)
    rng = np.random.default_rng(0)
    for trial in range(3):
        d = rng.standard_normal(flat.shape[0]).astype(np.float32)
        d /= np.linalg.norm(d)
        h = 3e-3
        lp = float(loss(unravel(flat + h * jnp.asarray(d))))
        lm = float(loss(unravel(flat - h * jnp.asarray(d))))
        fd = (lp - lm) / (2 * h)
        ad = float(gflat @ jnp.asarray(d))
        # fp32 central differences: ~1e-3 relative noise floor
        np.testing.assert_allclose(ad, fd, rtol=5e-2, atol=1e-5)


def test_pixel_gradient_fused_path_matches_xla(key):
    """Identical pixel loss, but the transport runs through the Pallas
    fused kernel with the custom_vjp backward — gradients must agree with
    the all-XLA path."""
    cfg, v_params, base, b_params, omega_i, cond = _setup(key)
    npix, S, T = 64, 8, 4
    k1, k2 = jax.random.split(key)
    wi_img = jax.random.uniform(k1, (npix, 2), minval=-0.5, maxval=0.5)
    eps = jax.random.normal(k2, (npix, S, 2))

    from bsdf_diffusion_sampling_tpu.models.base_density import _disk_heads

    def loss_with(transport):
        def loss(p):
            wi = jnp.repeat(wi_img, S, axis=0)
            cond_ = encode_condition(wi, cfg)
            loc, ls = _disk_heads(b_params, wi)
            x0 = loc + eps.reshape(-1, 2) * jnp.exp(ls)
            log_p0 = jnp.sum(-ls - 0.5 * eps.reshape(-1, 2) ** 2,
                             axis=-1) - jnp.log(2.0 * jnp.pi)
            x, det = transport(p, x0, cond_)
            pdf = jnp.exp(log_p0) / det
            L = jnp.exp(-4.0 * jnp.sum((x - jnp.array([0.2, -0.3])) ** 2,
                                       axis=-1))
            r = jnp.linalg.norm(x, axis=-1, keepdims=True)
            x_safe = x * (jnp.minimum(r, 0.95) / jnp.maximum(r, 1e-6))
            f = ggx_shading_disk(wi, x_safe, roughness=0.6, diffuse_prob=0.3)
            img = (L * f / jnp.maximum(pdf, 1e-3)).reshape(npix, S).mean(axis=1)
            return jnp.mean(img**2)

        return loss

    g_fused = jax.grad(loss_with(
        lambda p, x0, c: fused_transport_diff("disk", p, x0, c, T, False, 8)
    ))(v_params)
    g_xla = jax.grad(loss_with(
        lambda p, x0, c: _xla_transport_with_det("disk", p, x0, c, T, False)
    ))(v_params)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-6)
