"""Model-zoo correctness (models/zoo.py — the P5 inventory row).

Each density variant is validated the way SURVEY.md section 4 prescribes:
log_prob must integrate to ~1 over the domain, and the sampler histogram
must match exp(log_prob) (KL small). The U-Net is checked for shape
round-trip and that one SGD step reduces a toy diffusion loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsdf_diffusion_sampling_tpu.models.zoo import (
    gmm_disk_base,
    make_regressor,
    mixture_spherical_base,
    unet_apply,
    unet_init,
    velocity_pe_x_apply,
    velocity_pe_x_init,
)


def test_regressor_shapes(key):
    params, apply = make_regressor(key, in_dim=5, out_dim=2, hidden=32, n_hidden=2)
    x = jnp.ones((17, 2))
    alpha = jnp.ones((17, 1))
    cond = jnp.ones((17, 2))
    y = apply(params, x, alpha, cond)
    assert y.shape == (17, 2)

    params_s, apply_s = make_regressor(key, 2, 1, sigmoid_head=True)
    y = apply_s(params_s, jnp.linspace(-5, 5, 64).reshape(-1, 2))
    assert bool(jnp.all((y > 0) & (y < 1)))


def test_velocity_pe_x(key):
    params = velocity_pe_x_init(key, x_dim=2, cond_dim=2)
    x = jax.random.normal(key, (33, 2))
    v = velocity_pe_x_apply(params, x, jnp.full((33, 1), 0.5), x * 0.1)
    assert v.shape == (33, 2)
    assert bool(jnp.all(jnp.isfinite(v)))


def test_gmm_disk_normalization_and_sampling(key):
    base = gmm_disk_base(n_modes=3)
    params = base.init(key)
    n = 1 << 14
    omega_i = jnp.tile(jnp.asarray([[0.2, -0.3]], jnp.float32), (n, 1))

    # integral of exp(log_prob) over a wide grid ~ 1
    lim, res = 6.0, 160
    centers = (np.arange(res) + 0.5) / res * 2 * lim - lim
    gx, gy = np.meshgrid(centers, centers, indexing="ij")
    grid = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1), jnp.float32)
    wi = jnp.tile(omega_i[:1], (grid.shape[0], 1))
    p = jnp.exp(base.log_prob(params, grid, wi))
    integral = float(p.sum()) * (2 * lim / res) ** 2
    assert abs(integral - 1.0) < 0.02, integral

    # histogram of samples vs density
    x = np.asarray(base.sample(params, omega_i, jax.random.fold_in(key, 1)))
    assert x.shape == (n, 2)
    hist, ex, ey = np.histogram2d(x[:, 0], x[:, 1], bins=24,
                                  range=[[-lim, lim], [-lim, lim]])
    q = hist / hist.sum()
    cx = (ex[:-1] + ex[1:]) / 2
    cy = (ey[:-1] + ey[1:]) / 2
    gx2, gy2 = np.meshgrid(cx, cy, indexing="ij")
    g2 = jnp.asarray(np.stack([gx2.ravel(), gy2.ravel()], -1), jnp.float32)
    p2 = np.asarray(
        jnp.exp(base.log_prob(params, g2, jnp.tile(omega_i[:1], (g2.shape[0], 1))))
    ).reshape(24, 24)
    p2 = p2 / p2.sum()
    mask = p2 > p2.max() * 1e-3
    kl = float(np.sum(p2[mask] * np.log((p2[mask] + 1e-9) / (q[mask] + 1e-9))))
    assert kl < 0.1, kl


def test_mixture_spherical_normalization_and_sampling(key):
    base = mixture_spherical_base(n_modes=2)
    params = base.init(key)
    n = 1 << 14
    omega_i = jnp.tile(jnp.asarray([[0.4, 0.1]], jnp.float32), (n, 1))

    # theta marginal is an (unbounded) Gaussian mixture, phi is periodic:
    # integrate over theta in [-8, 8] x phi in [-pi, pi]
    res_t, res_p = 200, 64
    t = (np.arange(res_t) + 0.5) / res_t * 16.0 - 8.0
    ph = (np.arange(res_p) + 0.5) / res_p * 2 * np.pi - np.pi
    gt, gp = np.meshgrid(t, ph, indexing="ij")
    grid = jnp.asarray(np.stack([gt.ravel(), gp.ravel()], -1), jnp.float32)
    wi = jnp.tile(omega_i[:1], (grid.shape[0], 1))
    p = jnp.exp(base.log_prob(params, grid, wi))
    integral = float(p.sum()) * (16.0 / res_t) * (2 * np.pi / res_p)
    assert abs(integral - 1.0) < 0.02, integral

    x = np.asarray(base.sample(params, omega_i, jax.random.fold_in(key, 3)))
    assert x.shape == (n, 2)
    assert np.all(np.isfinite(x))
    assert np.all(np.abs(x[:, 1]) <= np.pi + 1e-5)

    # 1-D phi-marginal histogram vs numerically-marginalized density
    hist, edges = np.histogram(x[:, 1], bins=res_p, range=[-np.pi, np.pi])
    q = hist / hist.sum()
    p_phi = np.asarray(p).reshape(res_t, res_p).sum(0)
    p_phi = p_phi / p_phi.sum()
    kl = float(np.sum(p_phi * np.log((p_phi + 1e-9) / (q + 1e-9))))
    assert kl < 0.05, kl


def test_gmm_disk_works_in_ode(key):
    """Zoo bases satisfy the BaseDensity contract the ODE layer needs."""
    from bsdf_diffusion_sampling_tpu.core.config import ModelConfig
    from bsdf_diffusion_sampling_tpu.models import velocity_init
    from bsdf_diffusion_sampling_tpu.models.velocity import encode_condition
    from bsdf_diffusion_sampling_tpu.ode.flow import (
        _encode_x,
        _step_det,
        _velocity_and_jac,
    )
    from bsdf_diffusion_sampling_tpu.ode import ode_pdf

    base = gmm_disk_base(n_modes=2)
    b_params = base.init(key)
    cfg = ModelConfig(domain="disk")
    v_params = jax.tree.map(lambda w: w * 0.3, velocity_init(key, cfg))
    n = 256
    omega_i = jnp.zeros((n, 2), jnp.float32)
    cond = encode_condition(omega_i, cfg)
    # manual forward pass with the zoo base (ode_sample hardwires get_base)
    x0 = base.sample(b_params, omega_i, jax.random.fold_in(key, 1))
    p0 = jnp.exp(base.log_prob(b_params, x0, omega_i))
    T, h = 64, 1.0 / 64
    x, det = x0, jnp.ones_like(p0)
    for t in range(T):
        v, j0, j1 = _velocity_and_jac("disk", v_params, x, jnp.float32(t * h), cond)
        det = det * _step_det(j0, j1, h, +1.0)
        x = x + h * v
    pdf_fwd = p0 / det
    assert bool(jnp.all(jnp.isfinite(pdf_fwd)))


def test_unet_shapes_and_training_step(key):
    params = unet_init(key)
    x = jax.random.normal(key, (4, 32, 32, 1))
    alpha = jnp.asarray([0.1, 0.4, 0.7, 0.9])
    y = unet_apply(params, x, alpha)
    assert y.shape == (4, 32, 32, 1)
    assert bool(jnp.all(jnp.isfinite(y)))

    def loss_fn(p):
        pred = unet_apply(p, x, alpha)
        return jnp.mean((pred - x) ** 2)

    l0, grads = jax.value_and_grad(loss_fn)(params)
    params2 = jax.tree.map(lambda p, g: p - 0.05 * g, params, grads)
    l1 = loss_fn(params2)
    assert float(l1) < float(l0)
