"""ODE sampler/PDF invariants.

Strategy (SURVEY.md section 4): with a *randomly initialized* velocity net,
the T-step Euler map is still a well-defined diffeomorphism-ish map, so
- pdf(sample()) computed during sampling must equal an independent reverse
  ode_pdf() query at the same point (the invertibility contract of
  `mlp_brdf_sampling.py:47` vs `:99` — note both use a finite-T Euler
  discretization, so forward det(I+J/T) and reverse det(I-J/T) differ by
  O(1/T^2); we test at large T and monotone convergence),
- the pdf must agree with a brute-force change-of-variables estimate from
  finite differences of the forward map,
- histogram of many samples must match ode_pdf on a grid.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsdf_diffusion_sampling_tpu.core.config import ModelConfig
from bsdf_diffusion_sampling_tpu.models import get_base, velocity_init
from bsdf_diffusion_sampling_tpu.models.velocity import encode_condition
from bsdf_diffusion_sampling_tpu.ode import ode_pdf, ode_sample, ode_sample_only


def _setup(domain, key, scale=1.0):
    cfg = ModelConfig(domain=domain)
    k1, k2 = jax.random.split(key)
    v_params = velocity_init(k1, cfg)
    # shrink weights so the random flow is well-conditioned
    v_params = jax.tree.map(lambda w: w * scale, v_params)
    base = get_base(domain)
    b_params = base.init(k2)
    return cfg, v_params, b_params


@pytest.mark.parametrize("domain", ["disk", "spherical"])
def test_sample_pdf_consistency(domain, key):
    cfg, v_params, b_params = _setup(domain, key, scale=0.5)
    k_wi, k_s = jax.random.split(jax.random.fold_in(key, 1))
    n = 512
    if domain == "disk":
        omega_i = jax.random.uniform(k_wi, (n, 2), minval=-0.6, maxval=0.6)
    else:
        theta = jax.random.uniform(k_wi, (n,), minval=0.1, maxval=1.4)
        phi = jax.random.uniform(jax.random.fold_in(k_wi, 1), (n,), minval=-3.0, maxval=3.0)
        omega_i = jnp.stack([theta, phi], axis=-1)
    cond = encode_condition(omega_i, cfg)

    T = 32  # large T: forward/reverse Euler dets agree to O(1/T^2)
    x, pdf_fwd = ode_sample(domain, v_params, b_params, omega_i, cond, k_s, T)
    pdf_rev = ode_pdf(domain, v_params, b_params, x, omega_i, cond, T)
    np.testing.assert_allclose(pdf_rev, pdf_fwd, rtol=0.05)

    # convergence: T=128 closer than T=32
    def gap(T_):
        x_, pf = ode_sample(domain, v_params, b_params, omega_i, cond, k_s, T_)
        pr = ode_pdf(domain, v_params, b_params, x_, omega_i, cond, T_)
        return float(jnp.median(jnp.abs(pr / pf - 1.0)))

    assert gap(32) < gap(8)  # gap(32) reuses the jitted T=32 program


@pytest.mark.parametrize("domain", ["disk", "spherical"])
def test_pdf_matches_numerical_jacobian(domain, key):
    """ode_pdf == p0(x0) * |det dToInverse/dx| where the inverse map is the
    reverse Euler integration — checked against jax.jacfwd of the map."""
    cfg, v_params, b_params = _setup(domain, key, scale=0.5)
    base = get_base(domain)
    n, T = 64, 8
    k_wi, k_x = jax.random.split(jax.random.fold_in(key, 2))
    omega_i = jax.random.uniform(k_wi, (n, 2), minval=-0.5, maxval=0.5)
    if domain == "spherical":
        omega_i = omega_i.at[:, 0].add(0.7)  # theta > 0
    cond = encode_condition(omega_i, cfg)
    omega_o = jax.random.normal(k_x, (n, 2)) * 0.3

    def reverse_map(xo, cond_row):
        # single-sample reverse Euler (mirrors ode_pdf's integration)
        x = xo[None]
        from bsdf_diffusion_sampling_tpu.models.velocity import velocity_apply
        from bsdf_diffusion_sampling_tpu.geometry.coords import encode_spherical_x

        for t in range(T):
            alpha = jnp.asarray(1.0 - t / T, x.dtype)
            xe = x if domain == "disk" else encode_spherical_x(x)
            v = velocity_apply(v_params, xe, alpha, cond_row[None])
            x = x - v / T
        return x[0]

    pdf = ode_pdf(domain, v_params, b_params, omega_o, omega_i, cond, T)

    jac = jax.vmap(jax.jacfwd(reverse_map))(omega_o, cond)
    x0 = jax.vmap(reverse_map)(omega_o, cond)
    p0 = jnp.exp(base.log_prob(b_params, x0, omega_i))
    det = jnp.abs(jac[:, 0, 0] * jac[:, 1, 1] - jac[:, 0, 1] * jac[:, 1, 0])
    np.testing.assert_allclose(pdf, p0 * det, rtol=2e-4)


def test_disk_sample_histogram_matches_pdf(key):
    """Histogram of ODE samples vs ode_pdf values on a grid (the reference's
    own validation style, `utils.py:167-211`)."""
    domain = "disk"
    cfg, v_params, b_params = _setup(domain, key, scale=0.4)
    omega_i_single = jnp.array([0.2, -0.1])
    n = 200_000
    omega_i = jnp.broadcast_to(omega_i_single, (n, 2))
    cond = encode_condition(omega_i, cfg)
    T = 8
    k_s = jax.random.fold_in(key, 3)
    x, _ = ode_sample(domain, v_params, b_params, omega_i, cond, k_s, T)
    x = np.asarray(x)

    lim = 4.0
    bins = 30
    hist, xe, ye = np.histogram2d(
        x[:, 0], x[:, 1], bins=bins, range=[[-lim, lim], [-lim, lim]], density=True
    )
    cx = 0.5 * (xe[1:] + xe[:-1])
    cy = 0.5 * (ye[1:] + ye[:-1])
    gx, gy = np.meshgrid(cx, cy, indexing="ij")
    grid = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], axis=-1), jnp.float32)
    cond_g = encode_condition(jnp.broadcast_to(omega_i_single, (grid.shape[0], 2)), cfg)
    pdf = np.asarray(
        ode_pdf(domain, v_params, b_params, grid,
                jnp.broadcast_to(omega_i_single, (grid.shape[0], 2)), cond_g, T)
    ).reshape(bins, bins)

    inside = (np.abs(x[:, 0]) < lim) & (np.abs(x[:, 1]) < lim)
    coverage = inside.mean()
    assert coverage > 0.97
    mask = hist > 0.01
    rel = np.abs(pdf[mask] - hist[mask]) / np.maximum(hist[mask], 1e-3)
    assert np.median(rel) < 0.15, np.median(rel)


def test_sample_only_matches_sample_trajectory(key):
    """ode_sample_only must transport identically to ode_sample (same Euler
    grid) given the same x0."""
    domain = "disk"
    cfg, v_params, b_params = _setup(domain, key, scale=0.5)
    base = get_base(domain)
    n, T = 256, 4
    omega_i = jnp.zeros((n, 2))
    cond = encode_condition(omega_i, cfg)
    k_s = jax.random.fold_in(key, 4)
    x0 = base.sample(b_params, omega_i, k_s)
    x_a = ode_sample_only(domain, v_params, x0, cond, T)
    # re-run ode_sample with the same key => same x0 => same trajectory
    x_b, _ = ode_sample(domain, v_params, b_params, omega_i, cond, k_s, T)
    np.testing.assert_allclose(x_a, x_b, atol=1e-6)
