"""Pallas fused-ODE kernel vs XLA reference path — numerical parity.

The analogue of the reference's one genuine parity test
(`/root/reference/tiny-cuda-nn/tmp.py:1-59`, torch vs tcnn allclose):
the fused kernel must match `ode/flow.py`'s lax.scan + jax.linearize path
on both the transported samples and the accumulated Jacobian-det products,
forward and reverse, disk and spherical. Runs the kernel in interpreter
mode on CPU; on TPU the same code compiles via Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bsdf_diffusion_sampling_tpu.ops.fused_ode as fused
from bsdf_diffusion_sampling_tpu.core.config import ModelConfig
from bsdf_diffusion_sampling_tpu.models import get_base, velocity_init
from bsdf_diffusion_sampling_tpu.models.velocity import encode_condition
from bsdf_diffusion_sampling_tpu.ode import ode_pdf, ode_sample, ode_sample_only

fused._INTERPRET = jax.default_backend() == "cpu"


def _setup(domain, key, hidden=32, layers=3):
    cfg = ModelConfig(domain=domain, velocity_hidden=hidden, velocity_layers=layers)
    k1, k2, k3 = jax.random.split(key, 3)
    v_params = jax.tree.map(lambda w: w * 0.5, velocity_init(k1, cfg))
    base = get_base(domain)
    b_params = base.init(k2)
    n = 300  # deliberately not a multiple of tile*pack: exercises padding
    if domain == "disk":
        omega_i = jax.random.uniform(k3, (n, 2), minval=-0.6, maxval=0.6)
    else:
        theta = jax.random.uniform(k3, (n,), minval=0.1, maxval=1.4)
        phi = jax.random.uniform(jax.random.fold_in(k3, 1), (n,), minval=-3.0, maxval=3.0)
        omega_i = jnp.stack([theta, phi], axis=-1)
    cond = encode_condition(omega_i, cfg)
    return cfg, v_params, b_params, omega_i, cond


@pytest.mark.parametrize("domain", ["disk", "spherical"])
def test_forward_parity(domain, key):
    cfg, v_params, b_params, omega_i, cond = _setup(domain, key)
    base = get_base(domain)
    T = 4
    x0 = base.sample(b_params, omega_i, jax.random.fold_in(key, 9))

    # XLA reference: replay ode_sample's loop from the same x0
    x_ref = ode_sample_only(domain, v_params, x0, cond, T)
    _, pdf_ref = _pdf_via_flow(domain, v_params, b_params, x0, omega_i, cond, T)

    x_k, det_k = fused.fused_ode_transport(domain, v_params, x0, cond, T, tile=8)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_ref), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(det_k), np.asarray(pdf_ref), rtol=2e-5)


def _pdf_via_flow(domain, v_params, b_params, x0, omega_i, cond, T):
    """Forward det product from the XLA path (mirrors ode_sample's internals
    but from a given x0)."""
    from bsdf_diffusion_sampling_tpu.ode.flow import _step_det, _velocity_and_jac

    h = 1.0 / T
    x, det = x0, jnp.ones(x0.shape[0], x0.dtype)
    for t in range(T):
        v, j0, j1 = _velocity_and_jac(domain, v_params, x, jnp.asarray(t * h, x.dtype), cond)
        det = det * _step_det(j0, j1, h, +1.0)
        x = x + h * v
    return x, det


@pytest.mark.parametrize("domain", ["disk", "spherical"])
def test_reverse_parity(domain, key):
    cfg, v_params, b_params, omega_i, cond = _setup(domain, key)
    base = get_base(domain)
    T = 4
    omega_o = base.sample(b_params, omega_i, jax.random.fold_in(key, 11))

    pdf_ref = ode_pdf(domain, v_params, b_params, omega_o, omega_i, cond, T)
    x0_k, det_k = fused.fused_ode_transport(
        domain, v_params, omega_o, cond, T, reverse=True, tile=8
    )
    p0 = jnp.exp(base.log_prob(b_params, x0_k, omega_i))
    np.testing.assert_allclose(np.asarray(p0 * det_k), np.asarray(pdf_ref), rtol=3e-5)


def test_wide_net_block64(key):
    """Spherical complex net (6x64): block-64 packing path."""
    domain = "spherical"
    cfg, v_params, b_params, omega_i, cond = _setup(domain, key, hidden=64, layers=6)
    base = get_base(domain)
    x0 = base.sample(b_params, omega_i, jax.random.fold_in(key, 12))
    T = 2
    x_ref = ode_sample_only(domain, v_params, x0, cond, T)
    x_k, _ = fused.fused_ode_transport(domain, v_params, x0, cond, T, with_jac=False, tile=8)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_ref), rtol=2e-5, atol=2e-6)


def test_no_jac_matches_sample_only(key):
    domain = "disk"
    cfg, v_params, b_params, omega_i, cond = _setup(domain, key)
    base = get_base(domain)
    x0 = base.sample(b_params, omega_i, jax.random.fold_in(key, 13))
    T = 8
    x_ref = ode_sample_only(domain, v_params, x0, cond, T)
    x_k, _ = fused.fused_ode_transport(domain, v_params, x0, cond, T, with_jac=False, tile=8)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_ref), rtol=2e-5, atol=2e-6)


def test_make_fused_transport_matches_single_call(key):
    import bsdf_diffusion_sampling_tpu.ops.fused_ode as fused
    from bsdf_diffusion_sampling_tpu.core.config import ModelConfig
    from bsdf_diffusion_sampling_tpu.models import velocity_init
    from bsdf_diffusion_sampling_tpu.models.velocity import encode_condition

    for domain, cfg in (
        ("disk", ModelConfig(domain="disk")),
        ("spherical", ModelConfig(domain="spherical", velocity_hidden=32,
                                  velocity_layers=4)),
    ):
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, hash(domain) % 97), 3)
        v_params = jax.tree.map(lambda w: w * 0.5, velocity_init(k1, cfg))
        n = 300
        omega_i = jax.random.uniform(k2, (n, 2), minval=-0.6, maxval=0.6)
        cond = encode_condition(omega_i, cfg)
        x0 = jax.random.normal(k3, (n, 2)) * 0.3
        x_a, det_a = fused.fused_ode_transport(domain, v_params, x0, cond, 4, tile=8)
        run = fused.make_fused_transport(domain, v_params, cond, 4, tile=8)
        x_b, det_b = run(x0)
        np.testing.assert_array_equal(np.asarray(x_a), np.asarray(x_b))
        np.testing.assert_array_equal(np.asarray(det_a), np.asarray(det_b))


def test_make_fused_sample_pdf_spherical_matches_xla(key):
    import bsdf_diffusion_sampling_tpu.ops.fused_ode as fused
    from bsdf_diffusion_sampling_tpu.core.config import ModelConfig
    from bsdf_diffusion_sampling_tpu.models import get_base, velocity_init
    from bsdf_diffusion_sampling_tpu.models.velocity import encode_condition
    from bsdf_diffusion_sampling_tpu.ode import ode_sample

    cfg = ModelConfig(domain="spherical", velocity_hidden=32, velocity_layers=4)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    v_params = jax.tree.map(lambda w: w * 0.5, velocity_init(k1, cfg))
    base = get_base("spherical")
    b_params = base.init(k2)
    n = 300
    omega_i = jax.random.uniform(k3, (n, 2), minval=-0.5, maxval=0.5)
    cond = encode_condition(omega_i, cfg)

    run = fused.make_fused_sample_pdf_spherical(
        v_params, base, b_params, omega_i, cond, 8, tile=8
    )
    x_f, pdf_f = run(k4)
    x_r, pdf_r = ode_sample("spherical", v_params, b_params, omega_i, cond, k4, 8)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_r), rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(pdf_f), np.asarray(pdf_r), rtol=5e-5)
