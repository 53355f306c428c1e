"""P11 distribution library + P21 validation metrics + the 1-D/2-D toy
flow pipeline (BASELINE config 1): train the conditional flow on an
analytic 2-D density built from the distribution library and validate
sample histogram vs ode_pdf with the KL metric.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from bsdf_diffusion_sampling_tpu.utils.distributions1d import (
    Beta,
    CustomDistribution,
    Gaussian,
    StraightLine,
    TruncatedGaussian,
    TwoDCombination,
    Uniform,
    stratified_uniform,
)
from bsdf_diffusion_sampling_tpu.utils.validation import (
    image_mse,
    kl_divergence_grid,
    pdf_grid_2d,
    sampler_vs_pdf_kl,
)


def test_stratified_uniform_coverage(key):
    u = np.asarray(stratified_uniform(key, 1000))
    assert u.shape == (1000,)
    # each of the 1000 strata occupied exactly once
    assert len(np.unique((u * 1000).astype(int))) == 1000


@pytest.mark.parametrize(
    "dist,scipy_dist",
    [
        (Uniform(0.2, 0.8), scipy.stats.uniform(0.2, 0.6)),
        (Gaussian(0.3, 0.5), scipy.stats.norm(0.3, 0.5)),
        (Beta(2.0, 3.0), scipy.stats.beta(2.0, 3.0)),
    ],
)
def test_distribution_matches_scipy(dist, scipy_dist, key):
    x = np.asarray(dist.sample(key, 20_000))
    # KS test against the scipy CDF
    stat, pval = scipy.stats.kstest(x, scipy_dist.cdf)
    assert pval > 1e-3, (stat, pval)
    xs = np.linspace(x.min() + 1e-3, x.max() - 1e-3, 50)
    np.testing.assert_allclose(
        np.asarray(dist.pdf(jnp.asarray(xs))), scipy_dist.pdf(xs), rtol=2e-2, atol=1e-4
    )


def test_truncated_gaussian(key):
    d = TruncatedGaussian(0.0, 1.0, -0.5, 1.5)
    x = np.asarray(d.sample(key, 20_000))
    assert (x >= -0.5).all() and (x <= 1.5).all()
    sp = scipy.stats.truncnorm(-0.5, 1.5)
    stat, pval = scipy.stats.kstest(x, sp.cdf)
    assert pval > 1e-3


def test_straight_line(key):
    d = StraightLine()
    x = np.asarray(d.sample(key, 50_000))
    stat, pval = scipy.stats.kstest(x, lambda v: v**2)  # CDF of 2x density
    assert pval > 1e-3


def test_custom_distribution_matches_target(key):
    target = lambda x: jnp.exp(-((x - 0.3) ** 2) / 0.02) + 0.1
    d = CustomDistribution(target, 0.0, 1.0)
    x = np.asarray(d.sample(key, 50_000))
    hist, edges = np.histogram(x, bins=40, range=(0, 1), density=True)
    centers = 0.5 * (edges[1:] + edges[:-1])
    pdf = np.asarray(d.pdf(jnp.asarray(centers)))
    rel = np.abs(hist - pdf) / np.maximum(pdf, 1e-3)
    assert np.median(rel) < 0.05


def test_kl_metrics():
    p = np.ones((8, 8))
    assert kl_divergence_grid(p, p) == pytest.approx(0.0, abs=1e-9)
    q = np.ones((8, 8))
    q[0, 0] = 10.0
    assert kl_divergence_grid(p, q) > 0.0
    assert image_mse(np.zeros((4, 4, 3)), np.ones((4, 4, 3))) == 1.0


def test_toy_2d_flow_pipeline(key):
    """BASELINE config 1: train the flow on an analytic 2-D density (from
    the distribution library), then KL(sample hist || analytic pdf) must be
    small and ode_pdf must match the analytic density."""
    import optax

    from bsdf_diffusion_sampling_tpu.core.config import ModelConfig
    from bsdf_diffusion_sampling_tpu.models import get_base, velocity_init
    from bsdf_diffusion_sampling_tpu.models.velocity import encode_condition
    from bsdf_diffusion_sampling_tpu.ode import ode_pdf, ode_sample
    from bsdf_diffusion_sampling_tpu.train import (
        init_state,
        make_diffusion_step,
        make_pretrain_step,
    )

    target = TwoDCombination(Gaussian(0.2, 0.25), Beta(2.0, 4.0))
    n_data = 60_000
    xy = np.asarray(target.sample(key, n_data))
    dataset = jnp.asarray(
        np.concatenate([np.zeros((n_data, 2), np.float32), xy], axis=1)
    )

    cfg = ModelConfig(domain="disk")
    base = get_base("disk")
    k1, k2, k3 = jax.random.split(jax.random.fold_in(key, 1), 3)

    tx = optax.adam(3e-3)
    st = init_state(base.init(k1), tx)
    step = jax.jit(make_pretrain_step("disk", tx), donate_argnums=(0,),
                   static_argnames=("batch_size",))
    for i in range(300):
        st, _ = step(st, dataset, jax.random.fold_in(k2, i), batch_size=4096)
    b_params = st.params

    tx_d = optax.adam(3e-3)
    st_d = init_state(velocity_init(k3, cfg), tx_d)
    dstep = jax.jit(make_diffusion_step("disk", cfg, tx_d), donate_argnums=(0,),
                    static_argnames=("batch_size",))
    for i in range(800):
        st_d, _ = dstep(st_d, b_params, dataset, jax.random.fold_in(k3, i),
                        batch_size=4096)
    v_params = st_d.params

    n = 60_000
    wi = jnp.zeros((n, 2))
    cond = encode_condition(wi, cfg)
    x, _ = ode_sample("disk", v_params, b_params, wi, cond,
                      jax.random.fold_in(key, 5), 8)
    kl = sampler_vs_pdf_kl(np.asarray(x), lambda p: target.pdf(p),
                           lo=(-0.6, 0.0), hi=(1.0, 1.0), bins=24)
    assert kl < 0.15, kl

    # learned pdf vs analytic on the grid
    grid_pdf = pdf_grid_2d(
        lambda p: ode_pdf("disk", v_params, b_params, p, jnp.zeros_like(p),
                          encode_condition(jnp.zeros_like(p), cfg), 8),
        lo=(-0.6, 0.0), hi=(1.0, 1.0), bins=24,
    )
    target_pdf = pdf_grid_2d(lambda p: target.pdf(p), lo=(-0.6, 0.0),
                             hi=(1.0, 1.0), bins=24)
    assert kl_divergence_grid(target_pdf, grid_pdf) < 0.2


def test_compile_cache_env_contract(tmp_path, monkeypatch):
    """BSDF_TPU_COMPILE_CACHE: empty disables, a path redirects, and an
    explicit argument wins; the directory is created."""
    from bsdf_diffusion_sampling_tpu.core.compile_cache import (
        enable_compilation_cache,
    )

    monkeypatch.setenv("BSDF_TPU_COMPILE_CACHE", "")
    assert enable_compilation_cache() is None

    env_dir = tmp_path / "envcache"
    monkeypatch.setenv("BSDF_TPU_COMPILE_CACHE", str(env_dir))
    assert enable_compilation_cache() == str(env_dir)
    assert env_dir.is_dir()

    arg_dir = tmp_path / "argcache"
    assert enable_compilation_cache(str(arg_dir)) == str(arg_dir)
    assert arg_dir.is_dir()
