import jax
import jax.numpy as jnp
import numpy as np

from bsdf_diffusion_sampling_tpu.bsdf import ggx_shading_disk
from bsdf_diffusion_sampling_tpu.data import ensemble_mcmc, generate_brdf_dataset


def test_ensemble_mcmc_recovers_gaussian(key):
    """Stretch-move ensemble must reproduce a correlated 2-D Gaussian."""
    cov = jnp.array([[1.0, 0.6], [0.6, 0.8]])
    prec = jnp.linalg.inv(cov)

    def log_prob(x):
        return -0.5 * jnp.einsum("ni,ij,nj->n", x, prec, x)

    nwalkers = 64
    x0 = jax.random.normal(key, (nwalkers, 2)) * 3.0
    chain, acc = ensemble_mcmc(
        jax.random.fold_in(key, 1), log_prob, x0, nsteps=2500, burn_in=500
    )
    assert 0.1 < float(acc) < 0.9
    s = np.asarray(chain.reshape(-1, 2))
    np.testing.assert_allclose(s.mean(axis=0), 0.0, atol=0.05)
    np.testing.assert_allclose(np.cov(s.T), np.asarray(cov), atol=0.08)


def test_generate_brdf_dataset_disk(key, tmp_path):
    """Small-scale banded dataset over the analytic GGX target: samples live
    in-support and the omega_o marginal peaks near the specular direction."""

    def pdf_fn(wi, wo):
        return ggx_shading_disk(wi, wo, roughness=0.4)

    samples = generate_brdf_dataset(
        key,
        pdf_fn,
        domain="disk",
        nsteps=400,
        nwalkers=50,
        piecewise=4,
        burn_in=200,
        cache_path=str(tmp_path / "ggx.npy"),
    )
    assert samples.shape == (4 * 400 * 50, 4)
    wi, wo = samples[:, :2], samples[:, 2:]
    assert (np.sum(wo**2, axis=-1) <= 1.0 + 1e-5).all()
    assert (np.sum(wi**2, axis=-1) <= 1.0 + 1e-5).all()
    # specular lobe: E[wo] roughly mirrors E[-wi]
    corr = np.mean(wi * wo)
    assert corr < 0.0  # wo anti-correlates with wi (reflection about normal)

    # cache round-trip
    cached = generate_brdf_dataset(
        key, pdf_fn, domain="disk", nsteps=400, nwalkers=50, piecewise=4,
        burn_in=200, cache_path=str(tmp_path / "ggx.npy"),
    )
    np.testing.assert_array_equal(samples, cached)


def test_generate_brdf_dataset_spherical(key):
    from bsdf_diffusion_sampling_tpu.bsdf import ggx_shading_spherical

    def pdf_fn(wi, wo):
        # target includes the sin(theta_o) area Jacobian
        # (`mitsuba_brdf_scalar.py:44`)
        return ggx_shading_spherical(wi, wo, roughness=0.5) * jnp.sin(wo[:, 0])

    samples = generate_brdf_dataset(
        key, pdf_fn, domain="spherical", nsteps=300, nwalkers=50,
        piecewise=3, burn_in=150,
    )
    wi, wo = samples[:, :2], samples[:, 2:]
    assert ((wo[:, 0] > 0) & (wo[:, 0] < np.pi / 2)).all()
    assert (np.abs(wo[:, 1]) < np.pi).all()
    assert ((wi[:, 0] > 0) & (wi[:, 0] < np.pi / 2)).all()


def test_distributed_helpers_single_host():
    """init_distributed is a safe no-op on one host; host_fold and
    global_batch_slice follow process 0 conventions."""
    import jax
    import jax.numpy as jnp

    from bsdf_diffusion_sampling_tpu.parallel import (
        global_batch_slice,
        host_fold,
        init_distributed,
    )

    assert init_distributed() is False  # single host, no pod env
    k = jax.random.key(3)
    assert not jnp.array_equal(
        jax.random.key_data(host_fold(k)),
        jax.random.key_data(jax.random.fold_in(k, 1)),
    )
    start, size = global_batch_slice(1024)
    assert (start, size) == (0, 1024)
