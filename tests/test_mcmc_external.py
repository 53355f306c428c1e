"""Three-way MCMC redundancy check (P23, the Stan/PyMC role).

The reference validates its emcee data pipeline by re-implementing the GGX
shading density in unrelated probabilistic stacks and sampling with THEIR
samplers — Stan/NUTS (`/root/reference/rendering/utils/analytical_brdf_stan.py`)
and PyMC (`analytical_brdf_pymc.py`) — then eyeballing the marginals. This
test automates that redundancy: the pure-numpy random-walk Metropolis
(utils/reference_np.py), the device affine-invariant stretch-move ensemble
(data/mcmc.py), and the numerically normalized pdf grid share no code, no
RNG, and no density implementation; all three must agree.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bsdf_diffusion_sampling_tpu.bsdf import ggx_shading_disk
from bsdf_diffusion_sampling_tpu.data import ensemble_mcmc
from bsdf_diffusion_sampling_tpu.utils.reference_np import (
    ggx_pdf_grid_np,
    metropolis_ggx_disk_np,
)
from bsdf_diffusion_sampling_tpu.utils.validation import (
    histogram_grid_2d,
    kl_divergence_grid,
)

OMEGA_I = np.array([0.35, 0.0])
ROUGH = 0.4
RES = 12


def _grid_prob() -> np.ndarray:
    """Reference cell probabilities on the RES x RES grid over [-1,1]^2."""
    g = ggx_pdf_grid_np(OMEGA_I, ROUGH, res=RES)  # density, integrates to 1
    cell = (2.0 / RES) ** 2
    return g * cell


def _hist_prob(samples: np.ndarray) -> np.ndarray:
    h = histogram_grid_2d(samples, lo=(-1.0, -1.0), hi=(1.0, 1.0), bins=RES)
    cell = (2.0 / RES) ** 2
    return h * cell


def test_numpy_metropolis_matches_pdf_grid():
    rng = np.random.default_rng(7)
    samples, acc = metropolis_ggx_disk_np(
        rng, OMEGA_I, ROUGH, n_steps=2500, n_chains=64, burn_in=500
    )
    assert 0.15 < acc < 0.6, f"acceptance {acc} outside healthy RW range"
    kl = kl_divergence_grid(_hist_prob(samples), _grid_prob())
    assert kl < 0.05, f"numpy MH vs normalized grid: KL={kl}"


def test_device_ensemble_matches_numpy_metropolis(key):
    """The production stretch-move sampler and the external-stack numpy MH
    draw from the same density: their histograms must agree with each other
    and with the grid (the 'two unrelated MCMC stacks agree' criterion the
    reference meets with Stan/PyMC)."""
    wi = jnp.asarray(OMEGA_I, jnp.float32)

    def log_prob(x):  # x: (nwalkers, 2) omega_o
        inside = jnp.sum(x**2, axis=-1) < 1.0
        f = ggx_shading_disk(
            jnp.broadcast_to(wi, x.shape), jnp.where(inside[:, None], x, 0.0),
            roughness=ROUGH,
        )
        f = jnp.where(inside, jnp.maximum(f, 0.0), 0.0)
        return jnp.where(f > 0, jnp.log(jnp.maximum(f, 1e-38)), -jnp.inf)

    nwalkers = 64
    x0 = -0.5 * wi + 0.05 * jax.random.normal(key, (nwalkers, 2))
    chain, acc = ensemble_mcmc(
        jax.random.fold_in(key, 3), log_prob, x0, nsteps=2500, burn_in=500
    )
    assert 0.1 < float(acc) < 0.9
    dev = np.asarray(chain.reshape(-1, 2))

    rng = np.random.default_rng(11)
    ext, _ = metropolis_ggx_disk_np(
        rng, OMEGA_I, ROUGH, n_steps=2500, n_chains=64, burn_in=500
    )

    hp_dev, hp_ext, gp = _hist_prob(dev), _hist_prob(ext), _grid_prob()
    kl_dev = kl_divergence_grid(hp_dev, gp)
    kl_cross = kl_divergence_grid(hp_dev, hp_ext)
    assert kl_dev < 0.05, f"device ensemble vs grid: KL={kl_dev}"
    assert kl_cross < 0.05, f"device vs external numpy MH: KL={kl_cross}"
