"""End-to-end training smoke + learning tests on an analytic GGX target.

The minimum end-to-end slice of SURVEY.md §7: MCMC dataset from the analytic
disk-domain GGX density -> pretrain NLL -> diffusion flow-matching ->
rectify distillation, all tiny-scale on the 8-device CPU mesh, then verify
the learned sampler actually concentrates where the target does and that
sample()/pdf() stay consistent after training.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsdf_diffusion_sampling_tpu.bsdf import ggx_shading_disk
from bsdf_diffusion_sampling_tpu.core.config import ModelConfig, TrainConfig
from bsdf_diffusion_sampling_tpu.data import generate_brdf_dataset
from bsdf_diffusion_sampling_tpu.models import get_base
from bsdf_diffusion_sampling_tpu.models.velocity import encode_condition
from bsdf_diffusion_sampling_tpu.ode import ode_pdf, ode_sample
from bsdf_diffusion_sampling_tpu.parallel import make_mesh
from bsdf_diffusion_sampling_tpu.train import checkpoint as ckpt
from bsdf_diffusion_sampling_tpu.train import train_material


@pytest.fixture(scope="module")
def trained():
    key = jax.random.key(7)

    def pdf_fn(wi, wo):
        return ggx_shading_disk(wi, wo, roughness=0.5)

    dataset = generate_brdf_dataset(
        key, pdf_fn, domain="disk", nsteps=600, nwalkers=50, piecewise=4,
        burn_in=300,
    )
    model_cfg = ModelConfig(domain="disk")
    train_cfg = TrainConfig(
        batch_pretrain=4096, iters_pretrain=400, lr_pretrain=3e-3,
        batch_diffusion=4096, iters_diffusion=800, lr_diffusion=3e-3,
        iters_rectify=60, timestep_rectify=32, num_samples_rectify=256,
        batch_wi_rectify=16, checkpoint_dir="", log_every=0, seed=3,
    )
    mesh = make_mesh(8)
    params = train_material(dataset, model_cfg, train_cfg, mesh=mesh,
                            log_fn=lambda s: None)
    return params, model_cfg, dataset


@pytest.mark.slow
def test_pretrain_learns_coarse_density(trained):
    """Base density should place omega_o samples inside the disk with the
    right coarse spread."""
    params, cfg, dataset = trained
    base = get_base("disk")
    wi = jnp.asarray(dataset[:2048, 0:2])
    x = base.sample(params["base"], wi, jax.random.key(1))
    frac_in = float(jnp.mean(jnp.sum(x**2, axis=-1) < 1.0))
    assert frac_in > 0.8


@pytest.mark.slow
def test_trained_sampler_matches_target_moments(trained):
    """After diffusion training, ODE samples must mirror the specular lobe:
    E[omega_o | omega_i] anti-correlates with omega_i, and samples land in
    the disk."""
    params, cfg, dataset = trained
    n = 4096
    wi = jnp.broadcast_to(jnp.array([0.45, 0.0]), (n, 2))
    cond = encode_condition(wi, cfg)
    x, pdf = ode_sample("disk", params["diffusion"], params["base"], wi, cond,
                        jax.random.key(2), 8)
    x = np.asarray(x)
    assert (np.sum(x**2, axis=-1) < 1.2).mean() > 0.95
    # mirrored lobe: mean x-coordinate of omega_o near -0.45 (within lobe width)
    assert x[:, 0].mean() < -0.15
    assert np.isfinite(np.asarray(pdf)).all() and (np.asarray(pdf) > 0).all()


@pytest.mark.slow
def test_trained_sample_pdf_consistency(trained):
    """Forward-sampling pdf vs reverse-query pdf on a TRAINED net. The
    finite-T Euler discretization makes the two differ by O(1/T^2) scaled
    by the (now sharp) Jacobians, so the test asserts convergence in T plus
    a loose absolute bound at large T."""
    params, cfg, _ = trained
    n = 512
    wi = jnp.broadcast_to(jnp.array([0.3, 0.2]), (n, 2))
    cond = encode_condition(wi, cfg)

    def gap(T):
        x, pdf_fwd = ode_sample("disk", params["diffusion"], params["base"],
                                wi, cond, jax.random.key(4), T)
        pdf_rev = ode_pdf("disk", params["diffusion"], params["base"], x, wi,
                          cond, T)
        return float(jnp.median(jnp.abs(pdf_rev / pdf_fwd - 1.0)))

    g16, g64 = gap(16), gap(64)
    assert g64 < g16, (g16, g64)
    assert g64 < 0.1, g64


@pytest.mark.slow
def test_rectified_sampler_close_at_one_step(trained):
    """Rectification straightens trajectories: the T=1 rectified map should
    land near the T=8 teacher map in distribution (compare means/covs)."""
    params, cfg, _ = trained
    n = 8192
    wi = jnp.broadcast_to(jnp.array([0.45, 0.0]), (n, 2))
    cond = encode_condition(wi, cfg)
    x_t, _ = ode_sample("disk", params["diffusion"], params["base"], wi, cond,
                        jax.random.key(5), 8)
    x_r, _ = ode_sample("disk", params["rectified"], params["base"], wi, cond,
                        jax.random.key(5), 1)
    mt, mr = np.asarray(x_t).mean(0), np.asarray(x_r).mean(0)
    np.testing.assert_allclose(mr, mt, atol=0.15)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, trained):
    params, _, _ = trained
    path = str(tmp_path / "ck.npz")
    ckpt.save_pytree(path, params["diffusion"], step=123)
    restored, step = ckpt.load_pytree(path, params["diffusion"])
    assert step == 123
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(params["diffusion"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_midstage_crash_resumes_at_saved_step(tmp_path):
    """Kill a stage mid-run and resume: the restart must pick up at the
    last periodic save (not step 0) and finish with params bit-identical
    to an uninterrupted run — the exact-step-resume contract of
    train/stages.py (ADVICE r3 high: the periodic save had drifted out of
    the loop, silently breaking crash-resume)."""
    import optax

    from bsdf_diffusion_sampling_tpu.parallel import make_mesh
    from bsdf_diffusion_sampling_tpu.train.stages import TrainState, run_stage

    mesh = make_mesh(8)
    tx = optax.sgd(0.1)
    params0 = {"w": jnp.ones((4,), jnp.float32)}

    def fresh_state():
        return TrainState(params=params0,
                          opt_state=tx.init(params0),
                          step=jnp.asarray(0, jnp.int32))

    @jax.jit
    def _update(state, key):
        g = {"w": jax.random.normal(key, (4,))}
        updates, new_opt = tx.update(g, state.opt_state, state.params)
        return TrainState(optax.apply_updates(state.params, updates),
                          new_opt, state.step + 1)

    def make_step(crash_at=None):
        def step_call(state, key, it):
            if crash_at is not None and it == crash_at:
                raise RuntimeError("simulated crash")
            state = _update(state, key)
            return state, jnp.float32(it)
        return step_call

    key = jax.random.key(11)
    iters, save_every = 23, 5
    path = str(tmp_path / "stage.npz")

    # uninterrupted oracle (no checkpointing)
    oracle = run_stage(name="oracle", mesh=mesh, state=fresh_state(),
                       step_call=make_step(), iters=iters, key=key,
                       checkpoint_path=None, log_every=0,
                       log_fn=lambda s: None)

    # crashed run: dies at it == 17 -> last periodic save is step 15
    with pytest.raises(RuntimeError):
        run_stage(name="crashy", mesh=mesh, state=fresh_state(),
                  step_call=make_step(crash_at=17), iters=iters, key=key,
                  checkpoint_path=path, save_every=save_every, log_every=0,
                  log_fn=lambda s: None)
    assert ckpt.latest_step(path) == 15

    # resume: must restart at 15 (never replaying or skipping a step) and
    # converge to the oracle exactly (fold_in(key, it) makes steps
    # deterministic in it)
    logs = []
    resumed = run_stage(name="resume", mesh=mesh, state=fresh_state(),
                        step_call=make_step(), iters=iters, key=key,
                        checkpoint_path=path, save_every=save_every,
                        log_every=0, log_fn=logs.append)
    assert any("resumed at step 15" in s for s in logs), logs
    np.testing.assert_array_equal(np.asarray(resumed.params["w"]),
                                  np.asarray(oracle.params["w"]))
    assert ckpt.latest_step(path) == iters
