"""Parity of imported reference checkpoints (interop/torch_checkpoints.py).

The one genuine numerical-parity test in the reference is the torch<->tcnn
transplant check (`/root/reference/tiny-cuda-nn/tmp.py:1-59`, allclose
rtol/atol 0.01). Here the analogue, with REAL trained weights:

1. layout parity — our velocity_apply / base heads vs an independent torch
   evaluation of the same state dict (generic linear+SiLU chain, built here
   from the state dict alone),
2. sample<->pdf invertibility of the imported flow,
3. the imported disk sampler actually concentrates probability where the
   measured BSDF does (cheap sanity, not a full KL run).

Skipped wholesale if the reference checkout isn't mounted.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

CKPT_ROOT = "/root/reference/rendering/checkpoints_new"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(CKPT_ROOT), reason="reference checkpoints not mounted"
)

MATERIAL = "chm_mint_rgb"


def _torch_mlp_apply(sd, x_np):
    """Independent torch evaluation: linear1..linearN with SiLU, then output.
    Written from the state dict alone (layer list + shapes)."""
    import re

    import torch

    names = sorted(
        {k.split(".")[0] for k in sd if k.startswith("linear")},
        key=lambda n: int(re.search(r"\d+", n).group()),
    ) + ["output"]
    h = torch.from_numpy(x_np)
    for i, name in enumerate(names):
        h = h @ sd[f"{name}.weight"].T
        if f"{name}.bias" in sd:
            h = h + sd[f"{name}.bias"]
        if i + 1 < len(names):
            h = torch.nn.functional.silu(h)
    return h.numpy()


@pytest.mark.parametrize("domain", ["disk", "spherical"])
def test_velocity_layout_parity(domain, key):
    import torch

    from bsdf_diffusion_sampling_tpu.core.config import ModelConfig
    from bsdf_diffusion_sampling_tpu.interop import import_reference_material
    from bsdf_diffusion_sampling_tpu.models.velocity import (
        encode_condition,
        velocity_apply,
    )

    params = import_reference_material(CKPT_ROOT, MATERIAL, domain)
    cfg = (
        ModelConfig(domain="disk")
        if domain == "disk"
        else ModelConfig(domain="spherical", velocity_hidden=32, velocity_layers=4)
    )

    n = 257
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.uniform(k1, (n, 2), minval=-0.8, maxval=0.8)
    x_enc = x if domain == "disk" else jnp.stack(
        [x[:, 0], jnp.sin(x[:, 1]), jnp.cos(x[:, 1])], axis=-1
    )
    alpha = jax.random.uniform(k2, (n, 1))
    omega_i = jax.random.uniform(k3, (n, 2), minval=-0.7, maxval=0.7)
    cond = encode_condition(omega_i, cfg)

    ours = velocity_apply(params["rectified"], x_enc, alpha, cond)

    sd = torch.load(
        os.path.join(
            CKPT_ROOT, f"{MATERIAL}_{domain}", f"brdf_rectify_network{MATERIAL}.pth"
        ),
        map_location="cpu",
    )
    inp = np.concatenate(
        [np.asarray(x_enc), np.asarray(alpha), np.asarray(cond)], axis=-1
    ).astype(np.float32)
    theirs = _torch_mlp_apply(sd, inp)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-5)


def test_base_layout_parity(key):
    import torch

    from bsdf_diffusion_sampling_tpu.interop import import_reference_material
    from bsdf_diffusion_sampling_tpu.models import get_base

    params = import_reference_material(CKPT_ROOT, MATERIAL, "disk")
    base = get_base("disk")
    n = 129
    k1, k2 = jax.random.split(key)
    omega_i = jax.random.uniform(k1, (n, 2), minval=-0.7, maxval=0.7)
    x = jax.random.uniform(k2, (n, 2), minval=-0.5, maxval=0.5)
    lp = base.log_prob(params["base"], x, omega_i)

    sd = torch.load(
        os.path.join(CKPT_ROOT, f"{MATERIAL}_disk",
                     f"brdf_pretrain_network{MATERIAL}.pth"),
        map_location="cpu",
    )
    # independent torch eval: PE(3 bands) -> MLP -> diagonal-Gaussian log_prob
    wi = np.asarray(omega_i, np.float32)
    freqs = 2.0 ** np.arange(3, dtype=np.float32)
    enc = np.concatenate(
        [wi] + [f(wi * fr) for fr in freqs for f in (np.sin, np.cos)], axis=-1
    )
    out = _torch_mlp_apply(sd, enc.astype(np.float32))
    loc, log_scale = out[:, :2], out[:, 2:]
    z = (np.asarray(x) - loc) / np.exp(log_scale)
    lp_ref = (
        -np.log(2 * np.pi) - log_scale.sum(-1) - 0.5 * (z * z).sum(-1)
    )
    np.testing.assert_allclose(np.asarray(lp), lp_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("domain", ["disk", "spherical"])
def test_imported_sample_pdf_consistency(domain, key):
    """Forward-sample pdf vs reverse ode_pdf query with trained weights.

    The two differ by O(1/T^2) per step — det(I+J/T) at the pre-step point
    vs det(I-J/T) at the post-step point — accumulating to O(1/T) overall;
    the reference has the identical asymmetry (`mlp_brdf_sampling.py:46-47`
    vs `:95-99`, same alpha grids t/T and 1-t/T). So we assert the ~linear
    convergence of the median relative gap in T.
    """
    from bsdf_diffusion_sampling_tpu.core.config import ModelConfig
    from bsdf_diffusion_sampling_tpu.interop import import_reference_material
    from bsdf_diffusion_sampling_tpu.models.velocity import encode_condition
    from bsdf_diffusion_sampling_tpu.ode import ode_pdf, ode_sample

    params = import_reference_material(CKPT_ROOT, MATERIAL, domain)
    cfg = (
        ModelConfig(domain="disk")
        if domain == "disk"
        else ModelConfig(domain="spherical", velocity_hidden=32, velocity_layers=4)
    )
    n = 2048
    omega_i = jnp.tile(jnp.asarray([[0.3, 0.2]], jnp.float32), (n, 1))
    cond = encode_condition(omega_i, cfg)

    med = {}
    for T in (8, 32, 64):
        x, pdf = ode_sample(
            domain, params["rectified"], params["base"], omega_i, cond, key, T
        )
        assert bool(jnp.all(jnp.isfinite(x)))
        assert bool(jnp.all(pdf > 0))
        pdf_q = ode_pdf(
            domain, params["rectified"], params["base"], x, omega_i, cond, T
        )
        rel = np.abs(np.asarray(pdf_q) - np.asarray(pdf)) / np.asarray(pdf)
        med[T] = float(np.median(rel))
    assert med[32] < med[8] / 2.0, med
    assert med[64] < med[32] / 1.5, med
    assert med[64] < 0.06, med


def test_imported_disk_sampler_matches_measured_density(key):
    """Samples from the imported rectified flow should land where the
    measured BSDF has mass: compare the sample histogram against the
    normalized (luminance x 1/cos) grid via the KL metric the reference
    prints (`learning_repo_cleanup/utils/utils.py:206-211`)."""
    from bsdf_diffusion_sampling_tpu.bsdf import load_measured
    from bsdf_diffusion_sampling_tpu.bsdf.measured import eval_lum
    from bsdf_diffusion_sampling_tpu.core.config import ModelConfig
    from bsdf_diffusion_sampling_tpu.geometry.coords import disk_to_cart
    from bsdf_diffusion_sampling_tpu.interop import import_reference_material
    from bsdf_diffusion_sampling_tpu.models.velocity import encode_condition
    from bsdf_diffusion_sampling_tpu.ode import ode_sample

    bsdf_path = f"/root/reference/rendering/measuredbsdfs/{MATERIAL}.bsdf"
    if not os.path.exists(bsdf_path):
        pytest.skip("measured bsdf data not mounted")
    brdf = load_measured(bsdf_path)

    params = import_reference_material(CKPT_ROOT, MATERIAL, "disk")
    cfg = ModelConfig(domain="disk")
    n = 1 << 15
    omega_i = jnp.tile(jnp.asarray([[0.25, 0.15]], jnp.float32), (n, 1))
    cond = encode_condition(omega_i, cfg)
    x, _ = ode_sample(
        "disk", params["rectified"], params["base"], omega_i, cond, key, 4
    )
    x = np.asarray(x)
    inside = (x**2).sum(-1) < 1.0
    assert inside.mean() > 0.97
    x = x[inside]

    # target density grid over the unit square [-1,1]^2
    res = 24
    centers = (np.arange(res) + 0.5) / res * 2.0 - 1.0
    gx, gy = np.meshgrid(centers, centers, indexing="ij")
    grid = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)
    wi = np.tile(np.asarray([[0.25, 0.15]], np.float32), (grid.shape[0], 1))
    wi3 = disk_to_cart(jnp.asarray(wi))
    wo3 = disk_to_cart(jnp.asarray(grid))
    # disk-domain target density: luminance x 1/cos(theta_o)
    # (`mitsuba_brdf_scalar.py:43-44`)
    cos_o = jnp.clip(wo3[:, 2], 1e-2, None)
    dens = np.asarray(eval_lum(brdf, wi3, wo3) / cos_o).reshape(res, res)
    dens = np.clip(dens, 0.0, None)
    inside_grid = ((grid**2).sum(-1) < 1.0).reshape(res, res)
    dens = np.where(inside_grid, dens, 0.0)
    p = dens / dens.sum()

    hist, _, _ = np.histogram2d(
        x[:, 0], x[:, 1], bins=res, range=[[-1, 1], [-1, 1]]
    )
    q = hist / hist.sum()

    mask = p > (p.max() * 1e-4)
    kl = float(np.sum(p[mask] * np.log((p[mask] + 1e-9) / (q[mask] + 1e-9))))
    # the rectified net is a lossy T=4 distillation, so this is a sanity
    # bound, not a parity bound (reference prints ~this for its own models)
    assert kl < 0.6, kl
    corr = np.corrcoef(p.ravel(), q.ravel())[0, 1]
    assert corr > 0.9, corr


def test_import_every_shipped_checkpoint():
    """All 78 material/domain checkpoint directories the reference ships
    must import cleanly with consistent layer shapes."""
    from bsdf_diffusion_sampling_tpu.interop import import_reference_material
    from bsdf_diffusion_sampling_tpu.models.mlp import mlp_dims

    n_ok = 0
    for d in sorted(os.listdir(CKPT_ROOT)):
        if d.endswith("_disk"):
            mat, domain = d[: -len("_disk")], "disk"
        elif d.startswith("bsdf_") and d.endswith("_spherical"):
            mat, domain = d[len("bsdf_"): -len("_spherical")], "sphere_full"
        elif d.endswith("_spherical"):
            mat, domain = d[: -len("_spherical")], "spherical"
        else:
            continue
        try:
            tree = import_reference_material(CKPT_ROOT, mat, domain)
        except FileNotFoundError:
            # one shipped dir (cc_green_malachite_rgb_spherical) has only a
            # pretrain net — nothing to import
            continue
        base_dims = mlp_dims(tree["base"]["net"])
        assert base_dims == [14, 16, 4], (d, base_dims)
        rect = mlp_dims(tree["rectified"])
        if domain == "disk":
            assert rect == [25, 32, 32, 32, 2], (d, rect)
            assert mlp_dims(tree["teacher"]) == rect, d
        else:
            assert rect == [26, 32, 32, 32, 32, 2], (d, rect)
            assert mlp_dims(tree["teacher"]) == [26, 64, 64, 64, 64, 64, 64, 2], d
        n_ok += 1
    assert n_ok >= 77, n_ok  # 78 dirs upstream; 1 is pretrain-only
