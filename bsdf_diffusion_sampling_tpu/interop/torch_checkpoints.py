"""Import reference PyTorch ``.pth`` checkpoints into our param pytrees.

The counterpart of the reference's torch->tcnn weight transplanting
(`/root/reference/learning_repo_cleanup/utils/utils.py:13-23`, validated by
`tiny-cuda-nn/tmp.py:1-59`), pointed the other way: torch state dicts ->
JAX pytrees. Layer naming in the checkpoints is ``linear1..linearN`` then
``output`` (`/root/reference/learning_repo_cleanup/utils/model.py:374-505`);
torch stores Linear weights as (out, in) and we store (in, out) for
``y = x @ W``, so each weight is transposed on import.

Checkpoint directory layout (`/root/reference/rendering/checkpoints_new/`):
- ``<material>_disk/``: ``brdf_pretrain_network<m>.pth`` (base density),
  ``brdf_diffusion_network<m>.pth`` (velocity, 3x32),
  ``brdf_rectify_network<m>.pth`` (distilled velocity, 3x32)
  (`/root/reference/rendering/brdf_measured_disk.py:43-51`).
- ``<material>_spherical/``: pretrain + ``_simpler`` (4x32) + ``_complex``
  (6x64) diffusion nets + rectify (4x32)
  (`/root/reference/rendering/brdf_measured_spherical.py:52-66`).
- ``bsdf_<idx>_spherical/``: same shape as spherical, for the full-sphere
  transmission models (`/root/reference/rendering/bsdf_myresult.py:31-44`).

torch is imported lazily and only on the host; everything returned is
float32 numpy wrapped in jnp arrays.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from bsdf_diffusion_sampling_tpu.core.pytree import Static


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load a state dict to float32 numpy (host-side, CPU only)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return {k: v.detach().to(torch.float32).numpy() for k, v in sd.items()}


def _layer_order(sd: Dict[str, np.ndarray]) -> List[str]:
    """linear1..linearN then output — numeric sort, not lexicographic."""
    names = {k.split(".")[0] for k in sd}
    linears = sorted(
        (n for n in names if n.startswith("linear")),
        key=lambda n: int(re.search(r"\d+", n).group()),
    )
    if "output" not in names:
        raise ValueError(f"state dict has no 'output' layer: {sorted(names)}")
    return linears + ["output"]


def mlp_from_state_dict(sd: Dict[str, np.ndarray]) -> List[dict]:
    """Map a torch MLP state dict onto our list-of-dict pytree
    (`models/mlp.py` layout: w stored (in, out), optional b)."""
    params = []
    for name in _layer_order(sd):
        layer = {"w": jnp.asarray(sd[f"{name}.weight"].T)}
        if f"{name}.bias" in sd:
            layer["b"] = jnp.asarray(sd[f"{name}.bias"])
        params.append(layer)
    return params


def base_from_state_dict(sd: Dict[str, np.ndarray], pe_bands: int = 3) -> dict:
    """Pretrain-net state dict -> base-density params. The reference base
    nets use PE basis 3 over omega_i (input 14 = 2 + 2*2*3,
    `model.py:375-377`)."""
    net = mlp_from_state_dict(sd)
    in_dim = net[0]["w"].shape[0]
    expect = 2 * (2 * pe_bands + 1)
    if in_dim != expect:
        raise ValueError(f"base net input {in_dim} != PE({pe_bands}) dim {expect}")
    return {"net": net, "pe_bands": Static(pe_bands)}


def _pth(ckpt_dir: str, stem: str, tag: str) -> str:
    return os.path.join(ckpt_dir, f"{stem}{tag}.pth")


def import_reference_material(
    checkpoints_root: str, material: str, domain: str
) -> dict:
    """Load one material/domain checkpoint directory into the pytree the
    training CLI writes (keys base/diffusion/teacher/rectified — consumed by
    `cli/render.py`). ``material`` is e.g. ``chm_mint_rgb`` or, for the
    full-sphere models, the bare material index (``"0"``..``"25"``).
    """
    if domain == "disk":
        ckpt_dir = os.path.join(checkpoints_root, f"{material}_disk")
        base = base_from_state_dict(
            load_state_dict(_pth(ckpt_dir, "brdf_pretrain_network", material))
        )
        diffusion = mlp_from_state_dict(
            load_state_dict(_pth(ckpt_dir, "brdf_diffusion_network", material))
        )
        teacher = diffusion
    elif domain in ("spherical", "sphere_full"):
        stem = material if domain == "spherical" else f"bsdf_{material}"
        ckpt_dir = os.path.join(checkpoints_root, f"{stem}_spherical")
        pre = _pth(ckpt_dir, "brdf_pretrain_network", material)
        if not os.path.exists(pre):
            # the spherical plugin reloads the base net from the _disk dir
            # (`brdf_measured_spherical.py:59`)
            pre = _pth(
                os.path.join(checkpoints_root, f"{material}_disk"),
                "brdf_pretrain_network",
                material,
            )
        base = base_from_state_dict(load_state_dict(pre))
        # a few shipped dirs store the diffusion nets under a legacy name
        # (neusample_pos_diffusion_..._onemode{32,64}.pth — e.g.
        # bsdf_2{3,4,5}_spherical); accept either
        legacy = "neusample_pos_diffusion_brdf_mcmc_pytorch_emcee_onemode"
        simpler = _pth(ckpt_dir, "brdf_diffusion_network_simpler", material)
        if not os.path.exists(simpler):
            simpler = os.path.join(ckpt_dir, f"{legacy}32.pth")
        complex_ = _pth(ckpt_dir, "brdf_diffusion_network_complex", material)
        if not os.path.exists(complex_):
            complex_ = os.path.join(ckpt_dir, f"{legacy}64.pth")
        diffusion = mlp_from_state_dict(load_state_dict(simpler))
        teacher = mlp_from_state_dict(load_state_dict(complex_))
    else:
        raise ValueError(f"unknown domain {domain!r}")

    rectified = mlp_from_state_dict(
        load_state_dict(_pth(ckpt_dir, "brdf_rectify_network", material))
    )
    return {
        "base": base,
        "diffusion": diffusion,
        "teacher": teacher,
        "rectified": rectified,
    }
