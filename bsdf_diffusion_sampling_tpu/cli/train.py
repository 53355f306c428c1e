"""Training CLI — the P12-P14 entry scripts unified.

One command covers the reference's three scripts:
  disk domain    -> `/root/reference/learning_repo_cleanup/disk_domain_sampling.py:140-191`
  spherical      -> `spherical_domain_sampling.py:207-258`
  full sphere    -> `bsdf_correct_sampling.py:207-256`

Usage:
  python -m bsdf_diffusion_sampling_tpu.cli.train \
      --domain disk --material chm_mint_rgb \
      --bsdf-dir /root/reference/rendering/measuredbsdfs \
      --out checkpoints/chm_mint_disk \
      --batch-pretrain "2**20" --iters-pretrain 2000 ...

Materials: an RGL .bsdf basename (measured), "ggx:<roughness>" (analytic),
or "table:<idx>" (the 26-entry principled/dielectric table,
`rendering/utils/bsdf_dict.py` — full-sphere domains only).
Integer args accept python-ish expressions ("2**16", "4900000*2"), like
the reference's eval_arg but parsed safely (core/config.py).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _int_expr(v: str) -> int:
    from bsdf_diffusion_sampling_tpu.core.config import safe_int_expr

    return safe_int_expr(v)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--domain", choices=["disk", "spherical", "sphere_full"],
                   default="disk")
    p.add_argument("--material", default="chm_mint_rgb")
    p.add_argument("--bsdf-dir", default="/root/reference/rendering/measuredbsdfs")
    p.add_argument("--out", default="checkpoints/run")
    p.add_argument("--seed", type=int, default=0)
    # reference defaults (`disk_domain_sampling.py:144-153`), overridable
    p.add_argument("--batch-pretrain", type=_int_expr, default=9_800_000)
    p.add_argument("--iters-pretrain", type=_int_expr, default=10_000)
    p.add_argument("--batch-diffusion", type=_int_expr, default=4_900_000)
    p.add_argument("--iters-diffusion", type=_int_expr, default=40_000)
    p.add_argument("--iters-rectify", type=_int_expr, default=40_000)
    p.add_argument("--timestep-rectify", type=_int_expr, default=256)
    p.add_argument("--num-samples-rectify", type=_int_expr, default=2**16)
    p.add_argument("--batch-wi-rectify", type=_int_expr, default=2**6)
    p.add_argument("--mcmc-steps", type=_int_expr, default=40_000)
    p.add_argument("--mcmc-walkers", type=_int_expr, default=50)
    p.add_argument("--mcmc-burnin", type=_int_expr, default=10_000)
    p.add_argument("--mcmc-bands", type=_int_expr, default=10)
    p.add_argument("--save-every", type=_int_expr, default=1000)
    p.add_argument("--log-every", type=_int_expr, default=100)
    return p


def make_target_pdf(args):
    """Batched (wi, wo) -> unnormalized density over the chosen domain,
    including the domain jacobian (`mitsuba_brdf_scalar.py:43-44,72,88`)."""
    import jax.numpy as jnp

    from bsdf_diffusion_sampling_tpu.geometry.coords import disk_to_cart, spher_to_cart

    name = args.material
    if name.startswith("ggx:"):
        from bsdf_diffusion_sampling_tpu.bsdf import (
            ggx_shading_disk,
            ggx_shading_spherical,
        )

        rough = float(name.split(":", 1)[1])
        if args.domain == "disk":
            return lambda wi, wo: ggx_shading_disk(wi, wo, roughness=rough)
        return lambda wi, wo: (
            ggx_shading_spherical(wi, wo, roughness=rough) * jnp.sin(wo[:, 0])
        )
    if name.startswith("table:"):
        from bsdf_diffusion_sampling_tpu.bsdf import BSDF_MATERIALS, eval_material
        from bsdf_diffusion_sampling_tpu.bsdf.measured import rgb_to_luminance

        mat = BSDF_MATERIALS[int(name.split(":", 1)[1])]

        def pdf_table(wi, wo):
            wi_c = spher_to_cart(wi[:, 0], wi[:, 1])
            wo_c = spher_to_cart(wo[:, 0], wo[:, 1])
            f = eval_material(mat, wi_c, wo_c)
            if f.ndim == wi_c.ndim:  # rgb
                f = rgb_to_luminance(f)
            return f * jnp.sin(wo[:, 0])

        return pdf_table

    # measured RGL file
    from bsdf_diffusion_sampling_tpu.bsdf import eval_lum, load_measured

    path = os.path.join(args.bsdf_dir, name + ".bsdf")
    brdf = load_measured(path)
    if args.domain == "disk":

        def pdf_disk(wi, wo):
            wi_c, wo_c = disk_to_cart(wi), disk_to_cart(wo)
            # eval includes cos(theta_o); disk-area jacobian divides it out
            return eval_lum(brdf, wi_c, wo_c) / jnp.maximum(wo_c[:, 2], 1e-3)

        return pdf_disk

    def pdf_sph(wi, wo):
        wi_c = spher_to_cart(wi[:, 0], wi[:, 1])
        wo_c = spher_to_cart(wo[:, 0], wo[:, 1])
        return eval_lum(brdf, wi_c, wo_c) / jnp.maximum(wo_c[:, 2], 1e-3) * jnp.sin(wo[:, 0])

    return pdf_sph


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    from bsdf_diffusion_sampling_tpu.core.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from bsdf_diffusion_sampling_tpu.core.config import ModelConfig, TrainConfig
    from bsdf_diffusion_sampling_tpu.data import generate_brdf_dataset
    from bsdf_diffusion_sampling_tpu.parallel import make_mesh
    from bsdf_diffusion_sampling_tpu.train import train_material

    os.makedirs(args.out, exist_ok=True)
    pdf_fn = make_target_pdf(args)
    cache = os.path.join(args.out, f"mcmc_{args.domain}_{args.material.replace(':', '_')}.npy")
    print(f"[data] MCMC dataset ({args.mcmc_bands} bands x {args.mcmc_steps} steps "
          f"x {args.mcmc_walkers} walkers) -> {cache}")
    dataset = generate_brdf_dataset(
        jax.random.key(args.seed),
        pdf_fn,
        domain=args.domain,
        nsteps=args.mcmc_steps,
        nwalkers=args.mcmc_walkers,
        piecewise=args.mcmc_bands,
        burn_in=args.mcmc_burnin,
        cache_path=cache,
    )
    print(f"[data] dataset {dataset.shape}")

    if args.domain == "disk":
        model_cfg = ModelConfig(domain="disk")
        teacher_cfg = None  # disk self-distills (`disk_domain_sampling.py:69`)
    else:
        model_cfg = ModelConfig(domain=args.domain, velocity_hidden=32,
                                velocity_layers=4)
        teacher_cfg = ModelConfig(domain=args.domain, velocity_hidden=64,
                                  velocity_layers=6)  # `model.py:449-477`
    train_cfg = TrainConfig(
        batch_pretrain=args.batch_pretrain,
        iters_pretrain=args.iters_pretrain,
        batch_diffusion=args.batch_diffusion,
        iters_diffusion=args.iters_diffusion,
        iters_rectify=args.iters_rectify,
        timestep_rectify=args.timestep_rectify,
        num_samples_rectify=args.num_samples_rectify,
        batch_wi_rectify=args.batch_wi_rectify,
        save_every=args.save_every,
        log_every=args.log_every,
        seed=args.seed,
        checkpoint_dir=args.out,
    )
    params = train_material(dataset, model_cfg, train_cfg, mesh=make_mesh(),
                            teacher_cfg=teacher_cfg)
    from bsdf_diffusion_sampling_tpu.train import checkpoint as ckpt

    # step records the final rectify iteration so downstream metrics
    # (benchmarks/quality_eval.py) can report which checkpoint they saw
    ckpt.save_pytree(os.path.join(args.out, "final.npz"), params,
                     step=train_cfg.iters_rectify)
    print(f"[done] wrote {args.out}/final.npz")


if __name__ == "__main__":
    main()
