"""Render CLI — the P19 render mains unified.

Equivalent of `python brdf_measured_disk.py --scene_file <material>`
(`/root/reference/rendering/brdf_measured_disk.py:133-164`): loads the
matpreview scene, installs the matball material (ground-truth measured
sampling, or a trained neural sampler from a checkpoint directory), renders
spp samples in accumulation passes, writes PNG + EXR, prints wall-clock.

  python -m bsdf_diffusion_sampling_tpu.cli.render \
      --material chm_mint_rgb --mode gt --spp 64 --out out/chm_mint
  python -m bsdf_diffusion_sampling_tpu.cli.render \
      --material chm_mint_rgb --mode neural-disk \
      --checkpoint checkpoints/chm_mint_disk/final.npz --out out/chm_mint_nn
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

SCENE_DEFAULT = "/root/reference/rendering/matpreview/scene_measured.xml"
BSDF_DIR_DEFAULT = "/root/reference/rendering/measuredbsdfs"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", default=SCENE_DEFAULT)
    p.add_argument("--material", default="chm_mint_rgb")
    p.add_argument("--bsdf-dir", default=BSDF_DIR_DEFAULT)
    p.add_argument("--mode",
                   choices=["gt", "neural-disk", "neural-spherical",
                            "neural-sphere"],
                   default="gt",
                   help="gt: measured (scene_measured) or analytic principled"
                        " (scene_bsdf) sampling; neural-*: trained sampler")
    p.add_argument("--checkpoint", default="",
                   help="final.npz from cli.train (required for neural modes)")
    p.add_argument("--spp", type=int, default=64)
    p.add_argument("--spp-chunk", type=int, default=4)
    p.add_argument("--max-depth", type=int, default=12)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="out/render")
    return p


def tonemap_srgb(img: np.ndarray) -> np.ndarray:
    lo = img <= 0.0031308
    srgb = np.where(lo, img * 12.92,
                    1.055 * np.power(np.clip(img, 1e-8, None), 1 / 2.4) - 0.055)
    return np.clip(srgb, 0.0, 1.0)


def main(argv=None):
    args = build_parser().parse_args(argv)
    from bsdf_diffusion_sampling_tpu.bsdf import load_measured
    from bsdf_diffusion_sampling_tpu.render.integrator import (
        measured_matball,
        neural_matball,
        render,
    )
    from bsdf_diffusion_sampling_tpu.render.scene import load_scene

    scene = load_scene(args.scene, width=args.width, height=args.height)
    table_scene = scene.desc.matball_idx >= 0  # scene_bsdf.xml style
    brdf = None
    mat = albedo = None
    if table_scene:
        from bsdf_diffusion_sampling_tpu.bsdf.materials import BSDF_MATERIALS

        mat = BSDF_MATERIALS[scene.desc.matball_idx]
        albedo = scene.desc.matball_albedo
    else:
        brdf = load_measured(os.path.join(args.bsdf_dir, args.material + ".bsdf"))

    if args.mode == "gt":
        from bsdf_diffusion_sampling_tpu.render.integrator import principled_matball

        mb = principled_matball(mat, albedo) if table_scene else measured_matball(brdf)
    else:
        import jax

        from bsdf_diffusion_sampling_tpu.core.config import ModelConfig
        from bsdf_diffusion_sampling_tpu.models import get_base, velocity_init
        from bsdf_diffusion_sampling_tpu.render.integrator import neural_matball_sphere
        from bsdf_diffusion_sampling_tpu.render.neural import make_neural_bsdf
        from bsdf_diffusion_sampling_tpu.train import checkpoint as ckpt

        domain = {"neural-disk": "disk", "neural-spherical": "spherical",
                  "neural-sphere": "sphere_full"}[args.mode]
        if domain == "disk":
            cfg = ModelConfig(domain="disk")
            teacher_cfg = cfg  # disk self-distills
        else:
            cfg = ModelConfig(domain=domain, velocity_hidden=32,
                              velocity_layers=4)
            teacher_cfg = ModelConfig(domain=domain, velocity_hidden=64,
                                      velocity_layers=6)
        base = get_base(domain)
        template = {
            "base": base.init(jax.random.key(0)),
            "diffusion": velocity_init(jax.random.key(0), cfg),
            "teacher": velocity_init(jax.random.key(0), teacher_cfg),
            "rectified": velocity_init(jax.random.key(0), cfg),
        }
        params, _ = ckpt.load_pytree(args.checkpoint, template)
        nb = make_neural_bsdf(domain, cfg, params["rectified"], params["base"], brdf)
        if args.mode == "neural-sphere":
            mb = neural_matball_sphere(nb, mat, albedo)
        else:
            mb = neural_matball(nb)

    t0 = time.perf_counter()
    img = render(scene, mb, seed=args.seed, spp=args.spp,
                 spp_chunk=args.spp_chunk, max_depth=args.max_depth)
    dt = time.perf_counter() - t0
    n_rays = args.width * args.height * args.spp
    print(f"rendering time: {dt:.2f} s  ({n_rays / dt / 1e6:.2f} Mray-samples/s)")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    from PIL import Image

    from bsdf_diffusion_sampling_tpu.native.exr import write_exr

    write_exr(args.out + ".exr", img)
    Image.fromarray((tonemap_srgb(img) * 255).astype(np.uint8)).save(args.out + ".png")
    print(f"wrote {args.out}.exr / .png")


if __name__ == "__main__":
    main()
