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
                   help="final.npz from cli.train (neural modes with"
                        " --weights checkpoint)")
    p.add_argument("--weights", choices=["checkpoint", "reference"],
                   default="checkpoint",
                   help="neural modes: 'checkpoint' loads one cli.train npz;"
                        " 'reference' imports the upstream .pth checkpoints"
                        " per matball (works for the 12-ball array scenes)")
    p.add_argument("--reference-ckpts",
                   default="/root/reference/rendering/checkpoints_new")
    p.add_argument("--spp", type=int, default=64)
    p.add_argument("--spp-chunk", type=int, default=4)
    p.add_argument("--max-depth", type=int, default=12)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="out/render")
    p.add_argument("--allow-substitute", action="store_true",
                   help="substitute chm_mint_rgb for matballs whose .bsdf "
                        "file is not shipped (upstream names aniso_* "
                        "materials with no data file). Substitutions are "
                        "recorded in <out>.meta.json so the image cannot be "
                        "mistaken for the named material (ADVICE r3). "
                        "Without the flag, a missing file is an error.")
    return p


def tonemap_srgb(img: np.ndarray) -> np.ndarray:
    lo = img <= 0.0031308
    srgb = np.where(lo, img * 12.92,
                    1.055 * np.power(np.clip(img, 1e-8, None), 1 / 2.4) - 0.055)
    return np.clip(srgb, 0.0, 1.0)


def _model_cfgs(domain):
    from bsdf_diffusion_sampling_tpu.core.config import ModelConfig

    if domain == "disk":
        cfg = ModelConfig(domain="disk")
        return cfg, cfg  # disk self-distills
    cfg = ModelConfig(domain=domain, velocity_hidden=32, velocity_layers=4)
    teacher = ModelConfig(domain=domain, velocity_hidden=64, velocity_layers=6)
    return cfg, teacher


def _load_neural_params(ball, domain, args):
    """Per-ball neural weights: one cli.train npz, or the upstream .pth
    checkpoint directory matching the ball's material."""
    if args.weights == "reference":
        from bsdf_diffusion_sampling_tpu.interop.torch_checkpoints import (
            import_reference_material,
        )

        material = ball["filename"] if ball["idx"] < 0 else str(ball["idx"])
        return import_reference_material(args.reference_ckpts, material, domain)
    import jax

    from bsdf_diffusion_sampling_tpu.models import get_base, velocity_init
    from bsdf_diffusion_sampling_tpu.train import checkpoint as ckpt

    cfg, teacher_cfg = _model_cfgs(domain)
    base = get_base(domain)
    template = {
        "base": base.init(jax.random.key(0)),
        "diffusion": velocity_init(jax.random.key(0), cfg),
        "teacher": velocity_init(jax.random.key(0), teacher_cfg),
        "rectified": velocity_init(jax.random.key(0), cfg),
    }
    params, _ = ckpt.load_pytree(args.checkpoint, template)
    return params


def build_matball(ball: dict, args, substitutions: list | None = None):
    """One MatballFns for one mybsdf hook (gt or neural). Missing .bsdf
    files are an error unless --allow-substitute; allowed substitutions are
    appended to `substitutions` for the output metadata."""
    from bsdf_diffusion_sampling_tpu.bsdf import load_measured
    from bsdf_diffusion_sampling_tpu.render.integrator import (
        measured_matball,
        neural_matball,
        neural_matball_sphere,
        principled_matball,
    )

    table = ball["idx"] >= 0  # scene_bsdf/array2 style (principled table)
    if table:
        from bsdf_diffusion_sampling_tpu.bsdf.materials import BSDF_MATERIALS

        mat, albedo, brdf = BSDF_MATERIALS[ball["idx"]], ball["albedo"], None
    else:
        mat = albedo = None
        path = os.path.join(args.bsdf_dir, ball["filename"] + ".bsdf")
        if not os.path.exists(path):
            # upstream ships only 14 of the RGL data files; array0/1 name
            # aniso_* materials with no .bsdf on disk.
            if not getattr(args, "allow_substitute", False):
                raise FileNotFoundError(
                    f"{path} is not shipped upstream; rerun with "
                    "--allow-substitute to render chm_mint_rgb in its "
                    "place (recorded in <out>.meta.json)"
                )
            sub = os.path.join(args.bsdf_dir, "chm_mint_rgb.bsdf")
            print(f"warning: {path} not shipped upstream; "
                  f"substituting chm_mint_rgb for ball {ball['filename']!r}")
            if substitutions is not None:
                substitutions.append(
                    {"ball": ball["filename"], "substituted": "chm_mint_rgb"}
                )
            path = sub
        brdf = load_measured(path)

    if args.mode == "gt":
        return principled_matball(mat, albedo) if table else measured_matball(brdf)

    from bsdf_diffusion_sampling_tpu.render.neural import make_neural_bsdf

    domain = {"neural-disk": "disk", "neural-spherical": "spherical",
              "neural-sphere": "sphere_full"}[args.mode]
    cfg, _ = _model_cfgs(domain)
    params = _load_neural_params(ball, domain, args)
    nb = make_neural_bsdf(domain, cfg, params["rectified"], params["base"], brdf)
    if args.mode == "neural-sphere":
        return neural_matball_sphere(nb, mat, albedo)
    return neural_matball(nb)


def main(argv=None):
    args = build_parser().parse_args(argv)
    from bsdf_diffusion_sampling_tpu.core.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    from bsdf_diffusion_sampling_tpu.render.integrator import render
    from bsdf_diffusion_sampling_tpu.render.scene import load_scene

    scene = load_scene(args.scene, width=args.width, height=args.height)
    balls = [dict(b) for b in scene.desc.matballs]
    if len(balls) == 1 and balls[0]["idx"] < 0:
        # single-measured-ball scenes render whatever --material says
        # (the reference renders scene_measured.xml per material,
        # `brdf_measured_disk.py:26-29,133`)
        balls[0]["filename"] = args.material
    substitutions: list = []
    mb = tuple(build_matball(b, args, substitutions) for b in balls)

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
    if substitutions:
        import json

        with open(args.out + ".meta.json", "w") as f:
            json.dump({"material_substitutions": substitutions,
                       "mode": args.mode, "material": args.material}, f,
                      indent=1)
        print(f"wrote {args.out}.meta.json (material substitutions)")
    print(f"wrote {args.out}.exr / .png")


if __name__ == "__main__":
    main()
