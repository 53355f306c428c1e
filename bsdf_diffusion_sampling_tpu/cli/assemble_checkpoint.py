"""Assemble a render-ready final.npz from cli.train stage checkpoints.

cli.train writes final.npz only when every stage completes; the stage
files (pretrain.npz / diffusion_simpler.npz / [teacher_complex.npz] /
rectify.npz) are full TrainState snapshots saved every --save-every
iterations. This tool extracts their params into the {base, diffusion,
teacher, rectified} dict cli.render and the eval harnesses expect — the
crash-recovery path for a run killed mid-stage (the reference can only
resume at stage granularity, `spherical_domain_sampling.py:43,126-129`;
here any periodic save is usable).

Usage:
  python -m bsdf_diffusion_sampling_tpu.cli.assemble_checkpoint \
      --dir checkpoints/chm_mint_disk_r04 [--domain disk] [--out final.npz]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dir", required=True)
    p.add_argument("--domain", default="disk",
                   choices=["disk", "spherical", "sphere_full"])
    p.add_argument("--out", default="final.npz")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from bsdf_diffusion_sampling_tpu.core.config import ModelConfig
    from bsdf_diffusion_sampling_tpu.models import get_base, velocity_init
    from bsdf_diffusion_sampling_tpu.train import checkpoint as ckpt
    from bsdf_diffusion_sampling_tpu.train.stages import TrainState

    if args.domain == "disk":
        cfg = teacher_cfg = ModelConfig(domain="disk")
    else:
        cfg = ModelConfig(domain=args.domain, velocity_hidden=32,
                          velocity_layers=4)
        teacher_cfg = ModelConfig(domain=args.domain, velocity_hidden=64,
                                  velocity_layers=6)
    base = get_base(args.domain)

    def load_state(name, params0):
        path = os.path.join(args.dir, name)
        tmpl = TrainState(params0, optax.adam(1e-3).init(params0),
                          jnp.asarray(0, jnp.int32))
        state, step = ckpt.load_pytree(path, tmpl)
        print(f"[{name}] step {step}")
        return state.params

    base_p = load_state("pretrain.npz", base.init(jax.random.key(0)))
    diff_p = load_state("diffusion_simpler.npz",
                        velocity_init(jax.random.key(0), cfg))
    teacher_path = os.path.join(args.dir, "diffusion_complex.npz")
    if os.path.exists(teacher_path):
        teach_p = load_state("diffusion_complex.npz",
                             velocity_init(jax.random.key(0), teacher_cfg))
    else:
        teach_p = diff_p  # disk self-distills
    rect_path = os.path.join(args.dir, "rectify.npz")
    if os.path.exists(rect_path):
        rect_p = load_state("rectify.npz", velocity_init(jax.random.key(0), cfg))
    else:
        print("[rectify.npz] missing — using the diffusion net as sampler")
        rect_p = diff_p

    out = os.path.join(args.dir, args.out)
    ckpt.save_pytree(out, {"base": base_p, "diffusion": diff_p,
                           "teacher": teach_p, "rectified": rect_p}, step=0)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
