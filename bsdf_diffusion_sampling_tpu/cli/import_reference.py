"""Convert reference ``.pth`` checkpoints into this framework's format.

  python -m bsdf_diffusion_sampling_tpu.cli.import_reference \\
      --material chm_mint_rgb --domain disk \\
      --out checkpoints/chm_mint_disk/final.npz

The output ``final.npz`` is exactly what ``cli.train`` writes, so
``cli.render --mode neural-disk --checkpoint <out>`` renders with the
reference's trained weights — the migration path for users of the reference
(whose plugin loads the same files at
`/root/reference/rendering/brdf_measured_disk.py:43-51`).
"""

from __future__ import annotations

import argparse

CKPT_ROOT_DEFAULT = "/root/reference/rendering/checkpoints_new"


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--material", required=True,
                   help="material name (or bare index for --domain sphere_full)")
    p.add_argument("--domain", choices=["disk", "spherical", "sphere_full"],
                   required=True)
    p.add_argument("--checkpoints-root", default=CKPT_ROOT_DEFAULT)
    p.add_argument("--out", required=True, help="output .npz path")
    args = p.parse_args(argv)

    from bsdf_diffusion_sampling_tpu.interop import import_reference_material
    from bsdf_diffusion_sampling_tpu.train.checkpoint import save_pytree

    tree = import_reference_material(args.checkpoints_root, args.material, args.domain)
    save_pytree(args.out, tree, step=0)
    print(f"imported {args.material} ({args.domain}) -> {args.out}")


if __name__ == "__main__":
    main()
