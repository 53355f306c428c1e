"""Decompose the per-bounce render budget on the real scene.

Times, at a production wavefront (default 2^17 rays) on the matpreview
scene, each phase of the wavefront path tracer in isolation:

  - isect_primary / isect_secondary: packet closest-hit traversal on the
    bounce-0 camera rays and on the REAL bounce-1 state (post-BSDF-sample
    directions from actual hits — not a synthetic workload; the r4 sweep's
    synthetic rows hid a surface-origin pathology);
  - occl_nee: the envmap NEE shadow query from bounce-0 hit points;
  - bounce0 / bounce1: the full per-bounce program (traversal + NEE +
    shading + RR) — the unit the renderer replays max_depth times;
  - shade0 / shade1: bounce minus its two traversal calls (derived).

Timing discipline = bench.py's: one jitted program per phase, iterations
chained through a seed perturbation so no call can be elided, final sync
via host transfer. Run on an otherwise-idle chip: a concurrent trainer
halves every number (the probe prints a matmul preflight so a contended
run is visible).

Usage: python -u benchmarks/render_probe.py [--rays 131072] [--mode gt|neural]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SCENE = "/root/reference/rendering/matpreview/scene_measured.xml"
BSDF = "/root/reference/rendering/measuredbsdfs/chm_mint_rgb.bsdf"


def _sync(x):
    return float(np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0])))


def chain_time(step_fn, iters):
    """step_fn(seed scalar f32) -> device value; chained, median-free
    single window (the caller repeats if dispersion matters). The seed
    derivation is a JITTED call (an eager op here would add ~30 ms per
    iteration on the tunneled backend)."""

    @jax.jit
    def next_seed(v):
        return (jax.tree.leaves(v)[0].ravel()[0] * 0).astype(jnp.float32)

    seed = jnp.float32(0.0)
    v = step_fn(seed)
    seed = next_seed(v)
    _sync(seed)  # compile + warm both
    t0 = time.perf_counter()
    for _ in range(iters):
        v = step_fn(seed)
        seed = next_seed(v)
    _sync(seed)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rays", type=int, default=1 << 17)
    p.add_argument("--mode", choices=["gt", "neural"], default="gt")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--save", default="")
    p.add_argument("--cpu", action="store_true",
                   help="pin CPU (the axon plugin overrides JAX_PLATFORMS)")
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bsdf_diffusion_sampling_tpu.bsdf import load_measured
    from bsdf_diffusion_sampling_tpu.render import traverse8
    from bsdf_diffusion_sampling_tpu.render.integrator import (
        _bounce_program,
        _init_wavefront,
        measured_matball,
    )
    from bsdf_diffusion_sampling_tpu.render.scene import load_scene
    from bsdf_diffusion_sampling_tpu.render.traverse8 import intersect8, occluded8

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        traverse8._INTERPRET = True

    # preflight: a contended/degraded chip shows up here (bench.py's probe)
    x = jnp.full((2048, 2048), 1.0 / 64.0, jnp.bfloat16)

    @jax.jit
    def mm(x):
        def body(c, _):
            return (c @ x).astype(jnp.bfloat16), None
        c, _ = jax.lax.scan(body, x, None, length=8)
        return c[0, 0].astype(jnp.float32)

    _sync(mm(x))
    t0 = time.perf_counter()
    _sync(mm(x))
    probe_ms = (time.perf_counter() - t0) * 1e3

    w = 512
    rows = max(1, args.rays // (w * 4))
    scene = load_scene(SCENE, width=w, height=512)
    brdf = load_measured(BSDF)
    if args.mode == "gt":
        mb = (measured_matball(brdf),)
    else:
        from bsdf_diffusion_sampling_tpu.render.neural import make_neural_bsdf

        nb = make_neural_bsdf("checkpoints/chm_mint_disk_r04/final.npz",
                              brdf=brdf)
        from bsdf_diffusion_sampling_tpu.render.integrator import neural_matball

        mb = (neural_matball(nb),)

    accel = scene.bvh8 if (scene.bvh8 is not None and
                           (on_tpu or traverse8._INTERPRET)) else scene.bvh
    lights = jnp.zeros((0, 6), jnp.float32)
    key = jax.random.key(7)
    state0, k_path = _init_wavefront(scene.camera.vectors, key, 0, width=w,
                                     height=512, spp_chunk=4, rows=rows)
    n = state0[0].shape[0]

    bounce = jax.jit(
        lambda s, d: _bounce_program(accel, scene.envmap, lights, s, k_path,
                                     d, matball=mb, mesh=None),
        static_argnums=(1,),
    )
    state1 = jax.block_until_ready(bounce(state0, 0))
    state2 = jax.block_until_ready(bounce(state1, 1))

    results = {"n_rays": n, "mode": args.mode, "probe_mm_ms": round(probe_ms, 2),
               "backend": jax.default_backend()}

    def t_isect(state):
        ro, rd, _, _, _, alive, _ = state

        @jax.jit
        def step(seed):
            return intersect8(accel, ro + seed, rd, active=alive).t.sum()

        return chain_time(step, args.iters)

    # isect on bounce-0 (camera) and bounce-1 (real secondary) rays
    results["isect_primary_ms"] = round(t_isect(state0) * 1e3, 2)
    results["isect_secondary_ms"] = round(t_isect(state1) * 1e3, 2)
    results["isect_tertiary_ms"] = round(t_isect(state2) * 1e3, 2)
    alive1 = int(np.asarray(state1[5]).sum())
    alive2 = int(np.asarray(state2[5]).sum())
    results["alive_after_b0"] = alive1
    results["alive_after_b1"] = alive2

    # NEE shadow query from bounce-0 hit points (the in-bounce geometry):
    # replay the same envmap draw the bounce makes
    from bsdf_diffusion_sampling_tpu.render.envmap import sample_env

    h0 = jax.block_until_ready(intersect8(accel, state0[0], state0[1],
                                          active=state0[5]))
    p_hit = state0[0] + state0[1] * h0.t[:, None]
    k_nee = jax.random.split(jax.random.fold_in(k_path, 0), 3)[0]
    u_nee = jax.random.uniform(k_nee, (n, 2))
    d_env, _, _ = sample_env(scene.envmap, u_nee)
    live0 = h0.t < 1e29

    @jax.jit
    def occl_step(seed):
        return occluded8(accel, p_hit + seed, d_env, jnp.full((n,), 1e6),
                         active=live0).sum()

    results["occl_nee_ms"] = round(chain_time(occl_step, args.iters) * 1e3, 2)

    # full bounce programs (state carried, seed perturbs origins)
    def t_bounce(state, d):
        @jax.jit
        def step(seed):
            s = (state[0] + seed,) + state[1:]
            return _bounce_program(accel, scene.envmap, lights, s, k_path, d,
                                   matball=mb, mesh=None)

        return chain_time(step, args.iters)

    state3 = jax.block_until_ready(bounce(state2, 2))
    results["alive_after_b2"] = int(np.asarray(state3[5]).sum())
    results["bounce0_ms"] = round(t_bounce(state0, 0) * 1e3, 2)
    results["bounce1_ms"] = round(t_bounce(state1, 1) * 1e3, 2)
    results["bounce2_ms"] = round(t_bounce(state2, 2) * 1e3, 2)
    results["bounce3_ms"] = round(t_bounce(state3, 3) * 1e3, 2)
    results["shade0_ms"] = round(
        results["bounce0_ms"] - results["isect_primary_ms"]
        - results["occl_nee_ms"], 2)
    results["shade1_ms"] = round(
        results["bounce1_ms"] - results["isect_secondary_ms"]
        - results["occl_nee_ms"], 2)

    print(json.dumps(results), flush=True)
    if args.save:
        with open(args.save, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
