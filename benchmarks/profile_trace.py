"""Capture a jax.profiler trace of the hot sample+pdf path.

The tracing/observability subsystem the reference lacks (SURVEY.md section
5: wall-clock prints only). Dumps a TensorBoard-compatible trace under
--out for per-kernel timeline inspection (xprof/tensorboard profile
plugin reads it).

Usage:  python -u benchmarks/profile_trace.py --out /tmp/trace [--n "2**20"]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp


def main(argv=None):
    from bsdf_diffusion_sampling_tpu.core.config import ModelConfig, safe_int_expr
    from bsdf_diffusion_sampling_tpu.models import get_base, velocity_init
    from bsdf_diffusion_sampling_tpu.models.velocity import encode_condition
    from bsdf_diffusion_sampling_tpu.ode import ode_sample
    from bsdf_diffusion_sampling_tpu.ops.fused_ode import make_fused_sample_pdf_disk

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/bsdf_trace")
    p.add_argument("--n", type=safe_int_expr, default="2**20")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--timesteps", type=int, default=4)
    args = p.parse_args(argv)

    cfg = ModelConfig(domain="disk")
    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    v_params = velocity_init(k1, cfg)
    base = get_base("disk")
    b_params = base.init(k2)
    omega_i = jax.random.uniform(k3, (args.n, 2), minval=-0.7, maxval=0.7)
    cond = encode_condition(omega_i, cfg)

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        fused = make_fused_sample_pdf_disk(v_params, b_params, cond,
                                           args.timesteps)
        seed = jnp.zeros((1, 1), jnp.int32)
        jax.block_until_ready(fused(seed))  # compile outside the trace

        @jax.jit
        def next_seed(pdf, s):
            return s + (pdf[0] > -1.0).astype(jnp.int32).reshape(1, 1)

        with jax.profiler.trace(args.out):
            for _ in range(args.iters):
                x, pdf, _ = fused(seed)
                seed = next_seed(pdf, seed)
            jax.block_until_ready((x, pdf))
    else:
        out = ode_sample("disk", v_params, b_params, omega_i, cond, k4,
                         args.timesteps)
        jax.block_until_ready(out)
        with jax.profiler.trace(args.out):
            keys = jax.random.split(k4, args.iters)
            for i in range(args.iters):
                out = ode_sample("disk", v_params, b_params, omega_i, cond,
                                 keys[i], args.timesteps)
            jax.block_until_ready(out)
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
