"""Throughput sweep: sample+pdf Meval/s across batch sizes, with roofline.

The TPU analogue of tiny-cuda-nn's image benchmark, which sweeps batch
sizes 2^14..2^21 and reports samples/s
(`/root/reference/tiny-cuda-nn/benchmarks/image/bench_ours.cu:188-285`).
Here the workload is this framework's hot path — the T=4 disk-domain
sample+pdf megakernel — measured for both the fused Pallas kernel and the
XLA lax.scan fallback, with the dependency-chained timing discipline of
bench.py (the dev tunnel elides unconsumed work).

Per batch size prints one JSON line:
  {"batch": N, "fused_mevals": ..., "xla_mevals": ...,
   "fused_ms": ..., "mxu_util": ...}

mxu_util is raw kernel FLOPs (including the 4x lane-packing redundancy of
the block-diagonal weights) over the MXU peak — the fraction of the
achievable ceiling for this layout. The kernel's default mxu_dtype is
single-pass bf16, so the peak defaults to 197 TFLOP/s (v5e bf16);
override with BENCH_PEAK_TFLOPS (use ~49 when sweeping
--mxu-dtype float32, which forces the 3/6-pass fp32-accurate mode).

Usage:  python -u benchmarks/sweep.py [--batches 14 15 ... 21] [--iters 20]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import functools
import json
import os
import time

import jax
import jax.numpy as jnp


def _flops_per_eval(T: int, n_layers: int, lanes: int, pack: int, streams: int = 3) -> float:
    """Raw MXU flops per sample: T steps x streams x n_layers 128x128
    matmuls amortized over `pack` lane-packed samples."""
    return T * streams * n_layers * (2.0 * lanes * lanes) / pack


def run_sweep(batches, iters, T=4, tile=256):
    from bsdf_diffusion_sampling_tpu.core.config import ModelConfig
    from bsdf_diffusion_sampling_tpu.models import get_base, velocity_init
    from bsdf_diffusion_sampling_tpu.models.velocity import encode_condition
    from bsdf_diffusion_sampling_tpu.ode import ode_sample
    from bsdf_diffusion_sampling_tpu.ops import fused_ode

    on_tpu = jax.default_backend() == "tpu"
    peak_tflops = float(os.environ.get("BENCH_PEAK_TFLOPS", "197.0"))

    cfg = ModelConfig(domain="disk")
    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    v_params = velocity_init(k1, cfg)
    base = get_base("disk")
    b_params = base.init(k2)

    results = []
    for log2n in batches:
        n = 1 << log2n
        omega_i = jax.random.uniform(k3, (n, 2), minval=-0.7, maxval=0.7)
        cond = encode_condition(omega_i, cfg)

        row = {"batch": n}

        # ---- fused Pallas path (TPU only; interpret mode is not a perf path)
        if on_tpu:
            fused = fused_ode.make_fused_sample_pdf_disk(
                v_params, b_params, cond, T, tile=min(tile, max(8, n // 512))
            )

            @jax.jit
            def next_seed(pdf, i):
                return (i + (pdf[0] > -1.0).astype(jnp.int32)).reshape(1, 1)

            steps = [jnp.asarray(i, jnp.int32) for i in range(iters + 1)]
            jax.block_until_ready(steps)
            seed = jnp.zeros((1, 1), jnp.int32)
            x, pdf, _ = fused(seed)
            seed = next_seed(pdf, steps[0])
            jax.block_until_ready(seed)
            t0 = time.perf_counter()
            for i in range(iters):
                x, pdf, _ = fused(seed)
                seed = next_seed(pdf, steps[i + 1])
            jax.block_until_ready((x, pdf, seed))
            dt = time.perf_counter() - t0
            row["fused_mevals"] = round(n * iters / dt / 1e6, 2)
            row["fused_ms"] = round(dt / iters * 1e3, 3)
            block = fused_ode._block_size(v_params)
            fl = _flops_per_eval(T, len(v_params), fused_ode.LANES,
                                 fused_ode.LANES // block)
            row["mxu_util"] = round(n * iters * fl / dt / (peak_tflops * 1e12), 3)

        # ---- XLA lax.scan fallback
        @functools.partial(jax.jit, static_argnames=("m",))
        def run_scan(key, m):
            def body(carry, i):
                x, pdf = ode_sample(
                    "disk", v_params, b_params, omega_i, cond,
                    jax.random.fold_in(key, i + carry.astype(jnp.int32) * 0), T,
                )
                return carry + pdf.sum() + x.sum(), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(m))
            return acc

        run_scan(k4, iters).block_until_ready()  # compile
        t0 = time.perf_counter()
        run_scan(k4, iters).block_until_ready()
        dt = time.perf_counter() - t0
        row["xla_mevals"] = round(n * iters / dt / 1e6, 2)

        print(json.dumps(row), flush=True)
        results.append(row)
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batches", type=int, nargs="+",
                   default=list(range(14, 22)),
                   help="log2 batch sizes (default 14..21, tcnn protocol)")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--timesteps", type=int, default=4)
    args = p.parse_args(argv)
    run_sweep(args.batches, args.iters, T=args.timesteps)


if __name__ == "__main__":
    main()
