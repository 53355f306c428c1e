"""Headline benchmark: BSDF sample+pdf throughput, Meval/s on one chip.

Protocol mirrors the reference's render-time hot path: a 2^20-query
wavefront (512x512 @ 4spp, `/root/reference/rendering/utils/mitsuba_helper.py:46`)
pushed through the T=4 disk-domain ODE sampler *with* per-sample exact PDF
(Jacobian-det accumulation) — the per-bounce megakernel call of
`rendering/brdf_measured_disk.py:66-100`. Uses the fully-fused Pallas
kernel (base draw + T-step transport + pdf assembly in one kernel,
ops/fused_ode.py); run with BENCH_XLA=1 to measure the XLA lax.scan
fallback instead. Prints ONE JSON line.

Timing discipline for the tunneled dev backend:
- no eager jnp ops inside the measured loop (each eager dispatch costs
  ~30 ms vs ~0.05 ms for a jitted call);
- every iteration's output feeds the next iteration's input (the runtime
  elides work whose outputs are dropped, so an unchained loop measures
  dispatch, not execution — unchained "timings" here come out 100x above
  the hardware roofline).

The reference publishes no absolute numbers (BASELINE.md), so vs_baseline
is reported against a fixed nominal target of 100 Meval/s/chip — a
roofline-scale figure for the 3x32 MLP at T=4 given the lane-packed MXU
design (see ops/fused_ode.py docstring).
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp

NOMINAL_MEVALS = 100.0


def main() -> None:
    from bsdf_diffusion_sampling_tpu.core.config import ModelConfig
    from bsdf_diffusion_sampling_tpu.models import get_base, velocity_init
    from bsdf_diffusion_sampling_tpu.models.velocity import encode_condition
    from bsdf_diffusion_sampling_tpu.ode import ode_sample
    from bsdf_diffusion_sampling_tpu.ops.fused_ode import make_fused_sample_pdf_disk

    cfg = ModelConfig(domain="disk")
    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    v_params = velocity_init(k1, cfg)
    base = get_base("disk")
    b_params = base.init(k2)

    n = 1 << 20
    T = 4
    iters = 30
    omega_i = jax.random.uniform(k3, (n, 2), minval=-0.7, maxval=0.7)
    cond = encode_condition(omega_i, cfg)
    use_xla = bool(int(os.environ.get("BENCH_XLA", "0")))

    if use_xla:
        # one jitted scan: fold_in + sampler + a scalar carry that chains
        # every iteration into the next
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

        run_scan(k4, 2).block_until_ready()  # compile small
        run_scan(k4, iters).block_until_ready()  # compile large
        t0 = time.perf_counter()
        acc = run_scan(k4, iters)
        acc.block_until_ready()
        t1 = time.perf_counter()
        acc2 = run_scan(k4, 2)
        acc2.block_until_ready()
        dt = (t1 - t0) - (time.perf_counter() - t1)  # subtract fixed overhead
        n_evals = n * (iters - 2)
    else:
        fused = make_fused_sample_pdf_disk(v_params, b_params, cond, T, tile=256)

        # chain: next seed = f(previous pdf), so no kernel can be elided
        @jax.jit
        def next_seed(pdf, i):
            return (i + (pdf[0] > -1.0).astype(jnp.int32)).reshape(1, 1)

        seed = jnp.zeros((1, 1), jnp.int32)
        steps = jnp.arange(iters + 1, dtype=jnp.int32)
        steps = [steps[i] for i in range(iters + 1)]
        jax.block_until_ready(steps)
        x, pdf, _ = fused(seed)
        seed = next_seed(pdf, steps[0])
        jax.block_until_ready(seed)

        t0 = time.perf_counter()
        for i in range(iters):
            x, pdf, _ = fused(seed)
            seed = next_seed(pdf, steps[i + 1])
        jax.block_until_ready((x, pdf, seed))
        dt = time.perf_counter() - t0
        n_evals = n * iters

    mevals = n_evals / dt / 1e6
    print(json.dumps({
        "metric": "bsdf_sample_pdf_throughput" + ("_xla" if use_xla else ""),
        "value": round(mevals, 2),
        "unit": "Meval/s/chip",
        "vs_baseline": round(mevals / NOMINAL_MEVALS, 3),
    }))


if __name__ == "__main__":
    main()
