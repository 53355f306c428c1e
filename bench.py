"""Headline benchmark: BSDF sample+pdf throughput, Meval/s on one chip.

Protocol mirrors the reference's render-time hot path: a 2^20-query
wavefront (512x512 @ 4spp, `/root/reference/rendering/utils/mitsuba_helper.py:46`)
pushed through the T=4 disk-domain ODE sampler *with* per-sample exact PDF
(Jacobian-det accumulation) — the per-bounce megakernel call of
`rendering/brdf_measured_disk.py:66-100`. Uses the fused Pallas kernel
(ops/fused_ode.py); run with BENCH_XLA=1 to measure the XLA lax.scan
fallback instead. Prints ONE JSON line.

The reference publishes no absolute numbers (BASELINE.md), so vs_baseline
is reported against a fixed nominal target of 100 Meval/s/chip — a
roofline-scale figure for the 3x32 MLP at T=4 given the lane-packed MXU
design (see ops/fused_ode.py docstring). Measured on v5e: fused ~164
Meval/s vs ~12 Meval/s for the XLA path.
"""

from __future__ import annotations

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
    from bsdf_diffusion_sampling_tpu.ops.fused_ode import fused_ode_transport

    cfg = ModelConfig(domain="disk")
    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    v_params = velocity_init(k1, cfg)
    base = get_base("disk")
    b_params = base.init(k2)

    n = 1 << 20
    T = 4
    omega_i = jax.random.uniform(k3, (n, 2), minval=-0.7, maxval=0.7)
    cond = encode_condition(omega_i, cfg)
    use_xla = bool(int(os.environ.get("BENCH_XLA", "0")))

    if use_xla:
        def run(key):
            return ode_sample("disk", v_params, b_params, omega_i, cond, key, T)
    else:
        # NOTE: the base draw and the fused kernel are dispatched as two
        # top-level jits on purpose. Wrapping the pallas_call in a larger
        # jit graph triggers pathological Mosaic compile times (minutes)
        # on v5e, while standalone the kernel compiles in ~12 s; the extra
        # dispatch costs ~1 ms against a ~6 ms kernel.
        @jax.jit
        def base_draw(key):
            x0 = base.sample(b_params, omega_i, key)
            p0 = jnp.exp(base.log_prob(b_params, x0, omega_i))
            return x0, p0

        def run(key):
            x0, p0 = base_draw(key)
            x, det = fused_ode_transport("disk", v_params, x0, cond, T, tile=256)
            return x, p0 / det

    out = run(k4)
    jax.block_until_ready(out)

    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        out = run(jax.random.fold_in(k4, i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    mevals = n * iters / dt / 1e6
    print(json.dumps({
        "metric": "bsdf_sample_pdf_throughput" + ("_xla" if use_xla else ""),
        "value": round(mevals, 2),
        "unit": "Meval/s/chip",
        "vs_baseline": round(mevals / NOMINAL_MEVALS, 3),
    }))


if __name__ == "__main__":
    main()
