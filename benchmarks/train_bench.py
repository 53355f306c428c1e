"""Training-step throughput: diffusion-stage samples/s on the local mesh.

Counterpart of the reference's training defaults (40k iters @ 4.9M batch,
`/root/reference/learning_repo_cleanup/disk_domain_sampling.py:144-153`) —
measures how many flow-matching training samples/s one step sustains,
data-parallel over all local devices. Dependency-chained (the train state
threads through every step, so nothing can be elided).

Usage:  python -u benchmarks/train_bench.py [--batch "2**20"] [--iters 20]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp
import optax


def main(argv=None):
    from bsdf_diffusion_sampling_tpu.core.config import ModelConfig, safe_int_expr
    from bsdf_diffusion_sampling_tpu.models import get_base, velocity_init
    from bsdf_diffusion_sampling_tpu.parallel import make_mesh
    from bsdf_diffusion_sampling_tpu.train import init_state, make_diffusion_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=safe_int_expr, default="2**20")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dataset-rows", type=safe_int_expr, default="2**22")
    args = p.parse_args(argv)

    mesh = make_mesh(jax.device_count())
    cfg = ModelConfig(domain="disk")
    key = jax.random.key(0)
    k_b, k_v, k_d = jax.random.split(key, 3)
    base = get_base("disk")
    base_params = base.init(k_b)
    tx = optax.adam(1e-3)
    state = init_state(velocity_init(k_v, cfg), tx)

    n_rows = args.dataset_rows - args.dataset_rows % jax.device_count()
    dataset = jax.random.uniform(k_d, (n_rows, 4), minval=-0.5, maxval=0.5)
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    state = jax.device_put(state, repl)
    base_params = jax.device_put(base_params, repl)
    dataset = jax.device_put(dataset, shard)

    raw_step = make_diffusion_step("disk", cfg, tx)
    bs = args.batch - args.batch % jax.device_count()
    step = jax.jit(
        lambda s, k: raw_step(s, base_params, dataset, k, bs),
        in_shardings=(repl, repl),
    )
    import numpy as np

    def _sync(x):
        # host transfer: block_until_ready returns at enqueue time on the
        # tunneled axon backend (bench.py module docstring)
        return float(np.asarray(jax.device_get(x)))

    keys = [jax.random.fold_in(key, i) for i in range(args.iters + 1)]
    jax.block_until_ready(keys)
    state, loss = step(state, keys[0])
    _sync(loss)

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, loss = step(state, keys[i + 1])  # state chains the iterations
    _sync(loss)
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "diffusion_train_throughput",
        "batch": bs,
        "devices": jax.device_count(),
        "value": round(bs * args.iters / dt / 1e6, 2),
        "unit": "Msamples/s",
        "step_ms": round(dt / args.iters * 1e3, 2),
        "final_loss": float(loss),
    }))


if __name__ == "__main__":
    main()
