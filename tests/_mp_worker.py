"""Worker for the 2-process distributed test (launched by
test_multiprocess.py). Each process owns 4 virtual CPU devices; the two
processes form one 8-device global mesh via jax.distributed.

Prints exactly two lines consumed by the parent:
  MPRESULT count=<process_count> devices=<global_device_count> \
sum=<global_sum> loss=<loss>
  MPOK
"""

import os
import sys

# CPU with 4 local virtual devices, pinned BEFORE any backend spin-up
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bsdf_diffusion_sampling_tpu.parallel.distributed import (  # noqa: E402
    init_distributed,
)


def main() -> None:
    coord = sys.argv[1]
    pid = int(sys.argv[2])

    # must run before any backend-initializing jax API (the contract
    # distributed.py:26-82 documents)
    is_multi = init_distributed(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    assert is_multi, "init_distributed did not report a multi-process runtime"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp  # noqa: E402
    import numpy as np  # noqa: E402
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

    from bsdf_diffusion_sampling_tpu.core.config import ModelConfig  # noqa: E402
    from bsdf_diffusion_sampling_tpu.models import velocity_init  # noqa: E402
    from bsdf_diffusion_sampling_tpu.models.velocity import (  # noqa: E402
        encode_condition,
        velocity_apply,
    )

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sh_data = NamedSharding(mesh, P("data"))
    sh_rep = NamedSharding(mesh, P())

    # ---- collective proof #1: global sum over a process-sharded array.
    # process 0's devices hold 1.0, process 1's hold 2.0; the global sum
    # (4*8*1 + 4*8*2 = 96) is computable only by crossing the process
    # boundary.
    local = np.full((4 * 8,), float(pid + 1), np.float32)
    gx = jax.make_array_from_process_local_data(sh_data, local)
    total = float(jax.jit(jnp.sum, out_shardings=sh_rep)(gx))

    # ---- collective proof #2: one global-mesh diffusion-style step —
    # batch sharded across processes, params replicated, the mean-loss
    # gradient psum'd by XLA from the shardings. Identical loss on both
    # processes requires the cross-process all-reduce.
    cfg = ModelConfig(domain="disk")
    params_host = jax.tree.map(
        np.asarray, velocity_init(jax.random.key(0), cfg)
    )
    params = jax.tree.map(
        lambda a: jax.make_array_from_callback(
            a.shape, sh_rep, lambda idx: a[idx]
        ),
        params_host,
    )
    n_local = 32
    rng = np.random.default_rng(100 + pid)  # DIFFERENT data per process
    wi_local = rng.uniform(-0.5, 0.5, (n_local, 2)).astype(np.float32)
    x_local = rng.uniform(-0.5, 0.5, (n_local, 2)).astype(np.float32)
    wi = jax.make_array_from_process_local_data(sh_data, wi_local)
    x = jax.make_array_from_process_local_data(sh_data, x_local)

    @jax.jit
    def loss_and_grad(p, wi, x):
        def loss(p):
            cond = encode_condition(wi, cfg)
            alpha = jnp.full(x.shape[:1] + (1,), 0.5, x.dtype)
            v = velocity_apply(p, x, alpha, cond)
            return jnp.mean(jnp.sum(v**2, axis=-1))

        return jax.value_and_grad(loss)(p)

    lv, grads = loss_and_grad(params, wi, x)
    lv = float(lv)
    g0 = float(jnp.sum(jax.tree.leaves(grads)[0] ** 2))

    print(f"MPRESULT count={jax.process_count()} devices={len(jax.devices())} "
          f"sum={total} loss={lv:.8f} gnorm={g0:.8f}", flush=True)
    print("MPOK", flush=True)


if __name__ == "__main__":
    main()
