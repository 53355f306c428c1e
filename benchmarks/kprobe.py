"""Decompose fused sample+pdf time: kernel-only vs compact vs full run.

Prints one line per variant as it completes. Run with -u.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bsdf_diffusion_sampling_tpu.core.config import ModelConfig
from bsdf_diffusion_sampling_tpu.models import get_base, velocity_init
from bsdf_diffusion_sampling_tpu.models.velocity import encode_condition
from bsdf_diffusion_sampling_tpu.ops import fused_ode

cfg = ModelConfig(domain="disk")
key = jax.random.key(0)
k1, k2, k3 = jax.random.split(key, 3)
v_params = velocity_init(k1, cfg)
b_params = get_base("disk").init(k2)
n = 1 << 20
T = 4
iters = int(os.environ.get("ITERS", "20"))
omega_i = jax.random.uniform(k3, (n, 2), minval=-0.7, maxval=0.7)
cond = encode_condition(omega_i, cfg)

block = fused_ode._block_size(v_params)
pack = fused_ode.LANES // block
LANES = fused_ode.LANES


def prep(tile):
    n_pad = ((n + tile * pack - 1) // (tile * pack)) * (tile * pack)
    c_packed = fused_ode._pack_rows(cond.astype(jnp.float32), 3, block, n_pad)
    ones_col = jnp.zeros((n_pad, block), jnp.float32).at[:, block - 1].set(1.0)
    c_packed = c_packed + ones_col.reshape(n_pad // pack, LANES)
    bw_packed = fused_ode._pack_base_weights(b_params, block)
    w_packed = fused_ode.pack_weights(v_params, block)
    jax.block_until_ready((c_packed, bw_packed, w_packed))
    return c_packed, bw_packed, w_packed


def _sync(x):
    return float(np.asarray(jax.device_get(x)))


def chain_time(step_fn, iters=iters):
    """step_fn(seed_arr) -> scalar-ish device value; seeds chained."""
    @jax.jit
    def next_seed(v, i):
        return (i + (v > -1e30).astype(jnp.int32)).reshape(1, 1)

    steps = [jnp.asarray(i, jnp.int32) for i in range(iters + 1)]
    jax.block_until_ready(steps)
    seed = jnp.zeros((1, 1), jnp.int32)
    v = step_fn(seed)
    seed = next_seed(v, steps[0])
    _sync(v)
    t0 = time.perf_counter()
    for i in range(iters):
        v = step_fn(seed)
        seed = next_seed(v, steps[i + 1])
    _sync(v)
    return (time.perf_counter() - t0) / iters


def report(name, dt):
    print(f"{name}: {dt*1e3:8.3f} ms/call  {n/dt/1e6:8.1f} Meval/s", flush=True)


eps_dummy = None

for tile in (256, 512, 1024):
    c_packed, bw_packed, w_packed = prep(tile)
    eps_packed = jnp.zeros((c_packed.shape[0], LANES), jnp.float32)

    call = functools.partial(
        fused_ode._fused_sample_pdf_call,
        T=T, n_layers=len(v_params), block=block, tile=tile, use_prng=True)

    # A: kernel only, consumed by scalar sum (sum fused into same program)
    @jax.jit
    def kernel_only(seed):
        out = call(seed, c_packed, eps_packed, bw_packed, w_packed)
        return jnp.sum(out[:, :1])

    report(f"tile={tile:5d} A kernel+colsum ", chain_time(kernel_only))

    # B: full production run (kernel + compact + split), consume pdf sum
    def full_run(seed):
        x, pdf, x0 = fused_ode._sample_pdf_run(
            seed, c_packed, eps_packed, bw_packed, w_packed,
            n=n, T=T, n_layers=len(v_params), block=block, tile=tile,
            use_prng=True, mxu_dtype="bfloat16")
        return _consume(pdf)

    _consume = jax.jit(lambda pdf: jnp.sum(pdf))
    report(f"tile={tile:5d} B full run      ", chain_time(full_run))
