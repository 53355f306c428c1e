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

# Packed buffers ride as jit ARGUMENTS everywhere: a closure would bake
# 134 MB of program constants into each executable — slow to build, and
# uploading constant-laden programs through the tunneled dev backend has
# been observed to wedge it for tens of minutes.


@functools.partial(jax.jit, static_argnames=("tile", "compact"))
def _kernel_only(seed, c_packed, eps_packed, bw_packed, w_packed, *, tile,
                 compact):
    out = fused_ode._fused_sample_pdf_call(
        seed, c_packed, eps_packed, bw_packed, w_packed,
        T=T, n_layers=N_LAYERS, block=BLOCK, tile=tile, use_prng=True,
        compact=compact)
    return jnp.sum(out[:, :1])


@functools.partial(jax.jit, static_argnames=("tile",))
def _prod_run(seed, c_packed, eps_packed, bw_packed, w_packed, *, tile):
    """Production unit: compact kernel + contiguous reshape/slice +
    consume, one program (mirrors the render bounce jit and bench.py)."""
    out = fused_ode._fused_sample_pdf_call(
        seed, c_packed, eps_packed, bw_packed, w_packed,
        T=T, n_layers=N_LAYERS, block=BLOCK, tile=tile, use_prng=True,
        compact=True)
    m = out.reshape(-1, 8)[:n]
    return jnp.sum(m[:, 2]) + jnp.sum(m[:, 0:2])


@functools.partial(jax.jit, static_argnames=("tile",))
def _split_run(seed, c_packed, eps_packed, bw_packed, w_packed, *, tile):
    """Legacy 2-dispatch-shaped variant kept for comparison: narrow slices
    materialized at the jit boundary (rounds 1-2 bench unit)."""
    x, pdf, x0 = fused_ode._sample_pdf_run(
        seed, c_packed, eps_packed, bw_packed, w_packed,
        n=n, T=T, n_layers=N_LAYERS, block=BLOCK, tile=tile,
        use_prng=True, mxu_dtype="bfloat16")
    return jnp.sum(pdf)


N_LAYERS = len(v_params)
BLOCK = block

for tile in (256, 512, 1024, 2048):
    c_packed, bw_packed, w_packed = prep(tile)
    eps_packed = jnp.zeros((c_packed.shape[0], LANES), jnp.float32)
    args = (c_packed, eps_packed, bw_packed, w_packed)

    report(f"tile={tile:5d} A kernel wide   ",
           chain_time(lambda s: _kernel_only(s, *args, tile=tile,
                                             compact=False)))
    report(f"tile={tile:5d} B kernel compact",
           chain_time(lambda s: _kernel_only(s, *args, tile=tile,
                                             compact=True)))
    report(f"tile={tile:5d} C production    ",
           chain_time(lambda s: _prod_run(s, *args, tile=tile)))
    report(f"tile={tile:5d} D legacy split  ",
           chain_time(lambda s: _split_run(s, *args, tile=tile)))
