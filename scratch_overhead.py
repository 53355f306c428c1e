"""Scratch: decompose the fixed per-call overhead of the fused sample+pdf.

Variants at n=2^20, T=4, tile=1024:
  A kernel-only: consume packed out with an on-device sum (no compact)
  B kernel+compact (reshape to (n,8)), sum
  C full run() (kernel+compact+split), sum of pdf
  D empty-dispatch floor: chain of trivial jitted adds, same count of
    dispatches per iteration as C
"""
import time, functools, jax, jax.numpy as jnp, numpy as np
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
iters = 30
tile = 1024
omega_i = jax.random.uniform(k3, (n, 2), minval=-0.7, maxval=0.7)
cond = encode_condition(omega_i, cfg)

block = fused_ode._block_size(v_params)
pack = fused_ode.LANES // block
n_pad = ((n + tile * pack - 1) // (tile * pack)) * (tile * pack)
c_packed = fused_ode._pack_rows(cond.astype(jnp.float32), 3, block, n_pad)
ones_col = jnp.zeros((n_pad, block), jnp.float32).at[:, block - 1].set(1.0)
c_packed = c_packed + ones_col.reshape(n_pad // pack, fused_ode.LANES)
bw_packed = fused_ode._pack_base_weights(b_params, block)
w_packed = fused_ode.pack_weights(v_params, block)
eps_dummy = jnp.zeros((n_pad // pack, fused_ode.LANES), jnp.float32)
jax.block_until_ready((c_packed, bw_packed, w_packed))

call = functools.partial(
    fused_ode._fused_sample_pdf_call,
    T=T, n_layers=len(v_params), block=block, tile=tile, use_prng=True)

sum_wide = jax.jit(lambda o, s: jnp.sum(o[:, :1]) + jnp.float32(s[0, 0]))
compact = jax.jit(lambda o: o.reshape(-1, block)[:n, :8])
sum8 = jax.jit(lambda m, s: jnp.sum(m[:, 2]) + jnp.float32(s[0, 0]))

@jax.jit
def next_seed(v, i):
    return (i + (v > -1e30).astype(jnp.int32)).reshape(1, 1)

def chain(step, iters=iters):
    steps = [jnp.asarray(i, jnp.int32) for i in range(iters + 1)]
    jax.block_until_ready(steps)
    seed = jnp.zeros((1, 1), jnp.int32)
    v = step(seed)
    seed = next_seed(v, steps[0])
    float(np.asarray(v))
    t0 = time.perf_counter()
    for i in range(iters):
        v = step(seed)
        seed = next_seed(v, steps[i + 1])
    float(np.asarray(v))
    return (time.perf_counter() - t0) / iters * 1e3

def stepA(seed):
    o = call(seed, c_packed, eps_dummy, bw_packed, w_packed)
    return sum_wide(o, seed)

def stepB(seed):
    o = call(seed, c_packed, eps_dummy, bw_packed, w_packed)
    return sum8(compact(o), seed)

run = fused_ode.make_fused_sample_pdf_disk(v_params, b_params, cond, T, tile=tile)
sum_pdf = jax.jit(lambda p, s: jnp.sum(p) + jnp.float32(s[0, 0]))
def stepC(seed):
    x, pdf, x0 = run(seed)
    return sum_pdf(pdf, seed)

trivial = jax.jit(lambda a, s: a + jnp.float32(s[0, 0]))
a0 = jnp.float32(0)
def stepD(seed):
    a = trivial(a0, seed)
    a = trivial(a, seed)
    a = trivial(a, seed)
    return trivial(a, seed)

for name, fn in [("A kernel+sum", stepA), ("B +compact", stepB),
                 ("C full run", stepC), ("D dispatch floor x4", stepD)]:
    ms = chain(fn)
    print(f"{name}: {ms:.2f} ms/iter  ({n*1e-6/(ms*1e-3):.1f} Meval/s)")

# isolate: single-program variants
from bsdf_diffusion_sampling_tpu.ops.fused_ode import _fused_sample_pdf_call

@functools.partial(jax.jit, static_argnames=())
def single_m(seed, c, e, bw, w):
    o = _fused_sample_pdf_call(seed, c, e, bw, w, T=T, n_layers=len(v_params),
                               block=block, tile=tile, use_prng=True)
    return o.reshape(-1, block)[:n, :8]

@jax.jit
def single_pdf(seed, c, e, bw, w):
    o = _fused_sample_pdf_call(seed, c, e, bw, w, T=T, n_layers=len(v_params),
                               block=block, tile=tile, use_prng=True)
    m = o.reshape(-1, block)[:n, :8]
    return m[:, 2]

@jax.jit
def single_3out(seed, c, e, bw, w):
    o = _fused_sample_pdf_call(seed, c, e, bw, w, T=T, n_layers=len(v_params),
                               block=block, tile=tile, use_prng=True)
    m = o.reshape(-1, block)[:n, :8]
    return m[:, 0:2], m[:, 2], m[:, 4:6]

sum_m = jax.jit(lambda m, s: jnp.sum(m[:, 2]) + jnp.float32(s[0, 0]))
def stepE(seed):
    return sum_m(single_m(seed, c_packed, eps_dummy, bw_packed, w_packed), seed)
def stepF(seed):
    return sum_pdf(single_pdf(seed, c_packed, eps_dummy, bw_packed, w_packed), seed)
def stepG(seed):
    x, p, x0 = single_3out(seed, c_packed, eps_dummy, bw_packed, w_packed)
    return sum_pdf(p, seed)

for name, fn in [("E single->m(n,8)", stepE), ("F single->pdf(n,)", stepF),
                 ("G single->3 narrow", stepG)]:
    ms = chain(fn)
    print(f"{name}: {ms:.2f} ms/iter  ({n*1e-6/(ms*1e-3):.1f} Meval/s)")
