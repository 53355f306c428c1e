"""Scratch: kernel variant timings with true host-transfer sync."""
import time, functools, jax, jax.numpy as jnp, numpy as np
from bsdf_diffusion_sampling_tpu.core.config import ModelConfig
from bsdf_diffusion_sampling_tpu.models import get_base, velocity_init
from bsdf_diffusion_sampling_tpu.models.velocity import encode_condition
from bsdf_diffusion_sampling_tpu.ops import fused_ode

cfg = ModelConfig(domain="disk")
key = jax.random.key(0)
k1, k2, k3, k4 = jax.random.split(key, 4)
v_params = velocity_init(k1, cfg)
b_params = get_base("disk").init(k2)
n = 1 << 20
T = 4
iters = 30
omega_i = jax.random.uniform(k3, (n, 2), minval=-0.7, maxval=0.7)
cond = encode_condition(omega_i, cfg)

def timed_chain(fused, iters=30):
    @jax.jit
    def next_seed(pdf, i):
        return (i + (pdf[0] > -1.0).astype(jnp.int32)).reshape(1, 1)
    reduce_ = jax.jit(lambda pdf, s: jnp.sum(pdf) + jnp.float32(s[0, 0]))
    steps = [jnp.asarray(i, jnp.int32) for i in range(iters + 1)]
    jax.block_until_ready(steps)
    seed = jnp.zeros((1, 1), jnp.int32)
    x, pdf, _ = fused(seed)
    seed = next_seed(pdf, steps[0])
    float(np.asarray(reduce_(pdf, seed)))
    t0 = time.perf_counter()
    for i in range(iters):
        x, pdf, _ = fused(seed)
        seed = next_seed(pdf, steps[i + 1])
    float(np.asarray(reduce_(pdf, seed)))
    return time.perf_counter() - t0

for tile in (128, 256, 512, 1024):
    fused = fused_ode.make_fused_sample_pdf_disk(v_params, b_params, cond, T, tile=tile)
    dt = timed_chain(fused, iters)
    print(f"sample_pdf tile={tile}: {n*iters/dt/1e6:.1f} Meval/s ({dt/iters*1e3:.2f} ms/call)")

# transport without jacobians (1 stream instead of 3)
x0 = jax.random.normal(k4, (n, 2)) * 0.3
tr = jax.jit(lambda x0, s: fused_ode.fused_ode_transport(
    "disk", v_params, x0 + 0.0 * s, cond, T, with_jac=False, tile=1024)[0])
y = tr(x0, jnp.float32(0)); float(np.asarray(jnp.sum(y)))
t0 = time.perf_counter()
s = jnp.float32(0)
for i in range(iters):
    y = tr(x0, s); s = jnp.sum(y) * 0
sv = float(np.asarray(jnp.sum(y)))
dt = time.perf_counter() - t0
print(f"transport nojac tile=1024: {n*iters/dt/1e6:.1f} Meval/s ({dt/iters*1e3:.2f} ms/call)")

# with jac
trj = jax.jit(lambda x0, s: fused_ode.fused_ode_transport(
    "disk", v_params, x0 + 0.0 * s, cond, T, with_jac=True, tile=1024)[0])
y = trj(x0, jnp.float32(0)); float(np.asarray(jnp.sum(y)))
t0 = time.perf_counter()
s = jnp.float32(0)
for i in range(iters):
    y = trj(x0, s); s = jnp.sum(y) * 0
sv = float(np.asarray(jnp.sum(y)))
dt = time.perf_counter() - t0
print(f"transport  jac  tile=1024: {n*iters/dt/1e6:.1f} Meval/s ({dt/iters*1e3:.2f} ms/call)")

# raw matmul ceiling for the same chain shape: T*L sequential (3*tile,128)@(128,128)
for tile in (256, 1024):
    M = 3 * tile
    a = jax.random.normal(k4, (M, 128), jnp.float32)
    w = jax.random.normal(k1, (16, 128, 128), jnp.float32)
    @jax.jit
    def mm(a, w):
        for i in range(16):
            a = jnp.dot(a, w[i], preferred_element_type=jnp.float32)
        return a
    grid_steps = n // (tile * 4)
    b = mm(a, w); float(np.asarray(jnp.sum(b)))
    t0 = time.perf_counter()
    x_ = a
    for i in range(grid_steps):
        x_ = mm(x_ * 1e-6, w)
    float(np.asarray(jnp.sum(x_)))
    dt = time.perf_counter() - t0
    fl = grid_steps * 16 * 2 * M * 128 * 128
    print(f"raw 16-chain matmul tile={tile}: {fl/dt/1e12:.1f} TFLOP/s ({dt/grid_steps*1e3:.3f} ms per 16)")
