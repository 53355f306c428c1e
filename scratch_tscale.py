import time, jax, jax.numpy as jnp, numpy as np
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

for T in (1, 2, 4, 8):
    fused = fused_ode.make_fused_sample_pdf_disk(v_params, b_params, cond, T, tile=1024)
    dt = timed_chain(fused, iters)
    print(f"T={T}: {dt/iters*1e3:.2f} ms/call  ({n*iters/dt/1e6:.1f} Meval/s)")

# also: mxu float32 (HIGHEST) at T=4 for reference
fused = fused_ode.make_fused_sample_pdf_disk(v_params, b_params, cond, 4, tile=1024, mxu_dtype="float32")
dt = timed_chain(fused, iters)
print(f"T=4 fp32-HIGHEST: {dt/iters*1e3:.2f} ms/call  ({n*iters/dt/1e6:.1f} Meval/s)")
