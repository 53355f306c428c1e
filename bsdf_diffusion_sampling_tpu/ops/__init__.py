from bsdf_diffusion_sampling_tpu.ops.fused_ode import (  # noqa: F401
    fused_ode_transport,
    pack_weights,
)
