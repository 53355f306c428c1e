from bsdf_diffusion_sampling_tpu.core import config, prng  # noqa: F401
