from bsdf_diffusion_sampling_tpu.data.mcmc import (  # noqa: F401
    ensemble_mcmc,
    make_domain_log_prob,
)
from bsdf_diffusion_sampling_tpu.data.datasets import generate_brdf_dataset  # noqa: F401
