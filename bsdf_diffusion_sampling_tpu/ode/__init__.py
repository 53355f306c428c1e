from bsdf_diffusion_sampling_tpu.ode.flow import (  # noqa: F401
    ode_pdf,
    ode_pdf_exact,
    ode_sample,
    ode_sample_only,
)
