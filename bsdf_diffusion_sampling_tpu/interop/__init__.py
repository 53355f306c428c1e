"""Interop with the reference implementation's artifacts.

The reference trains per-material PyTorch nets and transplants them into
tiny-cuda-nn's flat fp16 parameter buffer
(`/root/reference/learning_repo_cleanup/utils/utils.py:13-23`). The TPU-side
analogue is this package: loaders that map reference ``.pth`` state dicts
onto our plain-pytree params, so every trained checkpoint shipped with the
reference (`/root/reference/rendering/checkpoints_new/`, 78 material/domain
directories) runs unmodified through our ODE sampler, Pallas kernels, and
path tracer.
"""

from bsdf_diffusion_sampling_tpu.interop.torch_checkpoints import (
    base_from_state_dict,
    import_reference_material,
    load_state_dict,
    mlp_from_state_dict,
)

__all__ = [
    "base_from_state_dict",
    "import_reference_material",
    "load_state_dict",
    "mlp_from_state_dict",
]
