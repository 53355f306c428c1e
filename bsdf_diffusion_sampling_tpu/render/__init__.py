from bsdf_diffusion_sampling_tpu.render.integrator import (  # noqa: F401
    MatballFns,
    measured_matball,
    mis_weight,
    neural_matball,
    render,
    render_pass,
)
from bsdf_diffusion_sampling_tpu.render.neural import (  # noqa: F401
    NeuralBSDF,
    make_neural_bsdf,
    neural_eval,
    neural_pdf,
    neural_sample,
)
from bsdf_diffusion_sampling_tpu.render.scene import (  # noqa: F401
    Scene,
    build_scene,
    load_scene,
    parse_scene_xml,
)
