"""Full-sphere BSDF scene (scene_bsdf.xml): table-indexed principled
matball with transmission through the two-sided integrator path.
"""

import jax
import numpy as np
import pytest

from bsdf_diffusion_sampling_tpu.bsdf.materials import BSDF_MATERIALS
from bsdf_diffusion_sampling_tpu.render.integrator import principled_matball, render
from bsdf_diffusion_sampling_tpu.render.scene import load_scene, parse_scene_xml

SCENE = "/root/reference/rendering/matpreview/scene_bsdf.xml"


def test_parse_bsdf_scene():
    d = parse_scene_xml(SCENE)
    assert d.matball_idx == 20
    assert d.matball_albedo == (0.4, 0.8, 0.4)
    assert d.matball_bsdf == ""


def test_principled_matball_render_smoke():
    scene = load_scene(SCENE, width=40, height=40)
    d = scene.desc
    mat = BSDF_MATERIALS[d.matball_idx]
    mb = principled_matball(mat, d.matball_albedo)
    assert mb.transmissive  # spec_trans 0.9 on table entry 20
    img = render(scene, mb, spp=4, spp_chunk=4, max_depth=4)
    assert img.shape == (40, 40, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0.05
    # albedo tint (0.4, 0.8, 0.4): ball center greener than red
    center = img[16:26, 16:26]
    assert center[..., 1].mean() > center[..., 0].mean()
