"""Ray-wavefront sharding over the 8-device CPU mesh.

A sharded render pass must produce (statistically) the same film as the
unsharded one with the same key — the sharding constraint only changes
layout, not math — and must actually distribute the wavefront.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from bsdf_diffusion_sampling_tpu.bsdf import load_measured
from bsdf_diffusion_sampling_tpu.parallel import make_mesh
from bsdf_diffusion_sampling_tpu.render.integrator import measured_matball, render_pass
from bsdf_diffusion_sampling_tpu.render.scene import load_scene

SCENE = "/root/reference/rendering/matpreview/scene_measured.xml"
BSDF = "/root/reference/rendering/measuredbsdfs/chm_mint_rgb.bsdf"


@pytest.mark.slow
def test_sharded_render_matches_single(key):
    scene = load_scene(SCENE, width=32, height=32)
    mb = measured_matball(load_measured(BSDF))
    mesh = make_mesh(8)
    kwargs = dict(matball=mb, width=32, height=32, spp_chunk=8, max_depth=2)
    img_s, cnt_s = render_pass(scene.bvh, scene.envmap, scene.camera.vectors,
                               key, mesh=mesh, **kwargs)
    img_1, cnt_1 = render_pass(scene.bvh, scene.envmap, scene.camera.vectors,
                               key, mesh=None, **kwargs)
    np.testing.assert_array_equal(np.asarray(cnt_s), np.asarray(cnt_1))
    # same key => same samples => same film (sharding is layout, not math)
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_1),
                               rtol=1e-4, atol=1e-5)
    assert np.isfinite(np.asarray(img_s)).all()
