"""The 8 disney_bsdf_array scenes: parsing + point-light/multi-ball renders.

These are the reference's P24 render set for the full-sphere models
(`/root/reference/rendering/matpreview/disney_bsdf_array*.xml`): version
0.5.0 dialect, 12 per-shape inline mybsdf materials arranged in a grid,
and either an envmap or a point-light emitter
(`disney_bsdf_array0_pointlight.xml:384-387`).
"""

import glob

import numpy as np
import pytest

from bsdf_diffusion_sampling_tpu.bsdf import load_measured
from bsdf_diffusion_sampling_tpu.bsdf.materials import BSDF_MATERIALS
from bsdf_diffusion_sampling_tpu.render.integrator import (
    measured_matball,
    principled_matball,
    render,
)
from bsdf_diffusion_sampling_tpu.render.scene import (
    MAT_BALL,
    load_scene,
    parse_scene_xml,
)

MATPREVIEW = "/root/reference/rendering/matpreview"
BSDF_DIR = "/root/reference/rendering/measuredbsdfs"


def test_all_ten_scene_xmls_parse():
    paths = sorted(glob.glob(f"{MATPREVIEW}/*.xml"))
    assert len(paths) == 10
    for p in paths:
        d = parse_scene_xml(p)
        assert d.width > 0 and d.height > 0
        assert len(d.shapes) in (3, 25)
        assert d.envmap_path or d.point_lights.shape[0] > 0


def test_array_scene_materials():
    d = parse_scene_xml(f"{MATPREVIEW}/disney_bsdf_array0_pointlight.xml")
    assert len(d.matballs) == 12
    assert all(b["filename"] and b["idx"] < 0 for b in d.matballs)
    # 12 shells (one per ball) + 12 interiors + plane
    ball_ids = [s["material"] for s in d.shapes if s["material"] >= MAT_BALL]
    assert sorted(ball_ids) == list(range(MAT_BALL, MAT_BALL + 12))
    assert d.max_depth == 2
    np.testing.assert_allclose(d.point_lights[0], [0, 4.0, 5.0, 200, 200, 200])

    d2 = parse_scene_xml(f"{MATPREVIEW}/disney_bsdf_array2_spherical_envmap.xml")
    assert len(d2.matballs) == 12
    assert all(b["idx"] >= 0 and not b["filename"] for b in d2.matballs)
    assert all(len(b["albedo"]) == 3 for b in d2.matballs)


@pytest.fixture(scope="module")
def array_pointlight_scene():
    return load_scene(f"{MATPREVIEW}/disney_bsdf_array0_pointlight.xml",
                      width=64, height=48)


def _measured_matballs(desc):
    """Per-ball measured materials. The reference vendors only 14 of the
    RGL .bsdf files — array0/1 also name aniso_* materials whose data
    files are absent upstream (only their checkpoints ship); substitute
    chm_mint for those so the multi-ball machinery is still exercised."""
    import os

    mbs = []
    for b in desc.matballs:
        path = f"{BSDF_DIR}/{b['filename']}.bsdf"
        if not os.path.exists(path):
            path = f"{BSDF_DIR}/chm_mint_rgb.bsdf"
        mbs.append(measured_matball(load_measured(path)))
    return tuple(mbs)


@pytest.mark.slow
def test_array_pointlight_render_smoke(array_pointlight_scene):
    """Point-light NEE through the 12-ball wavefront: finite, lit, and the
    checkerboard plane shows the 1/r^2 falloff (no envmap => everything
    comes from the delta light)."""
    sc = array_pointlight_scene
    mbs = _measured_matballs(sc.desc)
    img = render(sc, mbs, seed=0, spp=4, spp_chunk=4, max_depth=2)
    assert img.shape == (48, 64, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01, "point light contributes no radiance"
    # with only a delta light, escaped camera rays are black
    assert (img.max(axis=-1) == 0).any()


@pytest.mark.slow
def test_array_envmap_render_smoke():
    """array2: 12 principled-table balls + envmap, full-sphere GT mode."""
    sc = load_scene(f"{MATPREVIEW}/disney_bsdf_array2_spherical_envmap.xml",
                    width=64, height=48)
    mbs = tuple(
        principled_matball(BSDF_MATERIALS[b["idx"]], b["albedo"])
        for b in sc.desc.matballs
    )
    img = render(sc, mbs, seed=0, spp=4, spp_chunk=4, max_depth=2)
    assert img.shape == (48, 64, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0.05
