"""Material tables — the reference's `bsdf_materials` index (P8).

Parameter values transcribed from
`/root/reference/rendering/utils/bsdf_dict.py` (principled dicts 1-23 at
lines 1-134/166-348, appended in order at :157-166,350-363) and the three
Beckmann bk7 roughdielectrics appended last (:365-393; same trio on the
learning side, `learning_repo_cleanup/utils/bsdf_dict.py:342-344`).

Quirk preserved: the reference defines `dict4_principled` twice and the
second definition (metallic .2, specular .3, roughness .3) shadows the
first before any append runs — index 3 therefore uses the second one.

All entries share spec_tint .5, clearcoat .5/.5, spec_trans .9,
flatness 1.0, sheen .5 (sheen_tint .3 only for #8), anisotropic .7
(.5 for #1-3); only (metallic, specular, roughness) vary otherwise, so
the table is stored as deltas over a common base.
"""

from __future__ import annotations

from typing import List, Union

from bsdf_diffusion_sampling_tpu.bsdf.principled import PrincipledParams
from bsdf_diffusion_sampling_tpu.bsdf.rough import RoughDielectricParams

_BASE = dict(
    spec_tint=0.5,
    anisotropic=0.7,
    sheen=0.5,
    sheen_tint=0.5,
    clearcoat=0.5,
    clearcoat_gloss=0.5,
    spec_trans=0.9,
    flatness=1.0,
)

# (metallic, specular, roughness, overrides)
_PRINCIPLED_ROWS = [
    (0.1, 1.0, 0.2, {"anisotropic": 0.5}),   # 1
    (0.3, 0.7, 0.5, {"anisotropic": 0.5}),   # 2
    (1.0, 0.8, 0.1, {"anisotropic": 0.5}),   # 3
    (0.2, 0.3, 0.3, {}),                     # 4 (second definition wins)
    (0.1, 0.8, 0.3, {}),                     # 5
    (0.1, 1.0, 0.1, {}),                     # 6
    (0.9, 0.7, 0.3, {}),                     # 7
    (0.5, 0.8, 0.3, {"sheen_tint": 0.3}),    # 8
    (0.1, 0.8, 0.3, {}),                     # 9
    (0.3, 0.2, 0.1, {}),                     # 10
    (0.0, 1.0, 0.1, {}),                     # 11
    (0.8, 0.2, 0.1, {}),                     # 12
    (0.6, 0.2, 0.3, {}),                     # 13
    (0.3, 0.2, 0.7, {}),                     # 14
    (0.9, 0.2, 0.5, {}),                     # 15
    (0.9, 0.2, 0.3, {}),                     # 16
    (0.9, 0.2, 0.6, {}),                     # 17
    (0.9, 0.2, 0.9, {}),                     # 18
    (0.1, 0.8, 0.1, {}),                     # 19
    (0.1, 0.5, 0.4, {}),                     # 20
    (0.1, 0.8, 0.3, {}),                     # 21
    (0.1, 0.5, 0.7, {}),                     # 22
    (0.1, 0.3, 0.8, {}),                     # 23
]

MaterialParams = Union[PrincipledParams, RoughDielectricParams]


def _build() -> List[MaterialParams]:
    mats: List[MaterialParams] = []
    for metallic, specular, roughness, over in _PRINCIPLED_ROWS:
        kw = dict(_BASE, metallic=metallic, specular=specular, roughness=roughness)
        kw.update(over)
        mats.append(PrincipledParams(**kw))
    for alpha in (0.2, 0.3, 0.5):
        mats.append(
            RoughDielectricParams(
                alpha=alpha, int_ior="bk7", ext_ior="air", distribution="beckmann"
            )
        )
    return mats


BSDF_MATERIALS: List[MaterialParams] = _build()


def eval_material(params: MaterialParams, wi, wo):
    """Dispatch f*cos eval on the table entry type; scalar luminance for
    principled (white) and dielectric, matching the reference's rgb2lum of
    a grayscale plugin output."""
    from bsdf_diffusion_sampling_tpu.bsdf.principled import eval_principled
    from bsdf_diffusion_sampling_tpu.bsdf.rough import eval_roughdielectric

    if isinstance(params, PrincipledParams):
        return eval_principled(params, wi, wo)
    return eval_roughdielectric(params, wi, wo)
