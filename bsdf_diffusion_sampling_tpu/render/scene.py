"""Scene description: Mitsuba-XML subset parser + matpreview assembly.

Parses the reference's scene XMLs (`/root/reference/rendering/matpreview/
scene_measured.xml`, `scene_bsdf.xml`) directly — same <default>
substitution, <transform> composition (each child left-multiplies the
accumulated matrix), perspective <sensor>, serialized <shape>s, envmap
<emitter>, and the `mybsdf` hook the reference registers for its neural
material (`brdf_measured_disk.py:140`, `scene_measured.xml:60-62`).

Output is a device-ready Scene: BVH over all world-space triangles with
per-triangle material ids, the envmap, the camera, and a material table
(0 = checkerboard plane, 1 = gray diffuse, 2 = matball).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Dict, List, NamedTuple, Optional

import numpy as np

from bsdf_diffusion_sampling_tpu.render.bvh import BVHArrays, build_bvh
from bsdf_diffusion_sampling_tpu.render.camera import Camera, make_camera
from bsdf_diffusion_sampling_tpu.render.envmap import EnvMap, load_envmap
from bsdf_diffusion_sampling_tpu.render.mesh import (
    build_soup,
    load_serialized,
    transform_mesh,
)

MAT_PLANE = 0
MAT_DIFFUSE = 1
MAT_BALL = 2


@dataclass
class SceneDesc:
    camera: Camera
    width: int
    height: int
    spp: int
    max_depth: int
    envmap_path: str
    envmap_to_world: np.ndarray
    envmap_scale: float
    shapes: List[dict] = field(default_factory=list)  # filename/index/to_world/mat
    matball_bsdf: str = ""  # mybsdf "filename" (measured material) if present
    matball_idx: int = -1  # mybsdf "idx" (material-table entry) if present
    matball_albedo: tuple = (1.0, 1.0, 1.0)  # mybsdf tint (scene_bsdf.xml:61)


class Scene(NamedTuple):
    bvh: BVHArrays
    envmap: EnvMap
    camera: Camera
    desc: SceneDesc


def _rotation(axis: np.ndarray, angle_deg: float) -> np.ndarray:
    a = np.deg2rad(angle_deg)
    x, y, z = axis / np.linalg.norm(axis)
    c, s = np.cos(a), np.sin(a)
    r = np.array(
        [
            [c + x * x * (1 - c), x * y * (1 - c) - z * s, x * z * (1 - c) + y * s],
            [y * x * (1 - c) + z * s, c + y * y * (1 - c), y * z * (1 - c) - x * s],
            [z * x * (1 - c) - y * s, z * y * (1 - c) + x * s, c + z * z * (1 - c)],
        ]
    )
    m = np.eye(4)
    m[:3, :3] = r
    return m


def _parse_transform(elem: ET.Element) -> np.ndarray:
    """Compose child elements in document order; each new op left-multiplies
    (Mitsuba semantics: later ops apply after earlier ones)."""
    m = np.eye(4)
    for child in elem:
        tag = child.tag
        if tag == "matrix":
            vals = np.array([float(v) for v in child.get("value").split()])
            op = vals.reshape(4, 4)
        elif tag == "rotate":
            axis = np.array(
                [float(child.get(k, 0)) for k in ("x", "y", "z")], np.float64
            )
            op = _rotation(axis, float(child.get("angle")))
        elif tag == "translate":
            op = np.eye(4)
            op[:3, 3] = [float(child.get(k, 0)) for k in ("x", "y", "z")]
        elif tag == "scale":
            op = np.diag(
                [float(child.get(k, 1)) for k in ("x", "y", "z")] + [1.0]
            )
        elif tag == "lookat":
            continue  # handled by the sensor parser
        else:
            raise ValueError(f"unsupported transform op <{tag}>")
        m = op @ m
    return m


def _get_props(elem: ET.Element, defaults: Dict[str, str]) -> Dict[str, str]:
    props = {}
    for child in elem:
        if child.tag in ("integer", "float", "string", "boolean"):
            v = child.get("value")
            if v.startswith("$"):
                v = defaults[v[1:]]
            props[child.get("name")] = v
    return props


def parse_scene_xml(path: str, spp: Optional[int] = None,
                    width: Optional[int] = None, height: Optional[int] = None) -> SceneDesc:
    root = ET.parse(path).getroot()
    defaults = {d.get("name"): d.get("value") for d in root.findall("default")}
    if spp is not None:
        defaults["spp"] = str(spp)
    if width is not None:
        defaults["width"] = str(width)
    if height is not None:
        defaults["height"] = str(height)

    # sensor
    sensor = root.find("sensor")
    fov = float(next(f.get("value") for f in sensor.findall("float")
                     if f.get("name") == "fov"))
    lookat = sensor.find("transform").find("lookat")
    origin = np.array([float(v) for v in lookat.get("origin").split(",")])
    target = np.array([float(v) for v in lookat.get("target").split(",")])
    up = np.array([float(v) for v in lookat.get("up").split(",")])
    film = sensor.find("film")
    film_props = _get_props(film, defaults)
    w = int(film_props["width"])
    h = int(film_props["height"])
    sampler_props = _get_props(sensor.find("sampler"), defaults)
    spp_v = int(sampler_props.get("sample_count", defaults.get("spp", "64")))
    integrator_props = _get_props(root.find("integrator"), defaults)
    max_depth = int(integrator_props.get("max_depth", "-1"))

    cam = make_camera(origin, target, up, fov, w, h)

    # emitter
    emitter = root.find("emitter")
    e_props = _get_props(emitter, defaults)
    env_file = os.path.join(os.path.dirname(path), e_props["filename"])
    env_tf = _parse_transform(emitter.find("transform"))
    e_scale = 1.0
    for f in emitter.findall("float"):
        if f.get("name") == "scale":
            e_scale = float(f.get("value"))

    # matball bsdf hook: either a measured-material filename
    # (scene_measured.xml:60-62) or a table index + albedo tint
    # (scene_bsdf.xml:60-61)
    matball_bsdf = ""
    matball_idx = -1
    matball_albedo = (1.0, 1.0, 1.0)
    for b in root.findall("bsdf"):
        if b.get("type") == "mybsdf":
            for s in b.findall("string"):
                if s.get("name").strip() == "filename":
                    matball_bsdf = s.get("value").strip()
            for s in b.findall("integer"):
                if s.get("name").strip() == "idx":
                    matball_idx = int(s.get("value"))
            for s in b.findall("vector"):
                if s.get("name").strip() == "albedo":
                    matball_albedo = tuple(
                        float(v) for v in s.get("value").split(",")
                    )

    # shapes
    mat_of_ref = {
        "bsdf-plane": MAT_PLANE,
        "bsdf-diffuse": MAT_DIFFUSE,
        "bsdf-matpreview": MAT_BALL,
    }
    shapes = []
    for sh in root.findall("shape"):
        props = _get_props(sh, defaults)
        ref = sh.find("ref")
        mat = mat_of_ref[ref.get("id")]
        shapes.append(
            dict(
                filename=os.path.join(os.path.dirname(path), props["filename"]),
                shape_index=int(props.get("shape_index", "0")),
                to_world=_parse_transform(sh.find("transform")),
                material=mat,
            )
        )

    return SceneDesc(
        camera=cam, width=w, height=h, spp=spp_v, max_depth=max_depth,
        envmap_path=env_file, envmap_to_world=env_tf, envmap_scale=e_scale,
        shapes=shapes, matball_bsdf=matball_bsdf, matball_idx=matball_idx,
        matball_albedo=matball_albedo,
    )


def build_scene(desc: SceneDesc) -> Scene:
    meshes, mats = [], []
    for sh in desc.shapes:
        mesh = load_serialized(sh["filename"], sh["shape_index"])
        meshes.append(transform_mesh(mesh, sh["to_world"]))
        mats.append(sh["material"])
    soup = build_soup(meshes, mats)
    bvh = build_bvh(soup)
    env = load_envmap(desc.envmap_path, desc.envmap_to_world, desc.envmap_scale)
    return Scene(bvh=bvh, envmap=env, camera=desc.camera, desc=desc)


def load_scene(path: str, **overrides) -> Scene:
    return build_scene(parse_scene_xml(path, **overrides))
