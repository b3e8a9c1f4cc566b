"""Modernize bitrotted reference TestScenes to the CURRENT loader schema.

Several shipped scenes (`sphere_light_test.json`, `texture_test.json`,
`dispersion_test.json`, `glossy_refraction_test.json`, `small_light_test.json`,
...) use an older light schema — `{"type": "sphere", position, radius}` and
`{"type": "area", position, edge0, edge1}` — that the reference's OWN
SceneLoader rejects today ("Area light is missing 'shape' field",
`Demo/SceneLoader.cpp:527`).  This converts them to the current schema
(area light + shape + transform) WITHOUT changing geometry: the modernized
JSON is consumed by BOTH renderers, so golden parity is by construction.

Conversions:
- sphere light  -> area light, sphere shape, translation transform
- edge-rect area light -> area light, rect shape size (|e0|, |e1|),
  orientation from the (e0, e1, e0 x e1) frame (YXZ euler extraction checked
  against `math/transform.quat_from_euler_deg` round-trip)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from raytracer_tpu.math.transform import quat_from_euler_deg, quat_to_matrix3

OUT_DIR = "/tmp/refdata/TestScenes_modern"


def euler_from_rows(m: np.ndarray) -> tuple[float, float, float]:
    """Invert quat_to_matrix3(quat_from_euler_deg([p, y, r])) (rows = images
    of the local axes)."""
    sp = float(np.clip(-m[2][1], -1.0, 1.0))
    pitch = np.rad2deg(np.arcsin(sp))
    if abs(sp) > 1.0 - 1e-9:
        # gimbal lock (straight up/down rect): yaw/roll degenerate; the
        # convention here (verified numerically against quat_from_euler_deg)
        # leaves m[0] = [cos yaw, 0, -sin yaw] with roll = 0
        yaw = np.rad2deg(np.arctan2(-m[0][2], m[0][0]))
        roll = 0.0
    else:
        yaw = np.rad2deg(np.arctan2(m[2][0], m[2][2]))
        roll = np.rad2deg(np.arctan2(m[0][1], m[1][1]))
    # verify round-trip
    m2 = quat_to_matrix3(quat_from_euler_deg([pitch, yaw, roll]))
    assert np.allclose(m2, m, atol=1e-5), (m, m2)
    return float(pitch), float(yaw), float(roll)


def modernize_light(l: dict, scene_center=None) -> dict:
    if l.get("type") == "sphere":
        return {
            "type": "area",
            "color": l["color"],
            "shape": {"type": "sphere", "radius": float(l.get("radius", 1.0))},
            "transform": {"translation": l["position"]},
        }
    if l.get("type") == "area" and "edge0" in l:
        p = np.asarray(l["position"], np.float64)
        e0 = np.asarray(l["edge0"], np.float64)
        e1 = np.asarray(l["edge1"], np.float64)
        n0, n1 = np.linalg.norm(e0), np.linalg.norm(e1)
        x = e0 / n0
        y = e1 / n1
        assert abs(float(x @ y)) < 1e-6, "edge rect is not orthogonal"
        # current-schema area lights emit from ONE side (+normal).  The old
        # edge-rect schema is gone from the reference's loader, so the edge
        # handedness is unrecoverable; when cross(e0, e1) points AWAY from
        # the scene's object centroid the light would illuminate nothing and
        # the scene renders black in BOTH renderers (dispersion_test as
        # shipped) — orient the emitting side toward the scene instead.
        if scene_center is not None:
            center = p + (e0 + e1) * 0.5
            to_scene = np.asarray(scene_center, np.float64) - center
            if float(np.cross(x, y) @ to_scene) < 0.0:
                x, y = y, x
                n0, n1 = n1, n0
        rows = np.stack([x, y, np.cross(x, y)])
        pitch, yaw, roll = euler_from_rows(rows)
        return {
            "type": "area",
            "color": l["color"],
            # current-schema rect 'size' is the HALF extent per axis
            # (`RectShape::GetSurfaceArea` = 4*x*y, `RectShape.cpp:27-30`);
            # the old schema's edges spanned the FULL rect
            "shape": {"type": "rect", "size": [float(n0) / 2.0, float(n1) / 2.0]},
            "transform": {
                "translation": [float(v) for v in (p + (e0 + e1) * 0.5)],
                "orientation": [pitch, yaw, roll],
            },
        }
    return l


def _rad_to_deg_orientations(node):
    """Old-schema scenes store transform orientations in RADIANS; the current
    loaders read degrees — convert in place (cameras, objects, lights)."""
    if isinstance(node, dict):
        for k, v in node.items():
            if k == "orientation" and isinstance(v, list):
                node[k] = [float(np.rad2deg(x)) for x in v]
            else:
                _rad_to_deg_orientations(v)
    elif isinstance(node, list):
        for v in node:
            _rad_to_deg_orientations(v)


# scenes that ship UNLIT (render black in both renderers as-is): add a
# neutral background light so texture/material parity has signal; also
# normalize Windows backslash texture paths for POSIX loaders
LIT_SCENES = {
    "bitmap_texture_test": [{"type": "background", "color": [1.2, 1.2, 1.2]}],
}


def _fix_paths(node):
    if isinstance(node, dict):
        for k, v in node.items():
            if isinstance(v, str) and "\\" in v:
                node[k] = v.replace("\\", "/")
            else:
                _fix_paths(v)
    elif isinstance(node, list):
        for v in node:
            _fix_paths(v)


def lit_variant(name: str) -> str:
    """Current-schema scene that only needs lights added (no radian/light
    conversion — orientations are already degrees)."""
    src = f"/root/reference/Data/TestScenes/{name}.json"
    doc = json.load(open(src))
    _fix_paths(doc)
    doc["lights"] = doc.get("lights", []) + LIT_SCENES[name]
    os.makedirs(OUT_DIR, exist_ok=True)
    out = os.path.join(OUT_DIR, f"{name}.json")
    json.dump(doc, open(out, "w"), indent=1)
    return out


def modernize(name: str) -> str:
    src = f"/root/reference/Data/TestScenes/{name}.json"
    doc = json.load(open(src))
    _rad_to_deg_orientations(doc)  # BEFORE adding degree-valued lights
    # old-schema 'plane' objects were XZ ground planes (+Y normal); the
    # current schema's rect/plane shape is the z=0 plane (+Z normal,
    # `RectShape.cpp`) — current-era scenes set orientation [-90,0,0]
    # explicitly (mis_test.json ground).  An orientation-less plane in an
    # old-schema scene therefore stands VERTICAL after conversion (verified:
    # dispersion_test's 'ground' backfaced the camera and the render went
    # black in BOTH renderers) — restore the ground convention.
    for o in doc.get("objects", []):
        if o.get("type") in ("plane", "rect"):
            tr = o.setdefault("transform", {})
            if "orientation" not in tr:
                tr["orientation"] = [-90.0, 0.0, 0.0]
    centers = [o.get("transform", {}).get("translation", [0.0, 0.0, 0.0])
               for o in doc.get("objects", [])]
    center = (np.mean(np.asarray(centers, np.float64), axis=0)
              if centers else np.zeros(3))
    doc["lights"] = [modernize_light(l, center) for l in doc.get("lights", [])]
    os.makedirs(OUT_DIR, exist_ok=True)
    out = os.path.join(OUT_DIR, f"{name}.json")
    json.dump(doc, open(out, "w"), indent=1)
    return out


if __name__ == "__main__":
    for name in sys.argv[1:] or [
        "sphere_light_test", "texture_test", "dispersion_test",
        "glossy_refraction_test", "small_light_test",
    ]:
        print(modernize(name))
