"""Debug renderer — AOV visualization (`Core/Rendering/DebugRenderer.h:7-34`).

One traversal + shading-frame evaluation per pixel; the selected debug mode
picks which quantity becomes the pixel color: camera-light shading, hit id,
depth, position, normals/tangents/bitangents, texcoords, and the resolved
material parameters (baseColor / emission / roughness / metalness / IoR).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..math.vec import Vec3, dot, where as vwhere
from ..ops.intersect import BIG, eval_prim_frame
from ..ops.materials import resolve_material
from ..ops.traverse import scene_traverse
from ..sampler.sampler import hash_u32, u32_to_unit_float
from ..scene.camera import Camera, Rays
from ..scene.types import SceneData, SceneMeta

# debug modes (`DebugRenderer.h` RenderingMode)
MODE_CAMERA_LIGHT = "CameraLight"
MODE_TRIANGLE_ID = "TriangleID"
MODE_DEPTH = "Depth"
MODE_POSITION = "Position"
MODE_NORMALS = "Normals"
MODE_TANGENTS = "Tangents"
MODE_BITANGENTS = "Bitangents"
MODE_TEXCOORDS = "TexCoords"
MODE_BASE_COLOR = "BaseColor"
MODE_EMISSION = "Emission"
MODE_ROUGHNESS = "Roughness"
MODE_METALNESS = "Metalness"
MODE_IOR = "IoR"
# traversal-work heatmap: the reference's intersection-counter AOVs
# (`DebugRenderer.h:27-33`, counters `Counters.h:43-48`)
MODE_TRAVERSAL_COST = "TraversalCost"

ALL_MODES = (
    MODE_CAMERA_LIGHT, MODE_TRIANGLE_ID, MODE_DEPTH, MODE_POSITION,
    MODE_NORMALS, MODE_TANGENTS, MODE_BITANGENTS, MODE_TEXCOORDS,
    MODE_BASE_COLOR, MODE_EMISSION, MODE_ROUGHNESS, MODE_METALNESS, MODE_IOR,
    MODE_TRAVERSAL_COST,
)


def _dir_color(v: Vec3) -> Vec3:
    """[-1,1] direction -> [0,1] color (standard normal-map visualization)."""
    return Vec3(0.5 * (v.x + 1.0), 0.5 * (v.y + 1.0), 0.5 * (v.z + 1.0))


def _id_color(ids: jnp.ndarray) -> Vec3:
    h = hash_u32(ids.astype(jnp.uint32))
    return Vec3(
        u32_to_unit_float(h),
        u32_to_unit_float(hash_u32(h)),
        u32_to_unit_float(hash_u32(h ^ jnp.uint32(0xA511E9B3))),
    )


def render_debug(
    scene: SceneData, meta: SceneMeta, rays: Rays, mode: str = MODE_CAMERA_LIGHT
) -> Vec3:
    """Single-bounce AOV evaluation over the wavefront."""
    hits = scene_traverse(scene, rays.origin, rays.dir)
    miss = hits.t >= BIG * 0.5
    hits_safe = hits._replace(t=jnp.clip(hits.t, 0.0, 1e12))
    from ..ops.materials import apply_normal_map
    from ..ops.traverse import scene_hit_frame

    frame = scene_hit_frame(scene, hits_safe, rays.origin, rays.dir)
    frame = apply_normal_map(scene, frame)
    mp = resolve_material(scene, frame.material_id, frame.tex_u, frame.tex_v)

    if mode == MODE_CAMERA_LIGHT:
        # headlight shading (`DebugRenderer.cpp` CameraLight mode)
        c = jnp.abs(dot(frame.normal, -rays.dir))
        out = mp.base_color * c
    elif mode == MODE_TRAVERSAL_COST:
        # green->red heat by triangle-test work, log-scaled
        from ..ops.traverse import scene_traversal_cost

        box_t, tri_t = scene_traversal_cost(scene, rays.origin, rays.dir)
        heat = jnp.clip(jnp.log1p(box_t + tri_t) / jnp.log(jnp.asarray(50000.0)), 0.0, 1.0)
        out = Vec3(heat, 1.0 - heat, jnp.zeros_like(heat))
    elif mode == MODE_TRIANGLE_ID:
        combined = jnp.where(hits.tri_id >= 0, hits.tri_id, hits.prim_id + 0x40000000)
        out = _id_color(combined)
    elif mode == MODE_DEPTH:
        # log-scaled depth for visibility
        out = Vec3.full(jnp.log1p(hits_safe.t) / 8.0)
    elif mode == MODE_POSITION:
        out = Vec3(
            jnp.mod(frame.position.x, 1.0),
            jnp.mod(frame.position.y, 1.0),
            jnp.mod(frame.position.z, 1.0),
        )
    elif mode == MODE_NORMALS:
        out = _dir_color(frame.normal)
    elif mode == MODE_TANGENTS:
        out = _dir_color(frame.tangent)
    elif mode == MODE_BITANGENTS:
        out = _dir_color(frame.bitangent)
    elif mode == MODE_TEXCOORDS:
        out = Vec3(jnp.mod(frame.tex_u, 1.0), jnp.mod(frame.tex_v, 1.0), jnp.zeros_like(frame.tex_u))
    elif mode == MODE_BASE_COLOR:
        out = mp.base_color
    elif mode == MODE_EMISSION:
        out = mp.emission
    elif mode == MODE_ROUGHNESS:
        out = Vec3.full(mp.roughness)
    elif mode == MODE_METALNESS:
        out = Vec3.full(mp.metalness)
    elif mode == MODE_IOR:
        out = Vec3.full(mp.ior / 3.0)
    else:
        raise ValueError(f"unknown debug mode '{mode}' (available: {', '.join(ALL_MODES)})")

    return vwhere(miss, Vec3.zeros(miss.shape), out)
