"""Unified scene traversal: analytic prims + (optional) triangle-mesh BVH.

The analogue of `Scene::Traverse` / `Scene::Traverse_Shadow`
(`Core/Scene/Scene.cpp:219-261`): closest hit across all geometry kinds, and
an any-hit occlusion query for shadow rays.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..math.vec import Vec3
from ..scene.types import SceneData
from .intersect import BIG, Hits, intersect_prims


def scene_traverse(scene: SceneData, origin: Vec3, direction: Vec3, t_max=None, time=None) -> Hits:
    """``time`` (N,): per-ray shutter time for motion blur (analytic prims
    only; meshes are pre-transformed static world-space geometry)."""
    n = origin.x.shape
    if t_max is None:
        t_max = jnp.full(n, BIG)
    t_p, pid = intersect_prims(scene.prims, origin, direction, t_max, time)

    tri_result = None
    if scene.tris is not None and scene.clusters is not None:
        import jax

        from .cluster_traverse import cluster_closest_hit

        args = jax.lax.stop_gradient((scene.clusters, origin, direction, jnp.minimum(t_p, t_max)))
        t_t, tid, tu, tv, _overflow = cluster_closest_hit(*args)
        tri_result = (t_t, tid, tu, tv)
    elif scene.tris is not None and scene.bvh is not None:
        from .bvh_traverse import bvh_closest_hit

        tri_result = bvh_closest_hit(
            scene.bvh, scene.tris, origin, direction, jnp.minimum(t_p, t_max)
        )

    if tri_result is not None:
        t_t, tid, tu, tv = tri_result
        tri_closer = t_t < t_p
        return Hits(
            t=jnp.where(tri_closer, t_t, t_p),
            prim_id=jnp.where(tri_closer, -1, pid),
            tri_id=jnp.where(tri_closer, tid, -1),
            u=jnp.where(tri_closer, tu, 0.0),
            v=jnp.where(tri_closer, tv, 0.0),
        )

    zeros = jnp.zeros(n, jnp.float32)
    return Hits(t=t_p, prim_id=pid, tri_id=jnp.full(n, -1, jnp.int32), u=zeros, v=zeros)


def scene_occluded(scene: SceneData, origin: Vec3, direction: Vec3, t_max, time=None) -> jnp.ndarray:
    """Any-hit shadow query (`Scene.cpp:245-261`)."""
    t_p, _ = intersect_prims(scene.prims, origin, direction, t_max, time)
    occ = t_p < t_max
    if scene.tris is not None and scene.clusters is not None:
        import jax

        from .cluster_traverse import cluster_any_hit

        args = jax.lax.stop_gradient((scene.clusters, origin, direction, t_max))
        occ = occ | cluster_any_hit(*args)
    elif scene.tris is not None and scene.bvh is not None:
        from .bvh_traverse import bvh_any_hit

        occ = occ | bvh_any_hit(scene.bvh, scene.tris, origin, direction, t_max)
    return occ
