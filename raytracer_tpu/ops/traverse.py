"""Unified scene traversal: analytic prims + (optional) triangle-mesh BVH.

The analogue of `Scene::Traverse` / `Scene::Traverse_Shadow`
(`Core/Scene/Scene.cpp:219-261`): closest hit across all geometry kinds, and
an any-hit occlusion query for shadow rays.

Mesh traversal backend selection (the analogue of the reference's
Single/Packet ``TraversalMode`` knob, `Core/Rendering/Context.h:17-21`):

- ``"wave"``: binned-wavefront engine (`ops/wave_traverse.py`) — per-ray
  exact candidates, cluster-binned execution, multi-round resume.  EXACT
  (agrees with the skip-link walk) and the fastest path on TPU for both
  coherent and incoherent wavefronts; pure jnp, so it runs everywhere and
  is covered by the CPU test suite.  The production default.
- ``"sorted-pallas"``: octant+Morton ray sort -> per-1024-ray-block
  candidates -> Pallas streaming kernel (`ops/pallas_traverse.py`).  Fast on
  coherent wavefronts but its per-BLOCK candidate union truncates on
  incoherent bounce wavefronts at scale (judged r2: 76% hit agreement on a
  200k-tri mesh) — kept as an experimental alternative, NOT the default.
- ``"cluster"``: per-ray dense two-phase jnp path (`ops/cluster_traverse.py`)
  — exact per-ray candidates but per-ray cluster-row gathers make it ~25x
  slower than wave on TPU; kept as a second orthogonal implementation for
  validation.
- ``"bvh"``: lock-step skip-link BVH walk (`ops/bvh_traverse.py`) — exact,
  but lock-step divergence makes it slow on TPU for large meshes; kept for
  small meshes and as the correctness oracle.
- ``"auto"`` (default): wave everywhere.

Any path that can truncate reports per-ray ``Hits.overflow`` (closest hit)
and a shadow overflow mask (any hit) — surfaced through the render counters:
the "no silent caps" rule.  The wave path's overflow is exact-by-rounds and
practically always zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..math.vec import Vec3
from ..scene.types import SceneData
from .intersect import BIG, Hits, intersect_prims

_MODE = "auto"
_VALID_MODES = ("auto", "wave2", "wave", "sorted-pallas", "cluster", "bvh")


def set_traversal_mode(mode: str) -> None:
    """Select the mesh traversal backend (see module docstring)."""
    global _MODE
    if mode not in _VALID_MODES:
        raise ValueError(f"traversal mode {mode!r} not in {_VALID_MODES}")
    _MODE = mode


def get_traversal_mode() -> str:
    return _MODE


def _resolved_mode(scene: SceneData) -> str:
    if _MODE == "bvh" and scene.bvh is None:
        # a user selecting the exact oracle must not silently get another path
        raise ValueError(
            "traversal mode 'bvh' requested but the scene has no skip-link BVH "
            "(scene was built without one); use 'wave' or rebuild with a BVH"
        )
    if _MODE != "auto":
        return _MODE
    import jax

    # wave2 (Pallas sort-join) on TPU; the pure-XLA engine elsewhere
    return "wave2" if jax.default_backend() in ("tpu", "axon") else "wave"


def _mesh_closest(scene: SceneData, origin: Vec3, direction: Vec3, t_cap):
    """Dispatch closest-hit to the selected mesh backend.

    Returns (t, tri_id, u, v, overflow)."""
    mode = _resolved_mode(scene)
    args = jax.lax.stop_gradient((scene.clusters, origin, direction, t_cap))
    if mode == "wave2":
        from .wave2_traverse import wave2_closest_hit

        return wave2_closest_hit(*args)
    if mode == "wave":
        from .wave_traverse import wave_closest_hit

        return wave_closest_hit(*args)
    if mode == "sorted-pallas":
        from .pallas_traverse import pallas_sorted_closest_hit

        return pallas_sorted_closest_hit(*args)
    if mode == "bvh":
        from .bvh_traverse import bvh_closest_hit

        t_t, tid, tu, tv = bvh_closest_hit(scene.bvh, scene.tris, origin, direction, t_cap)
        return t_t, tid, tu, tv, jnp.zeros(origin.x.shape, bool)
    from .cluster_traverse import cluster_closest_hit

    return cluster_closest_hit(*args)


def scene_traverse(scene: SceneData, origin: Vec3, direction: Vec3, t_max=None, time=None) -> Hits:
    """``time`` (N,): per-ray shutter time for motion blur (analytic prims
    only; meshes are pre-transformed static world-space geometry)."""
    n = origin.x.shape
    if t_max is None:
        t_max = jnp.full(n, BIG)
    t_p, pid = intersect_prims(scene.prims, origin, direction, t_max, time)

    tri_result = None
    overflow = jnp.zeros(n, bool)
    if scene.tris is not None and scene.clusters is not None:
        t_t, tid, tu, tv, overflow = _mesh_closest(
            scene, origin, direction, jnp.minimum(t_p, t_max)
        )
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
            overflow=overflow,
        )

    zeros = jnp.zeros(n, jnp.float32)
    return Hits(
        t=t_p, prim_id=pid, tri_id=jnp.full(n, -1, jnp.int32), u=zeros, v=zeros,
        overflow=overflow,
    )


def scene_occluded(scene: SceneData, origin: Vec3, direction: Vec3, t_max, time=None):
    """Any-hit shadow query (`Scene.cpp:245-261`).

    Returns (occluded, overflow): ``overflow`` marks shadow rays whose mesh
    query may have been truncated by the backend (wave: exact, ~never)."""
    n = origin.x.shape
    t_p, _ = intersect_prims(scene.prims, origin, direction, t_max, time)
    occ = t_p < t_max
    overflow = jnp.zeros(n, bool)
    if scene.tris is not None and scene.clusters is not None:
        mode = _resolved_mode(scene)
        args = jax.lax.stop_gradient((scene.clusters, origin, direction, t_max))
        if mode == "wave2":
            from .wave2_traverse import wave2_any_hit

            mesh_occ, overflow = wave2_any_hit(*args)
            occ = occ | mesh_occ
        elif mode == "wave":
            from .wave_traverse import wave_any_hit

            mesh_occ, overflow = wave_any_hit(*args)
            occ = occ | mesh_occ
        elif mode == "sorted-pallas":
            from .pallas_traverse import pallas_sorted_any_hit

            mesh_occ, overflow = pallas_sorted_any_hit(*args)
            occ = occ | mesh_occ
        elif mode == "bvh":
            from .bvh_traverse import bvh_any_hit

            occ = occ | bvh_any_hit(scene.bvh, scene.tris, origin, direction, t_max)
        else:
            from .cluster_traverse import cluster_any_hit

            occ = occ | cluster_any_hit(*args)
    elif scene.tris is not None and scene.bvh is not None:
        from .bvh_traverse import bvh_any_hit

        occ = occ | bvh_any_hit(scene.bvh, scene.tris, origin, direction, t_max)
    return occ, overflow
