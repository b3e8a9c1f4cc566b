"""Pallas TPU kernel for cluster traversal — the hot-op fast path.

Same two-phase design as `cluster_traverse.py` (the jnp reference path), but
phase 2 runs as a Pallas kernel with per-RAY-BLOCK candidates:

- rays are grouped into blocks of ``RB = 8*128`` (one VPU tile); phase 1
  computes, per block, the ``kb`` nearest clusters any ray in the block
  overlaps (dense slab test + per-block reduction + ``top_k`` — all jnp);
- phase 2 is a ``pl.pallas_call`` over grid ``(num_blocks, kb)`` using
  ``PrefetchScalarGridSpec``: the candidate id table is a scalar-prefetch
  operand, so the BlockSpec index_map itself selects which cluster's
  ``(K, 9)`` triangle block the pipeline DMAs into VMEM for each grid step.
  Pallas double-buffers those DMAs across steps automatically — this is the
  TPU analogue of the reference's packet traversal with per-node active-set
  compaction (`Traversal_Packet.cpp:111-162`), with the added win that the
  triangle data for a candidate cluster is fetched ONCE per 1024 rays
  instead of once per ray (the jnp path's row-gather materialises an
  (N, K*9) intermediate per candidate step).
- in-kernel early-out: candidates arrive nearest-first, so once every ray in
  the block has a hit closer than the candidate's entry distance the whole
  step is skipped (`@pl.when`), mirroring the reference's near-child-first +
  shadow early-out logic (`Traversal_Single.h:65-75,99-179`).

Traversal is AD-detached like the other traversal kernels (hit selection is
a discrete sampling decision, SURVEY §7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..math.vec import Vec3
from ..scene.clusters import ClusterSet
from .intersect import BIG

TRI_EPS = 1e-7
HIT_EPS = 1e-4
RB_SUB = 8  # ray-block sublanes
RB_LANE = 128  # ray-block lanes
RB = RB_SUB * RB_LANE  # rays per block (one f32 VPU tile)
_PHASE1_ELEMS = 32 * 1024 * 1024  # (rays x clusters) f32 budget per scan step


def _block_candidates(cs: ClusterSet, origin: Vec3, direction: Vec3, t_max, kb: int):
    """Per-ray-block nearest-first candidate clusters.

    Returns (cand (B, kb) int32 ids clamped valid, entry (B, kb) f32 block-min
    entry distance, +inf where no ray in the block overlaps the cluster).
    """
    n = origin.x.shape[0]
    c = cs.num_clusters
    b = n // RB
    blocks_per_chunk = max(1, min(b, _PHASE1_ELEMS // max(c * RB, 1)))
    pad_b = (-b) % blocks_per_chunk
    num_chunks = (b + pad_b) // blocks_per_chunk

    def shp(x, fill):
        x = x.reshape(b, RB)
        if pad_b:
            x = jnp.concatenate([x, jnp.full((pad_b, RB), fill, x.dtype)])
        return x.reshape(num_chunks, blocks_per_chunk, RB, 1)

    tiny = 1e-12
    inv = lambda d: 1.0 / jnp.where(jnp.abs(d) > tiny, d, jnp.where(d >= 0, tiny, -tiny))
    ox = shp(origin.x, 0.0)
    oy = shp(origin.y, 0.0)
    oz = shp(origin.z, 0.0)
    ix = shp(inv(direction.x), 1.0)
    iy = shp(inv(direction.y), 1.0)
    iz = shp(inv(direction.z), 1.0)
    tm = shp(jnp.asarray(t_max) * jnp.ones(n, jnp.float32), 0.0)

    bx0 = cs.box_min_x[None, None, :]
    by0 = cs.box_min_y[None, None, :]
    bz0 = cs.box_min_z[None, None, :]
    bx1 = cs.box_max_x[None, None, :]
    by1 = cs.box_max_y[None, None, :]
    bz1 = cs.box_max_z[None, None, :]

    def chunk_body(_, chunk):
        cox, coy, coz, cix, ciy, ciz, ctm = chunk  # (bpc, RB, 1) each
        t1x = (bx0 - cox) * cix
        t2x = (bx1 - cox) * cix
        t1y = (by0 - coy) * ciy
        t2y = (by1 - coy) * ciy
        t1z = (bz0 - coz) * ciz
        t2z = (bz1 - coz) * ciz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        tmax_ = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        hit = (tmax_ >= jnp.maximum(tmin, 0.0)) & (tmin < ctm)  # (bpc, RB, C)
        key = jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.float32(jnp.inf))
        block_key = key.min(axis=1)  # (bpc, C): block-min entry distance
        neg_top, idx = jax.lax.top_k(-block_key, kb)  # nearest-first
        return None, (idx.astype(jnp.int32), -neg_top)

    chunks = (ox, oy, oz, ix, iy, iz, tm)
    _, (ids, entry) = jax.lax.scan(chunk_body, None, chunks)
    ids = ids.reshape(-1, kb)[:b]
    entry = entry.reshape(-1, kb)[:b]
    return jnp.clip(ids, 0, c - 1), entry


def _phase2_kernel(
    # scalar-prefetch operands
    cand_ref,  # (B, kb) int32 (SMEM)
    entry_ref,  # (B, kb) f32 (SMEM)
    # pipelined tensor operands
    trib_ref,  # (1, 1, K*9) selected cluster triangle block
    tid_ref,  # (1, 1, K) selected cluster triangle ids
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,  # (1, 8, 128)
    # outputs (revisited across the inner grid dim)
    t_out, tri_out, u_out, v_out,
    *,
    k: int,
):
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_out[0] = tm_ref[0]
        tri_out[0] = jnp.full((RB_SUB, RB_LANE), -1, jnp.int32)
        u_out[0] = jnp.zeros((RB_SUB, RB_LANE), jnp.float32)
        v_out[0] = jnp.zeros((RB_SUB, RB_LANE), jnp.float32)

    entry = entry_ref[b, j]
    # nearest-first early-out: if every ray's best hit is already closer than
    # this candidate's entry distance, later candidates can't matter either —
    # but grid steps are independent, so we just skip this one.
    live = entry < jnp.max(t_out[0])

    @pl.when(live)
    def _():
        ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
        dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
        best_t = t_out[0]
        best_tri = tri_out[0]
        best_u = u_out[0]
        best_v = v_out[0]
        for s in range(k):
            g = trib_ref[0, 0, 9 * s : 9 * s + 9]  # (9,) scalar row
            tid = tid_ref[0, 0, s]
            v0x, v0y, v0z = g[0], g[1], g[2]
            e1x, e1y, e1z = g[3], g[4], g[5]
            e2x, e2y, e2z = g[6], g[7], g[8]
            # pvec = d x e2
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            ok = jnp.abs(det) > TRI_EPS
            inv_det = 1.0 / jnp.where(ok, det, 1.0)
            tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
            u = (tx * px + ty * py + tz * pz) * inv_det
            # qvec = tvec x e1
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            hit = (
                ok
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > HIT_EPS)
                & (tid >= 0)
                & (t < best_t)
            )
            best_t = jnp.where(hit, t, best_t)
            best_tri = jnp.where(hit, tid, best_tri)
            best_u = jnp.where(hit, u, best_u)
            best_v = jnp.where(hit, v, best_v)
        t_out[0] = best_t
        tri_out[0] = best_tri
        u_out[0] = best_u
        v_out[0] = best_v


@functools.partial(jax.jit, static_argnames=("kb",))
def _pallas_closest_hit_padded(cs: ClusterSet, ox, oy, oz, dx, dy, dz, tm, kb: int):
    """Padded (B*RB,) ray arrays -> (t, tri, u, v) each (B*RB,)."""
    n = ox.shape[0]
    b = n // RB
    k = cs.tris_per_cluster
    origin = Vec3(ox, oy, oz)
    direction = Vec3(dx, dy, dz)
    cand, entry = _block_candidates(cs, origin, direction, tm, kb)

    def rblk(x):
        return x.reshape(b, RB_SUB, RB_LANE)

    ray_spec = pl.BlockSpec(
        (1, RB_SUB, RB_LANE), lambda bi, j, cand, entry: (bi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, kb),
        in_specs=[
            # (C, 1, K*9): block (1, 1, K*9) — trailing dims equal the full
            # array dims, satisfying the Mosaic block-shape constraint while
            # the leading (grid) dim is indexed by the prefetched candidate id
            pl.BlockSpec(
                (1, 1, k * 9), lambda bi, j, cand, entry: (cand[bi, j], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, k), lambda bi, j, cand, entry: (cand[bi, j], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [ray_spec] * 7,
        out_specs=[ray_spec] * 4,
    )
    out_shape = [
        jax.ShapeDtypeStruct((b, RB_SUB, RB_LANE), jnp.float32),
        jax.ShapeDtypeStruct((b, RB_SUB, RB_LANE), jnp.int32),
        jax.ShapeDtypeStruct((b, RB_SUB, RB_LANE), jnp.float32),
        jax.ShapeDtypeStruct((b, RB_SUB, RB_LANE), jnp.float32),
    ]
    t, tri, u, v = pl.pallas_call(
        functools.partial(_phase2_kernel, k=k),
        grid_spec=grid_spec,
        out_shape=out_shape,
    )(
        cand, entry, cs.tri_block[:, None, :], cs.tri_id[:, None, :],
        rblk(ox), rblk(oy), rblk(oz), rblk(dx), rblk(dy), rblk(dz), rblk(tm),
    )
    return t.reshape(n), tri.reshape(n), u.reshape(n), v.reshape(n)


def pallas_cluster_closest_hit(
    cs: ClusterSet, origin: Vec3, direction: Vec3, t_max, kb: int = 48
):
    """Closest hit over the cluster set via the Pallas kernel.

    Same contract as `cluster_traverse.cluster_closest_hit`:
    returns (t, tri_id, u, v, overflow_mask); t == BIG and tri_id == -1 on
    miss.  ``kb`` is the per-block candidate budget; `overflow_mask` reports
    rays whose result could have been truncated by it.
    """
    cs, origin, direction, t_max = jax.lax.stop_gradient(
        (cs, origin, direction, t_max)
    )
    n = origin.x.shape[0]
    kb = min(kb, cs.num_clusters)
    pad = (-n) % RB
    tm = jnp.asarray(t_max) * jnp.ones(n, jnp.float32)

    def padded(x, fill):
        return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)]) if pad else x

    ox, oy, oz = padded(origin.x, 0.0), padded(origin.y, 0.0), padded(origin.z, 0.0)
    dx, dy, dz = padded(direction.x, 1.0), padded(direction.y, 0.0), padded(direction.z, 0.0)
    tmp = padded(tm, 0.0)  # pad rays have t_max = 0 -> cannot hit
    t, tri, u, v = _pallas_closest_hit_padded(cs, ox, oy, oz, dx, dy, dz, tmp, kb)
    t, tri, u, v = t[:n], tri[:n], u[:n], v[:n]

    # diagnosable truncation (the "no silent caps" rule): the farthest
    # candidate of the ray's block was still closer than its final hit
    _, entry = _block_candidates(
        cs, Vec3(ox, oy, oz), Vec3(dx, dy, dz), tmp, kb
    )
    last = jnp.repeat(entry[:, kb - 1], RB)[:n]
    overflow = jnp.isfinite(last) & (last < t)

    missed = tri < 0
    t_out = jnp.where(missed, BIG, t)
    return t_out, tri, u, v, overflow


def pallas_cluster_any_hit(
    cs: ClusterSet, origin: Vec3, direction: Vec3, t_max, kb: int = 48
):
    """Any-hit occlusion query via the closest-hit kernel (t < limit)."""
    limit = jnp.asarray(t_max) * jnp.ones(origin.x.shape, jnp.float32)
    t, tri, _, _, _ = pallas_cluster_closest_hit(cs, origin, direction, limit, kb)
    return (tri >= 0) & (t < limit)


def pallas_available() -> bool:
    """True when the backend can run the Pallas traversal kernel."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
