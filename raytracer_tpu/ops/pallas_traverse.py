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


def _f32_to_i32(x):
    """Scalar bitcast (ids travel bitcast-in-float through the DMA tile)."""
    return jax.lax.bitcast_convert_type(x, jnp.int32)
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


# --- sorted-wavefront front end ------------------------------------------------
#
# The per-BLOCK candidate scheme above lives or dies by intra-block ray
# coherence: a block of 1024 UNRELATED rays collectively overlaps far more
# clusters than ``kb`` can hold (measured: 73% agreement on random rays at
# kb=48).  Camera rays are naturally coherent, but bounce wavefronts are not
# — so the production entry point SORTS the wavefront by (direction octant,
# origin Morton cell) first, traces the sorted blocks, and scatters results
# back.  This is the TPU answer to the reference's planned-but-stubbed
# RayStream coherence sorter (`Core/Traversal/RayStream.cpp:26-48`) and the
# GPU wavefront-compaction tradition: XLA sorts 1M keys in ~ms, far cheaper
# than the incoherence it removes.


def _ray_sort_keys(cs: ClusterSet, origin: Vec3, direction: Vec3) -> jnp.ndarray:
    """int32 sort key: octant (3 bits) | 27-bit Morton of the origin cell."""
    lo_x = jnp.min(cs.box_min_x)
    lo_y = jnp.min(cs.box_min_y)
    lo_z = jnp.min(cs.box_min_z)
    span_x = jnp.maximum(jnp.max(cs.box_max_x) - lo_x, 1e-6)
    span_y = jnp.maximum(jnp.max(cs.box_max_y) - lo_y, 1e-6)
    span_z = jnp.maximum(jnp.max(cs.box_max_z) - lo_z, 1e-6)

    def q9(v, lo, span):  # 9 bits per axis
        return jnp.clip(((v - lo) / span * 511.0), 0.0, 511.0).astype(jnp.int32)

    def spread(v):  # 9-bit Morton spread (v | v<<2 pattern over 27 bits)
        v = v & 0x1FF
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    qx = spread(q9(origin.x, lo_x, span_x))
    qy = spread(q9(origin.y, lo_y, span_y))
    qz = spread(q9(origin.z, lo_z, span_z))
    morton = qx | (qy << 1) | (qz << 2)
    octant = (
        (direction.x < 0).astype(jnp.int32)
        + 2 * (direction.y < 0).astype(jnp.int32)
        + 4 * (direction.z < 0).astype(jnp.int32)
    )
    return (octant << 27) | morton


def _block_bounds(origin: Vec3, direction: Vec3, tm):
    """Per-block interval-ray bounds: origin box, direction box, max t.

    ``tm`` (B, RB); pad rays carry t_max == 0 and are excluded.
    Returns (o_lo, o_hi, d_lo, d_hi, t_hi) — 3-tuples of (B, 1) + (B, 1).
    """
    b = tm.shape[0]
    live = tm > 0.0
    big = jnp.float32(3e38)

    def mn(v):
        return jnp.min(jnp.where(live, v, big), axis=1, keepdims=True)

    def mx(v):
        return jnp.max(jnp.where(live, v, -big), axis=1, keepdims=True)

    blk = lambda v: v.reshape(b, RB)
    o = (blk(origin.x), blk(origin.y), blk(origin.z))
    d = (blk(direction.x), blk(direction.y), blk(direction.z))
    o_lo = tuple(mn(v) for v in o)
    o_hi = tuple(mx(v) for v in o)
    d_lo = tuple(mn(v) for v in d)
    d_hi = tuple(mx(v) for v in d)
    return o_lo, o_hi, d_lo, d_hi, mx(tm)


def _interval_entry(bounds, boxes):
    """Conservative slab test of a block's interval-ray against boxes.

    ``boxes``: (B, M, 6) [min.xyz, max.xyz] (empty boxes have min > max).
    Returns (entry (B, M) — a LOWER bound of any block ray's entry distance,
    reachable (B, M) bool).  Direction signs are uniform per block thanks to
    the octant sort key; mixed-sign (octant-boundary) blocks degrade to a
    conservative keep.
    """
    o_lo, o_hi, d_lo, d_hi, t_hi = bounds
    entry = jnp.zeros(boxes.shape[:2], jnp.float32)
    exit_ = jnp.broadcast_to(t_hi, boxes.shape[:2])
    tiny = 1e-12
    for ax in range(3):
        olo, ohi = o_lo[ax], o_hi[ax]
        dlo, dhi = d_lo[ax], d_hi[ax]
        blo, bhi = boxes[:, :, ax], boxes[:, :, 3 + ax]
        pos = dlo >= 0.0  # (B, 1): whole block moves +ax
        # entry lower bound: closest origin at the fastest speed;
        # exit upper bound: farthest origin at the slowest speed
        ent_pos = (blo - ohi) / jnp.maximum(dhi, tiny)
        ent_neg = (bhi - olo) / jnp.minimum(dlo, -tiny)
        ext_pos = (bhi - olo) / jnp.maximum(dlo, tiny)
        ext_neg = (blo - ohi) / jnp.minimum(dhi, -tiny)
        ent = jnp.where(pos, ent_pos, ent_neg)
        ext = jnp.where(pos, ext_pos, ext_neg)
        degen = ((dlo < 0.0) & (dhi > 0.0)) | (
            jnp.maximum(jnp.abs(dlo), jnp.abs(dhi)) < 1e-6
        )
        # degenerate axis: conservative keep — but EMPTY boxes (min > max,
        # tree padding) must still be rejected
        ent = jnp.where(degen, 0.0, ent)
        ext = jnp.where(degen, jnp.where(blo <= bhi, jnp.float32(3e38), -1.0), ext)
        entry = jnp.maximum(entry, jnp.maximum(ent, 0.0))
        exit_ = jnp.minimum(exit_, ext)
    return entry, exit_ >= entry


def _block_candidates_bfs(cs: ClusterSet, origin: Vec3, direction: Vec3, t_max, kb: int):
    """Per-block candidate clusters via BFS down the 8-ary cluster tree.

    Phase-1 replacement for :func:`_block_candidates` that scales: the dense
    per-ray pass costs O(N_rays x C) slab tests (3.3 GB of intermediates at
    Sponza scale); this costs O(B x kb x 8) per tree level with B = N/1024
    blocks — effectively free, and independent of cluster count.

    Each level expands every surviving node into its 8 children, tests them
    against the block's interval-ray (`_interval_entry`), and compacts
    survivors (cumsum positioning, no sort) into at most ``kb`` slots.
    Truncation at ANY level sets the block's overflow flag ("no silent
    caps").  Returns (cand (B, kb) cluster ids, entry (B, kb) ascending
    conservative lower bounds (+inf = invalid), overflow (B,) bool).
    """
    n = origin.x.shape[0]
    b = n // RB
    tm = (jnp.asarray(t_max) * jnp.ones(n, jnp.float32)).reshape(b, RB)
    bounds = _block_bounds(origin, direction, tm)
    levels = cs.tree_levels
    inf = jnp.float32(jnp.inf)

    # root level: test all 8 top nodes
    ids = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32)[None, :], (b, 8))
    ent, ok = _interval_entry(bounds, jnp.broadcast_to(levels[0][None], (b, 8, 6)))
    ids = jnp.where(ok, ids, -1)
    overflow = jnp.zeros(b, bool)

    for level in levels[1:]:
        k_cur = ids.shape[1]
        k_next = min(kb, k_cur * 8)
        child = (
            jnp.maximum(ids, 0)[:, :, None] * 8
            + jnp.arange(8, dtype=jnp.int32)[None, None, :]
        ).reshape(b, k_cur * 8)
        parent_ok = jnp.repeat(ids >= 0, 8, axis=1)
        boxes = level[jnp.maximum(child, 0)]  # (B, 8K, 6) — tiny gather
        ent, ok = _interval_entry(bounds, boxes)
        ok = ok & parent_ok
        # stable compaction: cumsum positions, overflowing entries spill
        pos = jnp.cumsum(ok.astype(jnp.int32), axis=1) - 1
        keep = ok & (pos < k_next)
        overflow = overflow | jnp.any(ok & (pos >= k_next), axis=1)
        rows = jnp.broadcast_to(jnp.arange(b)[:, None], pos.shape)
        slot = jnp.where(keep, pos, k_next)  # dropped -> spill column
        new_ids = jnp.full((b, k_next + 1), -1, jnp.int32)
        new_ent = jnp.full((b, k_next + 1), inf, jnp.float32)
        new_ids = new_ids.at[rows, slot].set(jnp.where(keep, child, -1), mode="drop")
        new_ent = new_ent.at[rows, slot].set(jnp.where(keep, ent, inf), mode="drop")
        ids = new_ids[:, :k_next]
        ent = new_ent[:, :k_next]

    # nearest-first ordering for the kernel's early-out + overflow test
    k_final = min(kb, ids.shape[1])
    neg_top, order = jax.lax.top_k(-jnp.where(ids >= 0, ent, inf), k_final)
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], order.shape)
    cand = ids[rows, order]
    cand = jnp.clip(cand, 0, cs.num_clusters - 1)
    return cand, -neg_top, overflow


def _phase2_stream_kernel(
    # scalar-prefetch operands (SMEM)
    cand_ref,  # (B, kb) int32 candidate cluster ids, nearest-first
    entry_ref,  # (B, kb) f32 ascending entry lower bounds (+inf = invalid)
    # ANY-space (HBM) packed cluster table — streamed in via explicit DMA
    stream_ref,  # (C, T*8, 128) f32: geometry + bitcast ids, tile-aligned
    # pipelined ray tiles (VMEM)
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,  # (1, 8, 128)
    # outputs (VMEM)
    t_out, tri_out, u_out, v_out,
    # scratch
    geom_buf,  # SMEM (2, T*8, 128): scalar access, no tiling constraints
    sem,  # DMA semaphores (2,)
    *,
    k: int,
    kb: int,
    any_hit: bool,
):
    """Streaming phase 2: ONE grid step per ray block; the candidate loop
    runs INSIDE the kernel as a `while_loop` with double-buffered HBM->VMEM
    DMA of each candidate cluster's triangle block.

    vs the grid-(B, kb) variant (`_phase2_kernel`): no per-candidate grid
    step overhead (measured ~5 us/step = 0.3 s at 256x256), and the loop
    EXITS as soon as every ray's best hit is closer than the next entry
    bound (nearest-first), instead of merely skipping compute.  For shadow
    rays (``any_hit``) occluded lanes park at t = 0, so the loop also exits
    once the whole block is occluded.
    """
    bi = pl.program_id(0)

    def geom_dma(j, slot):
        return pltpu.make_async_copy(
            stream_ref.at[cand_ref[bi, j]], geom_buf.at[slot], sem.at[slot]
        )

    geom_dma(0, 0).start()

    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    tiny = 1e-12
    inv = lambda d: 1.0 / jnp.where(jnp.abs(d) > tiny, d, jnp.where(d >= 0, tiny, -tiny))
    ix, iy, iz = inv(dx), inv(dy), inv(dz)
    zero_f = jnp.zeros((RB_SUB, RB_LANE), jnp.float32)

    init = (
        jnp.int32(0),
        tm_ref[0],
        jnp.full((RB_SUB, RB_LANE), -1, jnp.int32),
        zero_f,
        zero_f,
    )

    def cond(st):
        j, t, _tri, _u, _v = st
        # clamp: `&` does not short-circuit, so entry_ref[bi, j] is evaluated
        # even when j == kb (an OOB SMEM read otherwise)
        return (j < kb) & (entry_ref[bi, jnp.minimum(j, kb - 1)] < jnp.max(t))

    def body(st):
        j, t, tri, u, v = st
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < kb)
        def _():
            geom_dma(j + 1, 1 - slot).start()

        geom_dma(j, slot).wait()

        # per-RAY cluster-box slab test: the BFS candidates are the BLOCK
        # union, so many candidates overlap zero rays of this block — one
        # box test (~20 vector ops) gates the 64-triangle MT loop (~2500)
        flat0 = lambda e: geom_buf[slot, e // 128, e % 128]
        base = 10 * k
        bx0, by0, bz0 = flat0(base), flat0(base + 1), flat0(base + 2)
        bx1, by1, bz1 = flat0(base + 3), flat0(base + 4), flat0(base + 5)
        t1x = (bx0 - ox) * ix
        t2x = (bx1 - ox) * ix
        t1y = (by0 - oy) * iy
        t2y = (by1 - oy) * iy
        t1z = (bz0 - oz) * iz
        t2z = (bz1 - oz) * iz
        bmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        bmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        box_hit = (bmax >= jnp.maximum(bmin, 0.0)) & (bmin < t)

        def mt_loop(t, tri, u, v):
            best_t, best_tri, best_u, best_v = t, tri, u, v
            for sidx in range(k):
                # SMEM scalar reads: no vector-tiling constraints
                flat = lambda e: geom_buf[slot, e // 128, e % 128]
                g = lambda i: flat(9 * sidx + i)
                tid_f = flat(9 * k + sidx)  # id as f32 value (-1 = pad)
                tid = tid_f.astype(jnp.int32)
                v0x, v0y, v0z = g(0), g(1), g(2)
                e1x, e1y, e1z = g(3), g(4), g(5)
                e2x, e2y, e2z = g(6), g(7), g(8)
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                ok = jnp.abs(det) > TRI_EPS
                inv_det = 1.0 / jnp.where(ok, det, 1.0)
                tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
                uu = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                vv = (dx * qx + dy * qy + dz * qz) * inv_det
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                hit = (
                    ok
                    & (uu >= 0.0)
                    & (vv >= 0.0)
                    & (uu + vv <= 1.0)
                    & (tt > HIT_EPS)
                    & (tid >= 0)
                    & (tt < best_t)
                )
                if any_hit:
                    # park occluded lanes at t = 0 => nothing else can hit
                    # them and max(t) shrinks toward the all-occluded exit
                    best_t = jnp.where(hit, 0.0, best_t)
                    best_tri = jnp.where(hit, tid, best_tri)
                else:
                    best_t = jnp.where(hit, tt, best_t)
                    best_tri = jnp.where(hit, tid, best_tri)
                    best_u = jnp.where(hit, uu, best_u)
                    best_v = jnp.where(hit, vv, best_v)
            return best_t, best_tri, best_u, best_v

        t, tri, u, v = jax.lax.cond(
            jnp.any(box_hit), mt_loop, lambda a, b, c, d: (a, b, c, d), t, tri, u, v
        )
        return (j + 1, t, tri, u, v)

    j_f, t, tri, u, v = jax.lax.while_loop(cond, body, init)

    # drain the in-flight prefetch for candidate j_f (started by body(j_f-1),
    # or by the warm-up when the loop never ran)
    @pl.when(j_f < kb)
    def _():
        slot = jax.lax.rem(j_f, 2)
        geom_dma(j_f, slot).wait()

    t_out[0] = t
    tri_out[0] = tri
    u_out[0] = u
    v_out[0] = v


@functools.partial(jax.jit, static_argnames=("kb", "any_hit"))
def _pallas_stream_trace(cs: ClusterSet, ox, oy, oz, dx, dy, dz, tm, kb: int, any_hit: bool):
    """Sorted + BFS candidates + streaming kernel on padded (B*RB,) arrays."""
    n = ox.shape[0]
    b = n // RB
    k = cs.tris_per_cluster

    keys = _ray_sort_keys(cs, Vec3(ox, oy, oz), Vec3(dx, dy, dz))
    keys = jnp.where(tm > 0.0, keys, jnp.int32(0x7FFFFFFF))
    perm = jnp.argsort(keys)
    srt = lambda x: x[perm]
    ox, oy, oz, dx, dy, dz, tm = srt(ox), srt(oy), srt(oz), srt(dx), srt(dy), srt(dz), srt(tm)

    origin = Vec3(ox, oy, oz)
    direction = Vec3(dx, dy, dz)
    cand, entry, bfs_overflow = _block_candidates_bfs(cs, origin, direction, tm, kb)
    kb = cand.shape[1]

    def rblk(x):
        return x.reshape(b, RB_SUB, RB_LANE)

    ray_spec = pl.BlockSpec(
        (1, RB_SUB, RB_LANE), lambda bi, cand, entry: (bi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed cluster tiles (HBM)
        ]
        + [ray_spec] * 7,
        out_specs=[ray_spec] * 4,
        scratch_shapes=[
            pltpu.SMEM(cs.stream_block.shape[1:] and (2,) + tuple(cs.stream_block.shape[1:]), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((b, RB_SUB, RB_LANE), jnp.float32),
        jax.ShapeDtypeStruct((b, RB_SUB, RB_LANE), jnp.int32),
        jax.ShapeDtypeStruct((b, RB_SUB, RB_LANE), jnp.float32),
        jax.ShapeDtypeStruct((b, RB_SUB, RB_LANE), jnp.float32),
    ]
    t, tri, u, v = pl.pallas_call(
        functools.partial(_phase2_stream_kernel, k=k, kb=kb, any_hit=any_hit),
        grid_spec=grid_spec,
        out_shape=out_shape,
    )(
        cand, entry, cs.stream_block,
        rblk(ox), rblk(oy), rblk(oz), rblk(dx), rblk(dy), rblk(dz), rblk(tm),
    )
    t, tri, u, v = t.reshape(n), tri.reshape(n), u.reshape(n), v.reshape(n)
    overflow = jnp.repeat(bfs_overflow, RB)

    inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(n, dtype=perm.dtype))
    return t[inv], tri[inv], u[inv], v[inv], overflow[inv]


@functools.partial(jax.jit, static_argnames=("kb",))
def _pallas_sorted_closest_hit(cs: ClusterSet, ox, oy, oz, dx, dy, dz, tm, kb: int):
    """Sorted-wavefront closest hit on padded (B*RB,) arrays."""
    n = ox.shape[0]
    b = n // RB
    k = cs.tris_per_cluster

    keys = _ray_sort_keys(cs, Vec3(ox, oy, oz), Vec3(dx, dy, dz))
    # pad rays (tm == 0) sort to the very end so real blocks stay dense
    keys = jnp.where(tm > 0.0, keys, jnp.int32(0x7FFFFFFF))
    perm = jnp.argsort(keys)
    s = lambda x: x[perm]
    ox, oy, oz, dx, dy, dz, tm = s(ox), s(oy), s(oz), s(dx), s(dy), s(dz), s(tm)

    origin = Vec3(ox, oy, oz)
    direction = Vec3(dx, dy, dz)
    # BFS down the cluster tree: O(B x kb) per level, independent of cluster
    # count; the kernel's nearest-first early-out skips candidates once every
    # ray in the block is resolved, so oversizing kb costs DMA, not compute
    cand, entry, bfs_overflow = _block_candidates_bfs(cs, origin, direction, tm, kb)
    kb = cand.shape[1]

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
    t, tri, u, v = t.reshape(n), tri.reshape(n), u.reshape(n), v.reshape(n)

    # truncation diagnosis on the sorted layout: overflow iff the BFS
    # actually DROPPED candidate nodes for this ray's block (drops are the
    # only way a hit can be missed; an un-truncated candidate list is exact
    # regardless of how many entries it holds)
    overflow = jnp.repeat(bfs_overflow, RB)

    # scatter back to caller order
    inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(n, dtype=perm.dtype))
    return t[inv], tri[inv], u[inv], v[inv], overflow[inv]


def _pad_and_trace(cs, origin, direction, t_max, kb, any_hit):
    cs, origin, direction, t_max = jax.lax.stop_gradient(
        (cs, origin, direction, t_max)
    )
    n = origin.x.shape[0]
    pad = (-n) % RB
    tm = jnp.asarray(t_max) * jnp.ones(n, jnp.float32)

    def padded(x, fill):
        return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)]) if pad else x

    ox, oy, oz = padded(origin.x, 0.0), padded(origin.y, 0.0), padded(origin.z, 0.0)
    dx, dy, dz = padded(direction.x, 1.0), padded(direction.y, 0.0), padded(direction.z, 0.0)
    tmp = padded(tm, 0.0)
    t, tri, u, v, overflow = _pallas_stream_trace(
        cs, ox, oy, oz, dx, dy, dz, tmp, kb, any_hit
    )
    return t[:n], tri[:n], u[:n], v[:n], overflow[:n]


def pallas_sorted_closest_hit(
    cs: ClusterSet, origin: Vec3, direction: Vec3, t_max, kb: int = 256
):
    """Production mesh closest-hit: octant+Morton ray sort -> per-block BFS
    candidates over the cluster tree -> streaming Pallas phase 2 -> unsort.

    Same contract as :func:`pallas_cluster_closest_hit`.  Works for both
    coherent (camera) and incoherent (bounce) wavefronts.
    """
    t, tri, u, v, overflow = _pad_and_trace(cs, origin, direction, t_max, kb, False)
    missed = tri < 0
    return jnp.where(missed, BIG, t), tri, u, v, overflow


def pallas_sorted_any_hit(
    cs: ClusterSet, origin: Vec3, direction: Vec3, t_max, kb: int = 256
):
    """Any-hit occlusion via the streaming kernel's park-at-zero mode: the
    candidate loop exits as soon as the whole block is occluded (the analogue
    of the reference's shadow-ray early-out, `Traversal_Single.h:99-179`).

    Returns (occluded, overflow): shadow rays whose block's BFS truncated are
    flagged, not silently trusted (they may miss occluders => light leaks)."""
    t, tri, _, _, overflow = _pad_and_trace(cs, origin, direction, t_max, kb, True)
    return tri >= 0, overflow
