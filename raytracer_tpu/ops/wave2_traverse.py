"""Pallas sort-join mesh traversal — the production TPU path (exact + fast).

Fourth-generation engine.  The pure-XLA binned engine (`wave_traverse.py`)
is exact but pays TPU's weak spots — `top_k` (~0.2 us/row regardless of
width), element gathers (~7 ns/element) and scatters — measured on v5e with
a dependency-chained harness (the naive `block_until_ready` timing lies
under the axon transport).  This engine keeps the same exact semantics but
routes every data movement through the THREE primitives that are actually
fast on this hardware:

- **dense VPU compute** inside Pallas kernels (slab tests, Moller-Trumbore
  with SMEM-broadcast geometry: ~40 Gtri-test/s vs ~5 for XLA-fused MT);
- **`lax.sort`**, whose cost is flat in operand count (10 operands sort as
  fast as 2: ~0.8 ns/elem) — so ray payloads RIDE the pair sort instead of
  being gathered afterwards;
- **sequential DMA** (BlockSpec pipelining + double-buffered manual copies).

Pipeline (round 5 shape):

0. Liveness windows (``_wave2_trace``): rays with work (t_max > 0) are
   compacted to the front by ONE stable sort and traced in fixed-size
   ``SUBWAVE`` windows via `lax.while_loop` — wavefront cost follows the
   LIVE ray count down the bounce ladder; an all-dead wavefront costs two
   small sorts and nothing else.
1. ``_p1_extract`` (XLA, default): dense (rays × Cs) slab test; the 0/1
   hit matrix is bit-packed by one bf16 MXU matmul, then a find-first-set
   peel emits up to ``kc`` overlapped super ids per ray in ascending id
   order (the resume cursor is one int).  ``_p1_extract_ftb``
   (RT_WAVE2_FTB=1, experimental): packs (t_enter, id) into one sortable
   int32 key per overlap and peels the NEAREST unvisited supers in
   distance order with entry-distance early termination
   (`Traversal_Single.h:65-75`).  Measured r5: nearest-first saves traced
   pairs but multiplies round count, and window-sized per-round sorts eat
   the saving (1658 vs 719 ms/pass at 512² mesh200k) — one big id-ordered
   round beats many small distance-ordered ones on this hardware.
2. Pair join: one 9-operand `lax.sort` on the composite key
   ``super_id << shift | ray_octant | origin_Morton`` — chunks stay
   single-super while each chunk's rays become spatially/directionally
   coherent (so the kernel's (row, sub-box) gates cull; this is the
   stubbed RayStream sorter's intent, `Core/Traversal/RayStream.cpp`).
   A second sort filler-pads every super's run to CHUNK-pair chunks, so no
   chunk crosses supers and nothing can be dropped.
3. ``_mt_kernel`` (Pallas): per chunk, DMA the super's component-major
   geometry (tris on sublanes) and run fully-vectorized Möller-Trumbore —
   every op an (8 tris × 128 rays) VPU tile, geometry components broadcast
   from (8,1) columns, ray components from (1,128) rows: ZERO scalar reads
   in the hot loop.  (8 subs × 128 rays) slab gates skip sub-clusters a
   row's rays do not touch.  Emits per-pair (t, tri, u, v, processed).
4. Reduce: one more sort returns results to ray-major order; a dense
   (N, kc) masked min picks each ray's best.
5. Continuation: unresolved rays (a nearer unvisited candidate exists) are
   compacted (sort) into ``NSUB`` sub-wavefronts and re-traced in a
   `lax.while_loop` until none remain — the exactness guarantee,
   typically 0-2 iterations for a shrinking minority of rays.

CPU runs the same code under `interpret=True` (tests); TPU compiles the
kernels.  AD-detached like every traversal backend (SURVEY §7).

Reference analogues: packet traversal with per-node active masks
(`Core/Traversal/Traversal_Packet.cpp:111-162`), shadow-ray early-out
(`Traversal_Single.h:99-179`), and the stubbed RayStream coherence sorter
(`Core/Traversal/RayStream.cpp:26-48`) — here the sort IS the scheduler.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..math.vec import Vec3
from ..scene.clusters import SUB_PER_SUPER, ClusterSet
from .intersect import BIG

TRI_EPS = 1e-7
HIT_EPS = 1e-4

import os as _env_os

CHUNK = int(_env_os.environ.get("RT_WAVE2_CHUNK", "1024"))  # pairs per MT work chunk.
# Tradeoff (measured r5): small chunks shrink the FILLER budget (every
# super's pair-run is padded to CHUNK multiples; the budget rides sorts 2+3
# of EVERY round — 1.6M elements at Cs=1563/CHUNK=1024) but QUADRUPLE the
# grid-step count, whose per-step cost (12 pipelined buffers) dominates:
# id-order kc16 at CHUNK=256 measured ~1.5x slower than CHUNK=1024 on the
# mesh200k dispatch.  1024 wins on both bench scenes; RT_WAVE2_CHUNK is the
# A/B knob.
ROWS = CHUNK // 128  # ray rows per chunk
NSUB = int(_env_os.environ.get("RT_WAVE2_NSUB", "16384"))  # continuation sub-wavefront size
# pair sort key = super_id << shift | octant(3) | origin Morton; the shift
# adapts to the super count so the composite key stays inside int32
def _key_shift(cs: int) -> int:
    return max(0, min(21, 31 - max(1, int(cs + 1).bit_length())))
BIGF = 3.0e38


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


# --------------------------------------------------------------------------
# Phase 1: per-ray candidate extraction over super-cluster boxes
# --------------------------------------------------------------------------


_WORD_BITS = 16  # bits per packed word (exact in f32 MXU accumulation)
# chunk budget for the (rays x Cs) hit matrix: big enough that production
# wavefronts run as ONE chunk (lax.scan overhead measured ~2.7x at 7 chunks)
_P1_CHUNK_ELEMS = 256 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("kc",))
def _p1_extract(cs_set: ClusterSet, ox, oy, oz, dx, dy, dz, tl, cursor, kc: int):
    """(Npad,) rays -> (cand (Npad, kc) ascending super ids (Cs = empty),
    remaining (Npad,)).

    Pure XLA: a dense (rays × Cs) slab test whose 0/1 hit matrix is packed
    into 16-bit words by ONE bf16 matmul against a power-of-two weight
    matrix (exact: products are 0 or 2^b, accumulated in f32 below 2^16) —
    the MXU does the bit-pack for free — followed by a find-first-set loop
    that peels ``kc`` ascending super ids per ray from the words.  This
    avoids both `top_k` (~0.2 us/row on v5e regardless of width) and any
    scalar-broadcast Pallas loop (128x lane waste).
    """
    n = ox.shape[0]
    cs = cs_set.num_supers
    nw = -(-cs // _WORD_BITS)
    ch = max(CHUNK, min(n, (_P1_CHUNK_ELEMS // max(cs, 1)) // CHUNK * CHUNK))
    pad = (-n) % ch
    num_chunks = (n + pad) // ch

    tiny = 1e-12
    inv = lambda d: 1.0 / jnp.where(jnp.abs(d) > tiny, d, jnp.where(d >= 0, tiny, -tiny))

    def shp(x, fill):
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
        return x.reshape(num_chunks, ch, 1)

    chunks = (
        shp(ox, 0.0), shp(oy, 0.0), shp(oz, 0.0),
        shp(inv(dx), 1.0), shp(inv(dy), 1.0), shp(inv(dz), 1.0),
        shp(tl, 0.0), shp(cursor, cs),
    )

    bx0 = cs_set.super_box[None, :, 0]
    by0 = cs_set.super_box[None, :, 1]
    bz0 = cs_set.super_box[None, :, 2]
    bx1 = cs_set.super_box[None, :, 3]
    by1 = cs_set.super_box[None, :, 4]
    bz1 = cs_set.super_box[None, :, 5]
    cid_row = jnp.arange(cs, dtype=jnp.int32)[None, :]
    # (Cs, nw) pack weights: word c//16 gets 2^(c%16)
    w_pack = (
        (jnp.arange(cs)[:, None] // _WORD_BITS == jnp.arange(nw)[None, :])
        * (2.0 ** (jnp.arange(cs)[:, None] % _WORD_BITS))
    ).astype(jnp.bfloat16)

    def body(_, chunk):
        cox, coy, coz, cix, ciy, ciz, ctl, ccur = chunk
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
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        ent = jnp.maximum(tmin, 0.0)
        # tl's SIGN encodes per-ray any-hit mode; the limit is |tl|
        hit = (tmax >= ent) & (ent < jnp.abs(ctl)) & (cid_row > ccur)
        words = jax.lax.dot(
            hit.astype(jnp.bfloat16), w_pack,
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # (ch, nw) 16-bit masks

        # peel kc lowest set bits (ascending super id) per ray
        word_base = jnp.arange(nw, dtype=jnp.int32)[None, :] * _WORD_BITS
        total = jnp.zeros(ch, jnp.int32)
        for w in range(nw):
            total = total + jax.lax.population_count(words[:, w])
        slots = []
        for _s in range(kc):
            low = words & (-words)
            # exact ffs via the f32 exponent (low is a power of two < 2^24)
            bit = (
                jax.lax.bitcast_convert_type(low.astype(jnp.float32), jnp.int32)
                >> 23
            ) - 127
            idx = jnp.where(words != 0, word_base + bit, jnp.int32(2**30))
            best = jnp.min(idx, axis=1)
            slots.append(jnp.where(best < 2**30, best, cs))
            clear = idx == best[:, None]
            words = jnp.where(clear, words - low, words)
        cand = jnp.stack(slots, axis=1)
        return None, (cand, jnp.maximum(total - kc, 0))

    _, (cand, remaining) = jax.lax.scan(body, None, chunks)
    return cand.reshape(-1, kc)[:n], remaining.reshape(-1)[:n]


def _id_bits(cs: int) -> int:
    return max(1, int(cs).bit_length())


@functools.partial(jax.jit, static_argnames=("kc",))
def _p1_extract_ftb(cs_set: ClusterSet, ox, oy, oz, dx, dy, dz, tl, cur_key, kc: int):
    """Front-to-back candidate extraction (`Traversal_Single.h:65-75`'s
    near-child-first ordering, re-expressed for a dense wavefront).

    Per ray: the ``kc`` nearest unvisited overlapped supers, ordered by
    (t_enter, id).  Each (ray, super) overlap gets ONE sortable int32 key
    ``(t_enter_bits >> sh) << id_bits | super_id`` — the bit pattern of a
    non-negative f32 is monotone in its value, so integer order == distance
    order, with the super id as tie-break.  ``cur_key`` is the key of the
    last super already visited (-1 initially); only strictly greater keys are
    emitted, which makes multi-round resumption exact.

    Returns (cand (N, kc) ascending keys' super ids (Cs = empty slot),
    next_t (N,) a LOWER BOUND on the (kc+1)-th candidate's t_enter (+inf when
    none — the early-termination test `next_t < t_best` is conservative
    under the key quantization), new_cur (N,) the last emitted key).
    """
    n = ox.shape[0]
    cs = cs_set.num_supers
    idb = _id_bits(cs)
    sh = idb  # (31 - sh) t bits + idb id bits fit in a non-negative int32
    imax = jnp.int32(2**31 - 1)
    ch = max(CHUNK, min(n, (_P1_CHUNK_ELEMS // max(cs, 1)) // CHUNK * CHUNK))
    pad = (-n) % ch
    num_chunks = (n + pad) // ch

    tiny = 1e-12
    inv = lambda d: 1.0 / jnp.where(jnp.abs(d) > tiny, d, jnp.where(d >= 0, tiny, -tiny))

    def shp(x, fill):
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
        return x.reshape(num_chunks, ch, 1)

    chunks = (
        shp(ox, 0.0), shp(oy, 0.0), shp(oz, 0.0),
        shp(inv(dx), 1.0), shp(inv(dy), 1.0), shp(inv(dz), 1.0),
        shp(tl, 0.0), shp(cur_key, imax),
    )

    bx0 = cs_set.super_box[None, :, 0]
    by0 = cs_set.super_box[None, :, 1]
    bz0 = cs_set.super_box[None, :, 2]
    bx1 = cs_set.super_box[None, :, 3]
    by1 = cs_set.super_box[None, :, 4]
    bz1 = cs_set.super_box[None, :, 5]
    cid_row = jnp.arange(cs, dtype=jnp.int32)[None, :]

    def body(_, chunk):
        cox, coy, coz, cix, ciy, ciz, ctl, ccur = chunk
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
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        ent = jnp.maximum(tmin, 0.0)
        # tl's SIGN encodes per-ray any-hit mode; the limit is |tl|
        hit = (tmax >= ent) & (ent < jnp.abs(ctl))
        key = (
            (jax.lax.bitcast_convert_type(ent, jnp.int32) >> sh) << idb
        ) | cid_row
        kmat = jnp.where(hit & (key > ccur), key, imax)
        # multi-pass min consumers re-evaluate fused producers per pass:
        # materialize the key matrix once
        kmat = jax.lax.optimization_barrier(kmat)

        slots = []
        last = jnp.broadcast_to(ccur[:, 0], (ch,))
        for _s in range(kc):
            m = jnp.min(kmat, axis=1)
            got = m < imax
            slots.append(jnp.where(got, m & ((1 << idb) - 1), cs))
            last = jnp.where(got, m, last)
            kmat = jnp.where(kmat == m[:, None], imax, kmat)
        next_m = jnp.min(kmat, axis=1)
        # dequantized floor of the next candidate's t_enter (conservative)
        next_t = jnp.where(
            next_m < imax,
            jax.lax.bitcast_convert_type(
                (next_m >> idb) << sh, jnp.float32
            ),
            jnp.float32(jnp.inf),
        )
        return None, (jnp.stack(slots, axis=1), next_t, last)

    _, (cand, next_t, last) = jax.lax.scan(body, None, chunks)
    return (
        cand.reshape(-1, kc)[:n],
        next_t.reshape(-1)[:n],
        last.reshape(-1)[:n],
    )


# --------------------------------------------------------------------------
# Phase 2: sort-join + streaming MT kernel
# --------------------------------------------------------------------------


def _mt_kernel(
    # scalar prefetch
    c_tab,  # (B,) int32 super id per 1024-pair chunk (Cs = sentinel/skip)
    # pipelined tensor operands (BlockSpec-selected per chunk)
    geom_ref,  # (1, 8K, 16) component-major geometry: tris on SUBLANES,
    # lanes [v0.xyz, e1.xyz, e2.xyz, tri_id, pad]; rows [s*K,(s+1)*K) = sub s
    sbox_ref,  # (1, 8, 8) sub boxes, lanes [min.xyz, max.xyz, 0, 0]
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tl_ref,  # (1, ROWS, 128)
    # outputs (1, ROWS, 128) — each chunk owns exactly one grid step (runs are
    # filler-padded to chunk multiples), so no revisiting and no read-back:
    # [t, tri, u, v, done]
    # then scratch: per-ray-row running best in tri-sublane space,
    # VMEM (8, 128) f32 x 4
    *refs,
    k: int,
    cs: int,
    any_hit: bool,
):
    """Fully vectorized Möller-Trumbore: every op is an (8, 128) VPU tile of
    (8 triangles × 128 rays).  Triangle components are (8, 1) sublane columns
    of the component-major geometry block; ray components are (1, 128) lane
    rows of the pair payload — both broadcast for free, so the inner loop has
    ZERO scalar VMEM reads (the round-3 kernel read geometry scalar-by-scalar
    at ~70 ns each and was wholly read-bound, docs/perf_notes.md).

    The winner's shading frame (`MeshShape::EvaluateIntersection`,
    `MeshShape.cpp:283-328`) is reconstructed POST-trace with one row-gather
    from ``ClusterSet.tri_attr`` (~1.5 ms per 262k-ray wavefront): both
    riding attr channels through the downstream sorts (~430 ms/pass at
    512^2) and packing them into this kernel's geometry DMA were measured
    and rejected (docs/perf_notes.md r4)."""
    (t_out, tri_out, u_out, v_out, done_out,
     bt_ref, btid_ref, bu_ref, bv_ref) = refs
    b = pl.program_id(0)
    live = c_tab[b] < cs

    ox = ox_ref[0]
    oy = oy_ref[0]
    oz = oz_ref[0]
    dx = dx_ref[0]
    dy = dy_ref[0]
    dz = dz_ref[0]
    tl_signed = tl_ref[0]
    # per-lane any-hit: tl < 0 marks an occlusion query with limit |tl|
    # (the fused integrator traces shadow + next-bounce rays in ONE
    # wavefront; shadow lanes keep their early-exit semantics this way)
    ah_l = tl_signed < 0.0
    tl = jnp.abs(tl_signed)
    # filler / pad lanes carry tl == 0 -> they can never register a hit
    mask = tl > 0.0

    t_out[0] = tl
    tri_out[0] = jnp.full(tl.shape, -1, jnp.int32)
    u_out[0] = jnp.zeros(tl.shape, jnp.float32)
    v_out[0] = jnp.zeros(tl.shape, jnp.float32)
    done_out[0] = jnp.where(live, mask.astype(jnp.int32), 0)

    tiny = 1e-12
    inv = lambda d: 1.0 / jnp.where(jnp.abs(d) > tiny, d, jnp.where(d >= 0, tiny, -tiny))
    ix8, iy8, iz8 = inv(dx), inv(dy), inv(dz)
    groups = k // 8  # 8-triangle sublane groups per sub-cluster

    @pl.when(live)
    def _():
        geom = geom_ref[0]  # (8K, 16): [v0.xyz, e1.xyz, e2.xyz, tri_id, pad]
        sbox = sbox_ref[0]  # (8, 8)
        sb = lambda c: sbox[:, c : c + 1]  # (8, 1) sub-box component column

        for r in range(ROWS):  # ray rows (128 pairs each)
            ro = slice(r, r + 1)
            rox, roy, roz = ox[ro], oy[ro], oz[ro]
            rdx, rdy, rdz = dx[ro], dy[ro], dz[ro]
            rix, riy, riz = ix8[ro], iy8[ro], iz8[ro]
            rtl = tl[ro]
            rmask = mask[ro]
            rah = ah_l[ro]

            # (8 subs × 128 rays) slab gate — subs on sublanes
            t1x = (sb(0) - rox) * rix
            t2x = (sb(3) - rox) * rix
            t1y = (sb(1) - roy) * riy
            t2y = (sb(4) - roy) * riy
            t1z = (sb(2) - roz) * riz
            t2z = (sb(5) - roz) * riz
            bmin = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            bmax = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            sub_hit = (bmax >= jnp.maximum(bmin, 0.0)) & (bmin < rtl) & rmask

            # running best per (tri-sublane-slot × ray): scratch refs so the
            # gated sub bodies can update state across `pl.when` boundaries
            bt_ref[:] = jnp.broadcast_to(rtl, (8, 128))
            btid_ref[:] = jnp.full((8, 128), -1.0, jnp.float32)
            bu_ref[:] = jnp.zeros((8, 128), jnp.float32)
            bv_ref[:] = jnp.zeros((8, 128), jnp.float32)

            for s in range(SUB_PER_SUPER):

                @pl.when(jnp.any(sub_hit[s : s + 1]))
                def _(s=s):
                    bt = bt_ref[:]
                    btid = btid_ref[:]
                    bu = bu_ref[:]
                    bv = bv_ref[:]
                    for g in range(groups):
                        rows = slice((s * k + g * 8), (s * k + g * 8 + 8))
                        col = lambda c: geom[rows, c : c + 1]  # (8, 1)
                        v0x, v0y, v0z = col(0), col(1), col(2)
                        e1x, e1y, e1z = col(3), col(4), col(5)
                        e2x, e2y, e2z = col(6), col(7), col(8)
                        tid = col(9)
                        px = rdy * e2z - rdz * e2y
                        py = rdz * e2x - rdx * e2z
                        pz = rdx * e2y - rdy * e2x
                        det = e1x * px + e1y * py + e1z * pz
                        okd = jnp.abs(det) > TRI_EPS
                        inv_det = 1.0 / jnp.where(okd, det, 1.0)
                        tx, ty, tz = rox - v0x, roy - v0y, roz - v0z
                        uu = (tx * px + ty * py + tz * pz) * inv_det
                        qx = ty * e1z - tz * e1y
                        qy = tz * e1x - tx * e1z
                        qz = tx * e1y - ty * e1x
                        vv = (rdx * qx + rdy * qy + rdz * qz) * inv_det
                        tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                        hit = (
                            okd
                            & (uu >= 0.0)
                            & (vv >= 0.0)
                            & (uu + vv <= 1.0)
                            & (tt > HIT_EPS)
                            & (tid >= 0.0)
                            & (tt < bt)
                        )
                        if any_hit:
                            bt = jnp.where(hit, 0.0, bt)
                            btid = jnp.where(hit, tid, btid)
                        else:
                            # any-hit LANES collapse to t=0 on first hit so
                            # every later test fails the (tt < bt) gate fast
                            bt = jnp.where(hit, jnp.where(rah, 0.0, tt), bt)
                            btid = jnp.where(hit, tid, btid)
                            bu = jnp.where(hit, uu, bu)
                            bv = jnp.where(hit, vv, bv)
                    bt_ref[:] = bt
                    btid_ref[:] = btid
                    bu_ref[:] = bu
                    bv_ref[:] = bv

            # fold the 8 sublane slots into this row's final hit: min t,
            # ties by lowest tri id (matches the host-side winner select)
            bt = bt_ref[:]
            btid = btid_ref[:]
            got = btid >= 0.0
            t_row = jnp.min(jnp.where(got, bt, BIGF), axis=0, keepdims=True)
            w = got & (bt == t_row)
            tid_row = jnp.min(jnp.where(w, btid, BIGF), axis=0, keepdims=True)
            w = w & (btid == tid_row)
            u_row = jnp.max(jnp.where(w, bu_ref[:], -BIGF), axis=0, keepdims=True)
            v_row = jnp.max(jnp.where(w, bv_ref[:], -BIGF), axis=0, keepdims=True)
            any_row = tid_row < BIGF
            t_out[0, ro] = jnp.where(any_row, jnp.minimum(t_row, rtl), rtl)
            tri_out[0, ro] = jnp.where(any_row, tid_row, -1.0).astype(jnp.int32)
            u_out[0, ro] = jnp.where(any_row, u_row, 0.0)
            v_out[0, ro] = jnp.where(any_row, v_row, 0.0)


def _searchsorted(sorted_arr, queries):
    return jnp.searchsorted(sorted_arr, queries, side="right")


@functools.partial(jax.jit, static_argnames=("kc", "bps", "any_hit", "ftb"))
def _round(cs_set: ClusterSet, ox, oy, oz, dx, dy, dz, tl, cursor, kc: int, bps: int, any_hit: bool, ftb: bool = False):
    """One full extraction + join + MT round on a padded (Npad,) wavefront.

    ``ftb=True`` selects front-to-back candidate extraction: candidates
    arrive in ascending (t_enter, id) order and a ray terminates as soon as
    its next unvisited candidate's entry distance cannot beat its best hit
    (the wavefront analogue of near-child-first + early-out,
    `Traversal_Single.h:65-75`).  ``cursor`` is then the last visited
    (t_enter, id) key instead of the last visited super id.

    Returns (t, tri, u, v, attrs, new_cursor, unresolved) — t == |tl| where
    no hit.  ``attrs`` is always (): the winner's shading frame is
    reconstructed post-trace from ``ClusterSet.tri_attr`` (the tuple slot is
    kept so the driver's carry structure is stable).
    """
    n = ox.shape[0]
    cs = cs_set.num_supers
    ah_ray = tl < 0.0  # sign encodes per-ray any-hit (limit |tl|)
    tl_abs = jnp.abs(tl)
    if ftb:
        cand, next_t, new_key = _p1_extract_ftb(
            cs_set, ox, oy, oz, dx, dy, dz, tl, cursor, kc
        )
        remaining = None
    else:
        cand, remaining = _p1_extract(cs_set, ox, oy, oz, dx, dy, dz, tl, cursor, kc)

    p = n * kc
    p_pad = -(-p // CHUNK) * CHUNK
    del bps  # grid is per-chunk now; kept in the signature for jit stability

    def pad_to(x, length, fill):
        extra = length - x.shape[0]
        return jnp.concatenate([x, jnp.full((extra,), fill, x.dtype)]) if extra else x

    rep = lambda x: jnp.broadcast_to(x[:, None], (n, kc)).reshape(p)

    # --- composite sort key: (super id | ray octant | ray origin Morton).
    # Chunks stay single-super (the primary field), but pairs WITHIN a
    # super's run are spatially+directionally sorted, so the 128-ray rows a
    # chunk feeds the kernel are coherent and the kernel's per-(row, sub)
    # gate actually culls (with index-ordered rays a row's sub-box union is
    # ~all 8 of 8; with Morton|octant rows it collapses to the rays' true
    # footprint).  The stubbed RayStream sorter's intent, done in the join
    # (`Core/Traversal/RayStream.cpp:26-48`).
    import os as _os

    key_shift = _key_shift(cs) if _os.environ.get("RT_WAVE2_SPATIAL_KEY", "1") != "0" else 0
    mbits = max(0, key_shift - 3)
    valid_s = cs_set.super_box[:, 0] <= cs_set.super_box[:, 3]
    glo = [jnp.min(jnp.where(valid_s, cs_set.super_box[:, i], jnp.inf)) for i in range(3)]
    ghi = [jnp.max(jnp.where(valid_s, cs_set.super_box[:, 3 + i], -jnp.inf)) for i in range(3)]

    bpa = mbits // 3  # Morton bits per axis
    top = float(2 ** bpa - 1)

    def qb(x, lo, hi):
        return jnp.clip((x - lo) / jnp.maximum(hi - lo, 1e-9) * top, 0.0, top).astype(jnp.int32)

    qx, qy, qz = qb(ox, glo[0], ghi[0]), qb(oy, glo[1], ghi[1]), qb(oz, glo[2], ghi[2])
    morton = jnp.zeros_like(qx)
    for b in range(bpa):
        morton = (
            morton
            | (((qx >> b) & 1) << (3 * b))
            | (((qy >> b) & 1) << (3 * b + 1))
            | (((qz >> b) & 1) << (3 * b + 2))
        )
    octant = (
        (dx < 0).astype(jnp.int32)
        | ((dy < 0).astype(jnp.int32) << 1)
        | ((dz < 0).astype(jnp.int32) << 2)
    )
    okey = ((octant << mbits) | morton) if key_shift >= 3 else jnp.zeros_like(morton)
    key = jnp.where(cand < cs, (cand << key_shift) | okey[:, None], cs << key_shift)
    key = pad_to(key.reshape(p), p_pad, cs << key_shift)
    pidx = pad_to(jnp.arange(p, dtype=jnp.int32), p_pad, p)
    # barrier: lax.sort is multi-pass — letting XLA fuse the broadcasts/pads
    # into it re-evaluates them per pass (measured 50x slowdown on v5e)
    sort_in = jax.lax.optimization_barrier(
        [key, pidx, pad_to(rep(ox), p_pad, 0.0), pad_to(rep(oy), p_pad, 0.0),
         pad_to(rep(oz), p_pad, 0.0), pad_to(rep(dx), p_pad, 1.0),
         pad_to(rep(dy), p_pad, 0.0), pad_to(rep(dz), p_pad, 0.0),
         pad_to(rep(tl), p_pad, 0.0)]
    )
    sk, sidx, sox, soy, soz, sdx, sdy, sdz, stl = jax.lax.optimization_barrier(
        jax.lax.sort(sort_in, num_keys=1)
    )

    # --- filler-padded destination keys: every cluster's pair-run is padded
    # to CHUNK multiples so each 1024-pair chunk belongs to exactly ONE
    # cluster — nothing can ever be dropped (no run-crossing items), which
    # is what makes the resume/continuation loop terminate unconditionally.
    # first pair with super id >= c (keys are composite: super << key_shift)
    start = _searchsorted(sk, (jnp.arange(cs + 1, dtype=jnp.int32) << key_shift) - 1)
    pos = jnp.arange(p_pad, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones(1, bool), (sk[1:] >> key_shift) != (sk[:-1] >> key_shift)]
    )
    run_start = jax.lax.cummax(jnp.where(is_start, pos, 0))
    prev_start = jnp.concatenate([jnp.zeros(1, jnp.int32), run_start[:-1]])
    prev_len = pos - prev_start  # at a run start: length of the PREVIOUS run
    v_p = jnp.where(is_start & (pos > 0), (-prev_len) % CHUNK, 0)
    cum_pad = jnp.cumsum(v_p)
    d_p = pos + cum_pad  # padded destination of each pair (ascending)

    # filler keys fill each cluster's gap [D_c + len_c, D_c + len_c + pad_c)
    cp_at = cum_pad[jnp.minimum(start, p_pad - 1)]
    d_c = start + cp_at  # (Cs+1,) padded start of each cluster's region
    len_c = start[1:] - start[:-1]  # (Cs,) real clusters only
    pad_c = (-len_c) % CHUNK
    gap_start = d_c[:cs] + len_c
    f = -(-(cs * (CHUNK - 1)) // CHUNK) * CHUNK  # filler budget (CHUNK-mult)
    d_len = p_pad + f
    jj = jnp.arange(CHUNK - 1, dtype=jnp.int32)[None, :]
    fill_key = jnp.where(
        jj < pad_c[:, None], gap_start[:, None] + jj, jnp.int32(2**30)
    ).reshape(-1)
    fill_key = jnp.concatenate(
        [fill_key, jnp.full((f - fill_key.shape[0],), 2**30, jnp.int32)]
    )

    def with_fillers(x, fill):
        return jnp.concatenate([x, jnp.full((f,), fill, x.dtype)])

    sort2_in = jax.lax.optimization_barrier(
        [jnp.concatenate([d_p, fill_key]),
         with_fillers(sidx, p_pad),
         with_fillers(sox, 0.0), with_fillers(soy, 0.0), with_fillers(soz, 0.0),
         with_fillers(sdx, 1.0), with_fillers(sdy, 0.0), with_fillers(sdz, 0.0),
         with_fillers(stl, 0.0)]
    )
    _, fidx, fox, foy, foz, fdx, fdy, fdz, ftl = jax.lax.optimization_barrier(
        jax.lax.sort(sort2_in, num_keys=1)
    )

    # per-chunk cluster table: chunk b sits in the region of the cluster
    # whose padded start is the last one <= 1024*b (sentinel-region -> Cs)
    b2 = d_len // CHUNK
    block_cluster = jnp.minimum(
        _searchsorted(d_c, jnp.arange(b2, dtype=jnp.int32) * CHUNK) - 1, cs
    )
    block_cluster = jnp.clip(block_cluster, 0, cs)

    chunked = lambda x: x.reshape(b2, ROWS, 128)
    k = cs_set.tris_per_cluster
    n_supers = cs  # OOB block indices fault the TPU: clamp defensively
    geom_spec = pl.BlockSpec(
        (1, SUB_PER_SUPER * k, 16),
        lambda i, c: (jnp.clip(c[i], 0, n_supers - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    sbox_spec = pl.BlockSpec(
        (1, SUB_PER_SUPER, 8),
        lambda i, c: (jnp.clip(c[i], 0, n_supers - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    pair_spec = pl.BlockSpec(
        (1, ROWS, 128), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b2,),
        in_specs=[geom_spec, sbox_spec] + [pair_spec] * 7,
        out_specs=[pair_spec] * 5,
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)] * 4,
    )
    f32s = jax.ShapeDtypeStruct((b2, ROWS, 128), jnp.float32)
    i32s = jax.ShapeDtypeStruct((b2, ROWS, 128), jnp.int32)
    out_shape = [f32s, i32s, f32s, f32s, i32s]
    if _os.environ.get("RT_WAVE2_SKIP_KERNEL"):
        # perf-ablation diagnostics only (tools/probe_r5b.py): the sort-join
        # runs but every chunk reports "processed, no hit" — isolates the
        # sorts+reduce bill from the MT kernel (requires jax.clear_caches()
        # between flag flips: the flag is read at trace time)
        ctl = chunked(ftl)
        outs = [jnp.abs(ctl), jnp.full((b2, ROWS, 128), -1, jnp.int32),
                jnp.zeros((b2, ROWS, 128), jnp.float32),
                jnp.zeros((b2, ROWS, 128), jnp.float32),
                (jnp.abs(ctl) > 0.0).astype(jnp.int32)]
    else:
        outs = pl.pallas_call(
            functools.partial(_mt_kernel, k=k, cs=cs, any_hit=any_hit),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=_interpret(),
        )(
            block_cluster,
            cs_set.super_geom,
            cs_set.super_sbox,
            chunked(fox), chunked(foy), chunked(foz),
            chunked(fdx), chunked(fdy), chunked(fdz), chunked(ftl),
        )
    t_s, tri_s, u_s, v_s, done_s = outs[:5]
    attr_s = outs[5:]

    # back to ray-major pair order (fillers carry idx >= p_pad -> tail)
    sort3_in = jax.lax.optimization_barrier(
        [fidx, t_s.reshape(d_len), tri_s.reshape(d_len), u_s.reshape(d_len),
         v_s.reshape(d_len), done_s.reshape(d_len)]
        + [a.reshape(d_len) for a in attr_s]
    )
    sorted3 = jax.lax.optimization_barrier(jax.lax.sort(sort3_in, num_keys=1))
    _, t_p, tri_p, u_p, v_p, done_p = sorted3[:6]
    attr_p = sorted3[6:]
    shp = lambda x: x[:p].reshape(n, kc)
    t_p, tri_p, u_p, v_p, done_p = shp(t_p), shp(tri_p), shp(u_p), shp(v_p), shp(done_p)
    attr_p = [shp(a) for a in attr_p]

    slot_valid = cand < cs
    hit = slot_valid & (done_p > 0) & (tri_p >= 0)
    tkey = jnp.where(hit, t_p, jnp.float32(jnp.inf))
    # dense winner select (NO fancy-index gathers: advanced indexing on
    # (N, kc) lowers to slow element gathers on this chip): min t, break
    # ties by lowest tri id, then masked reductions pull u/v/tri
    best_t = jnp.min(tkey, axis=1)
    won = tkey == best_t[:, None]
    imax = jnp.int32(2**31 - 1)
    best_tri = jnp.min(jnp.where(won, tri_p, imax), axis=1)
    final = won & (tri_p == best_tri[:, None])
    best_u = jnp.max(jnp.where(final, u_p, -jnp.inf), axis=1)
    best_v = jnp.max(jnp.where(final, v_p, -jnp.inf), axis=1)
    got_hit = jnp.isfinite(best_t)
    best_tri = jnp.where(got_hit, best_tri, -1)
    best_u = jnp.where(got_hit, best_u, 0.0)
    best_v = jnp.where(got_hit, best_v, 0.0)
    t_round = jnp.where(got_hit, best_t, tl_abs)
    best_attr = tuple(
        jnp.where(got_hit, jnp.max(jnp.where(final, a, -jnp.inf), axis=1), 0.0)
        for a in attr_p
    )

    unproc = slot_valid & (done_p == 0)
    any_unproc = jnp.any(unproc, axis=1)
    if ftb:
        # early termination: done when the nearest unvisited candidate's
        # entry distance (conservative floor) cannot beat the best hit.
        # ``any_unproc`` is unreachable by construction (runs are
        # filler-padded to whole chunks); if it ever fired the lane retries
        # with an unadvanced cursor and max_iters caps + overflow-flags it.
        new_cursor = jnp.where(any_unproc, cursor, new_key)
        unresolved = any_unproc | (next_t < t_round)
    else:
        min_unproc = jnp.min(jnp.where(unproc, cand, cs + 1), axis=1)
        max_extracted = jnp.max(jnp.where(slot_valid, cand, -1), axis=1)
        new_cursor = jnp.where(
            any_unproc, min_unproc - 1, jnp.maximum(max_extracted, cursor)
        )
        unresolved = any_unproc | (remaining > 0)
    if any_hit:
        unresolved = unresolved & (best_tri < 0)
    unresolved = unresolved & ~(ah_ray & (best_tri >= 0))
    return t_round, best_tri, best_u, best_v, best_attr, new_cursor, unresolved


# --------------------------------------------------------------------------
# Driver: liveness-compacted sub-wave windows, each run to completion
# --------------------------------------------------------------------------

SUBWAVE = 65536  # rays per traced window (cost scales with LIVE rays)


def _window_trace(cs_set: ClusterSet, ox, oy, oz, dx, dy, dz, tm, kc: int, any_hit: bool, max_iters: int, ftb: bool = False):
    """Round + compacted-continuation loop on one already-padded window.
    ``tm`` may carry per-ray any-hit encoding (negative = occlusion query
    with limit |tm|)."""
    n = ox.shape[0]
    cursor0 = jnp.full(n, -1, jnp.int32)
    bps = max(1, min(32, (n * kc) // CHUNK))
    t1, tri1, u1, v1, attr1, cur1, unres1 = _round(
        cs_set, ox, oy, oz, dx, dy, dz, tm, cursor0, kc, bps, any_hit, ftb
    )

    nsub = min(NSUB, n)
    bps_sub = max(1, min(32, (nsub * kc) // CHUNK))

    def cond(st):
        return (st[0] < max_iters) & jnp.any(st[-1])

    def body(st):
        i, t, tri, u, v, attr, cur, unres = st
        # compact up to nsub unresolved rays (ascending index, stable)
        sel = jax.lax.sort(
            [(~unres).astype(jnp.int32), jnp.arange(n, dtype=jnp.int32)], num_keys=1
        )[1][:nsub]
        live = unres[sel]
        g = lambda a: a[sel]
        ah_sel = g(tm) < 0.0
        cap = jnp.where(live, jnp.where(ah_sel, -g(t), g(t)), 0.0)
        t_r, tri_r, u_r, v_r, attr_r, cur_r, unres_r = _round(
            cs_set, g(ox), g(oy), g(oz), g(dx), g(dy), g(dz),
            cap, g(cur), kc, bps_sub, any_hit, ftb,
        )
        improved = live & (t_r < t[sel])
        wi = jnp.where(live, sel, n)  # drop writes for dead lanes
        t = t.at[wi].set(jnp.where(improved, t_r, t[sel]), mode="drop")
        tri = tri.at[wi].set(jnp.where(improved, tri_r, tri[sel]), mode="drop")
        u = u.at[wi].set(jnp.where(improved, u_r, u[sel]), mode="drop")
        v = v.at[wi].set(jnp.where(improved, v_r, v[sel]), mode="drop")
        attr = tuple(
            a.at[wi].set(jnp.where(improved, ar, a[sel]), mode="drop")
            for a, ar in zip(attr, attr_r)
        )
        cur = cur.at[wi].set(cur_r, mode="drop")
        unres = unres.at[wi].set(live & unres_r, mode="drop")
        return (i + 1, t, tri, u, v, attr, cur, unres)

    _, t, tri, u, v, attr, _, unres = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t1, tri1, u1, v1, attr1, cur1, unres1)
    )
    return t, tri, u, v, attr, unres


@functools.partial(jax.jit, static_argnames=("kc", "any_hit", "max_iters", "ftb"))
def _wave2_trace(cs_set: ClusterSet, ox, oy, oz, dx, dy, dz, tm, kc: int, any_hit: bool, max_iters: int, ftb: bool = False):
    """Full-wavefront trace: rays with work (t_max > 0) are compacted to the
    front with ONE stable sort, then traced in fixed-size SUBWAVE windows by
    a `lax.while_loop` over ceil(live / SUBWAVE) iterations.  Terminated or
    masked-out lanes (t_max == 0, the integrator's dead paths) therefore
    cost one sort ride and nothing else — the wavefront's cost follows the
    LIVE ray count down the bounce ladder, like the reference only tracing
    the rays that exist (`Viewport.cpp:305-356` per-pixel loop), instead of
    paying full sort-join cost for an all-lanes wavefront every bounce."""
    n0 = ox.shape[0]
    s = min(SUBWAVE, -(-n0 // CHUNK) * CHUNK)
    n = -(-n0 // s) * s

    def padded(x, fill):
        return jnp.concatenate([x, jnp.full((n - n0,), fill, x.dtype)]) if n != n0 else x

    ox, oy, oz = padded(ox, 0.0), padded(oy, 0.0), padded(oz, 0.0)
    dx, dy, dz = padded(dx, 1.0), padded(dy, 0.0), padded(dz, 0.0)
    tm = padded(tm, 0.0)

    wanted = tm != 0.0
    ridx, cox, coy, coz, cdx, cdy, cdz, ctm = jax.lax.optimization_barrier(
        jax.lax.sort(
            [(~wanted).astype(jnp.int32), jnp.arange(n, dtype=jnp.int32),
             ox, oy, oz, dx, dy, dz, tm],
            num_keys=1,
        )
    )[1:]
    n_sub = -(-jnp.sum(wanted.astype(jnp.int32)) // s)

    t0 = ctm
    tri0 = jnp.full(n, -1, jnp.int32)
    z = jnp.zeros(n, jnp.float32)
    ovf0 = jnp.zeros(n, bool)
    attr0 = ()  # attrs reconstructed from tri_attr post-trace; nothing rides

    def cond(st):
        return st[0] < n_sub

    def body(st):
        i, t, tri, u, v, attr, ovf = st
        off = i * s
        sl = lambda a: jax.lax.dynamic_slice(a, (off,), (s,))
        tw, triw, uw, vw, attrw, ovfw = _window_trace(
            cs_set, sl(cox), sl(coy), sl(coz), sl(cdx), sl(cdy), sl(cdz),
            sl(ctm), kc, any_hit, max_iters, ftb,
        )
        upd = lambda a, w: jax.lax.dynamic_update_slice(a, w, (off,))
        return (
            i + 1, upd(t, tw), upd(tri, triw), upd(u, uw), upd(v, vw),
            tuple(upd(a, aw) for a, aw in zip(attr, attrw)), upd(ovf, ovfw),
        )

    _, t, tri, u, v, attr, ovf = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, tri0, z, z, attr0, ovf0)
    )

    # back to caller order (results ride the unsort)
    sorted_back = jax.lax.optimization_barrier(
        jax.lax.sort(
            [ridx, t, tri, u, v, ovf.astype(jnp.int32)] + list(attr), num_keys=1
        )
    )
    _, t, tri, u, v, ovf = sorted_back[:6]
    attr = tuple(a[:n0] for a in sorted_back[6:])
    return t[:n0], tri[:n0], u[:n0], v[:n0], attr, (ovf > 0)[:n0]


import os


def _ftb_default() -> bool:
    """Front-to-back candidate ordering + early termination — EXPERIMENTAL,
    default OFF.  Measured r5 (512^2 mesh200k pass, in-jit): ftb kc4 1658 ms
    vs id-order kc16 719 ms — nearest-first extraction saves traced pairs
    but multiplies ROUND COUNT, and each continuation round pays
    window-sized sorts + the filler budget, which dominates on this
    hardware (docs/perf_notes.md r5).  One big id-ordered round beats many
    small distance-ordered ones.  RT_WAVE2_FTB=1 enables it (exact; greens
    the oracle suite)."""
    return os.environ.get("RT_WAVE2_FTB", "0") == "1"


def _kc_default(ftb: bool) -> int:
    """Candidates per extraction round: front-to-back needs only the few
    NEAREST supers per round (most rays resolve in one), so its default is
    4 vs 16 for id-ordered extraction — 4x fewer pair slots riding the
    sorts."""
    env = os.environ.get("RT_WAVE2_KC")
    if env:
        return int(env)
    return 4 if ftb else 16


def wave2_closest_hit(cs: ClusterSet, origin: Vec3, direction: Vec3, t_max, kc: int = None, max_iters: int = 64, with_attrs: bool = False):
    """Closest hit. Returns (t, tri_id, u, v, overflow) — exact; overflow
    only marks rays still unresolved after ``max_iters`` continuation
    sub-rounds (practically unreachable).

    ``with_attrs=True`` additionally returns the winner's interpolated
    shading frame as a 6-tuple (nx, ny, nz, tex_u, tex_v, material_id_f32):
    ONE (N, 16) row-gather from ``ClusterSet.tri_attr`` + barycentric lerp
    (~1.5 ms per 262k-ray wavefront).  The kernel can also emit these from
    VMEM (``emit_attrs``) but riding 6 extra channels through the sort-join
    measured ~430 ms/pass at 512^2, so the table gather wins decisively."""
    cs, origin, direction, t_max = jax.lax.stop_gradient((cs, origin, direction, t_max))
    tm = jnp.asarray(t_max) * jnp.ones(origin.x.shape, jnp.float32)
    ftb = _ftb_default()
    kc = min(kc or _kc_default(ftb), cs.num_supers)
    t, tri, u, v, _, overflow = _wave2_trace(
        cs, origin.x, origin.y, origin.z, direction.x, direction.y, direction.z,
        tm, kc, False, max_iters, ftb,
    )
    missed = tri < 0
    t = jnp.where(missed, BIG, t)
    if with_attrs:
        return t, tri, u, v, overflow, interp_tri_attr(cs, tri, u, v)
    return t, tri, u, v, overflow


def interp_tri_attr(cs: ClusterSet, tri, u, v):
    """Winner shading frame from the (T, 16) input-order attribute table:
    one row-gather + barycentric interpolation (`MeshShape.cpp:283-328`
    semantics).  Returns (nx, ny, nz, tex_u, tex_v, material_id_f32);
    miss lanes (tri < 0) return zeros."""
    if cs.tri_attr is None:
        return None
    a = cs.tri_attr[jnp.clip(tri, 0, cs.tri_attr.shape[0] - 1)]  # (N, 16)
    w = 1.0 - u - v
    nx = a[:, 0] * w + a[:, 3] * u + a[:, 6] * v
    ny = a[:, 1] * w + a[:, 4] * u + a[:, 7] * v
    nz = a[:, 2] * w + a[:, 5] * u + a[:, 8] * v
    tu = a[:, 9] * w + a[:, 11] * u + a[:, 13] * v
    tv = a[:, 10] * w + a[:, 12] * u + a[:, 14] * v
    hit = (tri >= 0).astype(jnp.float32)
    return (nx * hit, ny * hit, nz * hit, tu * hit, tv * hit, a[:, 15] * hit)


def wave2_any_hit(cs: ClusterSet, origin: Vec3, direction: Vec3, t_max, kc: int = None, max_iters: int = 64):
    """Any-hit occlusion query. Returns (occluded, overflow)."""
    cs, origin, direction, t_max = jax.lax.stop_gradient((cs, origin, direction, t_max))
    tm = jnp.asarray(t_max) * jnp.ones(origin.x.shape, jnp.float32)
    ftb = _ftb_default()
    kc = min(kc or _kc_default(ftb), cs.num_supers)
    t, tri, _, _, _, overflow = _wave2_trace(
        cs, origin.x, origin.y, origin.z, direction.x, direction.y, direction.z,
        tm, kc, True, max_iters, ftb,
    )
    return tri >= 0, overflow
