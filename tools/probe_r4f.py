"""Measure per-1024-ray-block super-union sizes after octant+Morton ray sort.

Decides between the pair-sort-join (cost ~ N*kc sort ops) and a block-work
engine (cost ~ sum of block unions * kernel chunk cost).
"""
import sys
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "."); sys.path.insert(0, "tools")
from raytracer_tpu.scene.clusters import build_clusters
from traversal_bench import make_mesh, incoherent_rays, coherent_rays

rng = np.random.default_rng(7)
v0, e1, e2 = make_mesh(200_000, rng)
cs = build_clusters(v0, e1, e2)
N = 262144
BLK = 1024

sb = np.asarray(cs.super_box)

def overlaps(o, d):
    tiny = 1e-12
    dd = np.where(np.abs(d) > tiny, d, np.where(d >= 0, tiny, -tiny))
    inv = 1.0 / dd
    t1 = (sb[None, :, 0:3] - o[:, None, :]) * inv[:, None, :]
    t2 = (sb[None, :, 3:6] - o[:, None, :]) * inv[:, None, :]
    tmin = np.minimum(t1, t2).max(2)
    tmax = np.maximum(t1, t2).min(2)
    return tmax >= np.maximum(tmin, 0.0)

def morton_sort_keys(o, d, lo, hi):
    # octant (3 bits) then 21-bit Morton of origin
    oct_ = (d[:, 0] < 0).astype(np.int64) | ((d[:, 1] < 0).astype(np.int64) << 1) | ((d[:, 2] < 0).astype(np.int64) << 2)
    q = np.clip((o - lo) / np.maximum(hi - lo, 1e-9) * 127.0, 0, 127).astype(np.int64)
    def spread(v):
        v = (v | (v << 14)) & 0x0000FC0000003F
        v = (v | (v << 7)) & 0x03F0000F8003F0 >> 0
        return v
    # simple 7-bit interleave
    m = np.zeros(len(o), np.int64)
    for b in range(7):
        m |= ((q[:, 0] >> b) & 1) << (3 * b)
        m |= ((q[:, 1] >> b) & 1) << (3 * b + 1)
        m |= ((q[:, 2] >> b) & 1) << (3 * b + 2)
    return (oct_ << 40) | (m << 8)

lo = sb[:, 0:3].min(0); hi = sb[:, 3:6].max(0)

for label, mk in (("coherent", coherent_rays), ("incoherent", incoherent_rays)):
    o, d = mk(N, rng)
    o = np.stack([np.asarray(o.x), np.asarray(o.y), np.asarray(o.z)], -1)
    d = np.stack([np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)], -1)
    hit = overlaps(o, d)  # (N, Cs) bool
    per_ray = hit.sum(1)

    for sort_mode in ("unsorted", "morton"):
        if sort_mode == "morton":
            order = np.argsort(morton_sort_keys(o, d, lo, hi), kind="stable")
            h = hit[order]
        else:
            h = hit
        blocks = h.reshape(N // BLK, BLK, -1)
        union = blocks.any(1).sum(1)  # (n_blocks,) union sizes
        total_items = int(union.sum())
        # effective (row, super) granularity: 128-ray rows
        rows = h.reshape(N // 128, 128, -1).any(1)
        row_items = int(rows.sum())
        print(f"[{label}/{sort_mode}] block-union: mean={union.mean():.1f} p90={np.percentile(union,90):.0f} "
              f"max={union.max()} total_items={total_items} row_items={row_items} "
              f"ray_pairs={int(per_ray.sum())}")
