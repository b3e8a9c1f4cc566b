"""Ceiling analysis for pair-count reduction (numpy, host-side).

For camera-like coherent and bounce-like incoherent wavefronts on the 200k
bench mesh, measure per-ray:
  - supers overlapped (what kc-extraction pays today, pre-pruning)
  - supers with t_enter < t_closest_hit (the ideal front-to-back bill)
  - for any-hit: supers until the first containing an occluding tri (id order)
"""
import sys
import numpy as np

sys.path.insert(0, "."); sys.path.insert(0, "tools")
from raytracer_tpu.scene.clusters import build_clusters
from traversal_bench import make_mesh, incoherent_rays, coherent_rays

rng = np.random.default_rng(7)
v0, e1, e2 = make_mesh(200_000, rng)
cs = build_clusters(v0, e1, e2)
sb = np.asarray(cs.super_box)
Cs = sb.shape[0]
print(f"supers: {Cs}  tris/super: {np.asarray(cs.super_geom).shape[1]}")

N = 4096  # host-side brute force is O(N*tris); keep modest

v0 = v0[:, 0], v0[:, 1], v0[:, 2]
e1 = e1[:, 0], e1[:, 1], e1[:, 2]
e2 = e2[:, 0], e2[:, 1], e2[:, 2]


def closest_t(o, d):
    """Brute-force closest hit t per ray (numpy, batched over tris)."""
    t_best = np.full(len(o), 3.0e38)
    B = 20000
    for s in range(0, len(v0[0]), B):
        sl = slice(s, s + B)
        V0 = np.stack([c[sl] for c in v0], 1)[None]
        E1 = np.stack([c[sl] for c in e1], 1)[None]
        E2 = np.stack([c[sl] for c in e2], 1)[None]
        D = d[:, None, :]
        O = o[:, None, :]
        P = np.cross(D, E2)
        det = np.einsum("nkc,nkc->nk", E1, P)
        ok = np.abs(det) > 1e-7
        inv = 1.0 / np.where(ok, det, 1.0)
        T = O - V0
        u = np.einsum("nkc,nkc->nk", T, P) * inv
        Q = np.cross(T, E1)
        v = np.einsum("nkc,nkc->nk", D, Q) * inv
        t = np.einsum("nkc,nkc->nk", E2, Q) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4)
        t = np.where(hit, t, 3.0e38)
        t_best = np.minimum(t_best, t.min(1))
    return t_best


def overlap_stats(o, d, label):
    tiny = 1e-12
    dd = np.where(np.abs(d) > tiny, d, np.where(d >= 0, tiny, -tiny))
    inv = 1.0 / dd
    t1 = (sb[None, :, 0:3] - o[:, None, :]) * inv[:, None, :]
    t2 = (sb[None, :, 3:6] - o[:, None, :]) * inv[:, None, :]
    tmin = np.minimum(t1, t2).max(2)
    tmax = np.maximum(t1, t2).min(2)
    ent = np.maximum(tmin, 0.0)
    hit = (tmax >= ent)
    tc = closest_t(o, d)
    n_overlap = (hit & (ent < 3.0e38)).sum(1)
    n_pruned = (hit & (ent < tc[:, None])).sum(1)
    q = lambda a: np.percentile(a, [50, 90, 99]).round(1).tolist()
    print(f"[{label}] overlapped supers/ray: mean {n_overlap.mean():.2f} p50/90/99 {q(n_overlap)}")
    print(f"[{label}] ent<t_hit supers/ray:  mean {n_pruned.mean():.2f} p50/90/99 {q(n_pruned)}")


from raytracer_tpu.math.vec import Vec3
for label, mk in (("coherent", coherent_rays), ("incoherent", incoherent_rays)):
    o, d = mk(N, rng)
    o = np.stack([np.asarray(o.x), np.asarray(o.y), np.asarray(o.z)], 1)
    d = np.stack([np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)], 1)
    overlap_stats(o, d, label)
