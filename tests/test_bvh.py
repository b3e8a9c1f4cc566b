"""BVH build + traversal tests — brute-force O(N·T) intersection as ground
truth (the reference validates HashGrid/KdTree the same way, SURVEY §4.3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer_tpu.math.vec import Vec3
from raytracer_tpu.ops.bvh_traverse import bvh_any_hit, bvh_closest_hit
from raytracer_tpu.ops.intersect import BIG
from raytracer_tpu.scene.bvh import LEAF_SIZE, build_bvh_over_triangles, bvh_stats


def _random_tris(t, seed=0, spread=10.0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-spread, spread, (t, 1, 3))
    offsets = rng.normal(0, 0.5, (t, 3, 3))
    v = (centers + offsets).astype(np.float32)
    n = np.tile(np.array([[0, 0, 1.0]], np.float32), (t, 3)).reshape(t, 3, 3)
    uv = np.zeros((t, 3, 2), np.float32)
    mat = np.zeros((t,), np.int32)
    return v, n, uv, mat


def _random_rays(n, seed=1, spread=12.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def _brute_force_closest(tri_v, o, d, eps=1e-4):
    """Reference result: all-pairs Möller-Trumbore in float64."""
    v0 = tri_v[:, 0].astype(np.float64)
    e1 = (tri_v[:, 1] - tri_v[:, 0]).astype(np.float64)
    e2 = (tri_v[:, 2] - tri_v[:, 0]).astype(np.float64)
    best_t = np.full(o.shape[0], np.inf)
    best_i = np.full(o.shape[0], -1, np.int64)
    for i in range(v0.shape[0]):
        pvec = np.cross(d, e2[i])
        det = (e1[i] * pvec).sum(1)
        ok = np.abs(det) > 1e-9
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tvec = o - v0[i]
        u = (tvec * pvec).sum(1) * inv
        qvec = np.cross(tvec, e1[i])
        v = (d * qvec).sum(1) * inv
        t = (e2[i] * qvec).sum(1) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > eps)
        closer = hit & (t < best_t)
        best_t = np.where(closer, t, best_t)
        best_i = np.where(closer, i, best_i)
    return best_t, best_i


class TestBuild:
    def test_structure(self):
        v, n, uv, mat = _random_tris(200)
        tris, bvh = build_bvh_over_triangles(v, n, uv, mat)
        st = bvh_stats(bvh)
        assert st["real_tris"] == 200
        assert st["padded_tris"] == st["num_leaves"] * LEAF_SIZE
        # every real triangle appears exactly once in the padded slots
        ids = np.asarray(bvh.tri_id)
        real = ids[ids >= 0]
        assert sorted(real.tolist()) == list(range(200))

    def test_links_cover_tree(self):
        """Every octant's hit/miss DFS from the root must terminate and visit
        every node exactly once when all boxes 'hit'."""
        v, n, uv, mat = _random_tris(100, seed=3)
        tris, bvh = build_bvh_over_triangles(v, n, uv, mat)
        m = bvh.num_nodes
        for octant in range(8):
            hit = np.asarray(bvh.hit_link[octant])
            visited = []
            node = 0
            while node >= 0 and len(visited) <= m:
                visited.append(node)
                node = hit[node]
            assert len(visited) == m, f"octant {octant}: {len(visited)} != {m}"
            assert sorted(visited) == list(range(m))


class TestTraversal:
    @pytest.mark.parametrize("t_count,seed", [(64, 0), (500, 7)])
    def test_closest_hit_matches_brute_force(self, t_count, seed):
        v, n, uv, mat = _random_tris(t_count, seed=seed)
        tris, bvh = build_bvh_over_triangles(v, n, uv, mat)
        o, d = _random_rays(256, seed=seed + 1)

        ov = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
        dv = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))
        t, tid, u, vbar = bvh_closest_hit(bvh, tris, ov, dv, jnp.full((256,), BIG))

        # brute force runs on the REORDERED triangle array for id comparison
        tv = np.stack(
            [
                np.stack([np.asarray(tris.v0.x), np.asarray(tris.v0.y), np.asarray(tris.v0.z)], -1),
                np.stack(
                    [
                        np.asarray(tris.v0.x + tris.e1.x),
                        np.asarray(tris.v0.y + tris.e1.y),
                        np.asarray(tris.v0.z + tris.e1.z),
                    ],
                    -1,
                ),
                np.stack(
                    [
                        np.asarray(tris.v0.x + tris.e2.x),
                        np.asarray(tris.v0.y + tris.e2.y),
                        np.asarray(tris.v0.z + tris.e2.z),
                    ],
                    -1,
                ),
            ],
            axis=1,
        )
        bt, bi = _brute_force_closest(tv, o.astype(np.float64), d.astype(np.float64))

        tn = np.asarray(t)
        miss = tn >= float(BIG) * 0.5
        np.testing.assert_array_equal(miss, np.isinf(bt))
        # distances agree (few ULP tolerance; ties between coplanar tris possible)
        np.testing.assert_allclose(tn[~miss], bt[~miss], rtol=1e-4, atol=1e-4)
        agree = (np.asarray(tid)[~miss] == bi[~miss]).mean()
        assert agree > 0.99  # ties may pick either triangle

    def test_any_hit_matches_closest(self):
        v, n, uv, mat = _random_tris(300, seed=11)
        tris, bvh = build_bvh_over_triangles(v, n, uv, mat)
        o, d = _random_rays(256, seed=12)
        ov = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
        dv = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))
        limit = jnp.full((256,), 8.0)
        t, tid, _, _ = bvh_closest_hit(bvh, tris, ov, dv, jnp.full((256,), BIG))
        occ = bvh_any_hit(bvh, tris, ov, dv, limit)
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(t) < 8.0)

    def test_tmax_respected(self):
        v, n, uv, mat = _random_tris(100, seed=21)
        tris, bvh = build_bvh_over_triangles(v, n, uv, mat)
        o, d = _random_rays(128, seed=22)
        ov = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
        dv = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))
        t_any, _, _, _ = bvh_closest_hit(bvh, tris, ov, dv, jnp.full((128,), BIG))
        t_cap, tid_cap, _, _ = bvh_closest_hit(bvh, tris, ov, dv, jnp.full((128,), 5.0))
        tn = np.asarray(t_cap)
        hit = np.asarray(tid_cap) >= 0
        assert (tn[hit] < 5.0).all()
        # hits beyond the cap are reported as misses
        beyond = (np.asarray(t_any) >= 5.0) & (np.asarray(t_any) < float(BIG) * 0.5)
        assert not (hit & beyond).any()
