"""Traversal-path shootout on real hardware: jnp cluster vs Pallas cluster
vs skip-link BVH, on coherent (camera-like) and incoherent (bounce-like)
ray wavefronts at production mesh scale.

This is the measurement VERDICT r1 asked for ("the crossover is unknown —
nothing measures either on a big mesh"): the production default in
ops/traverse.py is chosen from these numbers.

Usage: python tools/traversal_bench.py [n_tris] [n_rays]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from raytracer_tpu.math.vec import Vec3
from raytracer_tpu.scene.clusters import build_clusters


def make_mesh(t, rng, spread=4.0, size=0.12):
    """Surface-like mesh: a wavy heightfield grid with ~t triangles (real
    scenes are surfaces; a volumetric soup is the worst case for any accel
    structure and not representative of Sponza-class geometry)."""
    g = max(2, int(np.sqrt(t / 2)) + 1)
    xs = np.linspace(-spread, spread, g, dtype=np.float32)
    zs = np.linspace(-spread, spread, g, dtype=np.float32)
    X, Z = np.meshgrid(xs, zs)
    Y = (
        0.8 * np.sin(X * 1.7) * np.cos(Z * 1.3)
        + 0.3 * np.sin(X * 5.1 + Z * 3.7)
        + rng.normal(0, 0.02, X.shape)
    ).astype(np.float32)
    verts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    idx = np.arange(g * g).reshape(g, g)
    a = idx[:-1, :-1].ravel()
    b = idx[:-1, 1:].ravel()
    c = idx[1:, :-1].ravel()
    d = idx[1:, 1:].ravel()
    faces = np.concatenate(
        [np.stack([a, b, d], axis=1), np.stack([a, d, c], axis=1)], axis=0
    )
    tri = verts[faces]  # (F, 3, 3)
    v0 = tri[:, 0]
    return v0, tri[:, 1] - v0, tri[:, 2] - v0


def coherent_rays(n, rng, spread=4.0):
    """Camera-like: common origin, directions in a frustum toward the mesh."""
    w = int(np.sqrt(n))
    xs = (np.arange(n) % w) / w - 0.5
    ys = (np.arange(n) // w) / w - 0.5
    o = np.tile(np.array([[0.0, 0.0, -3 * spread]], np.float32), (n, 1))
    d = np.stack([xs * 0.8, ys * 0.8, np.ones(n)], axis=1).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return _vec(o), _vec(d)


def incoherent_rays(n, rng, spread=4.0):
    """Bounce-like: random origins inside the mesh volume, random dirs."""
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return _vec(o), _vec(d)


def _vec(a):
    return Vec3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]), jnp.asarray(a[:, 2]))


def _force(out):
    """Force completion with host transfers: under the axon transport,
    block_until_ready returns before the device work finishes."""
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf[:1])
    return out


def timeit(fn, *args, reps=5):
    out = _force(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = _force(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    return out, dt


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    rng = np.random.default_rng(7)
    print(f"device: {jax.devices()[0]}  tris~{n_tris}  rays={n_rays}")

    v0, e1, e2 = make_mesh(n_tris, rng)
    n_tris = v0.shape[0]
    cs = build_clusters(v0, e1, e2)
    print(f"clusters: {cs.num_clusters} x {cs.tris_per_cluster}")

    from raytracer_tpu.scene.bvh import build_bvh_over_triangles

    t_build0 = time.perf_counter()
    tri_v = np.stack([v0, v0 + e1, v0 + e2], axis=1)
    tris, bvh = build_bvh_over_triangles(
        tri_v.astype(np.float32),
        np.zeros_like(tri_v, np.float32),
        np.zeros((n_tris, 3, 2), np.float32),
        np.zeros(n_tris, np.int32),
    )
    print(f"bvh build: {time.perf_counter() - t_build0:.2f}s  nodes={bvh.num_nodes}")

    from raytracer_tpu.ops.bvh_traverse import bvh_any_hit, bvh_closest_hit
    from raytracer_tpu.ops.cluster_traverse import cluster_any_hit, cluster_closest_hit
    from raytracer_tpu.ops.pallas_traverse import (
        pallas_available,
        pallas_cluster_any_hit,
        pallas_cluster_closest_hit,
    )

    jc = jax.jit(lambda o, d, t: cluster_closest_hit(cs, o, d, t))
    jb = jax.jit(lambda o, d, t: bvh_closest_hit(bvh, tris, o, d, t))
    jca = jax.jit(lambda o, d, t: cluster_any_hit(cs, o, d, t))
    jba = jax.jit(lambda o, d, t: bvh_any_hit(bvh, tris, o, d, t))

    def want(name):
        return only is None or name in only

    for label, mk in (("coherent", coherent_rays), ("incoherent", incoherent_rays)):
        origin, direction = mk(n_rays, rng)
        t_max = jnp.full(n_rays, 3.0e38)
        ctri = None

        if want("cluster"):
            (ct, ctri, cu, cv, covf), dt_c = timeit(jc, origin, direction, t_max)
            hitr_c = float(jnp.mean(ctri >= 0))
            print(
                f"[{label}] jnp-cluster closest: {dt_c * 1e3:8.2f} ms  "
                f"{n_rays / dt_c / 1e6:7.1f} Mray/s  hits={hitr_c:.3f} ovf={float(jnp.mean(covf)):.4f}"
            )

        if want("bvh"):
            try:
                (bt, btri, bu, bv), dt_b = timeit(jb, origin, direction, t_max)
                agree_b = float(jnp.mean(btri == ctri)) if ctri is not None else -1
                print(
                    f"[{label}] skiplink-bvh closest: {dt_b * 1e3:8.2f} ms  "
                    f"{n_rays / dt_b / 1e6:7.1f} Mray/s  agree-vs-cluster={agree_b:.4f}"
                )
            except Exception as e:  # TPU kernel faults surface as runtime errors
                print(f"[{label}] skiplink-bvh closest FAILED: {type(e).__name__}: {str(e)[:120]}")

        if want("pallas") and pallas_available():
            try:
                pc = jax.jit(lambda o, d, t: pallas_cluster_closest_hit(cs, o, d, t))
                (pt, ptri, pu, pv, povf), dt_p = timeit(pc, origin, direction, t_max)
                agree_p = float(jnp.mean(ptri == ctri)) if ctri is not None else -1
                print(
                    f"[{label}] pallas-cluster closest: {dt_p * 1e3:6.2f} ms  "
                    f"{n_rays / dt_p / 1e6:7.1f} Mray/s  agree-vs-cluster={agree_p:.4f} "
                    f"ovf={float(jnp.mean(povf)):.4f}"
                )
            except Exception as e:
                print(f"[{label}] pallas-cluster closest FAILED: {type(e).__name__}: {str(e)[:120]}")

        if want("wave"):
            from raytracer_tpu.ops.wave_traverse import wave_any_hit, wave_closest_hit

            try:
                wc = jax.jit(lambda o, d, t: wave_closest_hit(cs, o, d, t))
                (wt, wtri, wu, wv, wovf), dt_w = timeit(wc, origin, direction, t_max)
                agree_w = float(jnp.mean(wtri == ctri)) if ctri is not None else -1
                print(
                    f"[{label}] wave closest: {dt_w * 1e3:14.2f} ms  "
                    f"{n_rays / dt_w / 1e6:7.1f} Mray/s  agree-vs-cluster={agree_w:.4f} "
                    f"ovf={float(jnp.mean(wovf)):.4f}"
                )
                wa = jax.jit(lambda o, d, t: wave_any_hit(cs, o, d, t))
                (wocc, wsho), dt_wa = timeit(wa, origin, direction, jnp.full(n_rays, 4.0))
                print(
                    f"[{label}] wave any-hit: {dt_wa * 1e3:14.2f} ms  "
                    f"{n_rays / dt_wa / 1e6:7.1f} Mray/s  occl={float(jnp.mean(wocc)):.3f} "
                    f"ovf={float(jnp.mean(wsho)):.4f}"
                )
            except Exception as e:
                print(f"[{label}] wave FAILED: {type(e).__name__}: {str(e)[:160]}")

        if want("wave2"):
            from raytracer_tpu.ops.wave2_traverse import wave2_any_hit, wave2_closest_hit

            try:
                w2c = jax.jit(lambda o, d, t: wave2_closest_hit(cs, o, d, t))
                (w2t, w2tri, w2u, w2v, w2ovf), dt_w2 = timeit(w2c, origin, direction, t_max)
                agree_w2 = float(jnp.mean(w2tri == ctri)) if ctri is not None else -1
                print(
                    f"[{label}] wave2 closest: {dt_w2 * 1e3:13.2f} ms  "
                    f"{n_rays / dt_w2 / 1e6:7.1f} Mray/s  agree-vs-cluster={agree_w2:.4f} "
                    f"ovf={float(jnp.mean(w2ovf)):.4f}"
                )
                w2a = jax.jit(lambda o, d, t: wave2_any_hit(cs, o, d, t))
                (w2occ, w2sho), dt_w2a = timeit(w2a, origin, direction, jnp.full(n_rays, 4.0))
                print(
                    f"[{label}] wave2 any-hit: {dt_w2a * 1e3:13.2f} ms  "
                    f"{n_rays / dt_w2a / 1e6:7.1f} Mray/s  occl={float(jnp.mean(w2occ)):.3f} "
                    f"ovf={float(jnp.mean(w2sho)):.4f}"
                )
            except Exception as e:
                import traceback; traceback.print_exc()
                print(f"[{label}] wave2 FAILED: {type(e).__name__}: {str(e)[:160]}")

        if want("sorted") and pallas_available():
            from raytracer_tpu.ops.pallas_traverse import pallas_sorted_closest_hit

            try:
                sc = jax.jit(lambda o, d, t: pallas_sorted_closest_hit(cs, o, d, t))
                (st, stri, su, sv, sovf), dt_s = timeit(sc, origin, direction, t_max)
                agree_s = float(jnp.mean(stri == ctri)) if ctri is not None else -1
                print(
                    f"[{label}] sorted-pallas closest: {dt_s * 1e3:7.2f} ms  "
                    f"{n_rays / dt_s / 1e6:7.1f} Mray/s  agree-vs-cluster={agree_s:.4f} "
                    f"ovf={float(jnp.mean(sovf)):.4f}"
                )
            except Exception as e:
                print(f"[{label}] sorted-pallas closest FAILED: {type(e).__name__}: {str(e)[:120]}")

        # any-hit (shadow) with t_max at a mid-scene scale
        t_sh = jnp.full(n_rays, 4.0)
        occ_c = None
        if want("cluster"):
            (occ_c, _ovf_c), dt_ca = timeit(jca, origin, direction, t_sh)
            print(
                f"[{label}] jnp-cluster any-hit: {dt_ca * 1e3:9.2f} ms  "
                f"{n_rays / dt_ca / 1e6:7.1f} Mray/s  occl={float(jnp.mean(occ_c)):.3f}"
            )
        if want("bvh"):
            try:
                occ_b, dt_ba = timeit(jba, origin, direction, t_sh)
                agree = float(jnp.mean(occ_b == occ_c)) if occ_c is not None else -1
                print(
                    f"[{label}] skiplink-bvh any-hit: {dt_ba * 1e3:8.2f} ms  "
                    f"{n_rays / dt_ba / 1e6:7.1f} Mray/s  agree={agree:.4f}"
                )
            except Exception as e:
                print(f"[{label}] skiplink-bvh any-hit FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
