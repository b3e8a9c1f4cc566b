"""Correctness + perf check of the Pallas cluster-traversal kernel vs the
jnp reference path, on random meshes and random rays.  Runs on the real TPU.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from raytracer_tpu.math.vec import Vec3
from raytracer_tpu.ops.cluster_traverse import cluster_any_hit, cluster_closest_hit
from raytracer_tpu.ops.pallas_traverse import (
    pallas_cluster_any_hit,
    pallas_cluster_closest_hit,
)
from raytracer_tpu.scene.clusters import build_clusters


def random_mesh(t, rng, spread=2.0, size=0.3):
    c = rng.uniform(-spread, spread, (t, 3)).astype(np.float32)
    a = c + rng.uniform(-size, size, (t, 3)).astype(np.float32)
    b = c + rng.uniform(-size, size, (t, 3)).astype(np.float32)
    v0 = c
    e1 = a - c
    e2 = b - c
    return v0, e1, e2


def random_rays(n, rng, spread=4.0):
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (
        Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2])),
        Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])),
    )


def main():
    rng = np.random.default_rng(7)
    print("devices:", jax.devices())

    for t, n in ((500, 4096), (20000, 65536)):
        v0, e1, e2 = random_mesh(t, rng)
        cs = build_clusters(v0, e1, e2)
        origin, direction = random_rays(n, rng)
        t_max = jnp.full(n, 3.0e38)

        rt, rtri, ru, rv, rovf = jax.block_until_ready(
            cluster_closest_hit(cs, origin, direction, t_max)
        )
        pt, ptri, pu, pv, povf = jax.block_until_ready(
            pallas_cluster_closest_hit(cs, origin, direction, t_max)
        )
        both_valid = ~np.asarray(rovf) & ~np.asarray(povf)
        agree = np.asarray(rtri) == np.asarray(ptri)
        frac = float((agree | ~both_valid).mean())
        print(f"T={t} N={n}: tri agree {frac:.6f}  "
              f"ref hits {(np.asarray(rtri) >= 0).mean():.3f} "
              f"pal hits {(np.asarray(ptri) >= 0).mean():.3f} "
              f"ovf ref {np.asarray(rovf).mean():.4f} pal {np.asarray(povf).mean():.4f}")
        m = both_valid & agree & (np.asarray(rtri) >= 0)
        if m.any():
            np.testing.assert_allclose(np.asarray(pt)[m], np.asarray(rt)[m], rtol=2e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(pu)[m], np.asarray(ru)[m], rtol=1e-2, atol=2e-3)
        assert frac > 0.999, f"tri disagreement {1-frac:.2%}"

        ra = jax.block_until_ready(cluster_any_hit(cs, origin, direction, jnp.full(n, 5.0))[0])
        pa = jax.block_until_ready(pallas_cluster_any_hit(cs, origin, direction, jnp.full(n, 5.0)))
        aa = float((np.asarray(ra) == np.asarray(pa)).mean())
        print(f"  any-hit agree {aa:.6f}")
        assert aa > 0.999

    # perf: bigger mesh + many rays
    t, n = 200_000, 1 << 20
    v0, e1, e2 = random_mesh(t, rng, spread=3.0, size=0.12)
    cs = build_clusters(v0, e1, e2)
    origin, direction = random_rays(n, rng)
    t_max = jnp.full(n, 3.0e38)
    print(f"perf mesh: {t} tris, {cs.num_clusters} clusters, {n} rays")

    for name, fn in (
        ("jnp ", lambda: cluster_closest_hit(cs, origin, direction, t_max)),
        ("plas", lambda: pallas_cluster_closest_hit(cs, origin, direction, t_max)),
    ):
        try:
            out = jax.block_until_ready(fn())  # compile+warm
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                out = jax.block_until_ready(fn())
            dt = (time.perf_counter() - t0) / reps
            print(f"  {name}: {dt*1e3:8.2f} ms  {n/dt/1e6:9.1f} Mray/s  "
                  f"hits {(np.asarray(out[1]) >= 0).mean():.3f}")
        except Exception as e:
            print(f"  {name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
