"""Round-5 component split for one wave2 dispatch (synthetic wavefronts).

Scan-differenced in-jit timing (probe_r4c methodology) of `_wave2_trace`
variants on 200k-tri heightfield bounce rays at production wavefront size:

  full      — production engine, kc in {16, 8, 4}
  p1        — _p1_extract alone
  nokernel  — RT_WAVE2_SKIP_KERNEL=1: sort-join runs, MT kernel body gated
              off (chunks report all-done, no hits) -> sorts+reduce bill
              (the continuation loop sees no unresolved work: one round)

kernel ~= full(1 round share) - nokernel.  Usage: python tools/probe_r5b.py
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "."); sys.path.insert(0, "tools")

from traversal_bench import make_mesh, incoherent_rays
from raytracer_tpu.scene.clusters import build_clusters

N = int(os.environ.get("PROBE_N", str(512 * 512)))


def force(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf[:1] if getattr(leaf, "ndim", 0) else leaf)
    return x


def injit_time(step, x, r1=2, r2=6, outer=2):
    def many(reps):
        @jax.jit
        def f(x):
            y, _ = jax.lax.scan(lambda c, _: (step(c), None), x, None, length=reps)
            return y
        return f

    f1, f2 = many(r1), many(r2)
    force(f1(x)); force(f2(x))
    ts = []
    for f in (f1, f2):
        t0 = time.perf_counter()
        for _ in range(outer):
            force(f(x))
        ts.append((time.perf_counter() - t0) / outer)
    return (ts[1] - ts[0]) / (r2 - r1)


def main():
    rng = np.random.default_rng(7)
    v0, e1, e2 = make_mesh(200_000, rng)
    cs = build_clusters(v0, e1, e2)
    print(f"supers={cs.num_supers} clusters={cs.num_clusters} N={N}")
    o, d = incoherent_rays(N, rng)
    tm = jnp.full((N,), 100.0)

    from raytracer_tpu.ops import wave2_traverse as w2

    def t_full(kc, ftb):
        def step(x):
            t, tri, u, v, _, ovf = w2._wave2_trace(
                cs, o.x + x, o.y, o.z, d.x, d.y, d.z, tm, kc, False, 64, ftb
            )
            return t[0] * 1e-12
        return injit_time(step, jnp.float32(0.0))

    stages = sys.argv[1:] or ["old16", "ftb4", "ftb8", "ftb2", "nk4"]
    if "old16" in stages:
        print(f"[full id kc=16] {t_full(16, False)*1e3:8.1f} ms", flush=True)
    for kc in (2, 4, 6, 8):
        if f"ftb{kc}" in stages:
            print(f"[full ftb kc={kc}] {t_full(kc, True)*1e3:8.1f} ms", flush=True)

    if "p1ftb" in stages:
        def step_p1(x):
            cand, nt, nk = w2._p1_extract_ftb(
                cs, o.x + x, o.y, o.z, d.x, d.y, d.z, tm,
                jnp.full((N,), -1, jnp.int32), 4,
            )
            return jnp.sum(nt) * 1e-12
        print(f"[p1 ftb kc=4] {injit_time(step_p1, jnp.float32(0.0))*1e3:8.1f} ms", flush=True)

    if "nk4" in stages:
        os.environ["RT_WAVE2_SKIP_KERNEL"] = "1"
        jax.clear_caches()  # the flag is read at trace time
        try:
            print(f"[nokernel ftb kc=4] {t_full(4, True)*1e3:8.1f} ms", flush=True)
        finally:
            del os.environ["RT_WAVE2_SKIP_KERNEL"]


if __name__ == "__main__":
    main()


def bigk():
    """A/B super size: k tris per cluster (8k per super) vs the k=64 default
    on the full production trace at 262k incoherent rays."""
    import traversal_bench as tb
    rng2 = np.random.default_rng(7)
    v0, e1, e2 = tb.make_mesh(200_000, rng2)
    o, d = tb.incoherent_rays(N, rng2)
    tm = jnp.full((N,), 100.0)
    from raytracer_tpu.ops import wave2_traverse as w2
    for k in (64, 128, 256):
        cs = build_clusters(v0, e1, e2, k=k)
        def step(x, cs=cs):
            t, tri, u, v, _, ovf = w2._wave2_trace(
                cs, o.x + x, o.y, o.z, d.x, d.y, d.z, tm, min(16, cs.num_supers), False, 64, False
            )
            return t[0] * 1e-12
        print(f"[bigk k={k:3d} supers={cs.num_supers:4d}] "
              f"{injit_time(step, jnp.float32(0.0))*1e3:8.1f} ms", flush=True)
