"""Round-5: in-jit cost of ONE _round at various (n, kc, ftb), and of the
bare MT pallas_call at various chunk counts — separates per-round fixed cost
(pallas dispatch? sorts? p1?) from size-dependent cost.

Usage: python tools/probe_r5c.py [stage...]
  stages: round  pallas  p1
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
from raytracer_tpu.scene.clusters import build_clusters, SUB_PER_SUPER
from raytracer_tpu.ops import wave2_traverse as w2


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


rng = np.random.default_rng(7)
v0, e1, e2 = make_mesh(200_000, rng)
cs = build_clusters(v0, e1, e2)
CS = cs.num_supers
print(f"supers={CS} clusters={cs.num_clusters}", flush=True)


def stage_round():
    for n, kc, ftb in ((262144, 16, False), (262144, 4, True), (262144, 8, True),
                       (65536, 4, True), (16384, 4, True), (16384, 2, True)):
        o, d = incoherent_rays(n, rng)
        tm = jnp.full((n,), 100.0)
        cur = jnp.full((n,), -1, jnp.int32)

        def step(x, o=o, d=d, tm=tm, cur=cur, kc=kc, ftb=ftb):
            t, tri, u, v, _, ncur, unres = w2._round(
                cs, o.x + x, o.y, o.z, d.x, d.y, d.z, tm, cur, kc, 1, False, ftb
            )
            return t[0] * 1e-12
        print(f"[round n={n:6d} kc={kc:2d} ftb={int(ftb)}] "
              f"{injit_time(step, jnp.float32(0.0))*1e3:8.1f} ms", flush=True)


def stage_pallas():
    """Bare MT pallas_call at b2 chunk counts with all-live vs all-dead tabs."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k = cs.tris_per_cluster
    for b2, live in ((64, True), (64, False), (512, True), (1024, True), (4096, True)):
        tab = (jnp.arange(b2, dtype=jnp.int32) % CS) if live else jnp.full((b2,), CS, jnp.int32)
        o, d = incoherent_rays(b2 * 1024, rng)
        ch = lambda a: a.reshape(b2, 8, 128)
        ftl = jnp.full((b2, 8, 128), 100.0)

        geom_spec = pl.BlockSpec((1, SUB_PER_SUPER * k, 16), lambda i, c: (jnp.clip(c[i], 0, CS - 1), 0, 0), memory_space=pltpu.VMEM)
        sbox_spec = pl.BlockSpec((1, SUB_PER_SUPER, 8), lambda i, c: (jnp.clip(c[i], 0, CS - 1), 0, 0), memory_space=pltpu.VMEM)
        pair_spec = pl.BlockSpec((1, 8, 128), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(b2,),
            in_specs=[geom_spec, sbox_spec] + [pair_spec] * 7,
            out_specs=[pair_spec] * 5,
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)] * 4,
        )
        f32s = jax.ShapeDtypeStruct((b2, 8, 128), jnp.float32)
        i32s = jax.ShapeDtypeStruct((b2, 8, 128), jnp.int32)

        def step(x, tab=tab, o=o, d=d, ftl=ftl, grid_spec=grid_spec):
            outs = pl.pallas_call(
                functools.partial(w2._mt_kernel, k=k, cs=CS, any_hit=False),
                grid_spec=grid_spec, out_shape=[f32s, i32s, f32s, f32s, i32s],
            )(tab, cs.super_geom, cs.super_sbox,
              ch(o.x + x), ch(o.y), ch(o.z), ch(d.x), ch(d.y), ch(d.z), ftl)
            return outs[0][0, 0, 0] * 1e-12
        print(f"[pallas b2={b2:5d} live={int(live)}] "
              f"{injit_time(step, jnp.float32(0.0))*1e3:8.1f} ms", flush=True)


def stage_p1():
    for n, kc in ((262144, 4), (262144, 8), (65536, 4)):
        o, d = incoherent_rays(n, rng)
        tm = jnp.full((n,), 100.0)
        cur = jnp.full((n,), -1, jnp.int32)

        def step(x, o=o, d=d, tm=tm, cur=cur, kc=kc):
            cand, nt, nk = w2._p1_extract_ftb(
                cs, o.x + x, o.y, o.z, d.x, d.y, d.z, tm, cur, kc
            )
            return jnp.sum(nt) * 1e-12 + jnp.float32(jnp.sum(cand)) * 1e-13
        print(f"[p1ftb n={n:6d} kc={kc}] {injit_time(step, jnp.float32(0.0))*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    stages = sys.argv[1:] or ["round", "pallas", "p1"]
    if "round" in stages:
        stage_round()
    if "pallas" in stages:
        stage_pallas()
    if "p1" in stages:
        stage_p1()
