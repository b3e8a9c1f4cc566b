"""Phase-level breakdown of wave2 _round at production scale, scan-differenced.

Each phase variant runs the pipeline up to a cut point; chained via folding
outputs back into the ray inputs so nothing is dead-code-eliminated.
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from raytracer_tpu.scene.clusters import build_clusters
from raytracer_tpu.ops import wave2_traverse as w2
from traversal_bench import make_mesh, incoherent_rays

rng = np.random.default_rng(7)
v0, e1, e2 = make_mesh(200_000, rng)
cs = build_clusters(v0, e1, e2)
N = 262144
o, d = incoherent_rays(N, rng)
tm = jnp.full(N, 3.0e38)
KC = 16


def force(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf)[:1] if hasattr(leaf, "shape") and leaf.ndim else np.asarray(leaf)


def timed(make_step, label, r1=2, r2=6, outer=3):
    def many(reps):
        @jax.jit
        def f(ox):
            def body(c, _):
                out = make_step(c)
                # fold a scalar of the output back into the carry to chain deps
                s = 0.0
                for leaf in jax.tree_util.tree_leaves(out):
                    s = s + jnp.sum(leaf[:8].astype(jnp.float32)) * 1e-30
                return c + s, None
            y, _ = jax.lax.scan(body, ox, None, length=reps)
            return y
        return f
    f1, f2 = many(r1), many(r2)
    force(f1(o.x)); force(f2(o.x))
    ts = []
    for f in (f1, f2):
        t0 = time.perf_counter()
        for _ in range(outer):
            force(f(o.x))
        ts.append((time.perf_counter() - t0) / outer)
    dt = (ts[1] - ts[0]) / (r2 - r1)
    print(f"{label:34s} {dt*1e3:9.2f} ms")
    return dt


# --- phase 1 only -----------------------------------------------------------
def p1_only(ox):
    cand, rem = w2._p1_extract(cs, ox, o.y, o.z, d.x, d.y, d.z, tm, jnp.full(N, -1, jnp.int32), KC)
    return cand, rem

timed(p1_only, "p1_extract (kc=16)")

def p1_only8(ox):
    cand, rem = w2._p1_extract(cs, ox, o.y, o.z, d.x, d.y, d.z, tm, jnp.full(N, -1, jnp.int32), 8)
    return cand, rem

timed(p1_only8, "p1_extract (kc=8)")


# --- full round -------------------------------------------------------------
def full_round(ox):
    return w2._round(cs, ox, o.y, o.z, d.x, d.y, d.z, tm, jnp.full(N, -1, jnp.int32), KC, 32, False)

timed(full_round, "full _round (kc=16)")

def full_round8(ox):
    return w2._round(cs, ox, o.y, o.z, d.x, d.y, d.z, tm, jnp.full(N, -1, jnp.int32), 8, 32, False)

timed(full_round8, "full _round (kc=8)")

# --- full trace (with continuation loop) ------------------------------------
def full_trace(ox):
    return w2._wave2_trace(cs, ox, o.y, o.z, d.x, d.y, d.z, tm, KC, False, 64)

timed(full_trace, "full _wave2_trace (kc=16)", r1=2, r2=6, outer=3)

def full_trace8(ox):
    return w2._wave2_trace(cs, ox, o.y, o.z, d.x, d.y, d.z, tm, 8, False, 64)

timed(full_trace8, "full _wave2_trace (kc=8)", r1=2, r2=6, outer=3)

# shadow-like: 25% occluded at t_max 4, anyhit-encoded
tm_sh = jnp.full(N, -4.0)

def full_trace_ah(ox):
    return w2._wave2_trace(cs, ox, o.y, o.z, d.x, d.y, d.z, tm_sh, 16, False, 64)

timed(full_trace_ah, "full _wave2_trace anyhit-lanes", r1=2, r2=6, outer=3)
