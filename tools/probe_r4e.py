"""Stage-level breakdown inside the wave2 _round (sort-join machinery).

Replicates _round's stages with cut points; in-jit scan-differenced timing.
"""
import sys, time, functools
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from raytracer_tpu.scene.clusters import build_clusters
from raytracer_tpu.ops import wave2_traverse as w2
from raytracer_tpu.ops.wave2_traverse import CHUNK, _searchsorted
from traversal_bench import make_mesh, incoherent_rays

KC = int(sys.argv[1]) if len(sys.argv) > 1 else 16

rng = np.random.default_rng(7)
v0, e1, e2 = make_mesh(200_000, rng)
cs_set = build_clusters(v0, e1, e2)
N = 262144
o, d = incoherent_rays(N, rng)
tm = jnp.full(N, 3.0e38)
cs = cs_set.num_supers


def force(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf)[:1] if hasattr(leaf, "shape") and leaf.ndim else np.asarray(leaf)


def timed(make_step, label, r1=2, r2=6, outer=3):
    def many(reps):
        @jax.jit
        def f(ox):
            def body(c, _):
                out = make_step(c)
                s = 0.0
                for leaf in jax.tree_util.tree_leaves(out):
                    s = s + jnp.sum(leaf.reshape(-1)[:8].astype(jnp.float32)) * 1e-30
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
    print(f"{label:30s} {dt*1e3:9.2f} ms")
    return dt


def stages(ox, stop):
    oy, oz, dx, dy, dz, tl = o.y, o.z, d.x, d.y, d.z, tm
    n = N
    kc = KC
    cursor = jnp.full(n, -1, jnp.int32)
    cand, remaining = w2._p1_extract(cs_set, ox, oy, oz, dx, dy, dz, tl, cursor, kc)
    if stop == "p1":
        return cand, remaining

    p = n * kc
    p_pad = -(-p // CHUNK) * CHUNK

    def pad_to(x, length, fill):
        extra = length - x.shape[0]
        return jnp.concatenate([x, jnp.full((extra,), fill, x.dtype)]) if extra else x

    rep = lambda x: jnp.broadcast_to(x[:, None], (n, kc)).reshape(p)
    key = pad_to(cand.reshape(p), p_pad, cs)
    pidx = pad_to(jnp.arange(p, dtype=jnp.int32), p_pad, p)
    sort_in = jax.lax.optimization_barrier(
        [key, pidx, pad_to(rep(ox), p_pad, 0.0), pad_to(rep(oy), p_pad, 0.0),
         pad_to(rep(oz), p_pad, 0.0), pad_to(rep(dx), p_pad, 1.0),
         pad_to(rep(dy), p_pad, 0.0), pad_to(rep(dz), p_pad, 0.0),
         pad_to(rep(tl), p_pad, 0.0)]
    )
    sk, sidx, sox, soy, soz, sdx, sdy, sdz, stl = jax.lax.optimization_barrier(
        jax.lax.sort(sort_in, num_keys=1)
    )
    if stop == "sort1":
        return sk, sidx, sox

    start = _searchsorted(sk, jnp.arange(cs + 1, dtype=jnp.int32) - 1)
    pos = jnp.arange(p_pad, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    run_start = jax.lax.cummax(jnp.where(is_start, pos, 0))
    prev_start = jnp.concatenate([jnp.zeros(1, jnp.int32), run_start[:-1]])
    prev_len = pos - prev_start
    v_p = jnp.where(is_start & (pos > 0), (-prev_len) % CHUNK, 0)
    cum_pad = jnp.cumsum(v_p)
    d_p = pos + cum_pad
    cp_at = cum_pad[jnp.minimum(start, p_pad - 1)]
    d_c = start + cp_at
    len_c = start[1:] - start[:-1]
    pad_c = (-len_c) % CHUNK
    gap_start = d_c[:cs] + len_c
    f = -(-(cs * (CHUNK - 1)) // CHUNK) * CHUNK
    d_len = p_pad + f
    jj = jnp.arange(CHUNK - 1, dtype=jnp.int32)[None, :]
    fill_key = jnp.where(jj < pad_c[:, None], gap_start[:, None] + jj, jnp.int32(2**30)).reshape(-1)
    fill_key = jnp.concatenate([fill_key, jnp.full((f - fill_key.shape[0],), 2**30, jnp.int32)])
    if stop == "filler":
        return d_p, fill_key, d_c

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
    if stop == "sort2":
        return fidx, fox

    return fidx, fox


for cut in ("p1", "sort1", "filler", "sort2"):
    timed(functools.partial(stages, stop=cut), f"through {cut} (kc={KC})")

def full(ox):
    return w2._round(cs_set, ox, o.y, o.z, d.x, d.y, d.z, tm,
                     jnp.full(N, -1, jnp.int32), KC, 32, False)

timed(full, f"full round (kc={KC})")
