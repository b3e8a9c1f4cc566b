"""Round-5 whole-pass cost budget (VERDICT r4 item #1 step zero).

Attributes the full mesh-bench render pass (512^2, depth 6, MIS) with the
scan-differenced in-jit timing methodology (tools/probe_r4c.py): every
number is time(scan N2 reps) - time(scan N1 reps) / (N2 - N1), so host
dispatch (~2.8 ms/call on this transport) and compile time cancel out.

Stages:
  1. full render pass (production wave2)          -> T_pass
  2. render pass, RT_TRAVERSAL_MODE=null          -> T_shade (no mesh trace,
     but the null path falls back to eval_tri_frame gathers; combine with
     RT_SKIP_TRI_FRAME=1 for the pure shading bill)
  3. capture the REAL per-bounce fused wavefronts via io_callback, then
     time _wave2_trace / _p1_extract on each -> per-dispatch budget

Usage: python tools/probe_r5.py [stage...]   (default: all)
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

SCENE = os.environ.get("PROBE_SCENE", "mesh")  # mesh | interior


def force(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "shape") and getattr(leaf, "ndim", 0):
            np.asarray(leaf[:1])
        else:
            np.asarray(leaf)
    return x


def injit_time(step, x, r1=2, r2=6, outer=2):
    """Per-iteration time of `step` via scan-differencing inside one jit."""
    def many(reps):
        @jax.jit
        def f(x):
            def body(c, _):
                return step(c), None
            y, _ = jax.lax.scan(body, x, None, length=reps)
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


def load():
    from raytracer_tpu.io.scene_loader import load_scene

    if SCENE == "interior":
        from gen_interior import ensure_interior

        return load_scene(ensure_interior())
    from bench_mesh import ensure_scene

    return load_scene(ensure_scene(200_000))


def pass_step_fn(scene, meta, cam, vp, params):
    from raytracer_tpu.render.renderer import render_pass
    from raytracer_tpu.sampler.sampler import halton_frame_vector

    halton = jnp.asarray(halton_frame_vector(3))

    def step(carry):
        film, pidx = carry
        film, _ = render_pass(scene, meta, cam, film, pidx, halton, vp, params)
        return film, pidx + 1

    return step


def stage_pass(tag=""):
    from raytracer_tpu.integrators.path_tracer import RenderParams
    from raytracer_tpu.render.film import make_film
    from raytracer_tpu.render.renderer import ViewportParams

    scene, meta, cam = load()
    vp = ViewportParams(width=512, height=512, seed=0)
    params = RenderParams(max_depth=6, mis=True)
    film = make_film(vp.width, vp.height)
    t = injit_time(pass_step_fn(scene, meta, cam, vp, params), (film, jnp.int32(0)))
    print(f"[pass{tag}] in-jit per-pass: {t*1e3:8.1f} ms")
    return t


def stage_capture():
    """Capture the real per-dispatch mesh-engine inputs of one pass."""
    from raytracer_tpu.integrators.path_tracer import RenderParams
    from raytracer_tpu.render.film import make_film
    from raytracer_tpu.render.renderer import ViewportParams, render_pass
    from raytracer_tpu.sampler.sampler import halton_frame_vector
    from raytracer_tpu.ops import traverse as trav

    scene, meta, cam = load()
    vp = ViewportParams(width=512, height=512, seed=0)
    params = RenderParams(max_depth=6, mis=True)

    captured = []
    orig = trav._cs_closest

    def capturing(mode, clusters, bvh, tris, origin, direction, t_cap):
        def save(ox, oy, oz, dx, dy, dz, tc):
            captured.append((ox, oy, oz, dx, dy, dz, tc))

        jax.experimental.io_callback(
            save, None,
            origin.x, origin.y, origin.z,
            direction.x, direction.y, direction.z, jnp.asarray(t_cap),
            ordered=True,
        )
        return orig(mode, clusters, bvh, tris, origin, direction, t_cap)

    trav._cs_closest = capturing
    try:
        film = make_film(vp.width, vp.height)
        halton = jnp.asarray(halton_frame_vector(3))
        film, _ = jax.jit(
            render_pass, static_argnames=("meta", "vp", "params")
        )(scene, meta, cam, film, jnp.int32(3), halton, vp, params)
        np.asarray(film.sum)
    finally:
        trav._cs_closest = orig
    print(f"captured {len(captured)} mesh dispatches")
    for i, w in enumerate(captured):
        tc = np.asarray(w[6])
        n = tc.shape[0]
        live = (tc != 0).sum()
        sh = (tc < 0).sum()
        print(f"  dispatch {i}: n={n}  live={live} ({100*live/n:.0f}%)  anyhit_lanes={sh}")
    return scene, captured


def stage_dispatch_budget():
    from raytracer_tpu.ops.wave2_traverse import _ftb_default, _kc_default, _p1_extract, _wave2_trace

    scene, captured = stage_capture()
    cs = scene.clusters
    kc = min(_kc_default(_ftb_default()), cs.num_supers)

    tot_trace = tot_p1 = 0.0
    for i, w in enumerate(captured):
        w = [jnp.asarray(np.asarray(a)) for a in w]
        ox, oy, oz, dx, dy, dz, tc = w

        def step_trace(x, w=w):
            ox, oy, oz, dx, dy, dz, tc = w
            t, tri, u, v, attr, ovf = _wave2_trace(
                cs, ox + x, oy, oz, dx, dy, dz, tc, kc, False, 64
            )
            return t[0] * 0.0

        def step_p1(x, w=w):
            ox, oy, oz, dx, dy, dz, tc = w
            cand, rem = _p1_extract(
                cs, ox + x, oy, oz, dx, dy, dz, tc,
                jnp.full(ox.shape, -1, jnp.int32), kc,
            )
            return jnp.float32(cand[0, 0]) * 0.0

        t_tr = injit_time(step_trace, jnp.float32(0.0))
        t_p1 = injit_time(step_p1, jnp.float32(0.0))
        tot_trace += t_tr
        tot_p1 += t_p1
        print(f"  dispatch {i}: wave2_trace {t_tr*1e3:7.1f} ms   p1 {t_p1*1e3:6.1f} ms")
    print(f"[trace-total] {tot_trace*1e3:8.1f} ms   [p1-total] {tot_p1*1e3:8.1f} ms")


if __name__ == "__main__":
    stages = sys.argv[1:] or ["pass", "null", "dispatch"]
    if "pass" in stages:
        stage_pass()
    if "null" in stages:
        os.environ["RT_TRAVERSAL_MODE"] = "null"
        os.environ["RT_SKIP_TRI_FRAME"] = "1"
        stage_pass(tag="-null+skipframe")
        del os.environ["RT_TRAVERSAL_MODE"]
        del os.environ["RT_SKIP_TRI_FRAME"]
    if "dispatch" in stages:
        stage_dispatch_budget()
