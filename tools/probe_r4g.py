"""Split per-pass cost: traversal vs everything else.

Times the mesh-bench render pass under the production engine and under the
'null' traversal stub (all mesh queries miss) — the difference is the
traversal bill; the stub's own time is shading + sampling + film.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "."); sys.path.insert(0, "tools")

from bench_mesh import ensure_scene
from raytracer_tpu.io.scene_loader import load_scene
from raytracer_tpu.integrators.path_tracer import RenderParams
from raytracer_tpu.render.film import make_film
from raytracer_tpu.render.renderer import ViewportParams, _jitted_render_pass
from raytracer_tpu.ops import traverse as trav

scene, meta, cam = load_scene(ensure_scene(200_000))
size = 512
vp = ViewportParams(width=size, height=size, seed=0)
params = RenderParams(max_depth=6, mis=True)

for mode in (sys.argv[1:] or ["wave2", "null"]):
    trav.set_traversal_mode(mode)
    film = make_film(vp.width, vp.height)
    t0 = time.perf_counter()
    film, counters = _jitted_render_pass(scene, meta, cam, film, jnp.int32(0), None, vp, params)
    np.asarray(film.sum)
    print(f"[{mode}] compile+first: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    n = 4
    for i in range(1, n + 1):
        film, counters = _jitted_render_pass(scene, meta, cam, film, jnp.int32(i), None, vp, params)
    np.asarray(film.sum)
    dt = (time.perf_counter() - t0) / n
    print(f"[{mode}] per-pass: {dt*1e3:.0f} ms")
