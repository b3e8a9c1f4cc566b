"""Time the mesh-bench render pass directly; optionally dump an xprof trace.

Usage: python tools/probe_render.py [n_passes] [--trace]
"""
import sys, time, os
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from bench_mesh import ensure_scene
from raytracer_tpu.io.scene_loader import load_scene
from raytracer_tpu.integrators.path_tracer import RenderParams
from raytracer_tpu.render.film import make_film
from raytracer_tpu.render.renderer import ViewportParams, _jitted_render_pass

n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
do_trace = "--trace" in sys.argv

scene, meta, cam = load_scene(ensure_scene(200_000))
size = 512
vp = ViewportParams(width=size, height=size, seed=0)
params = RenderParams(max_depth=6, mis=True)
film = make_film(vp.width, vp.height)

t0 = time.perf_counter()
film, counters = _jitted_render_pass(scene, meta, cam, film, jnp.int32(0), None, vp, params)
np.asarray(film.sum)
print(f"compile+first pass: {time.perf_counter()-t0:.1f}s")

rays = float(counters.num_rays + counters.num_shadow_rays)
print(f"rays/pass: {rays/1e6:.3f}M")

if do_trace:
    jax.profiler.start_trace("/tmp/jax_trace_mesh")
t0 = time.perf_counter()
for i in range(1, n_passes + 1):
    film, counters = _jitted_render_pass(scene, meta, cam, film, jnp.int32(i), None, vp, params)
np.asarray(film.sum)
dt = (time.perf_counter() - t0) / n_passes
if do_trace:
    jax.profiler.stop_trace()
print(f"per-pass: {dt*1e3:.0f} ms   {rays/dt/1e6:.3f} Mray/s")
