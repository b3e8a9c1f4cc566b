"""Is the kernel-emitted attr fast path live in the wave2 render?
wave2 full vs wave2 with RT_SKIP_TRI_FRAME=1 (frame eval skipped entirely).
If both are ~equal, the fast path is live and traversal dominates."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "."); sys.path.insert(0, "tools")
if "skip" in sys.argv:
    os.environ["RT_SKIP_TRI_FRAME"] = "1"

from bench_mesh import ensure_scene
from raytracer_tpu.io.scene_loader import load_scene
from raytracer_tpu.integrators.path_tracer import RenderParams
from raytracer_tpu.render.film import make_film
from raytracer_tpu.render.renderer import ViewportParams, _jitted_render_pass

scene, meta, cam = load_scene(ensure_scene(200_000))
vp = ViewportParams(width=512, height=512, seed=0)
params = RenderParams(max_depth=6, mis=True)
film = make_film(vp.width, vp.height)
film, counters = _jitted_render_pass(scene, meta, cam, film, jnp.int32(0), None, vp, params)
np.asarray(film.sum)
t0 = time.perf_counter()
n = 4
for i in range(1, n + 1):
    film, counters = _jitted_render_pass(scene, meta, cam, film, jnp.int32(i), None, vp, params)
np.asarray(film.sum)
tag = "skip-frame" if "skip" in sys.argv else "full"
print(f"[wave2 {tag}] per-pass: {(time.perf_counter()-t0)/n*1e3:.0f} ms")
