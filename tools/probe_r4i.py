"""Ablate inside the mesh-scene bounce under the null traversal stub:
full / no-tri-frame / no-MIS-NEE / no-blue-noise."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "."); sys.path.insert(0, "tools")

from bench_mesh import ensure_scene
from raytracer_tpu.io.scene_loader import load_scene
from raytracer_tpu.integrators.path_tracer import RenderParams
from raytracer_tpu.render.film import make_film
from raytracer_tpu.render.renderer import ViewportParams, _jitted_render_pass
from raytracer_tpu.ops import traverse as trav

trav.set_traversal_mode("null")
scene, meta, cam = load_scene(ensure_scene(200_000))

def run(label, vp, params):
    film = make_film(vp.width, vp.height)
    film, counters = _jitted_render_pass(scene, meta, cam, film, jnp.int32(0), None, vp, params)
    np.asarray(film.sum)
    t0 = time.perf_counter()
    n = 4
    for i in range(1, n + 1):
        film, counters = _jitted_render_pass(scene, meta, cam, film, jnp.int32(i), None, vp, params)
    np.asarray(film.sum)
    print(f"[{label}] per-pass: {(time.perf_counter()-t0)/n*1e3:.0f} ms", flush=True)

vp = ViewportParams(width=512, height=512, seed=0)
which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "base"):
    run("d6 full", vp, RenderParams(max_depth=6, mis=True))
if which in ("all", "notri"):
    os.environ["RT_SKIP_TRI_FRAME"] = "1"
    jax.clear_caches()
    run("d6 no-tri-frame", vp, RenderParams(max_depth=6, mis=True))
    del os.environ["RT_SKIP_TRI_FRAME"]
if which in ("all", "nomis"):
    jax.clear_caches()
    run("d6 no-mis", vp, RenderParams(max_depth=6, mis=False))
if which in ("all", "nobn"):
    jax.clear_caches()
    vp2 = ViewportParams(width=512, height=512, seed=0, use_blue_noise=False)
    run("d6 no-bluenoise", vp2, RenderParams(max_depth=6, mis=True))
if which in ("all", "nold"):
    jax.clear_caches()
    vp3 = ViewportParams(width=512, height=512, seed=0, use_low_discrepancy=False)
    run("d6 no-lowdisc", vp3, RenderParams(max_depth=6, mis=True))
