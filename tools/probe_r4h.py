"""Bisect the non-traversal per-pass cost: cornell vs mesh scene, depth 1 vs 6,
all under the 'null' traversal stub (mesh queries all miss)."""
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
from raytracer_tpu.scene.presets import cornell_box, cornell_camera_kw
from raytracer_tpu.scene.camera import make_camera
from raytracer_tpu.math.transform import RigidTransform

trav.set_traversal_mode("null")

mscene, mmeta, mcam = load_scene(ensure_scene(200_000))
cscene, cmeta = cornell_box()
t_kw, c_kw = cornell_camera_kw()
ccam = make_camera(RigidTransform(**t_kw), **c_kw)

vp = ViewportParams(width=512, height=512, seed=0)

for label, (scene, meta, cam) in (("cornell", (cscene, cmeta, ccam)), ("mesh", (mscene, mmeta, mcam))):
    for depth in (1, 6):
        params = RenderParams(max_depth=depth, mis=True)
        film = make_film(vp.width, vp.height)
        film, counters = _jitted_render_pass(scene, meta, cam, film, jnp.int32(0), None, vp, params)
        np.asarray(film.sum)
        t0 = time.perf_counter()
        n = 4
        for i in range(1, n + 1):
            film, counters = _jitted_render_pass(scene, meta, cam, film, jnp.int32(i), None, vp, params)
        np.asarray(film.sum)
        dt = (time.perf_counter() - t0) / n
        print(f"[{label} d{depth}] per-pass: {dt*1e3:.0f} ms")
