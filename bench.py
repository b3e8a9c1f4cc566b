"""Benchmark harness: Mrays/s of the MIS path tracer on the flagship scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers, so the baseline was measured by building
the reference from source and running the identical Cornell/MIS/512p/depth-6
config through its own Viewport (tools/ref_baseline): 3.95 Mray/s on this
environment's host CPU.  vs_baseline = ours / 3.95.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from raytracer_tpu.integrators.path_tracer import RenderParams
    from raytracer_tpu.math.transform import RigidTransform
    from raytracer_tpu.render.film import make_film
    from raytracer_tpu.render.renderer import ViewportParams, render_pass
    from raytracer_tpu.scene.camera import make_camera
    from raytracer_tpu.scene.presets import cornell_box, cornell_camera_kw

    scene, meta = cornell_box()
    t_kw, c_kw = cornell_camera_kw()
    cam = make_camera(RigidTransform(**t_kw), **c_kw)

    on_tpu = jax.devices()[0].platform != "cpu"
    size = 512 if on_tpu else 64
    vp = ViewportParams(width=size, height=size, seed=0)
    params = RenderParams(max_depth=6, mis=True)

    from raytracer_tpu.render.renderer import _jitted_render_pass as pass_fn

    # warmup / compile
    film = make_film(vp.width, vp.height)
    film, counters = pass_fn(scene, meta, cam, film, jnp.int32(0), None, vp, params)
    jax.block_until_ready(film.sum)

    n_passes = 8 if on_tpu else 2
    total_rays = 0.0
    t0 = time.perf_counter()
    for i in range(1, n_passes + 1):
        film, counters = pass_fn(scene, meta, cam, film, jnp.int32(i), None, vp, params)
    jax.block_until_ready(film.sum)
    dt = time.perf_counter() - t0
    total_rays = float(counters.num_rays + counters.num_shadow_rays) * n_passes

    mrays = total_rays / dt / 1e6
    # reference renderer on this environment's host CPU, identical scene and
    # integrator config (tools/ref_baseline, BASELINE.md)
    ref_mrays = 3.95
    print(
        json.dumps(
            {
                "metric": "mrays_per_sec_cornell_mis",
                "value": round(mrays, 3),
                "unit": "Mray/s",
                "vs_baseline": round(mrays / ref_mrays, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
