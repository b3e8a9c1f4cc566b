"""Benchmark harness: Mrays/s of the MIS path tracer.

Prints ONE JSON line per metric: {"metric", "value", "unit", "vs_baseline"}.
The driver consumes the FIRST line; further lines are extra diagnostics.

Two configs:
- analytic Cornell box (512^2, depth 6, MIS) — the apples-to-apples config
  measured against the reference renderer built from source on this host
  (tools/ref_baseline): 3.95 Mray/s on the 2-core AVX2 CPU.
- 200k-triangle mesh scene (256^2, depth 4, MIS) — exercises the production
  mesh traversal path (sorted-wavefront Pallas cluster kernel on TPU); the
  reference baseline for this config was measured with the same harness
  (tools/ref_baseline mesh mode): see BASELINE.md.
"""

import json
import time

import jax
import jax.numpy as jnp

# reference renderer on this environment's host CPU (tools/ref_baseline)
REF_CORNELL_MRAYS = 3.95
# reference CPU on the same 200k-tri mesh config — measured via
# tools/ref_baseline (see BASELINE.md); fallback estimate if not yet measured
REF_MESH_MRAYS = 3.3


def bench_scene(scene, meta, cam, size, params, n_passes):
    from raytracer_tpu.render.film import make_film
    from raytracer_tpu.render.renderer import ViewportParams, _jitted_render_pass

    vp = ViewportParams(width=size, height=size, seed=0)
    film = make_film(vp.width, vp.height)
    film, counters = _jitted_render_pass(scene, meta, cam, film, jnp.int32(0), None, vp, params)
    jax.block_until_ready(film.sum)

    t0 = time.perf_counter()
    for i in range(1, n_passes + 1):
        film, counters = _jitted_render_pass(scene, meta, cam, film, jnp.int32(i), None, vp, params)
    jax.block_until_ready(film.sum)
    dt = time.perf_counter() - t0
    total_rays = float(counters.num_rays + counters.num_shadow_rays) * n_passes
    overflow = float(counters.num_overflow) if counters.num_overflow is not None else 0.0
    return total_rays / dt / 1e6, overflow


def main():
    from raytracer_tpu.integrators.path_tracer import RenderParams
    from raytracer_tpu.math.transform import RigidTransform
    from raytracer_tpu.scene.camera import make_camera
    from raytracer_tpu.scene.presets import cornell_box, cornell_camera_kw, random_mesh_scene

    on_tpu = jax.devices()[0].platform != "cpu"

    # --- analytic Cornell (the reference-comparable headline) ---------------
    scene, meta = cornell_box()
    t_kw, c_kw = cornell_camera_kw()
    cam = make_camera(RigidTransform(**t_kw), **c_kw)
    mrays, _ = bench_scene(
        scene, meta, cam,
        size=512 if on_tpu else 64,
        params=RenderParams(max_depth=6, mis=True),
        n_passes=8 if on_tpu else 2,
    )
    print(json.dumps({
        "metric": "mrays_per_sec_cornell_mis",
        "value": round(mrays, 3),
        "unit": "Mray/s",
        "vs_baseline": round(mrays / REF_CORNELL_MRAYS, 3),
    }))

    # --- mesh + traversal (SURVEY hard part #1) -----------------------------
    mscene, mmeta = random_mesh_scene(200_000 if on_tpu else 20_000, seed=0)
    mcam = make_camera(
        RigidTransform(translation=(0.0, 0.0, -4.0)), fov_deg=55.0
    )
    mesh_mrays, overflow = bench_scene(
        mscene, mmeta, mcam,
        size=256 if on_tpu else 64,
        params=RenderParams(max_depth=4, mis=True),
        n_passes=4 if on_tpu else 1,
    )
    print(json.dumps({
        "metric": "mrays_per_sec_mesh200k_mis",
        "value": round(mesh_mrays, 3),
        "unit": "Mray/s",
        "vs_baseline": round(mesh_mrays / REF_MESH_MRAYS, 3),
        "traversal_overflow_rays": overflow,
    }))


if __name__ == "__main__":
    main()
