"""Worker process for tests/test_multihost.py: one controller of a
2-process CPU cluster (4 virtual devices each => (2, 4) hosts×chips mesh).

Renders a sharded Cornell pass and verifies this process's LOCAL film band
matches the same rows of a single-process render to a few ULPs (the
multi-controller CPU backend compiles the band program in a different XLA
environment, so the last bit can differ; the BIT-exact determinism contract
across device counts is pinned single-process in tests/test_parallel.py).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    from raytracer_tpu.parallel.mesh import init_distributed

    init_distributed(
        coordinator_address=os.environ["MH_COORD"],
        num_processes=int(os.environ["MH_NPROC"]),
        process_id=int(os.environ["MH_PID"]),
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp

    from raytracer_tpu.integrators.path_tracer import RenderParams
    from raytracer_tpu.math.transform import RigidTransform
    from raytracer_tpu.parallel.mesh import (
        film_sharding,
        make_multihost_mesh,
        render_pass_sharded,
    )
    from raytracer_tpu.render.film import make_film
    from raytracer_tpu.render.renderer import ViewportParams, _jitted_render_pass
    from raytracer_tpu.scene.camera import make_camera
    from raytracer_tpu.scene.presets import cornell_box, cornell_camera_kw

    mesh = make_multihost_mesh()
    assert mesh.shape == {"hosts": 2, "chips": 4}, mesh.shape

    size = 32
    scene, meta = cornell_box()
    t_kw, c_kw = cornell_camera_kw()
    cam = make_camera(RigidTransform(**t_kw), **c_kw)
    vp = ViewportParams(width=size, height=size, seed=0)
    params = RenderParams(max_depth=3, mis=True)

    film = jax.device_put(make_film(size, size), film_sharding(mesh))
    for i in range(2):
        film, counters = render_pass_sharded(
            scene, meta, cam, film, jnp.int32(i), None, vp, params, mesh
        )

    # single-process (single-device semantics) reference render of all rows
    ref = make_film(size, size)
    for i in range(2):
        ref, _ = _jitted_render_pass(
            scene, meta, cam, ref, jnp.int32(i), None, vp, params
        )
    ref_sum = np.asarray(ref.sum)

    # this controller owns 4 of the 8 row-bands; check each local shard
    rows_per = size // 8
    checked = 0
    for shard in film.sum.addressable_shards:
        r0 = shard.index[0].start or 0
        band = np.asarray(shard.data)
        want = ref_sum[r0 : r0 + rows_per]
        assert band.shape == want.shape
        np.testing.assert_allclose(
            band, want, rtol=1e-5, atol=1e-6,
            err_msg=f"band at row {r0} diverged beyond ULP noise",
        )
        checked += 1
    assert checked == 4, checked
    print("MULTIHOST_OK process", jax.process_index(), "checked", checked, "bands")


if __name__ == "__main__":
    main()
