"""Traversal observability: box/tri-test counters + the cost heatmap AOV.

The analogue of the reference's compile-gated intersection counters and
heatmap debug views (`Core/Rendering/Counters.h:43-48`, `Config.h:4`,
`DebugRenderer.h:27-33`).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from raytracer_tpu.integrators.path_tracer import RenderParams
from raytracer_tpu.math.transform import RigidTransform
from raytracer_tpu.render.renderer import Viewport, ViewportParams
from raytracer_tpu.scene.camera import make_camera
from raytracer_tpu.scene.presets import random_mesh_scene


def _viewport(count):
    scene, meta = random_mesh_scene(2000, seed=0)
    cam = make_camera(RigidTransform(translation=(0.0, 0.0, -4.0)), fov_deg=55.0)
    vp = Viewport(
        scene, meta, cam, ViewportParams(width=16, height=16, seed=0),
        RenderParams(max_depth=2, mis=True, count_traversal=count),
    )
    vp.render(2)
    return vp, scene, meta, cam


class TestTraversalCounters:
    @pytest.mark.slow
    def test_counters_opt_in(self):
        vp_on, *_ = _viewport(True)
        p = vp_on.progress()
        assert p["total_box_tests"] > 0
        assert p["total_tri_tests"] > 0
        vp_off, *_ = _viewport(False)
        assert vp_off.progress()["total_box_tests"] == 0.0

    def test_cost_heatmap_aov(self):
        from raytracer_tpu.integrators.debug import MODE_TRAVERSAL_COST, render_debug
        from raytracer_tpu.render.renderer import pixel_grid
        from raytracer_tpu.sampler.sampler import make_stream
        from raytracer_tpu.scene.camera import generate_rays

        _, scene, meta, cam = _viewport(False)
        cx, cy, pids = pixel_grid(16, 16)
        stream = make_stream(pids, jnp.int32(0), seed=0, halton=None)
        rays, _ = generate_rays(cam, cx, cy, stream)
        img = render_debug(scene, meta, rays, MODE_TRAVERSAL_COST)
        heat = np.asarray(img.x)
        # rays toward the mesh cost more than rays missing everything
        assert heat.max() > heat.min() + 0.05
