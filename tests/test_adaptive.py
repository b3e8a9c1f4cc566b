"""Adaptive rendering: block error, subdivision, convergence, consistency.

Covers the reference's adaptive pipeline (`Viewport.cpp:552-581, 644-732`):
the secondary-buffer error estimator, converged-block dropping, block
subdivision, and that the adaptive result agrees with the uniform render.
"""

import numpy as np
import pytest

from raytracer_tpu.integrators.path_tracer import RenderParams
from raytracer_tpu.math.transform import RigidTransform
from raytracer_tpu.render.adaptive import AdaptiveSettings, AdaptiveViewport, Block
from raytracer_tpu.render.renderer import Viewport, ViewportParams
from raytracer_tpu.scene import types as T
from raytracer_tpu.scene.build import LightDesc, MaterialDesc, SceneBuilder
from raytracer_tpu.scene.camera import make_camera


def _simple_setup(width=32, height=32):
    """Flat-background scene: converges essentially immediately."""
    b = SceneBuilder()
    b.default_material_id()
    b.add_light(LightDesc(kind=T.LIGHT_BACKGROUND, color=(0.25, 0.5, 0.75)))
    scene, meta = b.build()
    cam = make_camera(RigidTransform(), fov_deg=60.0, aspect=width / height)
    return scene, meta, cam


def _cornellish_setup():
    from raytracer_tpu.scene.presets import cornell_box, cornell_camera_kw

    scene, meta = cornell_box()
    t_kw, c_kw = cornell_camera_kw()
    return scene, meta, make_camera(RigidTransform(**t_kw), **c_kw)


class TestAdaptive:
    def test_flat_scene_converges_and_stops(self):
        scene, meta, cam = _simple_setup()
        av = AdaptiveViewport(
            scene, meta, cam, ViewportParams(width=32, height=32, seed=0),
            RenderParams(max_depth=2, mis=True),
            AdaptiveSettings(num_initial_passes=2, convergence_threshold=0.01,
                             max_block_size=16, min_block_size=4),
        )
        av.render(8)
        p = av.progress()
        # a constant image has zero variance -> everything converges
        assert p["active_blocks"] == 0
        assert p["converged_fraction"] == 1.0
        # result equals the background
        np.testing.assert_allclose(
            av.radiance().reshape(-1, 3).mean(0), (0.25, 0.5, 0.75), atol=0.01
        )
        # further passes are free no-ops
        rays_before = p["total_rays"]
        av.render(4)
        assert av.progress()["total_rays"] == rays_before
        assert av.passes == 12

    @pytest.mark.slow
    def test_agrees_with_uniform_viewport(self):
        scene, meta, cam = _cornellish_setup()
        vp_params = ViewportParams(width=24, height=24, seed=0)
        params = RenderParams(max_depth=3, mis=True)
        uniform = Viewport(scene, meta, cam, vp_params, params).render(16)
        adaptive = AdaptiveViewport(
            scene, meta, cam, vp_params, params,
            AdaptiveSettings(num_initial_passes=16),  # no adaptation window
        ).render(16)
        # identical sampling (same pixel ids/pass keys) => identical radiance
        np.testing.assert_allclose(
            adaptive.radiance(), np.asarray(uniform.radiance()), atol=1e-5
        )

    def test_subdivision_splits_blocks(self):
        scene, meta, cam = _cornellish_setup()
        av = AdaptiveViewport(
            scene, meta, cam, ViewportParams(width=32, height=32, seed=0),
            RenderParams(max_depth=4, mis=True),
            AdaptiveSettings(
                num_initial_passes=2, adaptation_period=2,
                convergence_threshold=1e-9,  # never drop
                subdivision_threshold=1e9,  # always split
                max_block_size=32, min_block_size=8,
            ),
        )
        assert len(av.blocks) == 1
        av.render(2)
        assert len(av.blocks) == 2  # split once
        av.render(2)
        assert len(av.blocks) == 4

    def test_error_decreases_with_passes(self):
        scene, meta, cam = _cornellish_setup()
        av = AdaptiveViewport(
            scene, meta, cam, ViewportParams(width=24, height=24, seed=0),
            RenderParams(max_depth=4, mis=True),
            AdaptiveSettings(num_initial_passes=2, adaptation_period=2,
                             convergence_threshold=0.0),
        )
        av.render(4)
        e4 = av.progress()["average_error"]
        av.render(20)
        e24 = av.progress()["average_error"]
        assert e24 < e4
