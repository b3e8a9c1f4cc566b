"""Sphere area lights: solid-angle cone sampling (`SphereShape.cpp:65-124`).

MIS correctness demands the NEE sampling pdf and the BSDF-hit pdf agree; the
strongest check is naive-vs-MIS convergence to the same image
(`RaytracingTests.cpp:17-22` cross-integrator agreement pattern).
"""

import numpy as np
import pytest

from raytracer_tpu.integrators.path_tracer import RenderParams
from raytracer_tpu.math.transform import RigidTransform
from raytracer_tpu.render.renderer import Viewport, ViewportParams
from raytracer_tpu.scene import types as T
from raytracer_tpu.scene.build import LightDesc, MaterialDesc, SceneBuilder
from raytracer_tpu.scene.camera import make_camera


def _sphere_light_scene(b):
    m = b.add_material(MaterialDesc(bsdf="diffuse", base_color=(0.7, 0.7, 0.7)))
    # floor facing the camera
    b.add_rect(RigidTransform(translation=(0, 0, 5), euler_deg=(180, 0, 0)),
               (8.0, 8.0), m)
    li = b.add_light(LightDesc(
        kind=T.LIGHT_AREA, color=(24.0, 20.0, 16.0),
        transform=RigidTransform(translation=(0.8, 0.6, 2.0)),
        shape_kind=T.SHAPE_SPHERE, shape_param=(0.25, 0.0, 0.0),
    ))
    # the light must also be hit-testable geometry (`SceneObject_Light.cpp`)
    b.add_sphere(RigidTransform(translation=(0.8, 0.6, 2.0)), 0.25,
                 b.default_material_id(), light_id=li)


def _render(params, passes, seed=0):
    b = SceneBuilder()
    _sphere_light_scene(b)
    scene, meta = b.build()
    cam = make_camera(RigidTransform(), fov_deg=50.0)
    vp = Viewport(scene, meta, cam, ViewportParams(width=20, height=20, seed=seed),
                  params)
    vp.render(passes)
    return vp.radiance()


class TestSphereLightConeSampling:
    @pytest.mark.slow
    def test_mis_vs_naive_agree(self):
        """Cone-sampling pdf and BSDF-hit pdf must be mutually consistent:
        naive (BSDF-only) and MIS estimators converge to the same image."""
        mis = _render(RenderParams(max_depth=3, mis=True), passes=96)
        naive = _render(RenderParams(max_depth=3, mis=False), passes=640)
        # compare means over the floor region (robust to residual MC noise)
        rel = abs(mis.mean() - naive.mean()) / naive.mean()
        assert rel < 0.06, (mis.mean(), naive.mean())

    def test_mis_converges_fast(self):
        """Cone sampling keeps NEE variance low: few-pass render is already
        close to a long render (the point of `SphereShape::Sample`)."""
        short = _render(RenderParams(max_depth=1, mis=True), passes=8)
        long = _render(RenderParams(max_depth=1, mis=True), passes=128)
        # strictly-floor pixels: pixels partially covered by the light
        # silhouette carry AA jitter variance, not NEE variance
        floor = long.max(-1) < 0.5
        rel = np.abs(short - long)[floor].mean() / max(long[floor].mean(), 1e-6)
        assert rel < 0.12, rel

    def test_light_visible_radiance(self):
        """Camera ray hitting the sphere light sees its radiance."""
        img = _render(RenderParams(max_depth=2, mis=True), passes=16)
        assert img.max() > 10.0  # the light itself is in frame
