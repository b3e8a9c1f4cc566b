"""Motion blur: per-pixel shutter time applied to object and camera transforms.

Reference semantics: `RenderingParams::motionBlurStrength` (`Core/Rendering/
Context.h:64-66`), per-pixel time sampled at `Viewport.cpp:309`, object
transform sampled at `Scene::Traverse_Object` (`Scene.cpp:132-136`), camera
transform lerp `Camera::SampleTransform` (`Camera.cpp:61-79`).
"""

import numpy as np
import pytest

from raytracer_tpu.integrators.path_tracer import RenderParams
from raytracer_tpu.math.transform import RigidTransform
from raytracer_tpu.render.renderer import Viewport, ViewportParams
from raytracer_tpu.scene import types as T
from raytracer_tpu.scene.build import LightDesc, MaterialDesc, SceneBuilder
from raytracer_tpu.scene.camera import make_camera


def _moving_sphere_scene(velocity):
    b = SceneBuilder()
    m = b.add_material(MaterialDesc(base_color=(0.8, 0.2, 0.2)))
    b.add_sphere(
        RigidTransform(translation=np.array([0.0, 0.0, 3.0])), 0.5, m,
        velocity=velocity,
    )
    b.add_light(LightDesc(kind=T.LIGHT_BACKGROUND, color=(1.0, 1.0, 1.0)))
    return b.build()


def _coverage(img):
    """Pixels that differ from the pure-background color."""
    return int((np.abs(img - 1.0) > 0.01).any(-1).sum())


@pytest.mark.slow
def test_object_motion_blur_smears():
    scene, meta = _moving_sphere_scene((2.0, 0.0, 0.0))
    cam = make_camera(RigidTransform())
    params = RenderParams(max_depth=3)
    static = Viewport(scene, meta, cam, ViewportParams(width=48, height=48), params)
    blurred = Viewport(
        scene, meta, cam,
        ViewportParams(width=48, height=48, motion_blur_strength=1.0), params,
    )
    cov_static = _coverage(static.render(4).radiance())
    cov_blur = _coverage(blurred.render(4).radiance())
    # the sphere sweeps sideways over the shutter: wider footprint
    assert cov_blur > cov_static * 1.3, (cov_static, cov_blur)


def test_zero_strength_matches_static():
    scene, meta = _moving_sphere_scene((2.0, 0.0, 0.0))
    cam = make_camera(RigidTransform())
    params = RenderParams(max_depth=3)
    a = Viewport(scene, meta, cam, ViewportParams(width=32, height=32), params)
    b = Viewport(
        scene, meta, cam,
        ViewportParams(width=32, height=32, motion_blur_strength=0.0), params,
    )
    ia = a.render(2).radiance()
    ib = b.render(2).radiance()
    np.testing.assert_allclose(ia, ib, rtol=0, atol=0)


def test_camera_motion_blur():
    scene, meta = _moving_sphere_scene((0.0, 0.0, 0.0))
    params = RenderParams(max_depth=3)
    cam_static = make_camera(RigidTransform())
    cam_moving = make_camera(
        RigidTransform(),
        transform_end=RigidTransform(translation=np.array([0.5, 0.0, 0.0])),
    )
    vp = ViewportParams(width=48, height=48, motion_blur_strength=1.0)
    img_s = Viewport(scene, meta, cam_static, vp, params).render(4).radiance()
    img_m = Viewport(scene, meta, cam_moving, vp, params).render(4).radiance()
    assert np.abs(img_m - img_s).max() > 0.01
    assert _coverage(img_m) > _coverage(img_s)
