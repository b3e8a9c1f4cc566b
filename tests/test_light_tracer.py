"""Light tracer integration tests — cross-integrator agreement with PT-MIS,
the reference's key validation pattern (`RaytracingTests.cpp:17-22`)."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracer_tpu.integrators.light_tracer import render_pass_light_tracer
from raytracer_tpu.integrators.path_tracer import RenderParams
from raytracer_tpu.math.transform import RigidTransform
from raytracer_tpu.render.film import average_radiance, make_film
from raytracer_tpu.render.renderer import Viewport, ViewportParams
from raytracer_tpu.scene import types as T
from raytracer_tpu.scene.build import LightDesc, MaterialDesc, SceneBuilder
from raytracer_tpu.scene.camera import make_camera

import pytest

pytestmark = pytest.mark.slow  # full-render / FD-gradient suite: smoke tier skips it


def _scene():
    b = SceneBuilder()
    m = b.add_material(MaterialDesc(bsdf="diffuse", base_color=(0.7,) * 3))
    b.add_rect(RigidTransform(translation=(0, 0, 3), euler_deg=(180, 0, 0)), (10, 10), m)
    b.add_light(
        LightDesc(
            kind=T.LIGHT_AREA, color=(8.0,) * 3,
            transform=RigidTransform(translation=(0, 2, 1.0), euler_deg=(60, 0, 0)),
            shape_kind=T.SHAPE_RECT, shape_param=(0.7, 0.7, 0.0),
        )
    )
    return b.build()


def test_light_tracer_matches_mis():
    scene, meta = _scene()
    cam = make_camera(RigidTransform(), fov_deg=40.0)
    vp_params = ViewportParams(width=32, height=32, seed=3)
    params = RenderParams(max_depth=4, mis=True)

    vp = Viewport(scene, meta, cam, vp_params, params)
    vp.render(48)
    mis_img = vp.radiance()

    film = make_film(32, 32)
    ltfn = jax.jit(
        lambda s, c, f, p: render_pass_light_tracer(s, meta, c, f, p, None, vp_params, params)
    )
    for i in range(192):
        film, counters = ltfn(scene, cam, film, jnp.int32(i))
    lt_img = np.asarray(average_radiance(film))

    assert float(counters.num_rays) > 0
    np.testing.assert_allclose(lt_img.mean(), mis_img.mean(), rtol=0.05)


def test_light_tracer_point_light():
    """Point lights work through Emit (uniform sphere, pdf 1/4pi)."""
    b = SceneBuilder()
    m = b.add_material(MaterialDesc(bsdf="diffuse", base_color=(0.8,) * 3))
    b.add_rect(RigidTransform(translation=(0, 0, 3), euler_deg=(180, 0, 0)), (30, 30), m)
    b.add_light(
        LightDesc(kind=T.LIGHT_POINT, color=(10.0,) * 3,
                  transform=RigidTransform(translation=(0, 0, 1)))
    )
    scene, meta = b.build()
    cam = make_camera(RigidTransform(), fov_deg=40.0)
    vp_params = ViewportParams(width=32, height=32, seed=1)
    params = RenderParams(max_depth=3, mis=True)

    vp = Viewport(scene, meta, cam, vp_params, params)
    vp.render(24)
    mis_img = vp.radiance()

    film = make_film(32, 32)
    ltfn = jax.jit(
        lambda s, c, f, p: render_pass_light_tracer(s, meta, c, f, p, None, vp_params, params)
    )
    for i in range(256):
        film, _ = ltfn(scene, cam, film, jnp.int32(i))
    lt_img = np.asarray(average_radiance(film))
    np.testing.assert_allclose(lt_img.mean(), mis_img.mean(), rtol=0.08)
