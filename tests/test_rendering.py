"""End-to-end integration tests — the analogue of `Tests/RaytracingTests.cpp`:
every physical integrator over analytic scenes with known expectations
(empty / background-only / furnace / emissive / specular-metal furnace /
dielectric energy conservation)."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer_tpu.integrators.path_tracer import RenderParams
from raytracer_tpu.math.transform import RigidTransform
from raytracer_tpu.render.renderer import Viewport, ViewportParams
from raytracer_tpu.scene import types as T
from raytracer_tpu.scene.build import LightDesc, MaterialDesc, SceneBuilder
from raytracer_tpu.scene.camera import make_camera

SIZE = 16  # tiny viewport for speed (reference uses 32x32, `RaytracingTests.cpp:27`)

# the two integrator modes exercised over every analytic scene
INTEGRATORS = [
    pytest.param(RenderParams(max_depth=8, mis=False), id="path_tracer"),
    pytest.param(RenderParams(max_depth=8, mis=True), id="path_tracer_mis"),
]


def render(builder_fn, params, passes=16, cam_kw=None, size=SIZE, cam_translation=(0, 0, 0)):
    b = SceneBuilder()
    builder_fn(b)
    scene, meta = b.build()
    kw = dict(fov_deg=40.0)
    kw.update(cam_kw or {})
    cam = make_camera(RigidTransform(translation=cam_translation), **kw)
    vp = Viewport(
        scene, meta, cam,
        ViewportParams(width=size, height=size, seed=3),
        params,
    )
    vp.render(passes)
    return vp.radiance()


def assert_image_near(img, expected_rgb, tol):
    """ValidateBitmap analogue (`RaytracingTests.cpp:241-259`)."""
    expected = np.asarray(expected_rgb, np.float32)
    err = np.abs(img - expected).max()
    assert err <= tol, f"max err {err} > {tol}; mean={img.reshape(-1,3).mean(0)}"


@pytest.mark.parametrize("params", INTEGRATORS)
class TestAnalyticScenes:
    @pytest.mark.slow
    def test_empty_scene_is_black(self, params):
        """`RaytracingTests.cpp:263-285` — no geometry, no lights -> exact 0."""
        img = render(lambda b: b.default_material_id(), params, passes=2)
        assert_image_near(img, (0, 0, 0), 0.0)

    def test_background_only(self, params):
        """`RaytracingTests.cpp:287-315` — every pixel = background color."""
        bg = (0.2, 0.4, 0.8)
        img = render(
            lambda b: b.add_light(LightDesc(kind=T.LIGHT_BACKGROUND, color=bg)),
            params, passes=2,
        )
        assert_image_near(img, bg, 0.01)

    def test_furnace_diffuse(self, params):
        """`RaytracingTests.cpp:317-366` — diffuse sphere under a uniform env
        light, narrow-fov camera so the sphere fills the frame: every pixel
        converges to albedo * env (convex shape => single diffuse bounce)."""
        albedo, env = 0.7, 0.6

        def build(b):
            m = b.add_material(MaterialDesc(bsdf="diffuse", base_color=(albedo,) * 3))
            b.add_sphere(RigidTransform(), 1.0, m)
            b.add_light(LightDesc(kind=T.LIGHT_BACKGROUND, color=(env,) * 3))

        img = render(
            build, params, passes=96,
            cam_kw=dict(fov_deg=10.0), cam_translation=(0, 0, -3),
        )
        assert_image_near(img, (albedo * env,) * 3, 0.05)

    def test_emissive_sphere(self, params):
        """`RaytracingTests.cpp:368-419` — emissive-only sphere: exact emission
        color on the sphere, black elsewhere."""
        emission = (1.5, 0.5, 0.25)

        def build(b):
            m = b.add_material(
                MaterialDesc(bsdf="diffuse", base_color=(0, 0, 0), emission=emission)
            )
            b.add_sphere(RigidTransform(translation=(0, 0, 3)), 4.0, m)

        img = render(build, params, passes=4)
        assert_image_near(img, emission, 0.01)

    def test_furnace_metal(self, params):
        """`RaytracingTests.cpp:421-473` — perfect mirror (k -> inf) in a
        uniform furnace: sees the env through reflections."""
        env = 0.5

        def build(b):
            m = b.add_material(
                MaterialDesc(bsdf="metal", base_color=(1, 1, 1), ior=0.01, k=1e5)
            )
            b.add_sphere(RigidTransform(), 1.0, m)
            b.add_light(LightDesc(kind=T.LIGHT_BACKGROUND, color=(env,) * 3))

        img = render(
            build, params, passes=16,
            cam_kw=dict(fov_deg=10.0), cam_translation=(0, 0, -3),
        )
        assert_image_near(img, (env,) * 3, 0.02)

    def test_furnace_dielectric_energy(self, params):
        """`RaytracingTests.cpp:475-523` — clear glass sphere in a furnace:
        energy conservation => image ~= env everywhere."""
        env = 0.5

        def build(b):
            m = b.add_material(MaterialDesc(bsdf="dielectric", base_color=(1, 1, 1), ior=1.5))
            b.add_sphere(RigidTransform(translation=(0, 0, 3)), 1.0, m)
            b.add_light(LightDesc(kind=T.LIGHT_BACKGROUND, color=(env,) * 3))

        # the reference runs this with 1000 passes at the same 0.075 tolerance
        # (`RaytracingTests.cpp:475-523`); 256 passes is enough since the
        # Fresnel-stratified lobe choice keeps per-pixel variance low
        img = render(build, params, passes=256)
        assert_image_near(img, (env,) * 3, 0.075)


class TestLights:
    def test_point_light_inverse_square(self):
        """Diffuse wall + point light on the camera axis: direct lighting at
        the wall center matches the analytic I * cos / d^2 * albedo/pi."""
        intensity = 10.0
        albedo = 0.8

        def build(b):
            m = b.add_material(MaterialDesc(bsdf="diffuse", base_color=(albedo,) * 3))
            # wall at z=3 facing the camera (-Z normal via 180-degree pitch)
            b.add_rect(
                RigidTransform(translation=(0, 0, 3), euler_deg=(180, 0, 0)), (50, 50), m
            )
            b.add_light(
                LightDesc(
                    kind=T.LIGHT_POINT,
                    color=(intensity,) * 3,
                    transform=RigidTransform(translation=(0, 0, 1)),
                )
            )

        img = render(build, RenderParams(max_depth=3, mis=True), passes=32, size=32)
        # wall center: light distance d=2, normal incidence (cos=1)
        expected = intensity / (2.0**2) * albedo / np.pi
        center = img[16, 16]
        np.testing.assert_allclose(center, expected, rtol=0.1)

    @pytest.mark.slow
    def test_area_light_visible(self):
        """Area light is hit-testable geometry: camera sees its radiance
        (`SceneObject_Light.cpp:27-53`)."""
        radiance = (2.0, 1.0, 0.5)

        def build(b):
            b.add_light(
                LightDesc(
                    kind=T.LIGHT_AREA,
                    color=radiance,
                    transform=RigidTransform(translation=(0, 0, 3), euler_deg=(180, 0, 0)),
                    shape_kind=T.SHAPE_RECT,
                    shape_param=(2.0, 2.0, 0.0),
                )
            )

        img = render(build, RenderParams(max_depth=3, mis=True), passes=4)
        assert_image_near(img, radiance, 0.02)

    @pytest.mark.slow
    def test_mis_vs_naive_agree(self):
        """PT and PT+MIS must converge to the same image
        (`RaytracingTests.cpp:17-22` cross-integrator agreement)."""

        def build(b):
            m = b.add_material(MaterialDesc(bsdf="diffuse", base_color=(0.8, 0.8, 0.8)))
            b.add_rect(RigidTransform(translation=(0, -1, 3), euler_deg=(-90, 0, 0)), (20, 20), m)
            b.add_light(
                LightDesc(
                    kind=T.LIGHT_AREA,
                    color=(5.0,) * 3,
                    transform=RigidTransform(translation=(0, 2, 3), euler_deg=(0, 0, 0)),
                    shape_kind=T.SHAPE_RECT,
                    shape_param=(1.0, 1.0, 0.0),
                )
            )

        naive = render(build, RenderParams(max_depth=4, mis=False), passes=512)
        mis = render(build, RenderParams(max_depth=4, mis=True), passes=64)
        # compare mean over the floor region (MC noise dominates per-pixel)
        np.testing.assert_allclose(naive.mean(axis=(0, 1)), mis.mean(axis=(0, 1)), rtol=0.08)


class TestDeterminism:
    def test_bitwise_reproducible(self):
        def build(b):
            m = b.add_material(MaterialDesc(bsdf="diffuse", base_color=(0.8, 0.8, 0.8)))
            b.add_sphere(RigidTransform(translation=(0, 0, 3)), 1.0, m)
            b.add_light(LightDesc(kind=T.LIGHT_BACKGROUND, color=(0.5,) * 3))

        a = render(build, RenderParams(max_depth=4), passes=3)
        b_ = render(build, RenderParams(max_depth=4), passes=3)
        np.testing.assert_array_equal(a, b_)
