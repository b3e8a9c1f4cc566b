"""VCM integration tests — cross-agreement of all integrator families on one
scene (`RaytracingTests.cpp:17-22` pattern: PT MIS vs VCM vs its VC/VM-only
modes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracer_tpu.integrators.path_tracer import RenderParams
from raytracer_tpu.integrators.vcm import VcmParams, render_pass_vcm
from raytracer_tpu.math.transform import RigidTransform
from raytracer_tpu.render.film import average_radiance, make_film
from raytracer_tpu.render.renderer import Viewport, ViewportParams
from raytracer_tpu.scene import types as T
from raytracer_tpu.scene.build import LightDesc, MaterialDesc, SceneBuilder
from raytracer_tpu.scene.camera import make_camera

import pytest

pytestmark = pytest.mark.slow  # full-render / FD-gradient suite: smoke tier skips it

SIZE = 24
PASSES = 160


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


@pytest.fixture(scope="module")
def mis_reference():
    scene, meta = _scene()
    cam = make_camera(RigidTransform(), fov_deg=40.0)
    vp = Viewport(
        scene, meta, cam,
        ViewportParams(width=SIZE, height=SIZE, seed=3),
        RenderParams(max_depth=6, mis=True),
    )
    vp.render(PASSES)
    return scene, meta, cam, vp.radiance()


def _run_vcm(scene, meta, cam, vcm, passes=PASSES):
    vp_params = ViewportParams(width=SIZE, height=SIZE, seed=3)
    params = RenderParams(max_depth=6, mis=True)
    film = make_film(SIZE, SIZE)
    fn = jax.jit(
        lambda s, c, f, p: render_pass_vcm(s, meta, c, f, p, None, vp_params, params, vcm)
    )
    for i in range(passes):
        film = fn(scene, cam, film, jnp.int32(i))
    return np.asarray(average_radiance(film))


class TestVcmAgreement:
    def test_bdpt_matches_mis(self, mis_reference):
        """Vertex connection only (= bidirectional path tracing)."""
        scene, meta, cam, mis_img = mis_reference
        img = _run_vcm(scene, meta, cam, VcmParams(max_path_length=6, use_vertex_merging=False))
        np.testing.assert_allclose(img.mean(), mis_img.mean(), rtol=0.03)

    def test_photon_mapping_matches_mis(self, mis_reference):
        """Vertex merging only (= progressive photon mapping; radius-biased)."""
        scene, meta, cam, mis_img = mis_reference
        img = _run_vcm(
            scene, meta, cam,
            VcmParams(max_path_length=6, use_vertex_connection=False, initial_radius=0.05),
        )
        np.testing.assert_allclose(img.mean(), mis_img.mean(), rtol=0.05)

    def test_full_vcm_matches_mis(self, mis_reference):
        scene, meta, cam, mis_img = mis_reference
        img = _run_vcm(scene, meta, cam, VcmParams(max_path_length=6, initial_radius=0.05))
        np.testing.assert_allclose(img.mean(), mis_img.mean(), rtol=0.03)
        # per-pixel structure agrees too (generous: MC noise at these counts)
        np.testing.assert_allclose(img.mean(axis=(0, 1)), mis_img.mean(axis=(0, 1)), rtol=0.05)
