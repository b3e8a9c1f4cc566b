"""Mesh (BVH) rendering integration: triangle geometry through the full
integrator, and mixed prim+mesh scenes."""

import numpy as np
import pytest
import jax.numpy as jnp

from raytracer_tpu.integrators.path_tracer import RenderParams
from raytracer_tpu.math.transform import RigidTransform
from raytracer_tpu.render.renderer import Viewport, ViewportParams
from raytracer_tpu.scene import types as T
from raytracer_tpu.scene.build import LightDesc, MaterialDesc, SceneBuilder
from raytracer_tpu.scene.camera import make_camera


def _quad_mesh(builder, material_id, z=3.0, half=2.0):
    """Two triangles forming a quad facing -Z at depth z."""
    v = np.array(
        [[-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z]],
        np.float32,
    )
    idx = np.array([[0, 2, 1], [0, 3, 2]], np.int64)
    n = np.tile(np.array([0, 0, -1.0], np.float32), (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    builder.add_mesh(v, idx, n, uv, np.full(2, material_id))


def test_emissive_mesh_quad():
    """Camera sees an emissive mesh quad -> exact emission color."""
    emission = (2.0, 1.0, 0.5)
    b = SceneBuilder()
    m = b.add_material(MaterialDesc(bsdf="diffuse", base_color=(0, 0, 0), emission=emission))
    _quad_mesh(b, m)
    scene, meta = b.build()
    assert scene.tris is not None and scene.bvh is not None
    cam = make_camera(RigidTransform(), fov_deg=30.0)
    vp = Viewport(scene, meta, cam, ViewportParams(width=16, height=16, seed=2),
                  RenderParams(max_depth=3))
    vp.render(4)
    img = vp.radiance()
    expected = np.broadcast_to(np.asarray(emission, np.float32), img.shape)
    np.testing.assert_allclose(img, expected, atol=0.01)


def test_mesh_diffuse_furnace():
    """Diffuse mesh quad under uniform env: quad pixels = albedo*env + env
    seen through? No — quad blocks: facing pixels converge to albedo*env."""
    albedo, env = 0.6, 0.5
    b = SceneBuilder()
    m = b.add_material(MaterialDesc(bsdf="diffuse", base_color=(albedo,) * 3))
    _quad_mesh(b, m, z=3.0, half=20.0)
    b.add_light(LightDesc(kind=T.LIGHT_BACKGROUND, color=(env,) * 3))
    scene, meta = b.build()
    cam = make_camera(RigidTransform(), fov_deg=30.0)
    vp = Viewport(scene, meta, cam, ViewportParams(width=16, height=16, seed=2),
                  RenderParams(max_depth=4, mis=True))
    vp.render(64)
    img = vp.radiance()
    np.testing.assert_allclose(img, albedo * env, atol=0.05)


def test_mesh_shadowing_prims():
    """Mesh quad occludes the point light for a prim wall behind it:
    exercises bvh_any_hit inside NEE shadow rays."""
    b = SceneBuilder()
    wall_m = b.add_material(MaterialDesc(bsdf="diffuse", base_color=(0.8, 0.8, 0.8)))
    blocker_m = b.add_material(MaterialDesc(bsdf="diffuse", base_color=(0.1, 0.1, 0.1)))
    # prim wall at z=6 facing camera
    b.add_rect(RigidTransform(translation=(0, 0, 6), euler_deg=(180, 0, 0)), (10, 10), wall_m)
    # small mesh blocker quad between light and wall
    _quad_mesh(b, blocker_m, z=3.0, half=0.5)
    b.add_light(
        LightDesc(kind=T.LIGHT_POINT, color=(20.0,) * 3,
                  transform=RigidTransform(translation=(0, 0, 0)))
    )
    scene, meta = b.build()
    cam = make_camera(RigidTransform(translation=(0, 3.0, 0.0), euler_deg=(45, 0, 0)), fov_deg=60.0)
    vp = Viewport(scene, meta, cam, ViewportParams(width=32, height=32, seed=4),
                  RenderParams(max_depth=2, mis=True))
    vp.render(8)
    img = vp.radiance()
    # the wall region directly behind the blocker must be darker than the
    # unshadowed wall
    assert img.max() > 0.05  # lit wall visible
    assert img.min() < img.max() * 0.5  # shadow present


@pytest.mark.slow
def test_mesh_gradients_flow():
    """grad of image sum w.r.t. material base_color through the BVH path
    (traversal detached, shading differentiable)."""
    import jax

    albedo, env = 0.6, 0.5
    b = SceneBuilder()
    m = b.add_material(MaterialDesc(bsdf="diffuse", base_color=(albedo,) * 3))
    _quad_mesh(b, m, z=3.0, half=20.0)
    b.add_light(LightDesc(kind=T.LIGHT_BACKGROUND, color=(env,) * 3))
    scene, meta = b.build()
    cam = make_camera(RigidTransform(), fov_deg=30.0)

    from raytracer_tpu.render.renderer import ViewportParams, trace_rows
    vp = ViewportParams(width=8, height=8, seed=0)
    params = RenderParams(max_depth=3, mis=True)

    def mean_radiance(base_color):
        s = scene._replace(materials=scene.materials._replace(base_color=base_color))
        radiance, _ = trace_rows(s, meta, cam, jnp.int32(0), None, vp, params)
        return jnp.mean(radiance.x + radiance.y + radiance.z)

    g = jax.grad(mean_radiance)(scene.materials.base_color)
    gx = float(g.x[0])
    assert np.isfinite(gx) and gx > 0.0  # brighter albedo -> brighter image
