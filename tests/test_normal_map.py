"""Normal mapping: tangent-space perturbation of the shading frame.

Covers `Material::GetNormalVector` (`Core/Material/Material.cpp:120-138`)
and its application in `Scene::EvaluateIntersection`
(`Core/Scene/Scene.cpp:328-344`): fetch -> bipolar -> z-reconstruct -> lerp
by strength -> rotate into the tangent frame -> re-orthonormalize.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from raytracer_tpu.integrators.path_tracer import RenderParams
from raytracer_tpu.math.transform import RigidTransform
from raytracer_tpu.math.vec import Vec3, dot, cross
from raytracer_tpu.ops.materials import apply_normal_map
from raytracer_tpu.render.renderer import Viewport, ViewportParams
from raytracer_tpu.scene import types as T
from raytracer_tpu.scene.build import LightDesc, MaterialDesc, SceneBuilder
from raytracer_tpu.scene.camera import make_camera


def _flat_wall_scene(normal_tex, strength=1.0, tex_images=()):
    from raytracer_tpu.ops.textures import build_atlas

    b = SceneBuilder()
    if tex_images:
        b.textures = build_atlas(list(tex_images))
    m = b.add_material(MaterialDesc(
        bsdf="diffuse", base_color=(0.8, 0.8, 0.8),
        normal_tex=normal_tex, normal_strength=strength,
    ))
    b.add_rect(RigidTransform(translation=(0, 0, 4), euler_deg=(180, 0, 0)),
               (6.0, 6.0), m)
    # a directional light at a grazing angle makes shading normal-sensitive
    b.add_light(LightDesc(
        kind=T.LIGHT_DIRECTIONAL, color=(2.0, 2.0, 2.0),
        transform=RigidTransform(euler_deg=(45.0, 30.0, 0.0)),
    ))
    return b.build()


def _render(scene, meta, passes=24, size=12):
    cam = make_camera(RigidTransform(), fov_deg=30.0)
    vp = Viewport(scene, meta, cam, ViewportParams(width=size, height=size, seed=0),
                  RenderParams(max_depth=2, mis=True))
    vp.render(passes)
    return np.asarray(vp.radiance())


class TestApplyNormalMap:
    def _frame(self, scene, n=4):
        from raytracer_tpu.ops.intersect import PrimFrame

        z = jnp.zeros(n)
        return PrimFrame(
            position=Vec3(z, z, z),
            normal=Vec3(z, z, z + 1.0),
            tangent=Vec3(z + 1.0, z, z),
            bitangent=Vec3(z, z + 1.0, z),
            tex_u=z + 0.5, tex_v=z + 0.5,
            material_id=jnp.zeros(n, jnp.int32),
            light_id=jnp.full(n, -1, jnp.int32),
        )

    def test_flat_map_is_identity(self):
        """A (0.5, 0.5, 1) map encodes +Z: the frame must not change."""
        flat = np.full((4, 4, 3), 0.5, np.float32)
        flat[..., 2] = 1.0
        scene, meta = _flat_wall_scene(normal_tex=0, tex_images=[flat])
        f = self._frame(scene)
        g = apply_normal_map(scene, f)
        np.testing.assert_allclose(np.asarray(g.normal.z), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g.tangent.x), 1.0, atol=1e-5)

    def test_tilt_matches_reference_math(self):
        """Constant (0.75, 0.5, *) map tilts the normal by x=+0.5 in tangent
        space, z reconstructed as sqrt(1 - 0.25)."""
        tilt = np.zeros((4, 4, 3), np.float32)
        tilt[..., 0] = 0.75
        tilt[..., 1] = 0.5
        tilt[..., 2] = 0.0  # z is reconstructed, not read
        scene, meta = _flat_wall_scene(normal_tex=0, tex_images=[tilt])
        f = self._frame(scene)
        g = apply_normal_map(scene, f)
        expect = np.array([0.5, 0.0, np.sqrt(1 - 0.25)])
        expect /= np.linalg.norm(expect)
        np.testing.assert_allclose(np.asarray(g.normal.x), expect[0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(g.normal.z), expect[2], atol=1e-5)
        # frame stays orthonormal
        tn = np.asarray(dot(g.tangent, g.normal))
        np.testing.assert_allclose(tn, 0.0, atol=1e-5)
        b2 = cross(g.normal, g.tangent)
        np.testing.assert_allclose(np.asarray(b2.x), np.asarray(g.bitangent.x), atol=1e-5)

    def test_strength_zero_is_identity(self):
        tilt = np.zeros((4, 4, 3), np.float32)
        tilt[..., 0] = 1.0
        scene, meta = _flat_wall_scene(normal_tex=0, strength=0.0, tex_images=[tilt])
        f = self._frame(scene)
        g = apply_normal_map(scene, f)
        np.testing.assert_allclose(np.asarray(g.normal.z), 1.0, atol=1e-5)

    def test_no_map_lanes_untouched(self):
        """Materials without a normal texture keep their geometric frame even
        when the scene has textures."""
        tilt = np.full((4, 4, 3), 0.9, np.float32)
        scene, meta = _flat_wall_scene(normal_tex=T.INVALID_ID, tex_images=[tilt])
        f = self._frame(scene)
        g = apply_normal_map(scene, f)
        np.testing.assert_allclose(np.asarray(g.normal.z), 1.0, atol=1e-6)


class TestNormalMapRender:
    @pytest.mark.slow
    def test_tilted_map_changes_lighting(self):
        """Under grazing directional light, tilting normals changes the wall
        brightness vs the flat map — the map must be live in shading."""
        flat = np.full((4, 4, 3), 0.5, np.float32)
        flat[..., 2] = 1.0
        tilt = np.zeros((4, 4, 3), np.float32)
        tilt[..., 0] = 0.95
        tilt[..., 1] = 0.5

        s0, m0 = _flat_wall_scene(normal_tex=0, tex_images=[flat])
        s1, m1 = _flat_wall_scene(normal_tex=0, tex_images=[tilt])
        img0 = _render(s0, m0).mean()
        img1 = _render(s1, m1).mean()
        assert abs(img1 - img0) / max(img0, 1e-9) > 0.15, (img0, img1)
