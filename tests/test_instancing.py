"""Two-level structure: shared object-space meshes + instance transforms.

Covers the analogue of the reference's top-level BVH over object AABBs with
per-leaf ray transforms into object space (`Core/Scene/Scene.cpp:128-145`,
`SceneObject.h:22-55` `GetTransform(time)`): geometry is stored once per
mesh, instances are rigid transforms (+ shutter velocity for mesh motion
blur).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from raytracer_tpu.integrators.path_tracer import RenderParams
from raytracer_tpu.math.transform import RigidTransform
from raytracer_tpu.render.renderer import Viewport, ViewportParams
from raytracer_tpu.scene import types as T
from raytracer_tpu.scene.build import LightDesc, MaterialDesc, SceneBuilder
from raytracer_tpu.scene.camera import make_camera


def _pyramid(size=1.0):
    """A small 4-face pyramid mesh (object space, apex +Y)."""
    v = np.array(
        [[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1], [0, 1.5, 0]], np.float64
    ) * size
    f = np.array([[0, 1, 4], [1, 2, 4], [2, 3, 4], [3, 0, 4]], np.int64)
    # flat-ish normals: use the apex-weighted vertex normals
    n = np.zeros_like(v)
    for a, b, c in f:
        fn = np.cross(v[b] - v[a], v[c] - v[a])
        for k in (a, b, c):
            n[k] += fn
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    return v, f, n


def _render(build_fn, passes=16, size=24, mb=0.0):
    b = SceneBuilder()
    build_fn(b)
    scene, meta = b.build()
    cam = make_camera(
        RigidTransform(translation=(0.0, 1.0, -7.0)), fov_deg=45.0
    )
    vp = Viewport(
        scene, meta, cam,
        ViewportParams(width=size, height=size, seed=0, motion_blur_strength=mb),
        RenderParams(max_depth=3, mis=True),
    )
    vp.render(passes)
    return np.asarray(vp.radiance()), scene


def _common_lights(b):
    b.add_light(LightDesc(kind=T.LIGHT_BACKGROUND, color=(0.7, 0.8, 0.9)))
    b.add_light(LightDesc(
        kind=T.LIGHT_DIRECTIONAL, color=(2.5, 2.4, 2.2),
        transform=RigidTransform(euler_deg=(50.0, 20.0, 0.0)),
    ))


PLACES = [((-1.6, 0.0, 0.5), 30.0), ((1.4, 0.3, 1.0), -45.0), ((0.0, -0.4, 2.0), 120.0)]


class TestInstancing:
    @pytest.mark.slow
    def test_instanced_matches_baked(self):
        """Three instances of one pyramid must render like three baked
        copies of the same geometry (same transforms)."""
        v, f, n = _pyramid()

        def baked(b):
            m = b.add_material(MaterialDesc(bsdf="diffuse", base_color=(0.7, 0.5, 0.3)))
            _common_lights(b)
            for t, yaw in PLACES:
                b.add_mesh(v, f, n, None, np.full(len(f), m),
                           transform=RigidTransform(translation=t, euler_deg=(0, yaw, 0)))

        def instanced(b):
            m = b.add_material(MaterialDesc(bsdf="diffuse", base_color=(0.7, 0.5, 0.3)))
            _common_lights(b)
            mid = b.add_mesh_geometry(v, f, n, None, np.full(len(f), m))
            for t, yaw in PLACES:
                b.add_mesh_instance(mid, RigidTransform(translation=t, euler_deg=(0, yaw, 0)))

        img_b, scene_b = _render(baked)
        img_i, scene_i = _render(instanced)
        # geometry stored ONCE: 4 triangles regardless of 3 instances
        assert scene_i.mesh_geoms[0].tris.count == len(f)
        assert scene_b.tris.count == 3 * len(f)
        assert scene_i.tris is None
        # same image up to edge-pixel f32 round-off: baked transforms the
        # VERTICES, instancing transforms the RAYS, so grazing hits at
        # silhouettes may flip — compare robustly (mean + 95th percentile)
        diff = np.abs(img_i - img_b).max(-1)
        assert np.percentile(diff, 95) < 1e-3, np.percentile(diff, 95)
        assert abs(img_i.mean() - img_b.mean()) / img_b.mean() < 5e-3

    def test_instances_share_storage(self):
        v, f, n = _pyramid()

        def build(b):
            m = b.add_material(MaterialDesc())
            _common_lights(b)
            mid = b.add_mesh_geometry(v, f, n, None, np.full(len(f), m))
            for i in range(8):
                b.add_mesh_instance(mid, RigidTransform(translation=(i - 4.0, 0, 1)))

        _, scene = _render(build, passes=2, size=8)
        assert len(scene.mesh_geoms) == 1
        assert scene.instances.count == 8
        assert scene.mesh_geoms[0].tris.count == len(f)

    @pytest.mark.slow
    def test_motion_blur_streaks(self):
        """A fast-moving instance must smear along its velocity under an
        open shutter and stay sharp with motion blur off."""
        v, f, n = _pyramid(1.2)

        def build(vel):
            def fn(b):
                m = b.add_material(MaterialDesc(bsdf="diffuse", base_color=(0.9, 0.2, 0.1)))
                _common_lights(b)
                mid = b.add_mesh_geometry(v, f, n, None, np.full(len(f), m))
                b.add_mesh_instance(mid, RigidTransform(translation=(-1.5, 0.3, 1.0)),
                                    velocity=vel)
            return fn

        def empty(b):
            _common_lights(b)

        bg, _ = _render(empty, passes=32, size=32, mb=1.0)
        static, _ = _render(build((0.0, 0.0, 0.0)), passes=32, size=32, mb=1.0)
        moving, _ = _render(build((3.0, 0.0, 0.0)), passes=32, size=32, mb=1.0)
        # columns the pyramid touches (deviation from the background-only
        # render): the streak must occupy clearly more columns
        occ = lambda img: (np.abs(img - bg).max(-1).mean(0) > 0.02).sum()
        occ_s, occ_m = occ(static), occ(moving)
        assert occ_m > occ_s * 1.4, (occ_s, occ_m)
