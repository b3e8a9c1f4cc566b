"""Analytic primitive intersection tests (model: MathGeometryTest, SURVEY §4.1)."""

import numpy as np
import jax.numpy as jnp

from raytracer_tpu.math.transform import RigidTransform
from raytracer_tpu.math.vec import Vec3
from raytracer_tpu.ops.intersect import BIG, eval_prim_frame, intersect_prims, occluded_prims
from raytracer_tpu.scene import types as T
from raytracer_tpu.scene.build import MaterialDesc, SceneBuilder


def _scene_with(*adds):
    b = SceneBuilder()
    mid = b.add_material(MaterialDesc())
    for fn in adds:
        fn(b, mid)
    scene, meta = b.build()
    return scene


def _ray(o, d):
    o = np.asarray(o, np.float32)
    d = np.asarray(d, np.float32)
    d = d / np.linalg.norm(d)
    return (
        Vec3(*(jnp.asarray([v]) for v in o)),
        Vec3(*(jnp.asarray([v]) for v in d)),
    )


class TestSphere:
    def test_hit_distance(self):
        s = _scene_with(lambda b, m: b.add_sphere(RigidTransform(translation=(0, 0, 5)), 1.0, m))
        o, d = _ray((0, 0, 0), (0, 0, 1))
        t, pid = intersect_prims(s.prims, o, d, jnp.asarray([BIG]))
        np.testing.assert_allclose(float(t[0]), 4.0, atol=1e-5)
        assert int(pid[0]) == 0

    def test_miss(self):
        s = _scene_with(lambda b, m: b.add_sphere(RigidTransform(translation=(0, 0, 5)), 1.0, m))
        o, d = _ray((0, 3, 0), (0, 0, 1))
        t, pid = intersect_prims(s.prims, o, d, jnp.asarray([BIG]))
        assert float(t[0]) >= float(BIG) and int(pid[0]) == -1

    def test_inside_hits_backface(self):
        s = _scene_with(lambda b, m: b.add_sphere(RigidTransform(), 2.0, m))
        o, d = _ray((0, 0, 0), (0, 0, 1))
        t, pid = intersect_prims(s.prims, o, d, jnp.asarray([BIG]))
        np.testing.assert_allclose(float(t[0]), 2.0, atol=1e-5)

    def test_normal_outward(self):
        s = _scene_with(lambda b, m: b.add_sphere(RigidTransform(translation=(0, 0, 5)), 1.0, m))
        o, d = _ray((0, 0, 0), (0, 0, 1))
        t, pid = intersect_prims(s.prims, o, d, jnp.asarray([BIG]))
        fr = eval_prim_frame(s.prims, pid, o, d, t)
        np.testing.assert_allclose(
            [float(fr.normal.x[0]), float(fr.normal.y[0]), float(fr.normal.z[0])],
            [0, 0, -1], atol=1e-5,
        )


class TestBox:
    def test_face_hit(self):
        s = _scene_with(lambda b, m: b.add_box(RigidTransform(translation=(0, 0, 4)), (1, 2, 0.5), m))
        o, d = _ray((0, 0, 0), (0, 0, 1))
        t, pid = intersect_prims(s.prims, o, d, jnp.asarray([BIG]))
        np.testing.assert_allclose(float(t[0]), 3.5, atol=1e-5)
        fr = eval_prim_frame(s.prims, pid, o, d, t)
        np.testing.assert_allclose(float(fr.normal.z[0]), -1.0, atol=1e-5)

    def test_rotated_box(self):
        # 45-degree yaw: ray along +Z hits the edge-on corner at sqrt(2)-closer
        s = _scene_with(
            lambda b, m: b.add_box(RigidTransform(translation=(0, 0, 4), euler_deg=(0, 45, 0)), (1, 1, 1), m)
        )
        o, d = _ray((0, 0, 0), (0, 0, 1))
        t, pid = intersect_prims(s.prims, o, d, jnp.asarray([BIG]))
        np.testing.assert_allclose(float(t[0]), 4.0 - np.sqrt(2.0), atol=1e-4)


class TestRect:
    def test_hit(self):
        # rect local +Z normal; rotate so it faces the origin
        s = _scene_with(
            lambda b, m: b.add_rect(RigidTransform(translation=(0, 0, 3), euler_deg=(180, 0, 0)), (2, 2), m)
        )
        o, d = _ray((0.5, 0.5, 0), (0, 0, 1))
        t, pid = intersect_prims(s.prims, o, d, jnp.asarray([BIG]))
        np.testing.assert_allclose(float(t[0]), 3.0, atol=1e-5)

    def test_outside_bounds_misses(self):
        s = _scene_with(
            lambda b, m: b.add_rect(RigidTransform(translation=(0, 0, 3), euler_deg=(180, 0, 0)), (1, 1), m)
        )
        o, d = _ray((1.5, 0, 0), (0, 0, 1))
        t, _ = intersect_prims(s.prims, o, d, jnp.asarray([BIG]))
        assert float(t[0]) >= float(BIG)


class TestClosestAndShadow:
    def test_closest_of_two(self):
        s = _scene_with(
            lambda b, m: b.add_sphere(RigidTransform(translation=(0, 0, 8)), 1.0, m),
            lambda b, m: b.add_sphere(RigidTransform(translation=(0, 0, 4)), 1.0, m),
        )
        o, d = _ray((0, 0, 0), (0, 0, 1))
        t, pid = intersect_prims(s.prims, o, d, jnp.asarray([BIG]))
        np.testing.assert_allclose(float(t[0]), 3.0, atol=1e-5)
        assert int(pid[0]) == 1

    def test_occlusion(self):
        s = _scene_with(lambda b, m: b.add_sphere(RigidTransform(translation=(0, 0, 5)), 1.0, m))
        o, d = _ray((0, 0, 0), (0, 0, 1))
        assert bool(occluded_prims(s.prims, o, d, jnp.asarray([10.0]))[0])
        assert not bool(occluded_prims(s.prims, o, d, jnp.asarray([3.0]))[0])
