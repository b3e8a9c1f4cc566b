"""Math-layer unit tests — the analogue of the reference's MathVector4Test /
MathQuaternionTest / MathGeometryTest suites (SURVEY §4.1)."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer_tpu.math.vec import (
    Vec3, cross, dot, length, normalize, reflect, refract, where as vwhere,
)
from raytracer_tpu.math.sampling import build_onb, local_to_world, world_to_local
from raytracer_tpu.math.transform import RigidTransform, quat_to_matrix3, quat_from_euler_deg


def _rand_vec(n, seed=0, lo=-1.0, hi=1.0):
    rng = np.random.default_rng(seed)
    a = rng.uniform(lo, hi, (3, n)).astype(np.float32)
    return Vec3(jnp.asarray(a[0]), jnp.asarray(a[1]), jnp.asarray(a[2]))


class TestVec3:
    def test_arithmetic(self):
        a = Vec3(jnp.float32(1), jnp.float32(2), jnp.float32(3))
        b = Vec3(jnp.float32(4), jnp.float32(5), jnp.float32(6))
        s = a + b
        assert (float(s.x), float(s.y), float(s.z)) == (5, 7, 9)
        d = b - a
        assert (float(d.x), float(d.y), float(d.z)) == (3, 3, 3)
        m = a * b
        assert (float(m.x), float(m.y), float(m.z)) == (4, 10, 18)
        q = b / a
        np.testing.assert_allclose([float(q.x), float(q.y), float(q.z)], [4, 2.5, 2])

    def test_dot_cross(self):
        x = Vec3(jnp.float32(1), jnp.float32(0), jnp.float32(0))
        y = Vec3(jnp.float32(0), jnp.float32(1), jnp.float32(0))
        z = cross(x, y)
        assert (float(z.x), float(z.y), float(z.z)) == (0, 0, 1)
        assert float(dot(x, y)) == 0.0

    def test_normalize(self):
        v = _rand_vec(128, seed=1)
        n = normalize(v, eps=1e-20)
        np.testing.assert_allclose(np.asarray(length(n)), 1.0, atol=1e-5)

    def test_reflect(self):
        # i pointing into surface, n up: r = i - 2*dot(i,n)*n
        i = Vec3(jnp.float32(1), jnp.float32(-1), jnp.float32(0))
        n = Vec3(jnp.float32(0), jnp.float32(1), jnp.float32(0))
        r = reflect(i, n)
        np.testing.assert_allclose([float(r.x), float(r.y), float(r.z)], [1, 1, 0], atol=1e-6)

    def test_refract_straight_through(self):
        # normal incidence, eta=1 -> unchanged
        i = Vec3(jnp.float32(0), jnp.float32(-1), jnp.float32(0))
        n = Vec3(jnp.float32(0), jnp.float32(1), jnp.float32(0))
        t = refract(i, n, jnp.float32(1.0))
        np.testing.assert_allclose([float(t.x), float(t.y), float(t.z)], [0, -1, 0], atol=1e-6)

    def test_refract_snell(self):
        # 45 degrees into glass (eta = 1/1.5 entering)
        s = np.sin(np.deg2rad(45.0))
        i = Vec3(jnp.float32(s), jnp.float32(-s), jnp.float32(0))
        n = Vec3(jnp.float32(0), jnp.float32(1), jnp.float32(0))
        t = refract(i, n, jnp.float32(1.5))  # eta = material IoR
        sin_out = float(t.x)
        np.testing.assert_allclose(sin_out, s / 1.5, atol=1e-5)

    def test_where(self):
        a = Vec3.full(jnp.asarray([1.0, 1.0]))
        b = Vec3.full(jnp.asarray([2.0, 2.0]))
        m = jnp.asarray([True, False])
        r = vwhere(m, a, b)
        np.testing.assert_allclose(np.asarray(r.x), [1.0, 2.0])


class TestONB:
    def test_orthonormal(self):
        n = normalize(_rand_vec(256, seed=2), eps=1e-20)
        t, b = build_onb(n)
        np.testing.assert_allclose(np.asarray(dot(t, n)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dot(b, n)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dot(t, b)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(length(t)), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(length(b)), 1.0, atol=1e-5)

    def test_degenerate_down_normal(self):
        n = Vec3(jnp.float32(0), jnp.float32(0), jnp.float32(-1))
        t, b = build_onb(n)
        assert np.isfinite(float(t.x)) and np.isfinite(float(b.y))

    def test_roundtrip(self):
        n = normalize(_rand_vec(64, seed=3), eps=1e-20)
        t, b = build_onb(n)
        v = normalize(_rand_vec(64, seed=4), eps=1e-20)
        v2 = local_to_world(world_to_local(v, t, b, n), t, b, n)
        np.testing.assert_allclose(np.asarray(v2.x), np.asarray(v.x), atol=1e-5)
        np.testing.assert_allclose(np.asarray(v2.y), np.asarray(v.y), atol=1e-5)


class TestTransform:
    def test_identity(self):
        t = RigidTransform()
        np.testing.assert_allclose(t.rot, np.eye(3), atol=1e-12)

    def test_rotation_rows_orthonormal(self):
        t = RigidTransform(euler_deg=(30.0, 45.0, 60.0))
        np.testing.assert_allclose(t.rot @ t.rot.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(t.rot), 1.0, atol=1e-12)

    def test_yaw_90(self):
        # yaw 90 about Y: local +Z axis -> world +X (row-vector convention,
        # matching Quaternion::FromEulerAngles + ToMatrix4 in the reference)
        t = RigidTransform(euler_deg=(0.0, 90.0, 0.0))
        fwd = t.rot[2]
        np.testing.assert_allclose(np.abs(fwd), [1.0, 0.0, 0.0], atol=1e-12)

    def test_point_roundtrip(self):
        t = RigidTransform(translation=(1, 2, 3), euler_deg=(10, 20, 30), scale=2.0)
        p = np.array([0.3, -0.7, 1.1])
        np.testing.assert_allclose(t.inverse_transform_point(t.transform_point(p)), p, atol=1e-12)
