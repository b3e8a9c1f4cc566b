"""Packed format codecs: error-budget sweeps (`Tests/MathPackedTest.cpp`)."""

import numpy as np
import jax.numpy as jnp

from raytracer_tpu.math.packed import (
    half_decode,
    half_encode,
    oct_decode,
    oct_encode,
    r11g11b10_decode,
    r11g11b10_encode,
    rgb_to_ycocg,
    rgbe_decode,
    rgbe_encode,
    ycocg_to_rgb,
)
from raytracer_tpu.math.vec import Vec3


def _random_unit(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return Vec3(*(jnp.asarray(v[:, i], jnp.float32) for i in range(3)))


def _vec_np(v: Vec3):
    return np.stack([np.asarray(v.x), np.asarray(v.y), np.asarray(v.z)], -1)


class TestOctahedral:
    def test_roundtrip_error_budget(self):
        v = _random_unit(20_000)
        d = oct_decode(oct_encode(v))
        dots = np.asarray(v.x * d.x + v.y * d.y + v.z * d.z)
        angle = np.degrees(np.arccos(np.clip(dots, -1, 1)))
        assert angle.max() < 0.05  # 16-bit octahedral: ~0.01 deg typical

    def test_axes_exact_directions(self):
        axes = Vec3(
            jnp.asarray([1.0, -1.0, 0.0, 0.0, 0.0, 0.0]),
            jnp.asarray([0.0, 0.0, 1.0, -1.0, 0.0, 0.0]),
            jnp.asarray([0.0, 0.0, 0.0, 0.0, 1.0, -1.0]),
        )
        d = _vec_np(oct_decode(oct_encode(axes)))
        np.testing.assert_allclose(d, _vec_np(axes), atol=1e-3)


class TestHalf:
    def test_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(1).uniform(-1000, 1000, 4096), jnp.float32)
        y = half_decode(half_encode(x))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-3)


class TestRgbe:
    def test_hdr_roundtrip_relative_error(self):
        rng = np.random.default_rng(2)
        c = Vec3(*(jnp.asarray(rng.uniform(0, 1, 8192) * 10.0 ** rng.uniform(-3, 3, 8192),
                               jnp.float32) for _ in range(3)))
        d = rgbe_decode(rgbe_encode(c))
        for a, b in ((c.x, d.x), (c.y, d.y), (c.z, d.z)):
            a, b = np.asarray(a), np.asarray(b)
            m = np.maximum(np.asarray(jnp.maximum(jnp.maximum(c.x, c.y), c.z)), 1e-30)
            assert (np.abs(a - b) / m).max() < 0.01  # 8-bit mantissa vs max channel

    def test_zero_is_exact(self):
        z = Vec3(jnp.zeros(4), jnp.zeros(4), jnp.zeros(4))
        d = rgbe_decode(rgbe_encode(z))
        np.testing.assert_array_equal(_vec_np(d), 0.0)


class TestYCoCg:
    def test_exact_roundtrip(self):
        rng = np.random.default_rng(3)
        c = Vec3(*(jnp.asarray(rng.uniform(0, 4, 4096), jnp.float32) for _ in range(3)))
        d = ycocg_to_rgb(rgb_to_ycocg(c))
        np.testing.assert_allclose(_vec_np(d), _vec_np(c), atol=1e-5)


class TestR11G11B10:
    def test_roundtrip_error_budget(self):
        rng = np.random.default_rng(4)
        c = Vec3(*(jnp.asarray(rng.uniform(0, 1, 8192) * 10.0 ** rng.uniform(-2, 2, 8192),
                               jnp.float32) for _ in range(3)))
        d = r11g11b10_decode(r11g11b10_encode(c))
        # 6-bit mantissa => ~1.6% max relative error; blue 5-bit => ~3.2%;
        # sub-normal-range values flush to zero
        for a, b, tol in ((c.x, d.x, 0.017), (c.y, d.y, 0.017), (c.z, d.z, 0.033)):
            a, b = np.asarray(a), np.asarray(b)
            normal = a >= 2.0 ** -14
            rel = np.abs(a[normal] - b[normal]) / np.maximum(a[normal], 1e-20)
            assert rel.max() < tol
            assert (b[~normal] == 0.0).all()
