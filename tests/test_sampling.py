"""Statistical sampling tests — analogue of MathDistributionTest / RandomTest
(SURVEY §4.3): empirical moments and pdf consistency of the mapping helpers,
plus determinism of the counter-based sample streams."""

import numpy as np
import jax.numpy as jnp

from raytracer_tpu.math import sampling
from raytracer_tpu.math.vec import dot, length
from raytracer_tpu.sampler.sampler import (
    halton_frame_vector, hash_u32, make_stream, next_1d, next_2d, radical_inverse,
    u32_to_unit_float,
)

N = 1 << 14


def _uniforms(seed, n=N):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random(n, dtype=np.float32)), jnp.asarray(rng.random(n, dtype=np.float32))


class TestMappings:
    def test_sphere_uniform(self):
        u1, u2 = _uniforms(0)
        d = sampling.sample_sphere(u1, u2)
        np.testing.assert_allclose(np.asarray(length(d)), 1.0, atol=1e-5)
        # each component has mean 0 and variance 1/3 on the unit sphere
        for c in (d.x, d.y, d.z):
            assert abs(float(jnp.mean(c))) < 0.02
            np.testing.assert_allclose(float(jnp.mean(c * c)), 1.0 / 3.0, atol=0.01)

    def test_hemisphere_cos_mean(self):
        u1, u2 = _uniforms(1)
        d = sampling.sample_hemisphere_cos(u1, u2)
        assert float(jnp.min(d.z)) >= 0.0
        # E[cos theta] = 2/3 under pdf cos/pi
        np.testing.assert_allclose(float(jnp.mean(d.z)), 2.0 / 3.0, atol=0.01)

    def test_hemisphere_uniform(self):
        u1, u2 = _uniforms(2)
        d = sampling.sample_hemisphere(u1, u2)
        assert float(jnp.min(d.z)) >= 0.0
        # E[cos theta] = 1/2 under uniform hemisphere
        np.testing.assert_allclose(float(jnp.mean(d.z)), 0.5, atol=0.01)

    def test_circle_uniform(self):
        u1, u2 = _uniforms(3)
        x, y = sampling.sample_circle(u1, u2)
        r2 = np.asarray(x * x + y * y)
        assert r2.max() <= 1.0 + 1e-6
        # E[r^2] = 1/2 for uniform disc
        np.testing.assert_allclose(r2.mean(), 0.5, atol=0.01)

    def test_triangle_barycentric(self):
        u1, u2 = _uniforms(4)
        u, v = sampling.sample_triangle_barycentric(u1, u2)
        un, vn = np.asarray(u), np.asarray(v)
        assert (un >= 0).all() and (vn >= 0).all() and (un + vn <= 1.0 + 1e-6).all()
        # uniform triangle: E[u] = E[v] = 1/3
        np.testing.assert_allclose(un.mean(), 1.0 / 3.0, atol=0.01)
        np.testing.assert_allclose(vn.mean(), 1.0 / 3.0, atol=0.01)

    def test_cone_bounds(self):
        u1, u2 = _uniforms(5)
        cos_max = 0.8
        d = sampling.sample_cone(jnp.float32(cos_max), u1, u2)
        assert float(jnp.min(d.z)) >= cos_max - 1e-6
        # E[cos] = (1+cos_max)/2 for uniform-in-cap
        np.testing.assert_allclose(float(jnp.mean(d.z)), (1 + cos_max) / 2, atol=0.01)

    def test_gaussian2(self):
        u1, u2 = _uniforms(6)
        x, y = sampling.sample_gaussian2(jnp.maximum(u1, 1e-7), u2)
        assert abs(float(jnp.mean(x))) < 0.03
        np.testing.assert_allclose(float(jnp.mean(x * x)), 1.0, atol=0.05)
        np.testing.assert_allclose(float(jnp.mean(y * y)), 1.0, atol=0.05)


class TestHalton:
    def test_radical_inverse_base2(self):
        # classic van der Corput sequence in base 2
        vals = [radical_inverse(i, 2) for i in range(1, 8)]
        np.testing.assert_allclose(vals, [0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875])

    def test_frame_vector_low_discrepancy(self):
        # first dimension over 256 passes must be much more uniform than iid:
        # max gap of scrambled base-2 radical inverse is 1/N-ish
        xs = np.sort([halton_frame_vector(i, 1)[0] for i in range(256)])
        gaps = np.diff(np.concatenate([[0.0], xs, [1.0]]))
        assert gaps.max() < 3.0 / 256


class TestStreams:
    def test_deterministic(self):
        ids = jnp.arange(64, dtype=jnp.uint32)
        s1 = make_stream(ids, jnp.int32(3), seed=7)
        s2 = make_stream(ids, jnp.int32(3), seed=7)
        a, _ = next_1d(s1)
        b, _ = next_1d(s2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_decorrelated_across_pixels_and_dims(self):
        ids = jnp.arange(N, dtype=jnp.uint32)
        s = make_stream(ids, jnp.int32(0), seed=0)
        u1, s = next_1d(s)
        u2, s = next_1d(s)
        a, b = np.asarray(u1), np.asarray(u2)
        assert abs(a.mean() - 0.5) < 0.01
        assert abs(np.corrcoef(a, b)[0, 1]) < 0.03

    def test_uniform_chi_square(self):
        ids = jnp.arange(N, dtype=jnp.uint32)
        s = make_stream(ids, jnp.int32(1), seed=5)
        u, _ = next_1d(s)
        hist, _ = np.histogram(np.asarray(u), bins=64, range=(0, 1))
        expected = N / 64
        chi2 = ((hist - expected) ** 2 / expected).sum()
        # 63 dof: mean 63, std ~11 — generous bound
        assert chi2 < 120, chi2

    def test_hash_avalanche(self):
        x = jnp.arange(4096, dtype=jnp.uint32)
        h1 = np.asarray(hash_u32(x), dtype=np.uint32)
        h2 = np.asarray(hash_u32(x ^ jnp.uint32(1)), dtype=np.uint32)
        flips = np.unpackbits((h1 ^ h2).view(np.uint8)).mean()
        assert 0.45 < flips < 0.55  # ~half the output bits flip

    def test_unit_float_range(self):
        x = u32_to_unit_float(jnp.asarray([0, 0xFFFFFFFF], dtype=jnp.uint32))
        assert float(x[0]) == 0.0 and float(x[1]) < 1.0
