"""Distribution sampling: statistical tests + env-map importance sampling.

Category-3 statistical suite per SURVEY §4 (`Tests/MathDistributionTest.cpp:
14-50`): sample the distribution many times, assert pdf values and empirical
frequencies; plus an end-to-end check that env-importance-sampled NEE stays
unbiased vs uniform-hemisphere NEE and reduces variance on a hard env map.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracer_tpu.math.distribution import (
    Distribution2D,
    make_distribution,
    make_distribution_2d,
    pdf_2d,
    sample_2d,
    sample_continuous,
    sample_discrete,
)


def _uniforms(n, seed=0):
    return np.random.default_rng(seed).random(n).astype(np.float32)


class TestDistribution1D:
    def test_probabilities_normalized(self):
        d = make_distribution(np.array([1.0, 2.0, 3.0, 4.0]))
        np.testing.assert_allclose(np.asarray(d.prob), [0.1, 0.2, 0.3, 0.4], atol=1e-6)
        assert float(d.cdf[0]) == 0.0 and float(d.cdf[-1]) == 1.0

    def test_discrete_empirical_frequencies(self):
        # `MathDistributionTest.cpp`: empirical frequency ~ bin probability
        vals = np.array([1.0, 0.0, 2.0, 5.0, 2.0])
        d = make_distribution(vals)
        u = _uniforms(100_000)
        idx, prob = jax.jit(lambda u: sample_discrete(d, u))(u)
        idx = np.asarray(idx)
        freq = np.bincount(idx, minlength=5) / len(u)
        np.testing.assert_allclose(freq, vals / vals.sum(), atol=0.01)
        # returned prob is the bin's probability
        np.testing.assert_allclose(np.asarray(prob), (vals / vals.sum())[idx], atol=1e-6)
        assert not (idx == 1).any()  # zero-weight bin never sampled

    def test_continuous_density(self):
        d = make_distribution(np.array([1.0, 3.0]))
        u = _uniforms(50_000, seed=1)
        x, dens = sample_continuous(d, u)
        x = np.asarray(x)
        # CDF check: P(x < 0.5) = 0.25
        np.testing.assert_allclose((x < 0.5).mean(), 0.25, atol=0.01)
        # density is prob * N
        np.testing.assert_allclose(
            np.asarray(dens), np.where(x < 0.5, 0.5, 1.5), atol=1e-5
        )

    def test_zero_total_becomes_uniform(self):
        d = make_distribution(np.zeros(4))
        np.testing.assert_allclose(np.asarray(d.prob), 0.25, atol=1e-6)

    def test_negative_rejected(self):
        with pytest.raises(ValueError):
            make_distribution(np.array([1.0, -1.0]))


class TestDistribution2D:
    def test_sample_matches_density(self):
        rng = np.random.default_rng(3)
        w = rng.random((8, 16)) ** 3  # peaked
        d = make_distribution_2d(w)
        u1 = _uniforms(80_000, seed=4)
        u2 = _uniforms(80_000, seed=5)
        u, v, dens = jax.jit(lambda a, b: sample_2d(d, a, b))(u1, u2)
        u, v = np.asarray(u), np.asarray(v)
        assert (0 <= u).all() and (u < 1).all() and (0 <= v).all() and (v < 1).all()
        # pdf_2d at the sampled point equals the density sample_2d returned
        np.testing.assert_allclose(
            np.asarray(pdf_2d(d, jnp.asarray(u), jnp.asarray(v))),
            np.asarray(dens), rtol=1e-5,
        )
        # empirical cell frequencies ~ density / (H*W)
        iy = (v * 8).astype(int)
        ix = (u * 16).astype(int)
        counts = np.zeros((8, 16))
        np.add.at(counts, (iy, ix), 1.0)
        np.testing.assert_allclose(counts / len(u), w / w.sum(), atol=0.005)

    def test_density_integrates_to_one(self):
        d = make_distribution_2d(np.random.default_rng(0).random((4, 4)))
        assert abs(float(jnp.mean(d.density)) - 1.0) < 1e-5


def _env_scene(env_importance: bool):
    """Diffuse floor patch lit by a bright-spot lat-long env map."""
    from raytracer_tpu.ops.textures import build_atlas
    from raytracer_tpu.scene import types as T
    from raytracer_tpu.scene.build import LightDesc, MaterialDesc, SceneBuilder
    from raytracer_tpu.math.transform import RigidTransform

    h, w = 32, 64
    img = np.full((h, w, 3), 0.01, np.float32)
    img[4:7, 10:14] = 50.0  # small very bright patch -> high variance uniform NEE
    b = SceneBuilder()
    b.textures = build_atlas([img])
    mat = b.add_material(MaterialDesc(bsdf="diffuse", base_color=(0.7, 0.7, 0.7)))
    # rect facing the camera (normal -Z), filling the frame
    b.add_rect(
        RigidTransform(translation=(0, 0, 4), euler_deg=(180, 0, 0)), (3.0, 3.0), mat
    )
    b.add_light(LightDesc(kind=T.LIGHT_BACKGROUND, color=(1.0, 1.0, 1.0), env_tex=0))
    scene, meta = b.build()
    if not env_importance:
        scene = scene._replace(env_dist=None)
    return scene, meta


def _render_env(env_importance: bool, seed: int):
    from raytracer_tpu.integrators.path_tracer import RenderParams
    from raytracer_tpu.math.transform import RigidTransform
    from raytracer_tpu.render.renderer import Viewport, ViewportParams
    from raytracer_tpu.scene.camera import make_camera

    scene, meta = _env_scene(env_importance)
    cam = make_camera(RigidTransform(), fov_deg=40.0, aspect=1.0)
    vp = Viewport(
        scene, meta, cam, ViewportParams(width=24, height=24, seed=seed),
        RenderParams(max_depth=2, mis=True),
    )
    vp.render(24)
    return vp.radiance()


class TestEnvImportanceSampling:
    @pytest.mark.slow
    def test_unbiased_vs_uniform_and_lower_variance(self):
        imp = _render_env(True, seed=0)
        uni = np.mean([_render_env(False, seed=s) for s in range(4)], axis=0)
        # both estimate the same integral
        assert abs(imp.mean() - uni.mean()) / max(uni.mean(), 1e-6) < 0.25
        # importance sampling converges much more smoothly: per-pixel spread
        # around the mean is smaller despite 4x fewer total samples
        imp_noise = np.std(imp) / max(np.mean(imp), 1e-6)
        one_uni = _render_env(False, seed=1)
        uni_noise = np.std(one_uni) / max(np.mean(one_uni), 1e-6)
        assert imp_noise < uni_noise
