"""Spectral hero-wavelength mode + dispersion.

Coverage for the reference's `RT_ENABLE_SPECTRAL_RENDERING` feature set
(`Core/Color/Wavelength.*`, `RayColor.h:148-160`, dispersion hook
`RoughDielectricBSDF.cpp:29-44`, exercised by `Data/TestScenes/
dispersion_test.json`): CIE resolve weights, Cauchy IoR, wavelength-dependent
refraction, and energy conservation of the spectral estimator.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from raytracer_tpu.color.spectrum import (
    WAVELENGTH_HI,
    WAVELENGTH_LO,
    cauchy_ior,
    cie_xyz,
    rgb_resolve,
    sample_wavelength,
)
from raytracer_tpu.integrators.path_tracer import RenderParams
from raytracer_tpu.math.transform import RigidTransform
from raytracer_tpu.render.renderer import Viewport, ViewportParams
from raytracer_tpu.scene import types as T
from raytracer_tpu.scene.build import LightDesc, MaterialDesc, SceneBuilder
from raytracer_tpu.scene.camera import make_camera


class TestSpectrum:
    def test_resolve_mean_is_white(self):
        # E[rgb_resolve] over uniform wavelengths == (1,1,1): spectral mode
        # does not tint non-dispersive-looking paths on average
        lam = jnp.linspace(WAVELENGTH_LO, WAVELENGTH_HI, 4096)
        r, g, b = rgb_resolve(lam)
        np.testing.assert_allclose(
            [float(r.mean()), float(g.mean()), float(b.mean())], 1.0, atol=5e-3
        )

    def test_primaries_dominant(self):
        r450, g450, b450 = (float(v) for v in rgb_resolve(jnp.float32(460.0)))
        assert b450 > r450 and b450 > g450  # 460nm is blue
        r550, g550, b550 = (float(v) for v in rgb_resolve(jnp.float32(545.0)))
        assert g550 > abs(r550) and g550 > abs(b550)  # 545nm is green
        r640, g640, b640 = (float(v) for v in rgb_resolve(jnp.float32(640.0)))
        assert r640 > abs(g640) and r640 > abs(b640)  # 640nm is red

    def test_cie_y_peak(self):
        # photopic luminosity peaks near 555nm
        lam = jnp.linspace(WAVELENGTH_LO, WAVELENGTH_HI, 1000)
        _, y, _ = cie_xyz(lam)
        peak = float(lam[int(jnp.argmax(y))])
        assert 545.0 < peak < 565.0

    def test_sample_wavelength_range(self):
        u = jnp.asarray([0.0, 0.5, 1.0])
        lam = np.asarray(sample_wavelength(u))
        assert lam[0] == WAVELENGTH_LO and lam[-1] == WAVELENGTH_HI


class TestCauchy:
    def test_matches_d_line(self):
        n = float(cauchy_ior(jnp.float32(1.52), jnp.float32(59.0), jnp.float32(587.6)))
        np.testing.assert_allclose(n, 1.52, atol=1e-4)

    def test_blue_bends_more(self):
        n_blue = float(cauchy_ior(jnp.float32(1.52), jnp.float32(30.0), jnp.float32(440.0)))
        n_red = float(cauchy_ior(jnp.float32(1.52), jnp.float32(30.0), jnp.float32(650.0)))
        assert n_blue > n_red
        # low Abbe number = stronger dispersion
        spread_flint = n_blue - n_red
        nb2 = float(cauchy_ior(jnp.float32(1.52), jnp.float32(60.0), jnp.float32(440.0)))
        nr2 = float(cauchy_ior(jnp.float32(1.52), jnp.float32(60.0), jnp.float32(650.0)))
        assert spread_flint > (nb2 - nr2)

    def test_abbe_definition(self):
        n_d, v = 1.6, 25.0
        n_f = float(cauchy_ior(jnp.float32(n_d), jnp.float32(v), jnp.float32(486.1344)))
        n_c = float(cauchy_ior(jnp.float32(n_d), jnp.float32(v), jnp.float32(656.2725)))
        np.testing.assert_allclose((n_d - 1.0) / (n_f - n_c), v, rtol=1e-3)


def _render(build, params, passes=32, fov=10.0, cam_z=-3.0, size=12, seed=0):
    b = SceneBuilder()
    build(b)
    scene, meta = b.build()
    cam = make_camera(RigidTransform(translation=(0, 0, cam_z)), fov_deg=fov)
    vp = Viewport(scene, meta, cam, ViewportParams(width=size, height=size, seed=seed),
                  params)
    vp.render(passes)
    return vp.radiance()


class TestSpectralRendering:
    def test_non_dispersive_scene_matches_rgb_mode(self):
        """Without dispersive materials no path ever collapses, so the
        spectral estimator is *identical* to RGB mode (the wavelength dim
        shifts the stream, so compare against analytic truth instead)."""
        albedo, env = 0.7, 0.6

        def build(b):
            m = b.add_material(MaterialDesc(bsdf="diffuse", base_color=(albedo,) * 3))
            b.add_sphere(RigidTransform(), 1.0, m)
            b.add_light(LightDesc(kind=T.LIGHT_BACKGROUND, color=(env,) * 3))

        img = _render(build, RenderParams(max_depth=8, mis=True, spectral=True),
                      passes=96)
        np.testing.assert_allclose(img.mean(axis=(0, 1)), albedo * env, atol=0.04)

    def test_spectral_furnace_dielectric(self):
        """Dispersive glass sphere in a uniform furnace: collapse weights are
        unbiased, so energy is conserved (`RaytracingTests.cpp:475-523`
        extended to spectral mode)."""
        env = 0.5

        def build(b):
            m = b.add_material(MaterialDesc(
                bsdf="dielectric", base_color=(1, 1, 1), ior=1.5,
                dispersive=True, abbe=20.0,
            ))
            b.add_sphere(RigidTransform(), 1.0, m)
            b.add_light(LightDesc(kind=T.LIGHT_BACKGROUND, color=(env,) * 3))

        img = _render(build, RenderParams(max_depth=12, mis=True, spectral=True),
                      passes=256)
        np.testing.assert_allclose(img.mean(), env, rtol=0.08)

    def test_dispersion_produces_chromatic_spread(self):
        """A dispersive glass sphere refracting a background shows channel
        separation (rainbow fringes); the same sphere without dispersion
        stays achromatic.  (`dispersion_test.json` analogue.)"""
        def build(dispersive):
            def fn(b):
                m = b.add_material(MaterialDesc(
                    bsdf="dielectric", base_color=(1, 1, 1), ior=1.8,
                    dispersive=dispersive, abbe=10.0,
                ))
                b.add_sphere(RigidTransform(), 1.0, m)
                b.add_light(LightDesc(kind=T.LIGHT_BACKGROUND, color=(1.0, 1.0, 1.0)))
            return fn

        params = RenderParams(max_depth=10, mis=True, spectral=True)
        img_disp = _render(build(True), params, passes=64, fov=14.0)
        img_flat = _render(build(False), params, passes=64, fov=14.0)
        # chromaticity spread: per-pixel max deviation across channels
        def chroma(img):
            mean = img.mean(-1, keepdims=True)
            return np.abs(img - mean).mean()

        assert chroma(img_disp) > 1.5 * chroma(img_flat)


class TestHeroStratification:
    def test_pass_strata_cover_spectrum(self):
        """8 consecutive passes place the hero wavelength in 8 disjoint bins
        covering [LO, HI) — the pass-level analogue of the reference's 8
        rotated wavelengths (`Wavelength.cpp:10-21`)."""
        import jax.numpy as jnp
        from raytracer_tpu.color.spectrum import (
            NUM_STRATA, WAVELENGTH_HI, WAVELENGTH_LO, sample_wavelength_stratified,
        )

        u = jnp.asarray(0.5)
        lams = [
            float(sample_wavelength_stratified(u, jnp.int32(p)))
            for p in range(NUM_STRATA)
        ]
        width = (WAVELENGTH_HI - WAVELENGTH_LO) / NUM_STRATA
        for j, lam in enumerate(lams):
            assert WAVELENGTH_LO + j * width <= lam < WAVELENGTH_LO + (j + 1) * width
        # next cycle repeats the strata
        lam8 = float(sample_wavelength_stratified(u, jnp.int32(NUM_STRATA)))
        assert abs(lam8 - lams[0]) < 1e-3


class TestSpectralCalibration:
    @pytest.mark.slow
    def test_dispersive_scene_spectral_matches_rgb_brightness(self):
        """Our spectral estimator is calibrated to the RGB estimator
        (E[rgb_resolve] = (1,1,1)): on the reference's dispersion_test scene
        the spectral and RGB renders agree in global brightness to <1%
        (r5 measured 0.9996).  The REFERENCE's own spectral build fails this
        by 2x with a per-channel tint (`RayColor.cpp:277-293` D65 x
        uncalibrated norm — documented quirk, see
        test_ref_agreement.test_dispersion_spectral_golden)."""
        import os as _os
        import sys as _sys
        import warnings as _warnings

        _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "tools"))
        from make_test_textures import ensure
        import modernize_scenes as mz

        from raytracer_tpu.io.scene_loader import load_scene

        data_dir = ensure("/tmp/refdata_tests")
        mz.OUT_DIR = _os.path.join(data_dir, "TestScenes_modern")
        scene_json = mz.modernize("dispersion_test")
        with _warnings.catch_warnings():
            _warnings.simplefilter("ignore")
            scene, meta, cam = load_scene(scene_json, data_path=data_dir)

        imgs = {}
        for spectral in (False, True):
            vp = Viewport(
                scene, meta, cam,
                ViewportParams(width=96, height=96, seed=0),
                RenderParams(max_depth=6, mis=True, spectral=spectral),
            )
            vp.render(64)
            imgs[spectral] = np.asarray(vp.radiance())
        ratio = imgs[True].mean() / imgs[False].mean()
        assert abs(ratio - 1.0) < 0.02, f"spectral/RGB brightness ratio {ratio:.4f}"
