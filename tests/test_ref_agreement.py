"""Image agreement against the REFERENCE renderer's own output.

The committed goldens (tests/goldens/*.exr) were rendered by the patched
reference renderer built from source in this environment (see
tools/ref_baseline/build_ref.sh + dump_goldens.cpp): 128x128, 512 passes,
"Path Tracer MIS", maxRayDepth 8, AA spread 0.5, blue-noise off — the
reference's own ValidateBitmap methodology (`Tests/RaytracingTests.cpp:
241-259`) applied to its shipped TestScenes (`Data/TestScenes/*.json`).

We render the same scene through our loader + MIS path tracer and compare
4x4-downsampled radiance (box-filtering both images melts most MC noise, so
the tolerances below probe SYSTEMATIC agreement, not variance).  Two metrics
per scene:

- mean relative error of the downsampled images,
- global brightness ratio ours/golden (an unbiased-estimator check).

Known, deliberate divergence: the reference's `Vector4::Refract3`
(`Vector4.cpp:7-30`) "refracts" rays EXITING a medium through a tilted
microfacet normal by computing the entering-form direction and flipping its
z sign — physically wrong for rough dielectrics (verified against exact
Snell refraction; the spread is tens of degrees at roughness 0.5).  We use
exact refraction, so scenes dominated by rough-glass transmission
(background_light_test: a roughness-0.5 dielectric sphere fills the frame)
carry a wider tolerance and a documented ~+9% brightness ratio.
"""

import os
import warnings

import numpy as np
import pytest

from raytracer_tpu.integrators.path_tracer import RenderParams
from raytracer_tpu.io.exr import read_exr
from raytracer_tpu.io.scene_loader import load_scene
from raytracer_tpu.render.renderer import Viewport, ViewportParams

import pytest

pytestmark = pytest.mark.slow  # full-render / FD-gradient suite: smoke tier skips it

REF_SCENES = "/root/reference/Data/TestScenes"
GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")

# scene -> (render passes, mean-rel tolerance, |ratio - 1| tolerance)
# measured headroom: tolerances are ~1.5x the observed error at these pass
# counts, so a systematic regression of a few percent trips the test while
# seed-to-seed variance does not
SCENES = {
    "area_light_test": (64, 0.10, 0.03),
    # rough-dielectric sphere fills the frame; reference Refract3 exit-ray
    # quirk (see module docstring) => wider band, known +9% ratio
    "background_light_test": (48, 0.16, 0.12),
    "cornell_box": (64, 0.12, 0.03),
    # area light almost fully occluded -> high-variance NEE; mean-rel is
    # noise-dominated (r5 measured 0.161 at 128 passes) but the ratio is
    # tight — the band probes systematic error only
    "cornell_box_obstructed": (128, 0.22, 0.03),
    # 5-degree directional light + specular chains -> firefly-dominated
    # (r5 measured 0.115 at 128 passes)
    "directional_light_test": (128, 0.16, 0.03),
    "dof_test": (4, 0.02, 0.01),
    "furnace_test": (64, 0.02, 0.01),
    "furnace_test_2": (64, 0.04, 0.01),
    "material_perf_test": (4, 0.02, 0.01),
    "materials_test": (48, 0.06, 0.03),
    "mis_test": (64, 0.08, 0.03),
}


def _downsample(img: np.ndarray, f: int = 4) -> np.ndarray:
    h, w, c = img.shape
    return img.reshape(h // f, f, w // f, f, c).mean(axis=(1, 3))


@pytest.mark.parametrize("name", sorted(SCENES))
def test_golden_agreement(name):
    passes, mean_tol, ratio_tol = SCENES[name]
    golden = read_exr(os.path.join(GOLDENS, f"{name}.exr"))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # missing-texture placeholders
        scene, meta, cam = load_scene(
            f"{REF_SCENES}/{name}.json", data_path="/root/reference/Data"
        )
    vp = Viewport(
        scene, meta, cam,
        ViewportParams(width=128, height=128, seed=0),
        RenderParams(max_depth=8, mis=True),
    )
    vp.render(passes)
    ours = vp.radiance()
    assert np.isfinite(ours).all(), f"{name}: non-finite radiance"

    g = _downsample(golden)
    o = _downsample(ours)
    rel = np.abs(o - g) / np.maximum(g, 1e-2)
    mean_rel = float(rel.mean())
    ratio = float(o.mean() / max(g.mean(), 1e-9))
    assert mean_rel <= mean_tol, (
        f"{name}: mean relative error {mean_rel:.4f} > {mean_tol}"
    )
    assert abs(ratio - 1.0) <= ratio_tol, (
        f"{name}: brightness ratio {ratio:.4f} outside 1 +/- {ratio_tol}"
    )


# ---------------------------------------------------------------------------
# Modernized scenes: several shipped TestScenes use a light schema the
# reference's OWN loader rejects today (old `{"type": "sphere"}` lights and
# `position/edge0/edge1` area rects — "Area light is missing 'shape' field",
# `Demo/SceneLoader.cpp:527`).  tools/modernize_scenes.py converts them to
# the current schema without changing geometry; BOTH renderers consume the
# modernized JSON, so parity still measures our renderer against the
# reference's output on identical input.
# ---------------------------------------------------------------------------

MODERN_SCENES = {
    # ships with NO lights (renders black in both renderers as-is): the
    # lit_variant adds a neutral background light; the ground rect carries
    # per-object textureScale (RectShape::mTextureScale parity) over the
    # stand-in checker texture.  Residual ~0.12 mean-rel (ratio 1.0007,
    # corr +0.89): the grazing fine-checker view is a moire worst case that
    # 4x4 box downsampling does not fully melt — brightness parity is exact
    "bitmap_texture_test": (48, 0.16, 0.03),
    # r4: per-object textureScale + BMP row order + Bilinear_SmoothStep
    # parity landed — measured 0.0875 mean-rel / ratio 1.000004 (the r3 band
    # was 0.90 for the then-missing textureScale)
    "sphere_light_test": (64, 0.13, 0.03),
    # r5: the old-schema conversion gained three fixes (plane objects were
    # XZ ground planes, rect-light sizes are FULL edge lengths vs the
    # current schema's half extents, and emitting sides must face the
    # scene — tools/modernize_scenes.py) — the scenes that previously
    # rendered black (or showed only the light's own face) in BOTH
    # renderers now carry real signal.  Measured r5: glossy 0.0247/0.9942,
    # small_light 0.0123/1.0000, texture 0.1438/0.9948 (grazing fine-checker
    # moire like bitmap_texture_test), dispersion RGB 0.0865/0.9936.
    "glossy_refraction_test": (64, 0.05, 0.03),
    "small_light_test": (64, 0.04, 0.02),
    "texture_test": (64, 0.20, 0.03),
    # non-spectral build ignores `dispersive` (RT_ENABLE_SPECTRAL_RENDERING
    # off): plain rough-glass parity on the dispersion scene
    "dispersion_test": (96, 0.13, 0.03),
}


@pytest.fixture(scope="module")
def modern_dir():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_test_textures import ensure
    from modernize_scenes import modernize

    data_dir = ensure("/tmp/refdata_tests")
    # the modernizer writes to its own OUT_DIR; regenerate into the test dir
    import modernize_scenes as mz

    mz.OUT_DIR = os.path.join(data_dir, "TestScenes_modern")
    for name in MODERN_SCENES:
        if name in mz.LIT_SCENES:
            mz.lit_variant(name)
        else:
            mz.modernize(name)
    return data_dir


@pytest.mark.parametrize("name", sorted(MODERN_SCENES))
def test_modern_golden_agreement(name, modern_dir):
    passes, mean_tol, ratio_tol = MODERN_SCENES[name]
    golden_path = os.path.join(GOLDENS, f"{name}.exr")
    if not os.path.exists(golden_path):
        pytest.skip(f"golden {name}.exr not generated")
    golden = read_exr(golden_path)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        scene, meta, cam = load_scene(
            os.path.join(modern_dir, "TestScenes_modern", f"{name}.json"),
            data_path=modern_dir,
        )
    vp = Viewport(
        scene, meta, cam,
        ViewportParams(width=128, height=128, seed=0),
        RenderParams(max_depth=8, mis=True),
    )
    vp.render(passes)
    ours = vp.radiance()
    g = _downsample(golden)
    o = _downsample(np.asarray(ours))
    rel = np.abs(o - g) / np.maximum(g, 1e-2)
    mean_rel = float(rel.mean())
    ratio = float(o.mean() / max(g.mean(), 1e-9))
    assert mean_rel <= mean_tol, f"{name}: mean rel {mean_rel:.4f} > {mean_tol}"
    assert abs(ratio - 1.0) <= ratio_tol, f"{name}: ratio {ratio:.4f}"


def test_dispersion_spectral_golden(modern_dir):
    """Spectral-mode parity on dispersion_test against the reference BUILT
    WITH RT_ENABLE_SPECTRAL_RENDERING (tests/goldens/dispersion_test_
    spectral.exr; tools/ref_baseline/build_ref.sh + a copy with the flag and
    RT_CONFIGURATION_FINAL — the reference's spectral path trips its own
    RT_ASSERT(radiance.IsValid()) NaN checks, an unmaintained configuration
    upstream ships disabled).

    Documented reference quirk (measured r5, like the Refract3 case): the
    reference's spectral pipeline converts EVERY path through Spectrum ->
    XYZ with a D65 illuminant and an uncalibrated normalization
    (`RayColor.cpp:277-293`: x1/1.33 x colorMatchinhNormFactor/8), so its
    spectral render is NOT colorimetrically consistent with its own RGB
    render of the same scene — measured per-channel spectral/RGB ratios
    [0.61, 0.87, 0.89] here and [1.49, 2.41, 2.70] on a larger-light
    variant (scene-dependent).  Our spectral mode is calibrated so
    E[resolve] = 1: our spectral and RGB renders of this scene agree to
    0.04% (asserted in test_spectral.py).  The comparison therefore
    normalizes the golden by its own measured per-channel tint vs the RGB
    golden and probes SHAPE agreement + dispersion presence.
    """
    golden_spec = read_exr(os.path.join(GOLDENS, "dispersion_test_spectral.exr"))
    golden_rgb = read_exr(os.path.join(GOLDENS, "dispersion_test.exr"))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        scene, meta, cam = load_scene(
            os.path.join(modern_dir, "TestScenes_modern", "dispersion_test.json"),
            data_path=modern_dir,
        )
    vp = Viewport(
        scene, meta, cam,
        ViewportParams(width=128, height=128, seed=0),
        RenderParams(max_depth=8, mis=True, spectral=True),
    )
    vp.render(128)
    ours = np.asarray(vp.radiance())

    tint = golden_spec.mean((0, 1)) / np.maximum(golden_rgb.mean((0, 1)), 1e-9)
    g = _downsample(golden_spec / tint)
    o = _downsample(ours)
    rel = np.abs(o - g) / np.maximum(g, 1e-2)
    mean_rel = float(rel.mean())
    ratio = float(o.mean() / max(g.mean(), 1e-9))
    # r5 measured 0.2303 / 0.9930 at these pass counts (residual = spectral
    # MC noise + the reference's per-path D65 reweighting, which no global
    # tint fully removes)
    assert mean_rel <= 0.32, f"spectral mean rel {mean_rel:.4f}"
    assert abs(ratio - 1.0) <= 0.06, f"spectral ratio {ratio:.4f}"

    # dispersion must actually produce chromatic spread beyond the RGB
    # render's (r5 measured caustic-cell chromatic excess 0.033 ours vs
    # 0.062 reference on the large-light variant)
    o_rgb = _downsample(np.asarray(golden_rgb))
    excess = np.abs(o[..., 0] - o[..., 2]) - np.abs(o_rgb[..., 0] - o_rgb[..., 2])
    assert float(np.clip(excess, 0, None).mean()) > 0.002, "no chromatic spread"


ENV_SCENES = {
    # diffuse sphere under the stand-in lat-long HDR env (sun blob + sky
    # gradient): exercises env-map importance sampling + GetRadiance parity
    "material_env_test": (48, 0.10, 0.04),
}


@pytest.mark.parametrize("name", sorted(ENV_SCENES))
def test_env_golden_agreement(name, modern_dir):
    passes, mean_tol, ratio_tol = ENV_SCENES[name]
    golden = read_exr(os.path.join(GOLDENS, f"{name}.exr"))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        scene, meta, cam = load_scene(
            f"{REF_SCENES}/{name}.json", data_path=modern_dir
        )
    vp = Viewport(
        scene, meta, cam,
        ViewportParams(width=128, height=128, seed=0),
        RenderParams(max_depth=8, mis=True),
    )
    vp.render(passes)
    ours = np.asarray(vp.radiance())
    g = _downsample(golden)
    o = _downsample(ours)
    rel = np.abs(o - g) / np.maximum(g, 1e-2)
    mean_rel = float(rel.mean())
    ratio = float(o.mean() / max(g.mean(), 1e-9))
    assert mean_rel <= mean_tol, f"{name}: mean rel {mean_rel:.4f} > {mean_tol}"
    assert abs(ratio - 1.0) <= ratio_tol, f"{name}: ratio {ratio:.4f}"


def _render_sds_vcm(passes=24):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        scene, meta, cam = load_scene(
            f"{REF_SCENES}/sds.json", data_path="/root/reference/Data"
        )
    import jax.numpy as jnp

    from raytracer_tpu.integrators.vcm import VcmParams, render_pass_vcm
    from raytracer_tpu.render.film import make_film

    vp = ViewportParams(width=128, height=128, seed=0)
    params = RenderParams(max_depth=8, mis=True)
    vcm = VcmParams(max_path_length=8)
    film = make_film(128, 128)
    for p in range(passes):
        film = render_pass_vcm(
            scene, meta, cam, film, jnp.int32(p), None, vp, params, vcm
        )
    return np.asarray(film.sum) / passes, scene, meta, cam, vp


def test_vcm_sds_agrees_with_our_pt_mis():
    """SDS caustics (`sds.json`): our VCM must agree with our PT-MIS — the
    cross-integrator discipline of `Tests/RaytracingTests.cpp:17-22` at
    image level.  PT-MIS itself is pinned to the reference on 13 golden
    scenes above, so this transitively checks the bidirectional estimators.

    Measured: our VCM mean 0.1395 vs our PT-MIS 0.1410 (<1.1%); the
    reference's OWN VCM renders this scene 38% dimmer than its own path
    tracer's converged estimate (golden sds_vcm.exr mean 0.0875 at 384
    passes) — see test_vcm_golden_agreement_sds_reference below."""
    ours_vcm, scene, meta, cam, vp = _render_sds_vcm()
    view = Viewport(
        scene, meta, cam, ViewportParams(width=128, height=128, seed=0),
        RenderParams(max_depth=8, mis=True),
    )
    view.render(96)
    pt = np.asarray(view.radiance())
    ratio = float(ours_vcm.mean() / max(pt.mean(), 1e-9))
    assert abs(ratio - 1.0) <= 0.08, ratio


@pytest.mark.xfail(
    strict=False,
    reason="the REFERENCE's VCM renders sds.json ~38% dimmer than both its "
    "own path tracer's estimate and our PT/VCM pair (which agree to ~1%); "
    "the golden is kept so the divergence stays measured — suspected "
    "upstream VCM convergence/bias at these settings, to be root-caused",
)
def test_vcm_golden_agreement_sds_reference():
    """Informational: our VCM vs the reference VCM's own 384-pass render."""
    golden = read_exr(os.path.join(GOLDENS, "sds_vcm.exr"))
    ours, *_ = _render_sds_vcm()
    g = _downsample(golden)
    o = _downsample(ours)
    ratio = float(o.mean() / max(g.mean(), 1e-9))
    assert abs(ratio - 1.0) <= 0.12, ratio
