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
    # noise-dominated at this pass count but the ratio is tight
    "cornell_box_obstructed": (64, 0.30, 0.03),
    # 5-degree directional light + specular chains -> firefly-dominated
    "directional_light_test": (64, 0.20, 0.03),
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
    # glossy dielectric chains: firefly-dominated at this pass count
    "glossy_refraction_test": (64, 0.25, 0.08),
    # NOT covered: texture_test / small_light_test render BLACK in the
    # REFERENCE itself after schema modernization (their old edge-rect light
    # normals face away under the current loader's conventions) — no signal
    # to compare; dispersion_test needs the reference's compile-gated
    # spectral build (RT_ENABLE_SPECTRAL_RENDERING off upstream by default).
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
