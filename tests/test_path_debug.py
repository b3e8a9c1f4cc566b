"""Path debugging: per-bounce replay of one pixel (`PathDebugging.h:27-53`)."""

from raytracer_tpu.integrators.path_tracer import RenderParams
from raytracer_tpu.math.transform import RigidTransform
from raytracer_tpu.render.path_debug import (
    TERM_DEPTH_EXCEEDED,
    TERM_HIT_BACKGROUND,
    TERM_HIT_LIGHT,
    TERM_RUSSIAN_ROULETTE,
    TERM_THROUGHPUT_ZERO,
    debug_pixel_path,
)
from raytracer_tpu.render.renderer import ViewportParams
from raytracer_tpu.scene.camera import make_camera
from raytracer_tpu.scene.presets import cornell_box, cornell_camera_kw


def _setup():
    scene, meta = cornell_box()
    t_kw, c_kw = cornell_camera_kw()
    return scene, meta, make_camera(RigidTransform(**t_kw), **c_kw)


class TestPathDebug:
    def test_records_bounces(self):
        scene, meta, cam = _setup()
        vp = ViewportParams(width=32, height=32, seed=0)
        data = debug_pixel_path(
            scene, meta, cam, 16, 24, vp, RenderParams(max_depth=4, mis=True)
        )
        assert data.pixel == (16, 24)
        assert data.termination in (
            TERM_HIT_BACKGROUND, TERM_HIT_LIGHT, TERM_DEPTH_EXCEEDED,
            TERM_RUSSIAN_ROULETTE, TERM_THROUGHPUT_ZERO,
        )
        # a cornell interior pixel hits geometry at least once
        assert len(data.vertices) >= 1
        v0 = data.vertices[0]
        assert v0.depth == 0
        assert v0.hit_distance > 0.0
        assert v0.prim_id >= 0
        # throughput starts at one and only decreases in max-norm
        assert max(v0.throughput) == 1.0
        for a, b in zip(data.vertices, data.vertices[1:]):
            assert b.depth == a.depth + 1
            assert max(b.throughput) <= max(a.throughput) * 8.01  # RR boost bound

    def test_deterministic_replay(self):
        scene, meta, cam = _setup()
        vp = ViewportParams(width=32, height=32, seed=0)
        params = RenderParams(max_depth=4, mis=True)
        a = debug_pixel_path(scene, meta, cam, 16, 24, vp, params, pass_idx=3)
        b = debug_pixel_path(scene, meta, cam, 16, 24, vp, params, pass_idx=3)
        assert len(a.vertices) == len(b.vertices)
        for va, vb in zip(a.vertices, b.vertices):
            assert va.position == vb.position
            assert va.direction == vb.direction
            assert va.bsdf_pdf == vb.bsdf_pdf
        # a different pass samples different BSDF directions (diffuse wall)
        c = debug_pixel_path(scene, meta, cam, 16, 24, vp, params, pass_idx=7)
        assert (len(c.vertices) != len(a.vertices)
                or any(va.bsdf_pdf != vc.bsdf_pdf
                       for va, vc in zip(a.vertices, c.vertices)))
