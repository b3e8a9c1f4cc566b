"""Decals: projected-texture alpha blending onto shading parameters.

Covers `DecalSceneObject` (`SceneObject_Decal.h:21-37`, `SceneObject_Decal.
cpp:23-46`) and their application during shading (`Scene.cpp:446-462`).
"""

import numpy as np
import pytest

from raytracer_tpu.integrators.path_tracer import RenderParams
from raytracer_tpu.math.transform import RigidTransform
from raytracer_tpu.render.renderer import Viewport, ViewportParams
from raytracer_tpu.scene import types as T
from raytracer_tpu.scene.build import DecalDesc, LightDesc, MaterialDesc, SceneBuilder
from raytracer_tpu.scene.camera import make_camera


def _render(build_fn, passes=48, size=16):
    b = SceneBuilder()
    build_fn(b)
    scene, meta = b.build()
    cam = make_camera(RigidTransform(), fov_deg=30.0)
    vp = Viewport(
        scene, meta, cam, ViewportParams(width=size, height=size, seed=0),
        RenderParams(max_depth=2, mis=True),
    )
    vp.render(passes)
    return vp.radiance()


def _white_wall(b, albedo=(0.8, 0.8, 0.8)):
    m = b.add_material(MaterialDesc(bsdf="diffuse", base_color=albedo))
    # wall at z=4 facing the camera, large enough to fill the frame
    b.add_rect(RigidTransform(translation=(0, 0, 4), euler_deg=(180, 0, 0)),
               (6.0, 6.0), m)
    b.add_light(LightDesc(kind=T.LIGHT_BACKGROUND, color=(1.0, 1.0, 1.0)))


class TestDecals:
    @pytest.mark.slow
    def test_full_alpha_replaces_base_color(self):
        """alpha=1 decal covering the whole wall: reflected color equals the
        decal color, not the material's."""
        decal_color = (0.6, 0.1, 0.1)

        def build(b):
            _white_wall(b)
            b.add_decal(DecalDesc(
                transform=RigidTransform(translation=(0, 0, 4)),
                half_size=(6.0, 6.0, 0.5),
                base_color=decal_color,
                alpha_min=1.0, alpha_max=1.0,
            ))

        img = _render(build)
        base = _render(_white_wall)
        # decal albedo replaces the wall albedo => channel ratio tracks it
        np.testing.assert_allclose(
            img.mean(axis=(0, 1)) / base.mean(axis=(0, 1)),
            np.array(decal_color) / 0.8, atol=0.05,
        )

    def test_outside_box_untouched(self):
        """Decal box off to the side: pixels outside it keep the base color."""
        def build(b):
            _white_wall(b)
            b.add_decal(DecalDesc(
                transform=RigidTransform(translation=(100, 0, 4)),
                half_size=(0.5, 0.5, 0.5),
                base_color=(0, 1, 0),
                alpha_min=1.0, alpha_max=1.0,
            ))

        img = _render(build, passes=16)
        base = _render(_white_wall, passes=16)
        np.testing.assert_allclose(img, base, atol=1e-6)

    def test_alpha_zero_is_noop(self):
        def build(b):
            _white_wall(b)
            b.add_decal(DecalDesc(
                transform=RigidTransform(translation=(0, 0, 4)),
                half_size=(6.0, 6.0, 0.5),
                base_color=(0, 0, 1),
                alpha_min=0.0, alpha_max=0.0,
            ))

        img = _render(build, passes=16)
        base = _render(_white_wall, passes=16)
        np.testing.assert_allclose(img, base, atol=1e-6)

    def test_order_controls_layering(self):
        """Two overlapping full-alpha decals: the LOWER order wins (the
        reference sorts descending and applies in order, so low order is
        applied last, `Scene.cpp:448-456`)."""
        def build(last_color, b):
            _white_wall(b)
            b.add_decal(DecalDesc(
                transform=RigidTransform(translation=(0, 0, 4)),
                half_size=(6.0, 6.0, 0.5), base_color=(0.7, 0.1, 0.1),
                alpha_min=1.0, alpha_max=1.0,
                order=0 if last_color == "red" else 5,
            ))
            b.add_decal(DecalDesc(
                transform=RigidTransform(translation=(0, 0, 4)),
                half_size=(6.0, 6.0, 0.5), base_color=(0.1, 0.1, 0.7),
                alpha_min=1.0, alpha_max=1.0,
                order=5 if last_color == "red" else 0,
            ))

        red_last = _render(lambda b: build("red", b), passes=24)
        blue_last = _render(lambda b: build("blue", b), passes=24)
        r = red_last.mean(axis=(0, 1))
        bl = blue_last.mean(axis=(0, 1))
        assert r[0] > r[2] and bl[2] > bl[0]

    @pytest.mark.slow
    def test_textured_decal(self):
        """Decal with a bitmap texture: decal-space (x, y) maps to (u, v)."""
        from raytracer_tpu.ops.textures import build_atlas

        tex = np.zeros((8, 8, 3), np.float32)
        tex[:, :4] = (1.0, 0.0, 0.0)  # left half red
        tex[:, 4:] = (0.0, 0.0, 1.0)  # right half blue

        def build(b):
            b.textures = build_atlas([tex])
            _white_wall(b)
            b.add_decal(DecalDesc(
                transform=RigidTransform(translation=(0, 0, 4)),
                half_size=(6.0, 6.0, 0.5),
                base_color=(1, 1, 1), base_color_tex=0,
                alpha_min=1.0, alpha_max=1.0,
            ))

        img = _render(build, passes=32, size=16)
        left = img[:, :6].mean(axis=(0, 1))
        right = img[:, 10:].mean(axis=(0, 1))
        assert left[0] > 3 * left[2] or right[2] > 3 * right[0]
