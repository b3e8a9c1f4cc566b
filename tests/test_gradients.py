"""Differentiable rendering: gradients vs finite differences (BASELINE.md
"gradient agreement" metric).  Deterministic sampling makes the FD estimator
exact up to float precision — same samples for f(x) and f(x+h)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracer_tpu.integrators.path_tracer import RenderParams
from raytracer_tpu.math.transform import RigidTransform
from raytracer_tpu.render.renderer import ViewportParams, trace_rows
from raytracer_tpu.scene import types as T
from raytracer_tpu.scene.build import LightDesc, MaterialDesc, SceneBuilder
from raytracer_tpu.scene.camera import make_camera


def _scene():
    b = SceneBuilder()
    m = b.add_material(MaterialDesc(bsdf="diffuse", base_color=(0.6, 0.5, 0.4)))
    b.add_rect(RigidTransform(translation=(0, 0, 3), euler_deg=(180, 0, 0)), (20, 20), m)
    b.add_sphere(RigidTransform(translation=(0.5, 0, 2)), 0.4, m)
    b.add_light(LightDesc(kind=T.LIGHT_BACKGROUND, color=(0.5, 0.5, 0.5)))
    b.add_light(
        LightDesc(kind=T.LIGHT_POINT, color=(5.0, 4.0, 3.0),
                  transform=RigidTransform(translation=(0, 1, 1)))
    )
    return b.build()


VP = ViewportParams(width=8, height=8, seed=1)
PARAMS = RenderParams(max_depth=4, mis=True)


def _loss(scene, meta, cam, base_color):
    s = scene._replace(materials=scene.materials._replace(base_color=base_color))
    r, _ = trace_rows(s, meta, cam, jnp.int32(0), None, VP, PARAMS)
    return jnp.mean(r.x + 2.0 * r.y + 0.5 * r.z)


class TestGradients:
    def test_grad_matches_finite_difference(self):
        scene, meta = _scene()
        cam = make_camera(RigidTransform(), fov_deg=40.0)
        bc = scene.materials.base_color
        f = jax.jit(lambda b: _loss(scene, meta, cam, b))
        g = jax.jit(jax.grad(lambda b: _loss(scene, meta, cam, b)))(bc)

        h = 1e-3
        for comp, garr in (("x", g.x), ("y", g.y), ("z", g.z)):
            e = jnp.zeros_like(bc.x).at[0].set(h)
            bp = bc._replace(**{comp: getattr(bc, comp) + e})
            bm = bc._replace(**{comp: getattr(bc, comp) - e})
            fd = (float(f(bp)) - float(f(bm))) / (2 * h)
            ad = float(garr[0])
            assert np.isfinite(ad)
            np.testing.assert_allclose(ad, fd, rtol=0.05, atol=1e-3,
                                       err_msg=f"component {comp}")

    def test_grad_emission(self):
        scene, meta = _scene()
        cam = make_camera(RigidTransform(), fov_deg=40.0)

        def loss(em):
            s = scene._replace(materials=scene.materials._replace(emission=em))
            r, _ = trace_rows(s, meta, cam, jnp.int32(0), None, VP, PARAMS)
            return jnp.mean(r.x)

        em = scene.materials.emission
        g = jax.jit(jax.grad(loss))(em)
        h = 1e-3
        f = jax.jit(loss)
        e = jnp.zeros_like(em.x).at[0].set(h)
        fd = (float(f(em._replace(x=em.x + e))) - float(f(em._replace(x=em.x - e)))) / (2 * h)
        np.testing.assert_allclose(float(g.x[0]), fd, rtol=0.05, atol=1e-4)

    def test_grad_light_color(self):
        scene, meta = _scene()
        cam = make_camera(RigidTransform(), fov_deg=40.0)

        def loss(lc):
            s = scene._replace(lights=scene.lights._replace(color=lc))
            r, _ = trace_rows(s, meta, cam, jnp.int32(0), None, VP, PARAMS)
            return jnp.mean(r.x)

        lc = scene.lights.color
        g = jax.jit(jax.grad(loss))(lc)
        assert bool(jnp.all(jnp.isfinite(g.x)))
        # background light (idx 0) contributes positively to the red channel
        assert float(g.x[0]) > 0.0

    def test_grad_camera_pose_finite(self):
        scene, meta = _scene()

        def loss(origin_z):
            cam = make_camera(RigidTransform(), fov_deg=40.0)
            cam2 = jax.tree_util.tree_map(lambda x: x, cam)
            cam2 = cam._replace_origin(origin_z) if hasattr(cam, "_replace_origin") else cam
            # move camera along z via dataclasses.replace on the pytree leaf
            import dataclasses
            from raytracer_tpu.math.vec import Vec3
            cam2 = dataclasses.replace(
                cam, origin=Vec3(cam.origin.x, cam.origin.y, cam.origin.z + origin_z)
            )
            r, _ = trace_rows(scene, meta, cam2, jnp.int32(0), None, VP, PARAMS)
            return jnp.mean(r.x)

        g = jax.jit(jax.grad(loss))(jnp.float32(0.0))
        assert np.isfinite(float(g))
