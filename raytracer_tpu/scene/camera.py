"""Camera ray generation (wavefront, differentiable).

Semantics follow ``Core/Scene/Camera.cpp``:

- film coords in [0,1)^2, mapped to bipolar [-1,1] (`Camera.cpp:81-84`)
- dir = forward + tanHalfFoV * (right * bx * aspect + up * by) (`Camera.cpp:94-98`)
- optional barrel distortion (`Camera.cpp:86-92`)
- thin-lens DoF with bokeh shapes (`Camera.cpp:100-115`)
- WorldToFilm / PdfW for light tracing & VCM (`Camera.cpp:120-147`)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..math import sampling
from ..math.transform import RigidTransform
from ..math.vec import Vec3, dot, normalize
from ..sampler.sampler import SampleStream, next_1d, next_2d, next_3d
from .types import Camera

BOKEH_CIRCLE = 0
BOKEH_HEXAGON = 1
BOKEH_SQUARE = 2
BOKEH_NGON = 3


class Rays(NamedTuple):
    """A wavefront of rays (SoA). Direction is normalized."""

    origin: Vec3
    dir: Vec3


def make_camera(
    transform: RigidTransform,
    fov_deg: float = 60.0,
    aspect: float = 1.0,
    enable_dof: bool = False,
    aperture: float = 0.1,
    focal_distance: float = 2.0,
    bokeh_shape: int = BOKEH_CIRCLE,
    aperture_blades: int = 5,
    enable_distortion: bool = False,
    distortion_const: float = 0.01,
    distortion_variable: float = 0.0,
    transform_end: RigidTransform | None = None,
) -> Camera:
    """``transform_end`` is the camera pose at shutter-close (time=1); pass it
    to enable camera motion blur (`Camera::SampleTransform`, `Camera.cpp:61-79`)."""
    f32 = lambda v: jnp.float32(v)
    rows = transform.rot.astype(np.float32)
    mkvec = lambda r: Vec3(f32(r[0]), f32(r[1]), f32(r[2]))
    end = transform_end if transform_end is not None else transform
    rows_end = end.rot.astype(np.float32)
    return Camera(
        origin=mkvec(transform.translation.astype(np.float32)),
        right=mkvec(rows[0]),
        up=mkvec(rows[1]),
        forward=mkvec(rows[2]),
        tan_half_fov=f32(np.tan(np.deg2rad(fov_deg) * 0.5)),
        aspect=f32(aspect),
        aperture=f32(aperture),
        focal_distance=f32(focal_distance),
        distortion_const=f32(distortion_const),
        distortion_variable=f32(distortion_variable),
        origin_end=mkvec(end.translation.astype(np.float32)),
        right_end=mkvec(rows_end[0]),
        up_end=mkvec(rows_end[1]),
        forward_end=mkvec(rows_end[2]),
        enable_dof=enable_dof,
        bokeh_shape=bokeh_shape,
        aperture_blades=aperture_blades,
        enable_distortion=enable_distortion,
        enable_motion_blur=transform_end is not None,
    )


def _sample_bokeh(cam: Camera, stream: SampleStream):
    """Lens-aperture point by bokeh shape (`Camera.cpp:195-242`)."""
    u1, u2, u3, stream = next_3d(stream)
    if cam.bokeh_shape == BOKEH_CIRCLE:
        bx, by = sampling.sample_circle(u1, u2)
    elif cam.bokeh_shape == BOKEH_HEXAGON:
        bx, by = sampling.sample_hexagon(u1, u2, u3)
    elif cam.bokeh_shape == BOKEH_SQUARE:
        bx, by = sampling.sample_square(u1, u2)
    else:
        bx, by = sampling.sample_regular_polygon(cam.aperture_blades, u1, u2, u3)
    return bx, by, stream


def _sample_transform(cam: Camera, time):
    """Per-ray camera basis at ray ``time``: lerp of the shutter-open/-close
    poses, re-orthonormalized (`Camera::SampleTransform`, `Camera.cpp:61-79`;
    the reference slerps quaternion keyframes — for the small per-frame
    rotations motion blur sees, lerp+Gram-Schmidt agrees to first order)."""
    from ..math.vec import cross

    lerp = lambda a, b: a + (b - a) * time
    origin = Vec3(lerp(cam.origin.x, cam.origin_end.x), lerp(cam.origin.y, cam.origin_end.y), lerp(cam.origin.z, cam.origin_end.z))
    fwd = normalize(Vec3(lerp(cam.forward.x, cam.forward_end.x), lerp(cam.forward.y, cam.forward_end.y), lerp(cam.forward.z, cam.forward_end.z)), eps=1e-20)
    r_raw = Vec3(lerp(cam.right.x, cam.right_end.x), lerp(cam.right.y, cam.right_end.y), lerp(cam.right.z, cam.right_end.z))
    right = normalize(r_raw - fwd * dot(r_raw, fwd), eps=1e-20)
    up = cross(fwd, right)
    return origin, right, up, fwd


def generate_rays(cam: Camera, coords_x, coords_y, stream: SampleStream, time=None) -> tuple[Rays, SampleStream]:
    """coords in [0,1)^2 (x right, y up) -> world-space camera rays.

    ``time`` is the per-ray shutter time in [0,1] (motion blur); None = static.
    """
    bx = 2.0 * coords_x - 1.0
    by = 2.0 * coords_y - 1.0

    if cam.enable_distortion:
        u, stream = next_1d(stream)
        r2 = bx * bx + by * by
        factor = r2 * (cam.distortion_const + cam.distortion_variable * u)
        bx = bx + bx * factor
        by = by + by * factor

    if cam.enable_motion_blur and time is not None:
        cam_origin, right, up, forward = _sample_transform(cam, time)
        origin = Vec3(
            jnp.broadcast_to(cam_origin.x, bx.shape),
            jnp.broadcast_to(cam_origin.y, bx.shape),
            jnp.broadcast_to(cam_origin.z, bx.shape),
        )
    else:
        right, up, forward = cam.right, cam.up, cam.forward
        origin = Vec3(
            jnp.broadcast_to(cam.origin.x, bx.shape),
            jnp.broadcast_to(cam.origin.y, bx.shape),
            jnp.broadcast_to(cam.origin.z, bx.shape),
        )

    direction = forward + (right * (bx * cam.aspect) + up * by) * cam.tan_half_fov

    if cam.enable_dof:
        focus = origin + direction * cam.focal_distance
        px, py, stream = _sample_bokeh(cam, stream)
        origin = origin + right * (px * cam.aperture) + up * (py * cam.aperture)
        direction = focus - origin

    return Rays(origin=origin, dir=normalize(direction, eps=1e-20)), stream


def world_to_film(cam: Camera, p: Vec3):
    """World point -> film coords in [0,1]^2 + validity (`Camera.cpp:120-133`).

    Used by the light tracer / VCM camera connections.
    """
    rel = p - cam.origin
    # camera-space coordinates (rows are orthonormal)
    cx = dot(rel, cam.right)
    cy = dot(rel, cam.up)
    cz = dot(rel, cam.forward)
    valid = cz > 1e-6
    inv = 1.0 / jnp.where(valid, cz, 1.0)
    fx = cx * inv / (cam.tan_half_fov * cam.aspect)
    fy = cy * inv / cam.tan_half_fov
    u = 0.5 * (fx + 1.0)
    v = 0.5 * (fy + 1.0)
    valid = valid & (u >= 0.0) & (u < 1.0) & (v >= 0.0) & (v < 1.0)
    return u, v, valid


def camera_pdf_w(cam: Camera, direction: Vec3) -> jnp.ndarray:
    """Solid-angle pdf of the camera sampling ``direction`` (`Camera.cpp:135-147`)."""
    cos_at_camera = dot(cam.forward, direction)
    pdf = 0.25 / jnp.maximum(
        cam.tan_half_fov**2 * cos_at_camera**3 * cam.aspect, 1e-20
    )
    return jnp.where(cos_at_camera > 0.0, pdf, 0.0)
