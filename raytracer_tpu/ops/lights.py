"""Wavefront light sampling (NEE) and radiance evaluation.

Branchless re-expression of `Core/Scene/Light/*.cpp`: every light kind's
Illuminate / GetRadiance is computed masked and selected by the per-light
integer kind.  All conventions (pdfs, cone tests, scene radius) follow the
reference files cited inline.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..math import sampling
from ..math.vec import Vec3, dot, normalize, where as vwhere
from ..scene.types import (
    LIGHT_AREA,
    LIGHT_BACKGROUND,
    LIGHT_DIRECTIONAL,
    LIGHT_POINT,
    LIGHT_SPOT,
    SHAPE_BOX,
    SHAPE_RECT,
    SHAPE_SPHERE,
    Lights,
    Rot3,
)

BIG = 3.0e38  # python float (see intersect.py)
SCENE_RADIUS = 30.0  # BackgroundLight.cpp:16 (TODO in reference too)


def _gather_vec3(v: Vec3, idx) -> Vec3:
    return Vec3(v.x[idx], v.y[idx], v.z[idx])


class LightSlice(NamedTuple):
    """One light's params gathered per-ray (after random light pick)."""

    kind: jnp.ndarray
    color: Vec3
    rot: Rot3
    trans: Vec3
    shape_kind: jnp.ndarray
    shape_param: Vec3
    area: jnp.ndarray
    cos_angle: jnp.ndarray
    is_delta: jnp.ndarray
    is_finite: jnp.ndarray
    env_tex: jnp.ndarray


def gather_light(lights: Lights, idx) -> LightSlice:
    """All 24 light columns in ONE one-hot MXU matmul (ops/smallgather.py)
    instead of 24 element-gathers — light tables are tiny."""
    from .smallgather import lookup_columns

    idx = jnp.asarray(idx)
    if idx.ndim == 0:
        idx = idx[None]
        squeeze = True
    else:
        squeeze = False
    cols = [
        lights.kind,
        lights.color.x, lights.color.y, lights.color.z,
        lights.rot.r0.x, lights.rot.r0.y, lights.rot.r0.z,
        lights.rot.r1.x, lights.rot.r1.y, lights.rot.r1.z,
        lights.rot.r2.x, lights.rot.r2.y, lights.rot.r2.z,
        lights.trans.x, lights.trans.y, lights.trans.z,
        lights.shape_kind,
        lights.shape_param.x, lights.shape_param.y, lights.shape_param.z,
        lights.area, lights.cos_angle, lights.is_delta, lights.is_finite,
        lights.env_tex,
    ]
    r = lookup_columns(idx, cols)
    if squeeze:
        r = [v[0] for v in r]
    return LightSlice(
        kind=r[0],
        color=Vec3(r[1], r[2], r[3]),
        rot=Rot3(Vec3(r[4], r[5], r[6]), Vec3(r[7], r[8], r[9]), Vec3(r[10], r[11], r[12])),
        trans=Vec3(r[13], r[14], r[15]),
        shape_kind=r[16],
        shape_param=Vec3(r[17], r[18], r[19]),
        area=r[20],
        cos_angle=r[21],
        is_delta=r[22],
        is_finite=r[23],
        env_tex=r[24],
    )


class Illumination(NamedTuple):
    """ILight::IlluminateResult (`Light.h:62-69`)."""

    dir_to_light: Vec3
    distance: jnp.ndarray
    direct_pdf_w: jnp.ndarray
    emission_pdf_w: jnp.ndarray  # pdf of emitting along this connection (VCM MIS)
    cos_at_light: jnp.ndarray
    radiance: Vec3
    valid: jnp.ndarray


def _sample_shape_surface(l: LightSlice, u1, u2, u3):
    """Uniform point + normal on the light's shape, in light-local space
    (`RectShape.cpp:50-63`, `SphereShape.cpp:47-62`, `BoxShape.cpp:127-178`)."""
    # rect: z=0 plane, normal +Z
    rx = l.shape_param.x * (2.0 * u1 - 1.0)
    ry = l.shape_param.y * (2.0 * u2 - 1.0)
    zero = jnp.zeros_like(u1)
    one = jnp.ones_like(u1)
    rect_p = Vec3(rx, ry, zero)
    rect_n = Vec3(zero, zero, one)
    # sphere: uniform point
    sph_n = sampling.sample_sphere(u1, u2)
    sph_p = sph_n * l.shape_param.x
    # box: area-weighted face pick by u3 (`BoxShape::Sample` face CDF), then
    # a uniform point on the picked face; v < 0.5 selects the -axis face
    hx, hy, hz = l.shape_param.x, l.shape_param.y, l.shape_param.z
    ax_w = hy * hz
    ay_w = hz * hx
    az_w = hx * hy
    c1 = ax_w
    c2 = ax_w + ay_w
    c3 = jnp.maximum(ax_w + ay_w + az_w, 1e-20)
    v = u3 * c3
    pick_x = v < c1
    pick_y = (~pick_x) & (v < c2)
    # renormalize the picked segment to [0, 1) -> face sign
    vr = jnp.where(
        pick_x, v / jnp.maximum(c1, 1e-20),
        jnp.where(pick_y, (v - c1) / jnp.maximum(ay_w, 1e-20),
                  (v - c2) / jnp.maximum(az_w, 1e-20)),
    )
    sgn = jnp.where(vr < 0.5, -1.0, 1.0)
    a1 = 2.0 * u1 - 1.0
    a2 = 2.0 * u2 - 1.0
    box_p = vwhere(
        pick_x, Vec3(sgn * hx, a1 * hy, a2 * hz),
        vwhere(pick_y, Vec3(a2 * hx, sgn * hy, a1 * hz),
               Vec3(a1 * hx, a2 * hy, sgn * hz)),
    )
    box_n = vwhere(
        pick_x, Vec3(sgn, zero, zero),
        vwhere(pick_y, Vec3(zero, sgn, zero), Vec3(zero, zero, sgn)),
    )

    is_sphere = l.shape_kind == SHAPE_SPHERE
    is_box = l.shape_kind == SHAPE_BOX
    p = vwhere(is_sphere, sph_p, vwhere(is_box, box_p, rect_p))
    n = vwhere(is_sphere, sph_n, vwhere(is_box, box_n, rect_n))
    return p, n


def env_sample_direction(env, u1, u2) -> tuple[Vec3, jnp.ndarray]:
    """Importance-sample a direction from a lat-long env-map distribution.

    Returns (world direction, solid-angle pdf).  The (u, v) mapping matches
    ``cartesian_to_spherical_uv`` (y-up: v = theta/pi from +Y, u = phi/2pi+0.5),
    so sampled texels line up with `_env_radiance` fetches.  Jacobian:
    pdf_w = pdf_uv / (2 pi^2 sin(theta)).  This upgrades the reference's
    uniform-hemisphere `BackgroundLight::Illuminate` (`BackgroundLight.cpp:
    63-74`, importance sampling TODO there).
    """
    from ..math.distribution import sample_2d

    u, v, pdf_uv = sample_2d(env, u1, u2)
    theta = v * jnp.pi
    phi = (u - 0.5) * (2.0 * jnp.pi)
    sin_t = jnp.sin(theta)
    d = Vec3(sin_t * jnp.cos(phi), jnp.cos(theta), sin_t * jnp.sin(phi))
    pdf_w = pdf_uv / jnp.maximum(2.0 * jnp.pi * jnp.pi * sin_t, 1e-6)
    return d, pdf_w


def env_direction_pdf(env, d: Vec3) -> jnp.ndarray:
    """Solid-angle pdf :func:`env_sample_direction` assigns to direction ``d``
    (the MIS counterpart used when a BSDF-sampled ray escapes)."""
    from ..math.distribution import pdf_2d
    from ..math.sampling import cartesian_to_spherical_uv

    u, v = cartesian_to_spherical_uv(d)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - d.y * d.y, 1e-12))
    return pdf_2d(env, u, v) / jnp.maximum(2.0 * jnp.pi * jnp.pi * sin_t, 1e-6)


def sphere_cone_cos_max(center: Vec3, radius, point: Vec3):
    """cos of the half-angle of the cone subtending a sphere from ``point``
    (`SphereShape.cpp:65-75`). Returns (cos_max, dist_to_center, outside)."""
    to_c = center - point
    dc2 = dot(to_c, to_c)
    dc = jnp.sqrt(jnp.maximum(dc2, 1e-12))
    # AD-safety (camera-pose gradients flow through ``point``):
    # - dc floored at 1e-6 so d(radius/dc)/d(dc) = -r/dc^2 cannot overflow to
    #   inf (a 0-cotangent * inf = NaN on masked non-sphere lanes otherwise —
    #   e.g. the background light sits at the camera origin, dc2 == 0 exactly)
    # - ratio clamped to [2e-3, ~1] before squaring so cos_max stays strictly
    #   inside (0, 1): cos_max == 1 makes sample_cone / sphere_cap_pdf
    #   non-differentiable, and the clamp's zero gradient at the bound severs
    #   the spurious backward path on those lanes.
    ratio = jnp.clip(radius / jnp.maximum(dc, 1e-6), 2e-3, 1.0)
    sin2_max = jnp.clip(ratio * ratio, 4e-6, 1.0 - 1e-7)
    cos_max = jnp.sqrt(1.0 - sin2_max)
    return cos_max, dc, dc2 > radius * radius


def illuminate(l: LightSlice, shading_pos: Vec3, shading_frame_normal: Vec3, u1, u2, u3,
               env=None, sphere_cone: bool = False,
               scene_radius: float = SCENE_RADIUS) -> Illumination:
    """NEE sample toward one light (ILight::Illuminate for every kind).

    ``env``: optional Distribution2D over the background light's lat-long env
    map; when given, background lanes importance-sample it instead of the
    uniform hemisphere.

    ``sphere_cone``: sphere-shaped area lights sample the subtended solid
    angle uniformly (`SphereShape::Sample`, `SphereShape.cpp:65-95`) instead
    of the surface area — far lower variance for small/distant spheres.  The
    caller's BSDF-hit MIS pdf must then use :func:`sphere_cone_cos_max`."""
    zero = jnp.zeros_like(u1)
    one = jnp.ones_like(u1)

    # --- point / spot (`PointLight.cpp:35-49`, `SpotLight.cpp:41-61`)
    to_l = l.trans - shading_pos
    sqr_d = dot(to_l, to_l)
    dist_p = jnp.sqrt(jnp.maximum(sqr_d, 1e-20))
    dir_p = to_l * (1.0 / dist_p)
    pdf_point = sqr_d  # directPdfW = d^2 (delta light; cancels the 1/d^2)
    # spot cone test about the light's local +Z axis (Emit uses +Z,
    # `SpotLight.cpp:63-96`; Illuminate's world -Z is a reference quirk we fix)
    spot_axis = l.rot.r2
    spot_cos = dot(-dir_p, spot_axis)
    spot_ok = spot_cos >= l.cos_angle

    # --- area (`AreaLight.cpp:42-105` solid-angle=False path via IShape::Sample,
    #     `Shape.cpp:65-93`)
    p_local, n_local = _sample_shape_surface(l, u1, u2, u3)
    p_world = l.rot.to_world(p_local) + l.trans
    n_world = l.rot.to_world(n_local)
    to_a = p_world - shading_pos
    sqr_da = dot(to_a, to_a)
    dist_a = jnp.sqrt(jnp.maximum(sqr_da, 1e-20))
    dir_a = to_a * (1.0 / dist_a)
    cos_at = dot(n_world, -dir_a)  # light emits along its normal
    inv_area = 1.0 / jnp.maximum(l.area, 1e-8)
    pdf_area = inv_area * sqr_da / jnp.maximum(cos_at, 1e-4)
    area_ok = cos_at > 1e-7

    if sphere_cone:
        # sphere lights: uniform sample of the subtended cone
        # (`SphereShape.cpp:65-95`)
        radius = l.shape_param.x
        cos_max, dc, outside = sphere_cone_cos_max(l.trans, radius, shading_pos)
        axis = (l.trans - shading_pos) * (1.0 / jnp.maximum(dc, 1e-20))
        cone_local = sampling.sample_cone(cos_max, u1, u2)
        at, ab = sampling.build_onb(axis)
        dir_s = sampling.local_to_world(cone_local, at, ab, axis)
        cos_t = cone_local.z
        under = radius * radius - dc * dc * (1.0 - cos_t * cos_t)
        # double-where: sqrt' at 0 is inf, and ``under`` is exactly 0 for the
        # (masked) non-sphere lanes — 0-cotangent * inf = NaN would poison the
        # camera-pose gradient through shading_pos (tests/test_gradients.py)
        under_pos = under > 0.0
        sqrt_under = jnp.where(
            under_pos, jnp.sqrt(jnp.where(under_pos, under, 1.0)), 0.0
        )
        t_s = dc * cos_t - sqrt_under
        hit = shading_pos + dir_s * t_s
        n_s = normalize(hit - l.trans, eps=1e-20)
        cos_at_s = dot(n_s, -dir_s)
        pdf_s = sampling.sphere_cap_pdf(cos_max)
        is_sph = l.shape_kind == SHAPE_SPHERE
        dir_a = vwhere(is_sph, dir_s, dir_a)
        dist_a = jnp.where(is_sph, t_s, dist_a)
        cos_at = jnp.where(is_sph, cos_at_s, cos_at)
        pdf_area = jnp.where(is_sph, pdf_s, pdf_area)
        # ``under_pos``: the (eps-widened) cone sample actually hits the sphere
        area_ok = jnp.where(is_sph, outside & under_pos & (cos_at_s > 1e-7), area_ok)

        # rect lights: Urena spherical-quad solid-angle sampling
        # (`RectShape.cpp:66-94` via `SphericalQuad.h`) — uniform over the
        # subtended solid angle; big variance win for close/large rects
        hx_r, hy_r = l.shape_param.x, l.shape_param.y
        corner = l.rot.to_world(Vec3(-hx_r, -hy_r, jnp.zeros_like(hx_r))) + l.trans
        quad = sampling.spherical_quad_prepare(
            corner, l.rot.r0 * (2.0 * hx_r), l.rot.r1 * (2.0 * hy_r), shading_pos
        )
        p_q, pdf_q = sampling.spherical_quad_sample(quad, shading_pos, u1, u2)
        to_q = p_q - shading_pos
        d2_q = dot(to_q, to_q)
        dist_q = jnp.sqrt(jnp.maximum(d2_q, 1e-20))
        dir_q = to_q * (1.0 / dist_q)
        n_rect = l.rot.r2
        cos_at_q = dot(n_rect, -dir_q)
        is_rect = l.shape_kind == SHAPE_RECT
        dir_a = vwhere(is_rect, dir_q, dir_a)
        dist_a = jnp.where(is_rect, dist_q, dist_a)
        cos_at = jnp.where(is_rect, cos_at_q, cos_at)
        pdf_area = jnp.where(is_rect, pdf_q, pdf_area)
        area_ok = jnp.where(is_rect, cos_at_q > 1e-7, area_ok)

    # --- background: env-map importance sampling when a distribution exists,
    #     else uniform hemisphere about the shading normal
    #     (`BackgroundLight.cpp:63-74`)
    if env is not None:
        dir_bg, pdf_bg = env_sample_direction(env, u1, u2)
    else:
        h_local = sampling.sample_hemisphere(u1, u2)
        t, b = sampling.build_onb(shading_frame_normal)
        dir_bg = sampling.local_to_world(h_local, t, b, shading_frame_normal)
        pdf_bg = jnp.full_like(u1, sampling.uniform_hemisphere_pdf())

    # --- directional (`DirectionalLight.cpp:48-89`): cone about local -Z
    cone = sampling.sample_cone(l.cos_angle, u1, u2)
    # TransformVectorNeg: dir to light = -(local dir in world)
    dir_dl_wide = -(l.rot.r0 * cone.x + l.rot.r1 * cone.y + l.rot.r2 * cone.z)
    is_delta_dl = l.cos_angle > 0.9999
    dir_dl = vwhere(is_delta_dl, -l.rot.r2, dir_dl_wide)
    pdf_dl = jnp.where(
        is_delta_dl, 1.0,
        sampling.sphere_cap_pdf(jnp.minimum(l.cos_angle, 1.0 - 1e-6)),
    )

    is_point = l.kind == LIGHT_POINT
    is_spot = l.kind == LIGHT_SPOT
    is_area = l.kind == LIGHT_AREA
    is_bg = l.kind == LIGHT_BACKGROUND
    is_dl = l.kind == LIGHT_DIRECTIONAL

    dir_to_light = vwhere(
        is_area, dir_a,
        vwhere(is_bg, dir_bg, vwhere(is_dl, dir_dl, dir_p)),
    )
    distance = jnp.select(
        [is_area, is_bg, is_dl], [dist_a, jnp.full_like(u1, BIG), jnp.full_like(u1, BIG)], dist_p
    )
    direct_pdf_w = jnp.select(
        [is_area, is_bg, is_dl], [pdf_area, pdf_bg, pdf_dl], pdf_point
    )
    cos_at_light = jnp.select([is_area], [cos_at], one)
    valid = jnp.select(
        [is_area, is_spot], [area_ok, spot_ok], jnp.ones_like(u1, bool)
    ).astype(bool)
    radiance = l.color  # env texture modulation handled by caller for bg lights
    # emission pdf along this connection (VCM MIS; mirrors each
    # ILight::Illuminate's outEmissionPdfW)
    circle_pdf = sampling.uniform_circle_pdf(scene_radius)
    emission_pdf_w = jnp.select(
        [is_area, is_bg, is_dl, is_spot],
        [
            inv_area * jnp.maximum(cos_at, 1e-6) / jnp.pi,
            sampling.uniform_sphere_pdf() * circle_pdf,
            jnp.where(l.cos_angle > 0.9999, 1.0,
                      sampling.sphere_cap_pdf(jnp.minimum(l.cos_angle, 1.0 - 1e-6))) * circle_pdf,
            sampling.sphere_cap_pdf(jnp.minimum(l.cos_angle, 1.0 - 1e-6)),
        ],
        jnp.full_like(u1, sampling.uniform_sphere_pdf()),
    )
    return Illumination(
        dir_to_light=dir_to_light,
        distance=distance,
        direct_pdf_w=direct_pdf_w,
        emission_pdf_w=emission_pdf_w,
        cos_at_light=cos_at_light,
        radiance=radiance,
        valid=valid,
    )


def area_light_radiance(l: LightSlice, ray_dir: Vec3, hit_normal: Vec3):
    """GetRadiance for an area light hit by a camera/BSDF ray
    (`AreaLight.cpp:107-140` with solid-angle pdf via `Shape::Pdf`).

    Returns (radiance, direct_pdf_a, valid). pdf is in AREA measure; the
    integrator converts with PdfAtoW (`PathTracerMIS.cpp:196-200`).
    """
    cos_at_light = dot(hit_normal, -ray_dir)
    valid = cos_at_light > 1e-7
    inv_area = 1.0 / jnp.maximum(l.area, 1e-8)
    # rect/box use 1/area; sphere uses cone pdf converted to area
    # (`SphereShape.cpp:108-124`)
    pdf_a = inv_area
    return l.color, pdf_a, valid


def background_radiance(lights: Lights, light_idx: int, ray_dir: Vec3):
    """Background light color for a ray direction (GetBackgroundColor,
    `BackgroundLight.cpp:45-61`). Environment texture handled by caller."""
    l = gather_light(lights, jnp.full_like(ray_dir.x, light_idx, jnp.int32))
    return l.color


class Emission(NamedTuple):
    """ILight::EmitResult (`Light.h:88-100`) + pre-divided throughput."""

    position: Vec3
    direction: Vec3
    emission_pdf_w: jnp.ndarray
    direct_pdf_a: jnp.ndarray
    cos_at_light: jnp.ndarray
    radiance: Vec3  # color term (NOT yet divided by emission pdf)


def emit(l: LightSlice, u1, u2, u3, u4, u5,
         scene_radius: float = SCENE_RADIUS) -> Emission:
    """Photon emission sampling for every light kind (ILight::Emit):
    `PointLight.cpp`, `SpotLight.cpp:63-96`, `AreaLight.cpp` (cos-hemisphere
    from a uniform surface point), `DirectionalLight.cpp`,
    `BackgroundLight.cpp` (inward from the scene bounding sphere)."""
    one = jnp.ones_like(u1)

    # --- point: uniform sphere direction, pdf 1/4pi
    dir_point = sampling.sample_sphere(u1, u2)
    pdf_point = jnp.full_like(u1, sampling.uniform_sphere_pdf())

    # --- spot: uniform cone about local +Z (`SpotLight.cpp:63-96`)
    cone = sampling.sample_cone(l.cos_angle, u1, u2)
    dir_spot = l.rot.to_world(cone)
    pdf_spot = sampling.sphere_cap_pdf(jnp.minimum(l.cos_angle, 1.0 - 1e-6))

    # --- area: uniform surface point + cosine hemisphere about the normal
    p_local, n_local = _sample_shape_surface(l, u3, u4, u5)
    p_area = l.rot.to_world(p_local) + l.trans
    n_world = l.rot.to_world(n_local)
    t, b = sampling.build_onb(n_world)
    h = sampling.sample_hemisphere_cos(u1, u2)
    dir_area = sampling.local_to_world(h, t, b, n_world)
    cos_area = h.z
    inv_area = 1.0 / jnp.maximum(l.area, 1e-8)
    pdf_area_e = inv_area * jnp.maximum(cos_area, 1e-6) / jnp.pi

    # --- directional: from a disc on the scene bounding sphere
    cx, cy = sampling.sample_circle(u3, u4)
    dl_dir_local = sampling.sample_cone(l.cos_angle, u1, u2)
    dir_dl = -(l.rot.to_world(dl_dir_local))
    du, dv = sampling.build_onb(dir_dl)
    pos_dl = (du * cx + dv * cy - dir_dl) * scene_radius
    pdf_dl_dir = jnp.where(
        l.cos_angle > 0.9999, 1.0, sampling.sphere_cap_pdf(jnp.minimum(l.cos_angle, 1.0 - 1e-6))
    )
    pdf_dl = pdf_dl_dir * sampling.uniform_circle_pdf(scene_radius)

    # --- background: inward from the bounding sphere
    dir_bg = sampling.sample_sphere(u1, u2)
    bu, bv = sampling.build_onb(dir_bg)
    pos_bg = (bu * cx + bv * cy - dir_bg) * scene_radius
    pdf_bg = sampling.uniform_sphere_pdf() * sampling.uniform_circle_pdf(scene_radius)

    is_area = l.kind == LIGHT_AREA
    is_bg = l.kind == LIGHT_BACKGROUND
    is_dl = l.kind == LIGHT_DIRECTIONAL
    is_spot = l.kind == LIGHT_SPOT

    position = vwhere(is_area, p_area, vwhere(is_bg, pos_bg, vwhere(is_dl, pos_dl, l.trans)))
    direction = vwhere(
        is_area, dir_area,
        vwhere(is_bg, dir_bg, vwhere(is_dl, dir_dl, vwhere(is_spot, dir_spot, dir_point))),
    )
    emission_pdf = jnp.select(
        [is_area, is_bg, is_dl, is_spot], [pdf_area_e, pdf_bg, pdf_dl, pdf_spot], pdf_point
    )
    direct_pdf_a = jnp.select(
        [is_area, is_bg], [inv_area, jnp.full_like(u1, sampling.uniform_hemisphere_pdf())], one
    )
    cos_at = jnp.where(is_area, cos_area, 1.0)
    # area lights emit radiance * cos into the hemisphere (`AreaLight.cpp` Emit
    # returns color * cosAtLight)
    radiance = l.color * jnp.where(is_area, jnp.maximum(cos_area, 0.0), 1.0)
    return Emission(
        position=position,
        direction=direction,
        emission_pdf_w=jnp.maximum(emission_pdf, 1e-12),
        direct_pdf_a=direct_pdf_a,
        cos_at_light=cos_at,
        radiance=radiance,
    )
