"""Material parameter resolution (gather + texture evaluation).

Analogue of `Material::EvaluateShadingData` (`Core/Material/Material.cpp:151-158`):
per-ray gather of the material table, modulated by optional textures.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..math.vec import Vec3
from ..scene.types import Materials, SceneData
from .bsdf import MatParams


def _gather_vec3(v: Vec3, idx) -> Vec3:
    return Vec3(v.x[idx], v.y[idx], v.z[idx])


def _apply_decals(scene: SceneData, position, base_color: Vec3, roughness):
    """Alpha-blend decals onto shading parameters (`DecalSceneObject::Apply`
    + the point-in-box walk in `Scene::EvaluateShadingData`,
    `Scene.cpp:446-462`).  Decals are pre-sorted by descending order; the
    count is small and static, so a branchless unrolled loop replaces the
    reference's decal BVH."""
    from ..scene.types import INVALID_ID

    d = scene.decals
    for i in range(d.count):
        rot = _gather_vec3_scalar(d.rot, i)
        local = _to_local(rot, position - _vec3_at(d.trans, i))
        hs = _vec3_at(d.half_size, i)
        u = 0.5 * (local.x / jnp.maximum(hs.x, 1e-8) + 1.0)
        v = 0.5 * (local.y / jnp.maximum(hs.y, 1e-8) + 1.0)
        w = 0.5 * (local.z / jnp.maximum(hs.z, 1e-8) + 1.0)
        inside = (
            (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0)
            & (w >= 0.0) & (w <= 1.0)
        )
        color = _vec3_at(d.base_color, i)
        alpha_t = jnp.ones_like(u)
        if scene.textures is not None:
            from .textures import sample_texture_many

            # INVALID_ID lanes evaluate to 1.0 inside sample_texture_many
            tid = jnp.full_like(position.x.astype(jnp.int32), 0) + d.base_color_tex[i]
            color = color * sample_texture_many(scene.textures, tid, u, v)
            aid = jnp.full_like(tid, 0) + d.alpha_tex[i]
            alpha_t = sample_texture_many(scene.textures, aid, u, v).x
        alpha = (d.alpha_min[i] + (d.alpha_max[i] - d.alpha_min[i]) * alpha_t)
        a = jnp.where(inside, alpha, 0.0)
        base_color = base_color * (1.0 - a) + color * a
        roughness = roughness * (1.0 - a) + d.roughness[i] * a
    return base_color, roughness


def _vec3_at(v: Vec3, i: int) -> Vec3:
    return Vec3(v.x[i], v.y[i], v.z[i])


def _gather_vec3_scalar(rot, i: int):
    from ..scene.types import Rot3

    return Rot3(_vec3_at(rot.r0, i), _vec3_at(rot.r1, i), _vec3_at(rot.r2, i))


def _to_local(rot, v: Vec3) -> Vec3:
    from ..math.vec import dot

    return Vec3(dot(v, rot.r0), dot(v, rot.r1), dot(v, rot.r2))


def apply_normal_map(scene: SceneData, frame):
    """Perturb the shading frame by the material's tangent-space normal map
    — `Material::GetNormalVector` (`Core/Material/Material.cpp:120-138`)
    applied exactly as `Scene::EvaluateIntersection` does
    (`Core/Scene/Scene.cpp:328-344`): fetch, [0,1]->[-1,1], reconstruct z,
    lerp toward +Z by ``normal_strength``, rotate into the frame, then
    re-orthogonalize the tangent against the new normal.

    (`mask_tex` note: the reference PARSES mask maps and defines
    `Material::GetMaskValue` (`Material.cpp:140-149`) but no call site
    exists anywhere in its Core/ — alpha masking is dead upstream; we store
    the field for scene-schema compatibility and match that behavior.)
    """
    if scene.textures is None:
        return frame
    from ..math.vec import cross, dot, normalize
    from .textures import sample_texture_many

    mats = scene.materials
    idx = jnp.maximum(frame.material_id, 0)
    ntex = mats.normal_tex[idx]
    has = ntex >= 0
    t = sample_texture_many(scene.textures, ntex, frame.tex_u, frame.tex_v)
    nx = 2.0 * t.x - 1.0
    ny = 2.0 * t.y - 1.0
    nz = jnp.sqrt(jnp.maximum(1.0 - nx * nx - ny * ny, 1e-12))
    s = mats.normal_strength[idx]
    # Lerp(VECTOR_Z, n, strength) (`Material.cpp:133`)
    nx = nx * s
    ny = ny * s
    nz = nz * s + (1.0 - s)
    world_n = normalize(
        frame.tangent * nx + frame.bitangent * ny + frame.normal * nz, eps=1e-20
    )
    from ..math.vec import where as vwhere

    new_n = vwhere(has, world_n, frame.normal)
    # orthogonalize tangent (`Scene.cpp:340`), rebuild bitangent to keep the
    # same handedness as build_onb/local_to_world
    new_t = normalize(frame.tangent - new_n * dot(frame.tangent, new_n), eps=1e-20)
    new_b = cross(new_n, new_t)
    return frame._replace(normal=new_n, tangent=new_t, bitangent=new_b)


def resolve_material(scene: SceneData, material_id, tex_u=None, tex_v=None,
                     wavelength=None, position=None) -> MatParams:
    """``wavelength`` (N,) nm: spectral mode — dispersive materials get a
    Cauchy wavelength-dependent IoR (`RoughDielectricBSDF.cpp:29-44`).
    ``position`` (N,) world shading points: enables decal application."""
    from .smallgather import lookup_columns

    mats: Materials = scene.materials
    idx = jnp.maximum(material_id, 0)
    # every material column in ONE one-hot MXU matmul (ops/smallgather.py)
    (bsdf_k, bc_x, bc_y, bc_z, em_x, em_y, em_z, roughness, metalness,
     ior_c, k_c, disp_c, abbe_c, dc_c, dd_c, dua_c,
     bct, emt, rot_, met) = lookup_columns(idx, [
        mats.bsdf,
        mats.base_color.x, mats.base_color.y, mats.base_color.z,
        mats.emission.x, mats.emission.y, mats.emission.z,
        mats.roughness, mats.metalness,
        mats.ior, mats.k, mats.dispersive, mats.abbe,
        mats.dispersion_c, mats.dispersion_d, mats.disp_use_abbe,
        mats.base_color_tex, mats.emission_tex, mats.roughness_tex,
        mats.metalness_tex,
    ])
    base_color = Vec3(bc_x, bc_y, bc_z)
    emission = Vec3(em_x, em_y, em_z)

    if scene.textures is not None and tex_u is not None:
        from .textures import sample_texture_many

        base_color = base_color * sample_texture_many(
            scene.textures, bct, tex_u, tex_v
        )
        emission = emission * sample_texture_many(
            scene.textures, emt, tex_u, tex_v
        )
        rough_t = sample_texture_many(scene.textures, rot_, tex_u, tex_v)
        roughness = roughness * rough_t.x
        metal_t = sample_texture_many(scene.textures, met, tex_u, tex_v)
        metalness = metalness * metal_t.x

    ior = ior_c
    dispersive = disp_c
    if wavelength is not None:
        from ..color.spectrum import cauchy_ior

        # reference form (`RoughDielectricBSDF.cpp:33-37`): base IoR plus
        # Cauchy C/lambda^2 + D/lambda^4 terms (lambda in um); the (n_d,
        # abbe) form is our schema extension, selected per material
        lam_um = wavelength * 1e-3
        l2 = jnp.maximum(lam_um * lam_um, 1e-6)
        ior_cd = ior + dc_c / l2 + dd_c / (l2 * l2)
        ior_ab = cauchy_ior(ior, abbe_c, wavelength)
        ior = jnp.where(
            dispersive,
            jnp.where(dua_c, ior_ab, ior_cd),
            ior,
        )

    if scene.decals is not None and position is not None:
        base_color, roughness = _apply_decals(scene, position, base_color, roughness)

    return MatParams(
        bsdf=bsdf_k,
        base_color=base_color,
        emission=emission,
        roughness=roughness,
        metalness=metalness,
        ior=ior,
        k=k_c,
        dispersive=dispersive,
    )
