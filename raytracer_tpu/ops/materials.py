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


def resolve_material(scene: SceneData, material_id, tex_u=None, tex_v=None) -> MatParams:
    mats: Materials = scene.materials
    idx = jnp.maximum(material_id, 0)
    base_color = _gather_vec3(mats.base_color, idx)
    emission = _gather_vec3(mats.emission, idx)
    roughness = mats.roughness[idx]
    metalness = mats.metalness[idx]

    if scene.textures is not None and tex_u is not None:
        from .textures import sample_texture_many

        base_color = base_color * sample_texture_many(
            scene.textures, mats.base_color_tex[idx], tex_u, tex_v
        )
        emission = emission * sample_texture_many(
            scene.textures, mats.emission_tex[idx], tex_u, tex_v
        )
        rough_t = sample_texture_many(scene.textures, mats.roughness_tex[idx], tex_u, tex_v)
        roughness = roughness * rough_t.x
        metal_t = sample_texture_many(scene.textures, mats.metalness_tex[idx], tex_u, tex_v)
        metalness = metalness * metal_t.x

    return MatParams(
        bsdf=mats.bsdf[idx],
        base_color=base_color,
        emission=emission,
        roughness=roughness,
        metalness=metalness,
        ior=mats.ior[idx],
        k=mats.k[idx],
    )
