"""Texture atlas sampling — vectorized gather with per-texture filtering.

TPU re-expression of `Core/Textures/BitmapTexture.cpp:57-80` (nearest /
bilinear / bilinear-smoothstep filters over wrapped UVs).  All bitmaps are
packed row-wise into ONE (rows, W_atlas, 3) float32 array (`TextureAtlas`)
so a per-ray texture fetch is a single 2-D gather regardless of which texture
each ray addresses — the atlas is the TPU answer to per-object texture
pointers.

Textures with id INVALID_ID resolve to constant 1.0 (parameter modulation is
``constant * texture`` like `MaterialParameter::Evaluate`,
`Core/Material/MaterialParameter.h:10-33`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..math.vec import Vec3
from ..scene.types import INVALID_ID, TextureAtlas

FILTER_NEAREST = 0
FILTER_BILINEAR = 1
FILTER_BILINEAR_SMOOTHSTEP = 2


def build_atlas(images: list[np.ndarray], filter_modes: list[int] | None = None) -> TextureAtlas:
    """Pack (H_i, W_i, 3) float32 linear images into one atlas array.

    Each texture occupies its own row range; the atlas width is the max width
    (narrow rows are zero-padded — never addressed thanks to per-texture
    width metadata).
    """
    if not images:
        # 1-texel white placeholder keeps shapes static
        images = [np.ones((1, 1, 3), np.float32)]
    if filter_modes is None:
        filter_modes = [FILTER_BILINEAR] * len(images)
    w_atlas = max(im.shape[1] for im in images)
    rows = sum(im.shape[0] for im in images)
    data = np.zeros((rows, w_atlas, 3), np.float32)
    y0s, hs, ws = [], [], []
    y = 0
    for im in images:
        h, w = im.shape[:2]
        data[y : y + h, :w] = im[..., :3]
        y0s.append(y)
        hs.append(h)
        ws.append(w)
        y += h
    return TextureAtlas(
        data=jnp.asarray(data),
        y0=jnp.asarray(y0s, jnp.int32),
        height=jnp.asarray(hs, jnp.int32),
        width=jnp.asarray(ws, jnp.int32),
        filter_mode=jnp.asarray(filter_modes, jnp.int32),
    )


def _fetch(atlas: TextureAtlas, y0, h, w, ix, iy) -> Vec3:
    """Wrapped texel fetch: rows index into the packed atlas."""
    ix = jnp.mod(ix, w)
    iy = jnp.mod(iy, h)
    texel = atlas.data[y0 + iy, ix]  # (N, 3) gather
    return Vec3(texel[..., 0], texel[..., 1], texel[..., 2])


def sample_texture_many(atlas: TextureAtlas, tex_ids, u, v) -> Vec3:
    """Per-ray texture sample; rays with tex_id == INVALID_ID get 1.0.

    Filtering follows `BitmapTexture::Evaluate` (`BitmapTexture.cpp:57-80`):
    uv wrapped to [0,1), bilinear weights optionally smoothstepped.
    """
    valid = tex_ids != INVALID_ID
    tid = jnp.maximum(tex_ids, 0)
    y0 = atlas.y0[tid]
    h = atlas.height[tid]
    w = atlas.width[tid]
    fmode = atlas.filter_mode[tid]

    uu = jnp.mod(u, 1.0) * w.astype(jnp.float32)
    vv = jnp.mod(v, 1.0) * h.astype(jnp.float32)

    # nearest
    n_ix = jnp.clip(uu.astype(jnp.int32), 0, w - 1)
    n_iy = jnp.clip(vv.astype(jnp.int32), 0, h - 1)

    # bilinear: texel centers at integer + 0.5
    bu = uu - 0.5
    bv = vv - 0.5
    ix0 = jnp.floor(bu).astype(jnp.int32)
    iy0 = jnp.floor(bv).astype(jnp.int32)
    fu = bu - ix0.astype(jnp.float32)
    fv = bv - iy0.astype(jnp.float32)
    smooth = fmode == FILTER_BILINEAR_SMOOTHSTEP
    fu = jnp.where(smooth, fu * fu * (3.0 - 2.0 * fu), fu)
    fv = jnp.where(smooth, fv * fv * (3.0 - 2.0 * fv), fv)

    c00 = _fetch(atlas, y0, h, w, ix0, iy0)
    c10 = _fetch(atlas, y0, h, w, ix0 + 1, iy0)
    c01 = _fetch(atlas, y0, h, w, ix0, iy0 + 1)
    c11 = _fetch(atlas, y0, h, w, ix0 + 1, iy0 + 1)
    bil = (
        c00 * ((1.0 - fu) * (1.0 - fv))
        + c10 * (fu * (1.0 - fv))
        + c01 * ((1.0 - fu) * fv)
        + c11 * (fu * fv)
    )
    nearest = _fetch(atlas, y0, h, w, n_ix, n_iy)

    is_nearest = fmode == FILTER_NEAREST
    out = Vec3(
        jnp.where(is_nearest, nearest.x, bil.x),
        jnp.where(is_nearest, nearest.y, bil.y),
        jnp.where(is_nearest, nearest.z, bil.z),
    )
    one = jnp.ones_like(out.x)
    return Vec3(
        jnp.where(valid, out.x, one),
        jnp.where(valid, out.y, one),
        jnp.where(valid, out.z, one),
    )
