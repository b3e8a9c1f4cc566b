"""Postprocess pipeline: bloom, saturation/contrast/exposure, tonemap, dither.

Behavioral match of `Viewport::PostProcessTile` (`Core/Rendering/Viewport.cpp:492-550`)
and `PostprocessParams` defaults (`Core/Rendering/PostProcess.cpp:6-14`):

    avg = sum / passes
    bloom: avg = avg*(1-bloomFactor) + bloomFactor * Σ w_i * blur_i(avg)
    saturation: lerp(luma, c, saturation)
    contrast:   exp(log(c) * contrast)
    exposure:   c *= colorFilter * 2^exposure
    tonemap     (Clamped / Reinhard / Hejl / ACES)
    dither:     + bipolar_uniform * ditheringStrength

Everything is one fused XLA elementwise pipeline over the (H, W, 3) image; the
5-level Gaussian bloom pyramid (`Viewport.cpp:434-451`) uses separable
convolutions that XLA maps to small convs.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..color.colorhelpers import (
    TONEMAP_ACES,
    luminance,
    tonemap,
)
from ..sampler.sampler import hash_u32, u32_to_unit_float


@dataclass(frozen=True)
class PostprocessParams:
    """Mirrors `PostprocessParams` defaults (`PostProcess.cpp:6-14`)."""

    color_filter: tuple = (1.0, 1.0, 1.0)
    exposure: float = 0.0  # log2 scale
    contrast: float = 0.8
    saturation: float = 0.98
    dithering_strength: float = 0.005
    blue_noise_dither: bool = True
    bloom_factor: float = 0.0
    bloom_levels: int = 5
    tonemapper: int = TONEMAP_ACES


# weights of the 5 blurred pyramid levels (`Viewport.cpp:497`)
_BLOOM_WEIGHTS = (0.35, 0.25, 0.15, 0.15, 0.1)


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of an (H, W, 3) image (`Bitmap::GaussianBlur`)."""
    radius = max(1, int(3.0 * sigma))
    k = _gaussian_kernel1d(sigma, radius)
    # (H, W, C) -> blur rows then columns per channel via conv_general_dilated
    x = jnp.moveaxis(img, -1, 0)[:, None]  # (C, 1, H, W)
    kh = k.reshape(1, 1, 1, -1)
    kv = k.reshape(1, 1, -1, 1)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), [(0, 0), (radius, radius)], dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kv, (1, 1), [(radius, radius), (0, 0)], dimension_numbers=dn)
    return jnp.moveaxis(x[:, 0], 0, -1)


def apply_bloom(avg: jnp.ndarray, params: PostprocessParams) -> jnp.ndarray:
    """5-level blur-pyramid bloom (`Viewport.cpp:434-451,512-523`)."""
    if params.bloom_factor <= 0.0:
        return avg
    bloom = jnp.zeros_like(avg)
    blurred = avg
    for i in range(params.bloom_levels):
        blurred = gaussian_blur(blurred, sigma=2.0 * (i + 1))
        bloom = bloom + _BLOOM_WEIGHTS[i] * blurred
    return avg * (1.0 - params.bloom_factor) + bloom * params.bloom_factor


def postprocess(avg: jnp.ndarray, params: PostprocessParams, dither_seed: int = 0) -> jnp.ndarray:
    """(H, W, 3) mean radiance -> display-ready sRGB in [0, 1]."""
    c = apply_bloom(avg, params)

    # saturation: lerp from luma (`Viewport.cpp:530-532`)
    luma = luminance(c[..., 0], c[..., 1], c[..., 2])[..., None]
    c = jnp.maximum(0.0, luma + (c - luma) * params.saturation)

    # contrast in log space (`Viewport.cpp:534-535`)
    if params.contrast != 1.0:
        c = jnp.exp(jnp.log(jnp.maximum(c, 1e-20)) * params.contrast)

    # exposure + color filter (`Viewport.cpp:453,537`)
    scale = jnp.asarray(params.color_filter, jnp.float32) * (2.0 ** params.exposure)
    c = c * scale

    out = tonemap(c, params.tonemapper)

    # dither (`Viewport.cpp:543-545`): bipolar noise after tonemap.  Blue-noise
    # dither (tiled 128x128 table, one layer per channel) pushes quantization
    # error to high frequencies — visibly smoother gradients than white noise.
    if params.dithering_strength > 0.0:
        h, w, _ = out.shape
        if params.blue_noise_dither:
            from ..sampler.sampler import blue_noise_table

            table = jnp.asarray(blue_noise_table())  # (128, 128, 4)
            ty = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) % 128
            tx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) % 128
            # per-seed toroidal golden-ratio offset decorrelates frames
            shift = jnp.float32(dither_seed) * jnp.float32(0.618034)
            noise = jnp.mod(table[ty, tx][..., :3] + shift, 1.0) * 2.0 - 1.0
        else:
            idx = jax.lax.broadcasted_iota(jnp.uint32, (h, w, 3), 0) * jnp.uint32(w * 3) + \
                jax.lax.broadcasted_iota(jnp.uint32, (h, w, 3), 1) * jnp.uint32(3) + \
                jax.lax.broadcasted_iota(jnp.uint32, (h, w, 3), 2)
            noise = u32_to_unit_float(hash_u32(idx ^ jnp.uint32(dither_seed))) * 2.0 - 1.0
        out = out + noise * params.dithering_strength

    return jnp.clip(out, 0.0, 1.0)


def to_u8(srgb: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(srgb * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
