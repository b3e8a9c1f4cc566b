"""GGX (Trowbridge-Reitz) microfacet model, vectorized.

Matches ``Core/Material/BSDF/Microfacet.h`` numerically: isotropic GGX with
Smith height-uncorrelated shadowing-masking and NDF sampling.
All directions are in local shading space (+Z = normal).
"""

from __future__ import annotations

import jax.numpy as jnp

from .vec import Vec3

INV_PI = 1.0 / jnp.pi
TWO_PI = 2.0 * jnp.pi


def ggx_d(alpha_sq, n_dot_h):
    """NDF D(m) (`Microfacet.h:18-25`), in the overflow-free form
    ``a² / (π (c²(a²−1)+1)²)``.

    The textbook tan²θ form computes ``c⁴·(a²+tan²)²`` which underflows ×
    overflows to 0·inf = nan at grazing microfacet normals — nan here poisons
    reverse-mode AD through the masked-lobe selects even when the lobe is
    inactive, so the stable form is load-bearing for differentiability.
    """
    a2 = jnp.maximum(alpha_sq, 1e-10)
    c2 = n_dot_h * n_dot_h
    # d = c2*(a2-1)+1 rearranged as a sum of non-negative terms: the textbook
    # grouping cancels catastrophically in f32 once a2 < eps (a2-1 rounds to
    # -1, so d == 0 at c2 == 1 and D == inf -> inf/inf = nan in the sample
    # weights; seen at roughness 0.01, materials_test.json)
    d = c2 * a2 + (1.0 - c2)  # in [a2, 1]
    return a2 * INV_PI / (d * d)


def ggx_pdf(alpha_sq, n_dot_h):
    """pdf of sampled microfacet normal = D(m)*|m.z| (`Microfacet.h:27-30`)."""
    return ggx_d(alpha_sq, n_dot_h) * jnp.abs(n_dot_h)


def ggx_g1(alpha_sq, n_dot_x):
    """Smith G1 in the stable form ``2c / (c + sqrt(a² + (1−a²)c²))``."""
    c = jnp.abs(n_dot_x)
    return 2.0 * c / jnp.maximum(c + jnp.sqrt(alpha_sq + (1.0 - alpha_sq) * c * c), 1e-20)


def ggx_g(alpha_sq, n_dot_v, n_dot_l):
    """Smith height-uncorrelated G = G1(v)·G1(l) (`Microfacet.h:38-44`)."""
    return ggx_g1(alpha_sq, n_dot_v) * ggx_g1(alpha_sq, n_dot_l)


def ggx_sample(alpha_sq, u1, u2) -> Vec3:
    """Sample a microfacet normal from the GGX NDF (`Microfacet.h:46-55`).

    cos²θ = (1−u)/(1+(a²−1)u) is evaluated with the shared denominator
    D = (1−u) + a²u and sin²θ = a²u/D computed DIRECTLY — the textbook
    ``1 − cos²θ`` cancels to 0 in f32 for a² below ~1e-7 (roughness ≤ 0.02),
    collapsing the lobe to an exact delta and losing the sampled angle.
    """
    denom = (1.0 - u1) + alpha_sq * u1
    denom = jnp.maximum(denom, 1e-20)
    cos_theta_sq = (1.0 - u1) / denom
    sin_theta_sq = alpha_sq * u1 / denom
    # 1e-12 floors: sqrt' at exactly 0 is inf => nan tangents in AD
    cos_theta = jnp.sqrt(jnp.maximum(cos_theta_sq, 1e-12))
    sin_theta = jnp.sqrt(jnp.maximum(sin_theta_sq, 1e-12))
    phi = TWO_PI * u2
    return Vec3(sin_theta * jnp.sin(phi), sin_theta * jnp.cos(phi), cos_theta)
