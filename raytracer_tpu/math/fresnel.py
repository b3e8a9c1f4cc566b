"""Fresnel terms, vectorized.

Semantics match ``Core/Math/Utils.cpp`` (FresnelDielectric / FresnelMetal) so
BSDF lobes agree with the reference numerically.
"""

from __future__ import annotations

import jax.numpy as jnp


def fresnel_dielectric(n_dot_v: jnp.ndarray, eta: jnp.ndarray) -> jnp.ndarray:
    """Dielectric Fresnel reflectance — exact port of `Utils.cpp:9-29`.

    ``n_dot_v`` is signed: > 0 means the ray arrives from OUTSIDE the medium
    (the reference then flips eta to 1/ior, `Utils.cpp:11-14`). ``eta`` is
    the material IoR.  Returns 1.0 on total internal reflection (only
    reachable from inside, as physics demands).

    Bug-compatible on purpose: the reference uses ``g = cosθ_t`` (via
    ``g² = 1 − η'²(1 − c²)``, η' = n_i/n_t) inside the Cook-Torrance shell,
    which yields F = 0 at normal incidence instead of R₀ = ((n−1)/(n+1))².
    Matching it is required for image agreement with the reference goldens
    (tests/test_ref_agreement.py); it still satisfies 0 ≤ F ≤ 1, so energy
    conservation holds.

    A previous revision used the textbook ``g² = η² − 1 + c²`` with the eta
    flip INVERTED — entering rays beyond ~42° hit the g² < 0 branch and
    returned spurious TIR (F = 1), silently killing most off-normal
    transmission/diffuse energy in dielectric and plastic lobes.
    """
    eta_eff = jnp.where(n_dot_v > 0.0, 1.0 / eta, eta)
    c = jnp.abs(n_dot_v)
    g2 = 1.0 - eta_eff * eta_eff * (1.0 - c * c)
    tir = g2 <= 0.0
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
