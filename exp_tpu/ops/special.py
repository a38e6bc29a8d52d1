"""Special-function kernels (pure JAX, TPU-friendly).

Associated Legendre recurrences and azimuthal harmonics used by the spherical
BFE forces.  These mirror the math of the reference's `Basis::legendre_R` /
`dlegendre_R` (reference: src/Basis.cc:14-115) — unnormalized associated
Legendre functions P_lm(x) with the Condon–Shortley phase — but are written as
statically-unrolled, batched recurrences so XLA vectorizes them over particle
blocks on the VPU (no per-particle scalar loops).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

def _mineps(dtype):
    """Clamp |cos(theta)| away from 1 for the dP/dx recurrence (mirrors
    MINEPS clamping in the reference, src/Basis.cc:81-84).  Dtype-aware:
    1 - 1e-12 rounds back to 1.0 in float32 and 1/(x^2-1) blows up at
    the pole."""
    return 1.0e-12 if jnp.dtype(dtype) == jnp.float64 else 1.0e-6


def legendre_lm(lmax: int, x: jax.Array) -> jax.Array:
    """Batched associated Legendre functions P_lm(x).

    Args:
      lmax: maximum degree (static).
      x: array of arguments in [-1, 1], any shape (...,).

    Returns:
      Array of shape (..., lmax+1, lmax+1) with P[l, m] for m <= l
      (entries with m > l are zero).  Unnormalized, Condon–Shortley phase.
    """
    x = jnp.asarray(x)
    shape = x.shape
    zero = jnp.zeros(shape, x.dtype)
    # p[l][m]
    p = [[zero for _ in range(lmax + 1)] for _ in range(lmax + 1)]
    p[0][0] = jnp.ones(shape, x.dtype)

    if lmax > 0:
        somx2 = jnp.sqrt(jnp.maximum((1.0 - x) * (1.0 + x), 0.0))
        pll = p[0][0]
        fact = 1.0
        for m in range(1, lmax + 1):
            pll = pll * (-fact) * somx2
            p[m][m] = pll
            fact += 2.0

    for m in range(lmax):
        pl2 = p[m][m]
        pl1 = x * (2 * m + 1) * pl2
        if m + 1 <= lmax:
            p[m + 1][m] = pl1
        for l in range(m + 2, lmax + 1):
            pll = (x * (2 * l - 1) * pl1 - (l + m - 1) * pl2) / (l - m)
            p[l][m] = pll
            pl2, pl1 = pl1, pll

    rows = [jnp.stack(row, axis=-1) for row in p]
    return jnp.stack(rows, axis=-2)


def dlegendre_lm(lmax: int, x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """P_lm(x) and dP_lm/dx (x = cos(theta)).

    Uses the derivative identity
        (x^2 - 1) dP_lm/dx = l x P_lm - (l + m) P_{l-1,m}
    with |x| clamped away from 1 (same pole treatment as the reference,
    src/Basis.cc:81-115).

    Returns:
      (P, dP) each of shape (..., lmax+1, lmax+1).
    """
    eps = _mineps(jnp.asarray(x).dtype)
    xc = jnp.clip(x, -1.0 + eps, 1.0 - eps)
    p = legendre_lm(lmax, xc)
    shape = xc.shape
    zero = jnp.zeros(shape, xc.dtype)
    inv = 1.0 / (xc * xc - 1.0)

    dp = [[zero for _ in range(lmax + 1)] for _ in range(lmax + 1)]
    # l = 0: dP = 0
    for l in range(1, lmax + 1):
        for m in range(0, l + 1):
            if l == m:
                # (x^2-1) dP_ll/dx = l x P_ll  (P_{l-1,l} = 0)
                dp[l][m] = inv * (l * xc * p[..., l, m])
            else:
                dp[l][m] = inv * (l * xc * p[..., l, m] - (l + m) * p[..., l - 1, m])

    rows = [jnp.stack(row, axis=-1) for row in dp]
    return p, jnp.stack(rows, axis=-2)


def sincos_m(lmax: int, phi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """cos(m phi), sin(m phi) for m = 0..lmax.

    Returns arrays of shape (..., lmax+1).  Computed directly (VPU
    transcendentals vectorize perfectly; no need for the reference's serial
    recurrence, exputil sinecosine_R).
    """
    phi = jnp.asarray(phi)
    m = jnp.arange(lmax + 1, dtype=phi.dtype)
    arg = phi[..., None] * m
    return jnp.cos(arg), jnp.sin(arg)


def real_ylm_norm(lmax: int, dtype=jnp.float64) -> jnp.ndarray:
    """Real-spherical-harmonic normalization matrix.

    fac[l, m] = sqrt((2l+1)/(4 pi) * (l-m)!/(l+m)!) * (sqrt(2) if m > 0)

    (the "factorial" matrix of the reference, src/SphericalBasis.cc:328-335).
    Host-side constant; returns a numpy-backed jnp array of shape
    (lmax+1, lmax+1) with zeros for m > l.
    """
    import numpy as np

    fac = np.zeros((lmax + 1, lmax + 1))
    for l in range(lmax + 1):
        for m in range(l + 1):
            val = math.sqrt(
                (2.0 * l + 1.0) / (4.0 * math.pi)
                * math.factorial(l - m) / math.factorial(l + m)
            )
            if m > 0:
                val *= math.sqrt(2.0)
            fac[l, m] = val
    return jnp.asarray(fac, dtype=dtype)
