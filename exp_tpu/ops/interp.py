"""Uniform-grid table interpolation (pure JAX).

Table evaluation for basis functions: linear interpolation for values and a
three-point stencil for first derivatives, matching the reference's table
discipline (SLGridSph::get_pot linear interp, get_force 3-point formula,
exputil/SLGridMP2.cc:767-880).  Tables are laid out with the grid index as the
LEADING axis so a batched per-particle lookup is a row gather — the
TPU-friendly layout (rows are contiguous lanes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_index(x, xmin: float, dx: float, n: int, lo: int = 0):
    """Cell index + fractional offset for a uniform grid.

    Returns (idx, frac) with idx clipped to [lo, n-2]; frac = (x - x_idx)/dx
    (not clipped, so boundary extrapolation matches the reference's behavior).
    """
    t = (x - xmin) / dx
    idx = jnp.clip(jnp.floor(t).astype(jnp.int32), lo, n - 2)
    frac = t - idx.astype(t.dtype)
    return idx, frac


def lerp_uniform(table: jax.Array, x: jax.Array, xmin: float, dx: float):
    """Linear interpolation of `table` (shape (numr, ...)) at points x (N,).

    Returns array of shape (N, ...).
    """
    n = table.shape[0]
    idx, frac = uniform_index(x, xmin, dx, n)
    lo = table[idx]                      # (N, ...)
    hi = table[idx + 1]
    w = frac.reshape(frac.shape + (1,) * (table.ndim - 1))
    return lo * (1.0 - w) + hi * w


def deriv3_uniform(table: jax.Array, x: jax.Array, xmin: float, dx: float):
    """Three-point first derivative of `table` (shape (numr, ...)) at x (N,).

    d/dxi f(x) ~ [(p - 1/2) f_{i-1} - 2 p f_i + (p + 1/2) f_{i+1}] / dx
    with p the fractional offset from node i and i clipped to [1, numr-2]
    (the reference's get_force stencil, exputil/SLGridMP2.cc:838-870).
    """
    n = table.shape[0]
    idx, frac = uniform_index(x, xmin, dx, n, lo=1)
    fm = table[idx - 1]
    f0 = table[idx]
    fp = table[idx + 1]
    w = frac.reshape(frac.shape + (1,) * (table.ndim - 1))
    return ((w - 0.5) * fm - 2.0 * w * f0 + (w + 0.5) * fp) / dx


def lerp_and_deriv3(table: jax.Array, x: jax.Array, xmin: float, dx: float):
    """Fused value + derivative lookup sharing one gather neighborhood."""
    n = table.shape[0]
    idx, frac = uniform_index(x, xmin, dx, n, lo=1)
    fm = table[idx - 1]
    f0 = table[idx]
    fp = table[idx + 1]
    w = frac.reshape(frac.shape + (1,) * (table.ndim - 1))
    # lo=1 clips the first cell's idx to 1, making w negative there:
    # interpolate between nodes idx-1, idx in that case (a one-sided
    # lerp from nodes 1-2 would EXTRAPOLATE backwards past table[0])
    val = jnp.where(w < 0,
                    fm * (-w) + f0 * (1.0 + w),
                    f0 * (1.0 - w) + fp * w)
    # 3-point (parabola-through-nodes) derivative, valid for w in [-1, 1]
    der = ((w - 0.5) * fm - 2.0 * w * f0 + (w + 0.5) * fp) / dx
    return val, der
