"""Mapped radial coordinates for basis tables (pure JAX + host mirrors).

The radial basis tables live on a uniform grid in a mapped coordinate xi(r);
three maps are supported, matching the reference's conventions
(SLGridSph::r_to_xi / xi_to_r / d_xi_to_r, exputil/SLGridMP2.cc:711-765):

  cmap = 0 :  xi = r
  cmap = 1 :  xi = (r/rmap - 1)/(r/rmap + 1)      (algebraic; xi in [-1, 1))
  cmap = 2 :  xi = log(r)

All functions work on JAX or NumPy arrays (jnp ufuncs dispatch on both).
"""

from __future__ import annotations

import jax.numpy as jnp


def r_to_xi(r, cmap: int, rmap: float):
    if cmap == 1:
        return (r / rmap - 1.0) / (r / rmap + 1.0)
    elif cmap == 2:
        return jnp.log(r)
    return r


def xi_to_r(xi, cmap: int, rmap: float):
    if cmap == 1:
        return (1.0 + xi) / (1.0 - xi) * rmap
    elif cmap == 2:
        return jnp.exp(xi)
    return xi


def dxi_dr(xi, cmap: int, rmap: float):
    """d(xi)/dr evaluated at xi."""
    if cmap == 1:
        return 0.5 * (1.0 - xi) * (1.0 - xi) / rmap
    elif cmap == 2:
        return jnp.exp(-xi)
    return jnp.ones_like(xi)
