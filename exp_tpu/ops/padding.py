"""Particle-block padding for the Pallas kernels.

Every fused kernel tiles particles in blocks of 1024 along the lane axis
and asserts divisibility; callers pad with zero-mass rows first.  One
shared helper so the block size and fill conventions live in one place
(the accel paths pad positions with `fill=1.0` to keep the padded rows
off the r ~ 0 guards; their outputs are sliced away afterwards).
"""

from __future__ import annotations

import jax.numpy as jnp

BLOCK = 1024


def pad_particles(x, mass=None, block: int = BLOCK, fill: float = 0.0):
    """Pad (n, 3) positions (and optionally masses, with zeros) up to a
    multiple of `block`.  Returns (x_padded, mass_padded_or_None, n)."""
    n = x.shape[0]
    npad = (-n) % block
    if npad:
        x = jnp.concatenate([x, jnp.full((npad, 3), fill, x.dtype)])
        if mass is not None:
            mass = jnp.concatenate([mass, jnp.zeros(npad, mass.dtype)])
    return x, mass, n


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_xyzm(x, mass):
    """(N, 3) + (N,) -> (8, N) transposed SoA kernel input (particles on
    the lane axis; rows 4-7 are zero padding to the sublane tile)."""
    n = x.shape[0]
    out = jnp.zeros((8, n), jnp.float32)
    out = out.at[0:3, :].set(x.T.astype(jnp.float32))
    return out.at[3, :].set(mass.astype(jnp.float32))
