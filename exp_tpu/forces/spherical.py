"""Spherical BFE force (pure JAX, TPU-first).

The device-side equivalent of the reference's SphericalBasis/Sphere force
pipeline (src/SphericalBasis.cc, src/Sphere.cc, cudaSphericalBasis.cu),
re-designed as two batched tensor contractions over sharded SoA particle
arrays:

  coefficients (HOT LOOP #1, reference SphericalBasis.cc:429-599):
      c[l,m,n] = -4 pi sum_i m_i fac[l,m] P_lm(cos th_i) trig(m phi_i)
                 * pot_ln(r_i/scale)
    -> per-particle Legendre/trig blocks + a radial table gather, contracted
       with one einsum (MXU) and reduced across the particle mesh axis with
       `jax.lax.psum` (replacing MPI_Allreduce, SphericalBasis.cc:871-896).

  acceleration (HOT LOOP #2, reference SphericalBasis.cc:1476-1700):
      Phi   = sum fac P_lm (c cos + s sin) pot_ln
      dPhi/dr, (1/sin th) dPhi/dth, dPhi/dphi  ->  Cartesian acceleration
    with the vacuum multipole continuation (rmax/r)^(l+1) outside the table
    range (SphericalBasis.cc:1570-1633).

Real coefficient layout: cos/sin stacked, shape (2, lmax+1, lmax+1, nmax)
indexed [cs, l, m, n]; entries with m > l are zero.  Normalization matches
the reference: fac[l,m] = sqrt((2l+1)/4pi (l-m)!/(l+m)!) (* sqrt2 for m>0),
unnormalized Condon–Shortley P_lm (src/SphericalBasis.cc:328-335).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from exp_tpu.basis.slgrid import SLGridSph, SphSLTables
from exp_tpu.ops.special import legendre_lm, dlegendre_lm, sincos_m, real_ylm_norm

DSMALL = 1.0e-16


def _dsmall(dtype):
    """Radius floor guarding r -> 0 divisions; dtype-aware so that r^3 does
    not underflow in float32 (the reference's DSMALL=1e-16 is f64-only)."""
    return 1.0e-16 if jnp.dtype(dtype) == jnp.float64 else 1.0e-10


@jax.tree_util.register_pytree_node_class
@dataclass
class SphereSL:
    """sphereSL force: SL basis grid + harmonics metadata.

    A pytree so it can be passed through jit/shard_map.  `fac` is the real-Ylm
    normalization matrix (lmax+1, lmax+1).
    """

    grid: SLGridSph
    fac: jax.Array
    lmax: int
    nmax: int
    scale: float = 1.0

    @classmethod
    def from_tables(cls, t: SphSLTables, scale: float = 1.0,
                    dtype=jnp.float32) -> "SphereSL":
        grid = SLGridSph.from_tables(t, dtype=dtype)
        return cls(grid=grid, fac=real_ylm_norm(t.lmax, dtype=dtype),
                   lmax=t.lmax, nmax=t.nmax, scale=scale)

    def tree_flatten(self):
        return (self.grid, self.fac), (self.lmax, self.nmax, self.scale)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)

    @property
    def coef_shape(self):
        return (2, self.lmax + 1, self.lmax + 1, self.nmax)

    # ------------------------------------------------------------------
    # Coefficients
    # ------------------------------------------------------------------

    def coefficients_local(self, x: jax.Array, mass: jax.Array,
                           accum_dtype=jnp.float32) -> jax.Array:
        """Shard-local coefficient contribution.

        Args:
          x: positions (N, 3) (already centered).
          mass: (N,); zero-mass rows are padding and contribute nothing.

        Returns: (2, lmax+1, lmax+1, nmax) coefficient partial sums.
        """
        lmax, nmax = self.lmax, self.nmax
        g = self.grid

        r = jnp.sqrt(jnp.sum(x * x, axis=-1)) + _dsmall(x.dtype)
        costh = x[:, 2] / r
        phi = jnp.arctan2(x[:, 1], x[:, 0])
        rs = r / self.scale

        # mask to the table's radial support (reference: r in [rmin, rmax],
        # SphericalBasis.cc:488)
        w = jnp.where((rs >= g.rmin) & (rs <= g.rmax), mass, 0.0)

        P = legendre_lm(lmax, costh)                 # (N, L+1, L+1)
        cosm, sinm = sincos_m(lmax, phi)             # (N, L+1)
        potd = g.get_pot(rs)                         # (N, L+1, nmax)

        yc = self.fac[None] * P * cosm[:, None, :]   # (N, L+1(l), L+1(m))
        ys = self.fac[None] * P * sinm[:, None, :]

        wyc = yc * w[:, None, None]
        wys = ys * w[:, None, None]

        cc = jnp.einsum("ilm,iln->lmn", wyc, potd,
                        preferred_element_type=accum_dtype)
        cs = jnp.einsum("ilm,iln->lmn", wys, potd,
                        preferred_element_type=accum_dtype)
        return -4.0 * math.pi * jnp.stack([cc, cs])

    def coefficients(self, x, mass, axis_name=None, accum_dtype=jnp.float32):
        """Full coefficients; psum across `axis_name` if inside shard_map."""
        c = self.coefficients_local(x, mass, accum_dtype=accum_dtype)
        if axis_name is not None:
            c = jax.lax.psum(c, axis_name)
        return c

    # ------------------------------------------------------------------
    # Acceleration / potential
    # ------------------------------------------------------------------

    def acceleration(self, coef: jax.Array, x: jax.Array,
                     deriv: str = "stencil3"):
        """Acceleration and potential from coefficients.

        Args:
          coef: (2, lmax+1, lmax+1, nmax).
          x: positions (N, 3).
          deriv: radial-derivative mode, see SLGridSph.get_pot_dpot.

        Returns (acc (N, 3), pot (N,)).
        """
        lmax = self.lmax
        g = self.grid
        dtype = x.dtype
        coef = coef.astype(dtype)

        r = jnp.sqrt(jnp.sum(x * x, axis=-1)) + _dsmall(x.dtype)
        costh = x[:, 2] / r
        phi = jnp.arctan2(x[:, 1], x[:, 0])

        # clamp to table range; outside rmax apply multipole continuation
        outside = r > g.rmax * self.scale
        r_eval = jnp.minimum(r, g.rmax * self.scale)
        rs = r_eval / self.scale

        P, dP = dlegendre_lm(lmax, costh)            # (N, L+1, L+1)
        cosm, sinm = sincos_m(lmax, phi)             # (N, L+1)
        potd, dpot = g.get_pot_dpot(rs, deriv=deriv)  # (N, L+1, nmax)

        cc, ss = coef[0], coef[1]
        # radial series: contract n  ->  (N, L+1(l), L+1(m))
        pc = jnp.einsum("lmn,iln->ilm", cc, potd)
        ps = jnp.einsum("lmn,iln->ilm", ss, potd)
        dpc = jnp.einsum("lmn,iln->ilm", cc, dpot)
        dps = jnp.einsum("lmn,iln->ilm", ss, dpot)

        # vacuum continuation for r > rmax: p *= (rmax/r)^(l+1),
        # dp = -(l+1) p / r (SphericalBasis.cc:1570-1633)
        lvals = jnp.arange(lmax + 1, dtype=dtype)
        att = jnp.power((g.rmax * self.scale / r)[:, None], lvals + 1.0)
        att = jnp.where(outside[:, None], att, 1.0)      # (N, L+1)
        pc = pc * att[:, :, None]
        ps = ps * att[:, :, None]
        dfac_out = -(lvals + 1.0)[None, :, None] / r[:, None, None]
        dpc = jnp.where(outside[:, None, None], pc * dfac_out, dpc * att[:, :, None])
        dps = jnp.where(outside[:, None, None], ps * dfac_out, dps * att[:, :, None])

        facL = self.fac[None] * P                    # (N, L+1, L+1)
        facD = self.fac[None] * dP
        mvals = jnp.arange(lmax + 1, dtype=dtype)

        cosm_b = cosm[:, None, :]
        sinm_b = sinm[:, None, :]

        potl = jnp.sum(facL * (pc * cosm_b + ps * sinm_b), axis=(1, 2))
        potr = jnp.sum(facL * (dpc * cosm_b + dps * sinm_b), axis=(1, 2))
        pott = jnp.sum(facD * (pc * cosm_b + ps * sinm_b), axis=(1, 2))
        potp = jnp.sum(facL * (ps * cosm_b - pc * sinm_b) * mvals[None, None, :],
                       axis=(1, 2))

        s = self.scale
        potr = potr / (s * s)
        potl = potl / s
        pott = pott / s
        potp = potp / s

        xx, yy, zz = x[:, 0], x[:, 1], x[:, 2]
        r3 = r * r * r
        rho2 = xx * xx + yy * yy

        ax = -(potr * xx / r - pott * xx * zz / r3)
        ay = -(potr * yy / r - pott * yy * zz / r3)
        az = -(potr * zz / r + pott * rho2 / r3)
        safe = rho2 > _dsmall(x.dtype)
        ax = ax + jnp.where(safe, potp * yy / rho2, 0.0)
        ay = ay - jnp.where(safe, potp * xx / rho2, 0.0)

        return jnp.stack([ax, ay, az], axis=-1), potl

    # ------------------------------------------------------------------
    # Field evaluation (density) — used by analysis
    # ------------------------------------------------------------------

    def density(self, coef: jax.Array, x: jax.Array):
        """BFE density (of 4 pi rho / 4 pi, i.e. physical rho) at points x."""
        lmax = self.lmax
        g = self.grid
        coef = coef.astype(x.dtype)

        r = jnp.sqrt(jnp.sum(x * x, axis=-1)) + _dsmall(x.dtype)
        costh = x[:, 2] / r
        phi = jnp.arctan2(x[:, 1], x[:, 0])
        rs = jnp.clip(r / self.scale, g.rmin, g.rmax)

        P = legendre_lm(lmax, costh)
        cosm, sinm = sincos_m(lmax, phi)
        densd = g.get_dens(rs)                       # (N, L+1, nmax)

        dc = jnp.einsum("lmn,iln->ilm", coef[0], densd)
        dsn = jnp.einsum("lmn,iln->ilm", coef[1], densd)
        facL = self.fac[None] * P
        dens = jnp.sum(facL * (dc * cosm[:, None, :] + dsn * sinm[:, None, :]),
                       axis=(1, 2))
        # dens tables carry 4 pi rho; return physical density / scale^3
        return dens / (4.0 * math.pi) / self.scale**3
