"""Cylindrical EOF disk force (runtime, pure JAX).

Device-side companion of basis/empcyl.py — the analogue of the reference's
Cylinder/CylEXP runtime path (src/Cylinder.cc:863 accumulate, :1385
accumulated_eval; cudaCylinder.cu coefKernelCyl/forceKernel): coefficients
and forces from the tabulated EOF functions U^m_n(R, z) with bilinear
interpolation on the mapped (x(R), y(z)) grid.

  coefficients: b^{c/s}_{mn} = -4 pi sum_i m_i U^m_n(R_i, z_i) cos/sin(m phi_i)
  potential:    Phi = sum_mn (b^c cos + b^s sin) U^m_n
  acceleration: F_R = -sum (b^c cos + b^s sin) dU/dR,  F_z likewise,
                F_phi = (1/R) sum m (b^c sin - b^s cos) U

Outside the table sphere r > rmax the monopole continuation
Phi ~ Phi_edge * r_edge/r is applied (the l=0 limit of the spherical
continuation, SphericalBasis.cc:1570-1633).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from exp_tpu.basis.empcyl import EmpCylTables


@jax.tree_util.register_pytree_node_class
@dataclass
class CylinderForce:
    """EOF disk force; coefficient layout (2, mmax+1, nmax) [cos/sin, m, n]."""

    pot_t: jax.Array      # flat (numx*numy, (mmax+1)*nmax)
    rfrc_t: jax.Array     # dU/dR
    zfrc_t: jax.Array     # dU/dz
    dens_t: jax.Array
    quad_t: jax.Array     # fused [pot|dUr|dUz] x [y, y+1] rows for the force
    mmax: int
    nmax: int
    numx: int
    numy: int
    acyl: float
    hcyl: float
    xmin: float
    dx: float
    ymin: float
    dy: float
    rmax_grid: float

    # protocol metadata (coef-file writers key off these)
    @property
    def lmax(self):
        return self.mmax

    scale: float = 1.0

    @classmethod
    def from_tables(cls, t: EmpCylTables, dtype=jnp.float32) -> "CylinderForce":
        # tables stored FLAT (numx*numy, (mmax+1)*nmax): 2-D row layout keeps
        # TPU gathers vectorized (a 4-D (x,y,m,n) array tiles the trailing
        # (m,n) dims to (8,128) — an 8x physical blowup and scalarized loads)
        def flat(a):
            return jnp.asarray(
                a.reshape(t.numx * t.numy, (t.mmax + 1) * t.nmax),
                dtype=dtype)

        import numpy as _np

        # fused force table: [pot | dU/dR | dU/dz] rows paired with their
        # +1-in-y neighbor, so the force path needs TWO gathers total
        cat = _np.concatenate([
            t.pot.reshape(t.numx * t.numy, -1),
            t.rforce.reshape(t.numx * t.numy, -1),
            t.zforce.reshape(t.numx * t.numy, -1)], axis=1)
        quad = _np.concatenate([cat, _np.roll(cat, -1, axis=0)], axis=1)
        return cls(
            pot_t=flat(t.pot), rfrc_t=flat(t.rforce), zfrc_t=flat(t.zforce),
            dens_t=flat(t.dens),
            quad_t=jnp.asarray(quad, dtype=dtype),
            mmax=t.mmax, nmax=t.nmax, numx=t.numx, numy=t.numy,
            acyl=t.acyl, hcyl=t.hcyl, xmin=t.xmin, dx=t.dx,
            ymin=t.ymin, dy=t.dy, rmax_grid=t.rcylmax * t.acyl)

    def tree_flatten(self):
        return ((self.pot_t, self.rfrc_t, self.zfrc_t, self.dens_t,
                 self.quad_t),
                (self.mmax, self.nmax, self.numx, self.numy, self.acyl,
                 self.hcyl, self.xmin, self.dx, self.ymin, self.dy,
                 self.rmax_grid))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def coef_shape(self):
        return (2, self.mmax + 1, self.nmax)

    # ------------------------------------------------------------------

    def _geometry(self, x):
        R = jnp.sqrt(x[:, 0] ** 2 + x[:, 1] ** 2) + 1e-12
        z = x[:, 2]
        phi = jnp.arctan2(x[:, 1], x[:, 0])
        return R, z, phi

    def _bilinear_flat(self, table, R, z):
        """Bilinear interpolation of a flat (numx*numy, M*n) table
        -> (N, M*n)."""
        xg = (R / self.acyl - 1.0) / (R / self.acyl + 1.0)
        yg = jnp.arcsinh(z / self.hcyl)
        tx = jnp.clip((xg - self.xmin) / self.dx, 0.0, self.numx - 1.001)
        ty = jnp.clip((yg - self.ymin) / self.dy, 0.0, self.numy - 1.001)
        ix = tx.astype(jnp.int32)
        iy = ty.astype(jnp.int32)
        fx = (tx - ix)[:, None]
        fy = (ty - iy)[:, None]
        i00 = ix * self.numy + iy
        return (table[i00] * (1 - fx) * (1 - fy)
                + table[i00 + 1] * (1 - fx) * fy
                + table[i00 + self.numy] * fx * (1 - fy)
                + table[i00 + self.numy + 1] * fx * fy)

    def _bilinear(self, table, R, z):
        v = self._bilinear_flat(table, R, z)
        return v.reshape(v.shape[0], self.mmax + 1, self.nmax)

    def _trig(self, phi, dtype):
        m = jnp.arange(self.mmax + 1, dtype=dtype)
        ang = phi[:, None] * m
        return jnp.cos(ang), jnp.sin(ang)

    # ------------------------------------------------------------------

    def coefficients_local(self, x, mass, accum_dtype=jnp.float32):
        R, z, phi = self._geometry(x)
        r = jnp.sqrt(R * R + z * z)
        w = jnp.where(r <= self.rmax_grid, mass, 0.0)
        U = self._bilinear_flat(self.pot_t, R, z)        # (N, (M+1)*nmax)
        cosm, sinm = self._trig(phi, x.dtype)
        wc = w[:, None] * cosm                           # (N, M+1)
        ws = w[:, None] * sinm
        # one dense matmul; select the matching-m diagonal afterwards
        Wcs = jnp.concatenate([wc, ws], axis=1)          # (N, 2(M+1))
        big = jnp.dot(U.T, Wcs, preferred_element_type=accum_dtype)
        big = big.reshape(self.mmax + 1, self.nmax, 2, self.mmax + 1)
        msel = jnp.arange(self.mmax + 1)
        sel = big[msel, :, :, msel]                      # (M+1, nmax, 2)
        return -4.0 * math.pi * jnp.transpose(sel, (2, 0, 1))

    def coefficients(self, x, mass, axis_name=None, accum_dtype=jnp.float32):
        c = self.coefficients_local(x, mass, accum_dtype=accum_dtype)
        if axis_name is not None:
            c = jax.lax.psum(c, axis_name)
        return c

    def acceleration(self, coef, x):
        dtype = x.dtype
        coef = coef.astype(dtype)
        R, z, phi = self._geometry(x)
        r = jnp.sqrt(R * R + z * z) + 1e-12
        outside = r > self.rmax_grid
        # clamp evaluation point onto the boundary sphere along r-hat
        shrink = jnp.where(outside, self.rmax_grid / r, 1.0)
        Re = R * shrink
        ze = z * shrink

        # fused lookup: two gathers of [pot|dUr|dUz] x [y, y+1] rows
        xg = (Re / self.acyl - 1.0) / (Re / self.acyl + 1.0)
        yg = jnp.arcsinh(ze / self.hcyl)
        tx = jnp.clip((xg - self.xmin) / self.dx, 0.0, self.numx - 1.001)
        ty = jnp.clip((yg - self.ymin) / self.dy, 0.0, self.numy - 1.001)
        ix = tx.astype(jnp.int32)
        iy = ty.astype(jnp.int32)
        fx = (tx - ix)[:, None]
        fy = (ty - iy)[:, None]
        i00 = ix * self.numy + iy
        Fn = 3 * (self.mmax + 1) * self.nmax
        g0 = self.quad_t[i00]
        g1 = self.quad_t[i00 + self.numy]
        v0 = g0[:, :Fn] * (1 - fy) + g0[:, Fn:] * fy
        v1 = g1[:, :Fn] * (1 - fy) + g1[:, Fn:] * fy
        v = v0 * (1 - fx) + v1 * fx                      # (N, 3*M*n)
        Mn = (self.mmax + 1) * self.nmax
        U, dUr, dUz = v[:, :Mn], v[:, Mn:2 * Mn], v[:, 2 * Mn:]
        cosm, sinm = self._trig(phi, dtype)

        # contraction over n as elementwise multiply + reshape-sum (small-m
        # batched einsums lower pathologically on TPU)
        M1, nn = self.mmax + 1, self.nmax
        bcf = coef[0].reshape(-1)[None, :]
        bsf = coef[1].reshape(-1)[None, :]

        def csum(tab, b):
            return (tab * b).reshape(-1, M1, nn).sum(axis=2)   # (N, M+1)

        cmn = csum(U, bcf)
        smn = csum(U, bsf)
        pot = jnp.sum(cmn * cosm + smn * sinm, axis=1)
        FR = -(csum(dUr, bcf) * cosm + csum(dUr, bsf) * sinm).sum(axis=1)
        Fz = -(csum(dUz, bcf) * cosm + csum(dUz, bsf) * sinm).sum(axis=1)
        mvals = jnp.arange(self.mmax + 1, dtype=dtype)
        Fp = jnp.sum((cmn * sinm - smn * cosm) * mvals[None, :], axis=1) / R

        # monopole continuation beyond the table sphere:
        # Phi -> Phi_b * r_b/r; F_r = Phi_b r_b / r^2 toward the center
        pot_out = pot * shrink
        Fr_out = pot * shrink / r          # = -dPhi/dr with Phi = C/r (C<0)
        cphi = x[:, 0] / R
        sphi = x[:, 1] / R
        FR_in = FR * cphi - Fp * sphi
        FY_in = FR * sphi + Fp * cphi
        ax = jnp.where(outside, Fr_out * x[:, 0] / r, FR_in)
        ay = jnp.where(outside, Fr_out * x[:, 1] / r, FY_in)
        az = jnp.where(outside, Fr_out * z / r, Fz)
        pot = jnp.where(outside, pot_out, pot)
        return jnp.stack([ax, ay, az], axis=-1), pot

    def density(self, coef, x):
        coef = coef.astype(x.dtype)
        R, z, phi = self._geometry(x)
        D = self._bilinear_flat(self.dens_t, R, z)
        cosm, sinm = self._trig(phi, x.dtype)
        M1, nn = self.mmax + 1, self.nmax
        dc = (D * coef[0].reshape(-1)[None, :]).reshape(-1, M1, nn).sum(2)
        ds = (D * coef[1].reshape(-1)[None, :]).reshape(-1, M1, nn).sum(2)
        return jnp.sum(dc * cosm + ds * sinm, axis=1) / (4.0 * math.pi)
