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

#: compiled pallas kernels keyed by static basis geometry
_PALLAS_CACHE: dict = {}


@jax.tree_util.register_pytree_node_class
@dataclass
class CylinderForce:
    """EOF disk force; coefficient layout (2, mmax+1, nmax) [cos/sin, m, n]."""

    pot_t: jax.Array      # flat (numx*numy, (mmax+1)*nmax)
    rfrc_t: jax.Array     # dU/dR
    zfrc_t: jax.Array     # dU/dz
    dens_t: jax.Array
    potq_t: jax.Array     # [pot | pot shifted -1 in y]: 2-gather bilinear
    pot_c: jax.Array      # coarse-x (ncx, numy, mmax+1, nmax) pallas tables
    rfrc_c: jax.Array
    zfrc_c: jax.Array
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
    ncx: int = 64
    dxc: float = 0.0
    backend: str = "xla"   # 'xla' (fused-gather) | 'pallas' (fused kernels)
    #: 'default' = bf16 MXU passes (fast; see ops/pallas_cylinder.py
    #: docstring for measured error), 'highest' = fp32 emulation
    pallas_precision: str = "default"
    #: coarse-x interpolation: 'spline' = prefiltered quadratic B-spline
    #: (C1 field, O(h^3) — same matmul cost as 'linear' hats; the energy
    #: drift of the pallas backend is set by this choice, not precision)
    pallas_interp: str = "spline"

    @classmethod
    def from_tables(cls, t: EmpCylTables, dtype=jnp.float32,
                    backend: str = "xla", ncx: int = 64,
                    pallas_precision: str = "default",
                    pallas_interp: str = "spline") -> "CylinderForce":
        # tables stored FLAT (numx*numy, (mmax+1)*nmax): 2-D row layout keeps
        # TPU gathers vectorized (a 4-D (x,y,m,n) array tiles the trailing
        # (m,n) dims to (8,128) — an 8x physical blowup and scalarized loads)
        def flat(a):
            return jnp.asarray(
                a.reshape(t.numx * t.numy, (t.mmax + 1) * t.nmax),
                dtype=dtype)

        from exp_tpu.ops import pallas_cylinder as pk

        def coarse(a):
            c = pk.resample_coarse_x(a, t.numx, ncx)
            if pallas_interp == "spline":
                c = pk.prefilter_x(c)
            return jnp.asarray(c)

        potf = flat(t.pot)
        return cls(
            pot_t=potf, rfrc_t=flat(t.rforce), zfrc_t=flat(t.zforce),
            dens_t=flat(t.dens),
            potq_t=jnp.concatenate([potf, jnp.roll(potf, -1, axis=0)],
                                   axis=1),
            pot_c=coarse(t.pot), rfrc_c=coarse(t.rforce),
            zfrc_c=coarse(t.zforce),
            mmax=t.mmax, nmax=t.nmax, numx=t.numx, numy=t.numy,
            acyl=t.acyl, hcyl=t.hcyl, xmin=t.xmin, dx=t.dx,
            ymin=t.ymin, dy=t.dy, rmax_grid=t.rcylmax * t.acyl,
            ncx=ncx, dxc=pk.coarse_dxc(t.numx, ncx, t.dx), backend=backend,
            pallas_precision=pallas_precision, pallas_interp=pallas_interp)

    def tree_flatten(self):
        return ((self.pot_t, self.rfrc_t, self.zfrc_t, self.dens_t,
                 self.potq_t, self.pot_c, self.rfrc_c, self.zfrc_c),
                (self.mmax, self.nmax, self.numx, self.numy, self.acyl,
                 self.hcyl, self.xmin, self.dx, self.ymin, self.dy,
                 self.rmax_grid, self.scale, self.ncx, self.dxc,
                 self.backend, self.pallas_precision, self.pallas_interp))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def _pallas_kernels(self):
        from exp_tpu.ops import pallas_cylinder as pk

        key = (self.mmax, self.nmax, self.ncx, self.numy, self.acyl,
               self.hcyl, self.xmin, self.dxc, self.ymin, self.dy,
               self.rmax_grid)
        pkey = key + (self.pallas_precision, self.pallas_interp)
        ck = _PALLAS_CACHE.get(("coef",) + pkey)
        ak = _PALLAS_CACHE.get(("accel",) + pkey)
        if ck is None or ak is None:
            interp = jax.default_backend() == "cpu"
            prec = (jax.lax.Precision.HIGHEST
                    if self.pallas_precision == "highest"
                    else jax.lax.Precision.DEFAULT)
            ck = pk.make_cyl_coef_kernel(*key, interpret=interp,
                                         precision=prec,
                                         interp=self.pallas_interp)
            ak = pk.make_cyl_accel_kernel(*key, interpret=interp,
                                          precision=prec,
                                          interp=self.pallas_interp)
            _PALLAS_CACHE[("coef",) + pkey] = ck
            _PALLAS_CACHE[("accel",) + pkey] = ak
        return ck, ak

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

    def _pad1024(self, x, mass=None):
        from exp_tpu.ops.padding import pad_particles

        return pad_particles(x, mass)

    def coefficients_local(self, x, mass, accum_dtype=jnp.float32):
        if self.backend == "pallas":
            from exp_tpu.ops import pallas_cylinder as pk

            ck, _ = self._pallas_kernels()
            xp, mp, _ = self._pad1024(x, mass)
            G = ck(pk.pack_xyzm(xp, mp))
            return pk.contract_coef_output(G, self.pot_c).astype(accum_dtype)
        R, z, phi = self._geometry(x)
        r = jnp.sqrt(R * R + z * z)
        w = jnp.where(r <= self.rmax_grid, mass, 0.0)
        # 2-gather bilinear via the y-pair-fused table (per-index overhead
        # dominates TPU gathers — halving the gather count halves the time)
        xg = (R / self.acyl - 1.0) / (R / self.acyl + 1.0)
        yg = jnp.arcsinh(z / self.hcyl)
        tx = jnp.clip((xg - self.xmin) / self.dx, 0.0, self.numx - 1.001)
        ty = jnp.clip((yg - self.ymin) / self.dy, 0.0, self.numy - 1.001)
        ix = tx.astype(jnp.int32)
        iy = ty.astype(jnp.int32)
        fx = (tx - ix)[:, None]
        fy = (ty - iy)[:, None]
        i00 = ix * self.numy + iy
        Fn = (self.mmax + 1) * self.nmax
        g0 = self.potq_t[i00]
        g1 = self.potq_t[i00 + self.numy]
        U = ((g0[:, :Fn] * (1 - fy) + g0[:, Fn:] * fy) * (1 - fx)
             + (g1[:, :Fn] * (1 - fy) + g1[:, Fn:] * fy) * fx)
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

    def _contracted_quad(self, coef):
        """Contract the coefficients over n into the WHOLE table first
        (a 32768x126 @ 126x14 matmul, ~25 MFLOP): the n-sum commutes with
        the gather and the bilinear mix, so the per-particle lookup then
        needs only 6(M+1)-wide rows instead of 3(M+1)n — the gather was
        7x over the bandwidth bound at 1M particles before this.

        All four bilinear corners are fused into ONE gather row
        [C(y) | C(y+1) | C(x+1,y) | C(x+1,y+1)]: TPU gathers are
        per-index-overhead bound at these row widths, so one 168-float
        gather beats two 84-float gathers."""
        M1, nn = self.mmax + 1, self.nmax
        eye = jnp.eye(M1, dtype=coef.dtype)
        # block-diagonal selectors (M1*nn, M1) for cos and sin
        Bc = (coef[0][:, :, None] * eye[:, None, :]).reshape(M1 * nn, M1)
        Bs = (coef[1][:, :, None] * eye[:, None, :]).reshape(M1 * nn, M1)
        B = jnp.concatenate([Bc, Bs], axis=1)            # (M1*nn, 2*M1)
        C = jnp.concatenate([self.pot_t @ B, self.rfrc_t @ B,
                             self.zfrc_t @ B], axis=1)   # (G, 6*M1)
        return jnp.concatenate(
            [C, jnp.roll(C, -1, axis=0),
             jnp.roll(C, -self.numy, axis=0),
             jnp.roll(C, -self.numy - 1, axis=0)], axis=1)

    def acceleration(self, coef, x):
        dtype = x.dtype
        if self.backend == "pallas":
            from exp_tpu.ops import pallas_cylinder as pk

            _, ak = self._pallas_kernels()
            Ct = pk.contract_coef_tables(coef, self.pot_c, self.rfrc_c,
                                         self.zfrc_c)
            xp, _, n = self._pad1024(x)
            out = ak(pk.pack_xyzm(xp, jnp.zeros(xp.shape[0], dtype)), Ct)
            return (out[0:3, :n].T.astype(dtype), out[3, :n].astype(dtype))
        coef = coef.astype(dtype)
        R, z, phi = self._geometry(x)
        r = jnp.sqrt(R * R + z * z) + 1e-12
        outside = r > self.rmax_grid
        # clamp evaluation point onto the boundary sphere along r-hat
        shrink = jnp.where(outside, self.rmax_grid / r, 1.0)
        Re = R * shrink
        ze = z * shrink

        Cq = self._contracted_quad(coef)
        # fused lookup: ONE gather of the 4-corner contracted rows
        xg = (Re / self.acyl - 1.0) / (Re / self.acyl + 1.0)
        yg = jnp.arcsinh(ze / self.hcyl)
        tx = jnp.clip((xg - self.xmin) / self.dx, 0.0, self.numx - 1.001)
        ty = jnp.clip((yg - self.ymin) / self.dy, 0.0, self.numy - 1.001)
        ix = tx.astype(jnp.int32)
        iy = ty.astype(jnp.int32)
        fx = (tx - ix)[:, None]
        fy = (ty - iy)[:, None]
        i00 = ix * self.numy + iy
        M1 = self.mmax + 1
        Fn = 6 * M1
        g = Cq[i00]
        v0 = g[:, :Fn] * (1 - fy) + g[:, Fn:2 * Fn] * fy
        v1 = g[:, 2 * Fn:3 * Fn] * (1 - fy) + g[:, 3 * Fn:] * fy
        v = v0 * (1 - fx) + v1 * fx                      # (N, 6*M1)
        cosm, sinm = self._trig(phi, dtype)

        cmn, smn = v[:, :M1], v[:, M1:2 * M1]            # U.bc, U.bs per m
        pot = jnp.sum(cmn * cosm + smn * sinm, axis=1)
        FR = -(v[:, 2 * M1:3 * M1] * cosm
               + v[:, 3 * M1:4 * M1] * sinm).sum(axis=1)
        Fz = -(v[:, 4 * M1:5 * M1] * cosm
               + v[:, 5 * M1:6 * M1] * sinm).sum(axis=1)
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
        dens = jnp.sum(dc * cosm + ds * sinm, axis=1) / (4.0 * math.pi)
        # vacuum outside the table sphere — the clipped lookup would
        # plateau at the boundary cell's basis density
        r = jnp.sqrt(R * R + z * z)
        return jnp.where(r > self.rmax_grid, 0.0, dens)
