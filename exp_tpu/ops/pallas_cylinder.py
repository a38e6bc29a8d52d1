"""Fused Pallas TPU kernels for the EOF cylinder (disk) BFE hot loops.

The XLA path (forces/cylinder.py) is gather-bound: bilinear lookups into
the (numx*numy, features) tables cost ~13 ms per pass at 1M particles —
per-index overhead, not bandwidth.  These kernels replace the gathers
with hat-function interpolation *matmuls* against VMEM-resident coarse
tables, the same trick as ops/pallas_sphere.py lifted to 2D (the
reference's cudaCylinder.cu coefKernelCyl :325 / forceKernel :512
pipeline, collapsed and fused):

  coefficient — per particle block build A[(jx,t), i] =
      Wx[jx,i] * (w * trig_t)[i]   (t = cs*(M+1)+m rows, 3D broadcast,
      no transcendentals: cos/sin(m phi) by angle addition), then ONE
      MXU contraction  G += A @ Wy^T  accumulated in VMEM across the
      grid.  The (m, n) table contraction
      coef[cs,m,n] = -4pi sum_{jx,jy} G[jx,cs,m,jy] * T[jx,jy,m,n]
      is a tiny einsum OUTSIDE the kernel.

  force — coefficients are pre-contracted into the coarse table outside
      (C[jx,jy,q,m], q = pot/FR/Fz x cos/sin — the n-sum commutes with
      interpolation), then per block  D = C @ Wy  in jx chunks and the
      x-hat weighted reduction gives v[q,m] per particle; pot/acc are
      assembled on the VPU with the trig recurrences and the monopole
      continuation beyond the table sphere.

Grid resolution: the x (radial) axis is resampled 4x coarser (ncx=64
from numx=256) — measured force error ~2e-3 of the field scale, the
same order as the f32 BFE truncation itself; the y (vertical) axis
keeps FULL resolution (thin-disk structure does not survive
coarsening).  Precision: the big in-kernel matmuls default to
bf16-input MXU passes (DEFAULT) — measured v5e @1M, mmax=6/nmax=18:
coef 3.2 ms (err 5e-5: per-particle rounding is incoherent in the
sum), accel 6.2 ms (err 3.1e-3 vs 1.9e-3 at HIGHEST which costs
27 ms in 6-pass fp32 emulation); the XLA gather path is 12.3/10.0 ms.
Data layout: transposed SoA (8, N) in / (8, N) out, matching the
sphere and cube kernels.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PREC = jax.lax.Precision.HIGHEST   # host-side einsum contractions


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _trig_rows(mmax, cphi, sphi):
    """cos(m phi), sin(m phi) rows (1, B) by angle addition."""
    c = [jnp.ones_like(cphi)]
    s = [jnp.zeros_like(sphi)]
    for _ in range(mmax):
        c.append(c[-1] * cphi - s[-1] * sphi)
        s.append(s[-1] * cphi + c[-2] * sphi)
    return c, s


def _b2(u):
    """Quadratic B-spline kernel (support |u| < 1.5)."""
    au = jnp.abs(u)
    inner = 0.75 - au * au
    outer = 0.5 * (1.5 - au) * (1.5 - au)
    return jnp.where(au <= 0.5, inner,
                     jnp.where(au <= 1.5, outer, 0.0))


def _w3(t, nc, interp):
    """Interpolation weights as a 3D (rows, 1, B) tensor from node
    offsets (iota on the leading dim — no row-concatenation).

    'linear': hat weights, rows = nc.  'spline': prefiltered quadratic
    B-spline weights against ghost-extended spline coefficients, rows =
    nc + 2 with t shifted by the ghost offset (see prefilter_x)."""
    rows = nc + 2 if interp == "spline" else nc
    t3 = t[None, :, :]                                   # (1, 1, B)
    j = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, t.shape[1]),
                                 0).astype(jnp.float32)
    if interp == "spline":
        return _b2(j - 1.0 - t3)
    return jnp.maximum(0.0, 1.0 - jnp.abs(j - t3))


def _w2(t, nc, interp="linear"):
    """2D (rows, B) variant of _w3."""
    rows = nc + 2 if interp == "spline" else nc
    j = jax.lax.broadcasted_iota(jnp.int32, (rows, t.shape[1]),
                                 0).astype(jnp.float32)
    if interp == "spline":
        return _b2(j - 1.0 - t[0][None, :])
    return jnp.maximum(0.0, 1.0 - jnp.abs(j - t[0][None, :]))


def _cyl_maps(x, y, z, eps=1e-12):
    R = jnp.sqrt(x * x + y * y) + eps
    r = jnp.sqrt(R * R + z * z) + eps
    cphi = x / R
    sphi = y / R
    return R, r, cphi, sphi


def _grid_coords(R, z, acyl, hcyl, xmin, dxc, ncx, ymin, dy, ncy):
    xg = (R / acyl - 1.0) / (R / acyl + 1.0)
    u = z / hcyl
    yg = jnp.log(u + jnp.sqrt(u * u + 1.0))             # arcsinh
    tx = jnp.clip((xg - xmin) / dxc, 0.0, ncx - 1.0)
    ty = jnp.clip((yg - ymin) / dy, 0.0, ncy - 1.0)
    return tx, ty


# ---------------------------------------------------------------------------

def make_cyl_coef_kernel(mmax, nmax, ncx, ncy, acyl, hcyl, xmin, dxc,
                         ymin, dy, rmax_grid, block=1024, interpret=False,
                         precision=None, interp="linear"):
    """Returns fn(xyzm8 (8, N)) -> G (xrows, 16, ncy) f32 raw MTTKRP sums
    G[jx, cs*(M+1)+m, jy] = sum_i Wx[jx,i] Wy[jy,i] w_i trig_m(phi_i)
    (caller contracts with the coarse pot table — spline coefficients
    when interp='spline' — and applies -4pi)."""
    T16 = 16                    # 2*(mmax+1) trig rows padded to 16
    assert 2 * (mmax + 1) <= T16, "mmax > 7 needs a wider trig row block"
    xrows = ncx + 2 if interp == "spline" else ncx
    ncyp = _round_up(ncy, 128)
    prec = jax.lax.Precision.DEFAULT if precision is None else precision

    def _dotTp(a, b):
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

    def kernel(xs_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        xs = xs_ref[:]
        x, y, z, m = xs[0:1], xs[1:2], xs[2:3], xs[3:4]
        R, r, cphi, sphi = _cyl_maps(x, y, z)
        w = jnp.where(r <= rmax_grid, m, 0.0)
        cm, sm = _trig_rows(mmax, cphi, sphi)
        rows = [w * c for c in cm] + [w * s for s in sm]
        rows += [jnp.zeros_like(w)] * (T16 - len(rows))
        WT = jnp.concatenate(rows, axis=0)               # (16, B)

        tx, ty = _grid_coords(R, z, acyl, hcyl, xmin, dxc, ncx,
                              ymin, dy, ncy)
        Wx3 = _w3(tx, ncx, interp)                       # (xrows, 1, B)
        Wy = _w2(ty, ncyp)          # (ncyp, B); pad rows are exactly 0
        A = (Wx3 * WT[None, :, :]).reshape(xrows * T16, -1)
        out_ref[:] += _dotTp(A, Wy).reshape(xrows, T16, ncyp)

    def fn(xyzm8):
        n = xyzm8.shape[1]
        assert n % block == 0, (
            f"particle count {n} not a multiple of block {block}: pad "
            f"first (CylinderForce._pad1024) or the tail is dropped")
        return pl.pallas_call(
            kernel,
            grid=(n // block,),
            out_shape=jax.ShapeDtypeStruct((xrows, T16, ncyp), jnp.float32),
            in_specs=[pl.BlockSpec((8, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((xrows, T16, ncyp), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(xyzm8)[:, :, :ncy]

    return fn


def make_cyl_accel_kernel(mmax, nmax, ncx, ncy, acyl, hcyl, xmin, dxc,
                          ymin, dy, rmax_grid, block=1024, chunk=16,
                          interpret=False, precision=None,
                          interp="linear"):
    """Returns fn(xyzm8 (8, N), Ct (ncx*Sp, ncyp)) -> (8, N) rows
    (ax, ay, az, pot, 0...).

    Ct rows are (jx, s) with s = q*(M+1)+m padded to Sp, q in
    [pot.bc, pot.bs, dUdR.bc, dUdR.bs, dUdz.bc, dUdz.bs]
    (see contract_coef_tables)."""
    M1 = mmax + 1
    S = 6 * M1
    Sp = _round_up(S, 8)
    ncyp = _round_up(ncy, 128)
    xrows = ncx + 2 if interp == "spline" else ncx
    chunk = min(chunk, xrows)
    while xrows % chunk:
        chunk -= 1
    prec = jax.lax.Precision.DEFAULT if precision is None else precision

    def _dotNTp(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

    def kernel(xs_ref, ct_ref, out_ref):
        xs = xs_ref[:]
        x, y, z = xs[0:1], xs[1:2], xs[2:3]     # row 3 (mass) unused here
        R, r, cphi, sphi = _cyl_maps(x, y, z)
        outside = r > rmax_grid
        shrink = jnp.where(outside, rmax_grid / r, 1.0)
        tx, ty = _grid_coords(R * shrink, z * shrink, acyl, hcyl,
                              xmin, dxc, ncx, ymin, dy, ncy)
        Wy = _w2(ty, ncyp)          # (ncyp, B); pad rows are exactly 0
        Wx3 = _w3(tx, ncx, interp)                       # (xrows, 1, B)

        B = xs.shape[1]
        v = jnp.zeros((Sp, B), jnp.float32)
        for jc in range(0, xrows, chunk):
            Dc = _dotNTp(ct_ref[jc * Sp:(jc + chunk) * Sp, :], Wy)
            v += jnp.sum(Dc.reshape(chunk, Sp, B)
                         * Wx3[jc:jc + chunk], axis=0)

        cm, sm = _trig_rows(mmax, cphi, sphi)
        pot = jnp.zeros_like(x)
        FR = jnp.zeros_like(x)
        Fz = jnp.zeros_like(x)
        Fp = jnp.zeros_like(x)
        for mm in range(M1):
            cmn = v[mm:mm + 1]
            smn = v[M1 + mm:M1 + mm + 1]
            pot += cmn * cm[mm] + smn * sm[mm]
            FR -= (v[2 * M1 + mm:2 * M1 + mm + 1] * cm[mm]
                   + v[3 * M1 + mm:3 * M1 + mm + 1] * sm[mm])
            Fz -= (v[4 * M1 + mm:4 * M1 + mm + 1] * cm[mm]
                   + v[5 * M1 + mm:5 * M1 + mm + 1] * sm[mm])
            if mm:
                Fp += mm * (cmn * sm[mm] - smn * cm[mm])
        Fp = Fp / R

        # monopole continuation beyond the table sphere (l=0 limit of
        # SphericalBasis.cc:1570-1633): Phi -> Phi_b r_b/r
        pot_out = pot * shrink
        Fr_out = pot * shrink / r
        ax_in = FR * cphi - Fp * sphi
        ay_in = FR * sphi + Fp * cphi
        ax = jnp.where(outside, Fr_out * x / r, ax_in)
        ay = jnp.where(outside, Fr_out * y / r, ay_in)
        az = jnp.where(outside, Fr_out * z / r, Fz)
        pot = jnp.where(outside, pot_out, pot)
        zero = jnp.zeros_like(ax)
        out_ref[:] = jnp.concatenate(
            [ax, ay, az, pot, zero, zero, zero, zero], axis=0)

    def fn(xyzm8, Ct):
        n = xyzm8.shape[1]
        assert n % block == 0, (
            f"particle count {n} not a multiple of block {block}: pad "
            f"first (CylinderForce._pad1024) or the tail is dropped")
        return pl.pallas_call(
            kernel,
            grid=(n // block,),
            out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
            in_specs=[
                pl.BlockSpec((8, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((xrows * Sp, ncyp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(xyzm8, Ct)

    return fn


# ---------------------------------------------------------------------------
# host/XLA-side packing helpers

def resample_coarse_x(table, numx, ncx):
    """Linearly resample a (numx, numy, M+1, nmax) table onto ncx evenly
    spaced x-nodes spanning the same [xmin, xmax] (host-side, once)."""
    t = np.linspace(0.0, numx - 1.0, ncx)
    i0 = np.minimum(t.astype(np.int64), numx - 2)
    f = (t - i0).reshape(-1, 1, 1, 1)
    a = np.asarray(table, np.float32)
    return a[i0] * (1.0 - f) + a[i0 + 1] * f


def coarse_dxc(numx, ncx, dx):
    return (numx - 1.0) * dx / (ncx - 1.0)


def prefilter_x(table):
    """Quadratic-B-spline prefilter along axis 0 (host-side, once).

    Solves the tridiagonal interpolation system (1/8, 3/4, 1/8) so the
    spline passes through the table values, with ghost rows from linear
    extrapolation (which collapses the boundary conditions to
    s[0] = tab[0], s[-1] = tab[-1]).  Returns (nc + 2, ...) spline
    coefficients matching _w3/_w2's interp='spline' row layout."""
    from scipy.linalg import solve_banded

    a = np.asarray(table, np.float64)
    nc = a.shape[0]
    ab = np.zeros((3, nc))
    ab[0, 1:] = 0.125
    ab[1, :] = 0.75
    ab[2, :-1] = 0.125
    ab[1, 0] = 1.0
    ab[0, 1] = 0.0
    ab[1, -1] = 1.0
    ab[2, -2] = 0.0
    s = solve_banded((1, 1), ab, a.reshape(nc, -1)).reshape(a.shape)
    top = 2.0 * s[:1] - s[1:2]
    bot = 2.0 * s[-1:] - s[-2:-1]
    return np.concatenate([top, s, bot], axis=0).astype(np.float32)


def contract_coef_tables(coef, potc, rfrcc, zfrcc):
    """coef (2, M+1, nmax) x coarse tables (ncx, ncy, M+1, nmax)
    -> Ct (ncx*Sp, ncyp) f32 rows (jx, q*(M+1)+m) for the accel kernel."""
    ncx, ncy, M1, _ = potc.shape
    Sp = _round_up(6 * M1, 8)
    ncyp = _round_up(ncy, 128)
    b = coef.astype(jnp.float32)
    qs = []
    for tab in (potc, rfrcc, zfrcc):
        t = jnp.asarray(tab, jnp.float32)
        qs.append(jnp.einsum("xymn,mn->xym", t, b[0], precision=_PREC))
        qs.append(jnp.einsum("xymn,mn->xym", t, b[1], precision=_PREC))
    C = jnp.stack(qs, axis=2)                            # (ncx, ncy, 6, M1)
    C = jnp.transpose(C, (0, 2, 3, 1)).reshape(ncx, 6 * M1, ncy)
    C = jnp.pad(C, ((0, 0), (0, Sp - 6 * M1), (0, ncyp - ncy)))
    return C.reshape(ncx * Sp, ncyp)


def contract_coef_output(G, potc):
    """G (ncx, 16, ncy) raw MTTKRP sums x coarse pot table
    (ncx, ncy, M+1, nmax) -> (2, M+1, nmax) coefficients (with -4pi)."""
    M1 = potc.shape[2]
    t = jnp.asarray(potc, jnp.float32)
    Gc = G[:, :M1, :]                                    # (ncx, M1, ncy)
    Gs = G[:, M1:2 * M1, :]
    bc = jnp.einsum("xmy,xymn->mn", Gc, t, precision=_PREC)
    bs = jnp.einsum("xmy,xymn->mn", Gs, t, precision=_PREC)
    return -4.0 * math.pi * jnp.stack([bc, bs])


# shared SoA packing (ops/padding.py) re-exported for the callers
from exp_tpu.ops.padding import pack_xyzm  # noqa: E402,F401
