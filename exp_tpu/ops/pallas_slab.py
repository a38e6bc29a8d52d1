"""Fused Pallas TPU kernels for the slab (periodic x,y x SL-vertical) force.

The XLA einsum path (forces/slab.py) materializes (N, (2K+1)^2, nmax)
intermediates in HBM, like the cube before its kernels.  These kernels
combine the cube's plane-wave machinery (ops/pallas_cube.py: axis-phase
recurrences + outer products via selection matmuls) with the cylinder's
interpolation-as-matmul trick in z (the reference's cudaSlabSL.cu
coefKernelSlab :245 / force pipeline, collapsed and fused):

  coefficient — G[ab, j] = sum_i w_i (ex ey)[ab, i] Wz[j, i] as one MXU
      contraction per block (complex via re/im row pairs); the
      (|kx|, |ky|, n) z-table contraction is a tiny einsum outside.
  force — the coefficient tensor is pre-contracted into four complex
      z-profiles per wavevector pair (pot, 2 pi kx pot, 2 pi ky pot,
      d/dz), interpolated per particle by a z-hat matmul, and closed
      with bulk (Cp, B) multiply-reduce rows on the VPU.

The z-axis is resampled to nzc (default 126; +2 spline ghost rows =
exactly one 128-lane tile) coarse nodes — the slab
basis functions are smooth low-order profiles, so the coarse hat
interpolation error is far below the f32 BFE truncation.  Data layout:
transposed SoA (8, N), matching the other kernels.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exp_tpu.ops.pallas_cube import (_axis_phases, _select_mats,
                                     _outer_bcast, _round_up,
                                     _dotNT, pack_xyzm)  # noqa: F401  (pack_xyzm re-exported)

_PREC = jax.lax.Precision.DEFAULT


# z interpolation weights (rows, B): the shared hat / prefiltered
# quadratic-B-spline weight rows (ghost offset +1 for spline; see
# pallas_cylinder.prefilter_x)
from exp_tpu.ops.pallas_cylinder import _w2 as _w_rows  # noqa: E402


def _dotp(a, b):
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_PREC)


def _outer_select_c2(P, Q, ar, ai, br, bi):
    """Compact complex outer product via 2-pass bf16-COMPENSATED selection
    matmuls.

    The v1 path ran the four selection matmuls P.a / Q.b at
    Precision.HIGHEST (6 bf16 passes each) because a single DEFAULT pass
    rounds the phase VALUES to bf16 (~4e-3).  But the selection matrices
    are 0/1 — exact in bf16 — so splitting only the phase operand
    a = ah + al (hi+lo carries ~16 mantissa bits, ~1e-5 relative: lo is
    itself rounded to bf16) and summing two DEFAULT passes
    reconstructs P.a to ~1e-5 at a third of the MXU cost.  (Same trick as
    the accel kernel's bf16x3 z-profile matmul, minus the al*bl term that
    is exactly zero here.)"""
    def sel(S, u):
        hi = u.astype(jnp.bfloat16).astype(jnp.float32)
        lo = (u - hi).astype(jnp.bfloat16).astype(jnp.float32)
        d = jax.lax.Precision.DEFAULT
        return _dotNT(S, hi, d) + _dotNT(S, lo, d)

    Ar, Ai = sel(P, ar), sel(P, ai)
    Br, Bi = sel(Q, br), sel(Q, bi)
    return Ar * Br - Ai * Bi, Ar * Bi + Ai * Br


def _dotn(a, b):
    # HIGHEST: the accel z-profile matmuls are small (~90k MAC/particle)
    # but bf16 rounding of the pre-contracted tables costs ~5e-3 force
    # error; fp32 emulation here is ~1 ms at 1M for 10x the accuracy
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def make_slab_coef_kernel(nmaxx, nmaxy, nzc, zmax, block=1024,
                          interpret=False, interp="linear"):
    """Returns fn(xyzm8 (8, N)) -> complex64 (C, zrows) raw sums
    G[ab, j] = sum_i w_i e^{-2 pi i k.xy_i} Wz[j, i] with w masked to
    |z| <= zmax (caller contracts with the z-tables — spline
    coefficients when interp='spline')."""
    kx, ky = 2 * nmaxx + 1, 2 * nmaxy + 1
    C = kx * ky
    kxp, kyp = _round_up(kx, 8), _round_up(ky, 8)
    Cq = kxp * kyp
    zrows = nzc + 2 if interp == "spline" else nzc
    nzp = _round_up(zrows, 128)
    dz = 2.0 * zmax / (nzc - 1)

    # v3 (cube-v2 recipe): the v1 selection-matmul outer product ran 4
    # HIGHEST matmuls with K = 16 (~12% MXU utilization) and dominated
    # the whole pass (probe_slab_decomp: coef kernel 4.35 of 4.46 ms at
    # 1M).  The (kx, ky) outer product is VPU broadcast work on a padded
    # 16x16 row lattice; the single stacked (2 Cq, B) x (B, nzp) DEFAULT
    # matmul is then MXU-shaped.  Holes of the lattice carry zeros and
    # are sliced off outside.
    def kernel(xs_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        xs = xs_ref[:]
        x, y, z, m = xs[0:1], xs[1:2], xs[2:3], xs[3:4]
        w = jnp.where(jnp.abs(z) <= zmax, m, 0.0)
        exr, exi = _axis_phases(x - jnp.floor(x), nmaxx, -1.0, pad_to=kxp)
        eyr, eyi = _axis_phases(y - jnp.floor(y), nmaxy, -1.0, pad_to=kyp)
        # fold the mass weight into the 16 ex rows (not the 256-row
        # lattice product)
        xyr, xyi = _outer_bcast(exr * w, exi * w, eyr, eyi,
                                kxp, kyp, block)
        t = jnp.clip((z + zmax) / dz, 0.0, nzc - 1.0)
        Wz = _w_rows(t, nzc, interp)
        Wz = jnp.pad(Wz, ((0, nzp - Wz.shape[0]), (0, 0))) \
            if Wz.shape[0] < nzp else Wz
        XY = jnp.concatenate([xyr, xyi], axis=0)          # (2 Cq, B)
        out_ref[:] += _dotp(XY, Wz)

    def fn(xyzm8):
        n = xyzm8.shape[1]
        assert n % block == 0, (
            f"particle count {n} not a multiple of block {block}: pad "
            f"first or the tail is dropped")
        big = pl.pallas_call(
            kernel,
            grid=(n // block,),
            out_shape=jax.ShapeDtypeStruct((2 * Cq, nzp), jnp.float32),
            in_specs=[
                pl.BlockSpec((8, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2 * Cq, nzp), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(xyzm8)
        re = big[:Cq, :zrows].reshape(kxp, kyp, zrows)[:kx, :ky]
        im = big[Cq:, :zrows].reshape(kxp, kyp, zrows)[:kx, :ky]
        return jax.lax.complex(re.reshape(C, zrows),
                               im.reshape(C, zrows))

    return fn


def make_slab_accel_kernel(nmaxx, nmaxy, nzc, zmax, block=1024,
                           interpret=False, interp="linear", zprec=None):
    """Returns fn(xyzm8 (8, N), Ct (4*Cp, nzp), Aux (Cp, 128)) -> (8, N)
    rows (ax, ay, az, pot, 0...).

    Ct rows: TWO complex z-profile groups of Cp wavevector rows each,
    [pot_re | pot_im | dz_re | dz_im] (see contract_slab_tables) — the
    2 pi kx / 2 pi ky horizontal-force factors are per-WAVEVECTOR
    constants, applied after the z interpolation from Aux columns
    instead of burning 2x the MXU rows on pre-scaled copies of the same
    profile (the v2 halving; the v1 8-group layout re-interpolated
    kx*pot and ky*pot as independent rows).

    Aux columns (slab_accel_aux): per-row 2 pi kx, 2 pi ky, 2 pi |k|,
    k=0 mask, and the 8 boundary-value rows of the |z| > zmax vacuum
    continuation (top/bottom pot and dPhi/dz, re/im) — the whole
    outside-continuation (forces/slab.py's exterior Laplace solution)
    runs IN-kernel under a pl.when that skips it for blocks with every
    particle inside the slab (the common case: disk scale heights sit
    well inside zmax)."""
    kx, ky = 2 * nmaxx + 1, 2 * nmaxy + 1
    C = kx * ky
    Cp = _round_up(C, 8)
    kxp, kyp = _round_up(kx, 8), _round_up(ky, 8)
    zrows = nzc + 2 if interp == "spline" else nzc
    nzp = _round_up(zrows, 128)
    Pm, Qm = _select_mats(kx, ky, kxp, kyp, Cp)
    dz = 2.0 * zmax / (nzc - 1)
    zp = "bf16x3" if zprec is None else zprec

    def _zdot(a, b):
        if zp == "bf16x3":
            # 3-pass bf16 error compensation: a = ah + al, b = bh + bl
            # (each half carries ~8 more mantissa bits); dropping only
            # the al*bl term leaves ~1e-5 relative error at HALF the
            # 6-pass cost of Precision.HIGHEST (which Mosaic runs f32
            # matmuls at; Precision.HIGH is not lowered on TPU).
            # Measured (probe_slab_block): HIGHEST 7.0 ms / DEFAULT
            # 4.8 ms at 1M, err(DEFAULT) = 5e-3.  Operands stay f32
            # (Mosaic rejects bf16 vregs in tpu.matmul) with VALUES
            # pre-rounded to bf16 — DEFAULT's single bf16 pass then
            # truncates them losslessly.
            def split(u):
                hi = u.astype(jnp.bfloat16).astype(jnp.float32)
                lo = (u - hi).astype(jnp.bfloat16).astype(jnp.float32)
                return hi, lo

            ah, al = split(a)
            bh, bl = split(b)

            def d(u, v):
                # explicit DEFAULT: one bf16 MXU pass (an unset
                # precision resolved to the fp32 6-pass contract here,
                # tripling the cost — measured 13.5 ms vs 8.1 HIGHEST)
                return jax.lax.dot_general(
                    u, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)

            return d(ah, bh) + (d(ah, bl) + d(al, bh))
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=zp)

    def kernel(xs_ref, ct_ref, aux_ref, pm_ref, qm_ref, out_ref):
        xs = xs_ref[:]
        x, y, z = xs[0:1], xs[1:2], xs[2:3]
        zc = jnp.clip(z, -zmax, zmax)
        exr, exi = _axis_phases(x - jnp.floor(x), nmaxx, +1.0, pad_to=kxp)
        eyr, eyi = _axis_phases(y - jnp.floor(y), nmaxy, +1.0, pad_to=kyp)
        xyr, xyi = _outer_select_c2(pm_ref[:], qm_ref[:],
                                    exr, exi, eyr, eyi)
        t = jnp.clip((zc + zmax) / dz, 0.0, nzc - 1.0)
        Wz = _w_rows(t, nzc, interp)
        Wz = jnp.pad(Wz, ((0, nzp - Wz.shape[0]), (0, 0))) \
            if Wz.shape[0] < nzp else Wz

        # ONE (4 Cp, nzp) x (nzp, B) matmul for the two complex
        # z-profile groups
        vall = _zdot(ct_ref[:], Wz)
        v0r, v0i = vall[0 * Cp:1 * Cp], vall[1 * Cp:2 * Cp]   # pot
        v3r, v3i = vall[2 * Cp:3 * Cp], vall[3 * Cp:4 * Cp]   # d/dz
        kxw = aux_ref[:, 0:1]        # 2 pi kx per wavevector row
        kyw = aux_ref[:, 1:2]
        TEr = xyr * v0r - xyi * v0i
        TEi = xyr * v0i + xyi * v0r
        pot = jnp.sum(TEr, axis=0, keepdims=True)
        ax = jnp.sum(kxw * TEi, axis=0, keepdims=True)
        ay = jnp.sum(kyw * TEi, axis=0, keepdims=True)
        az = -jnp.sum(xyr * v3r - xyi * v3i, axis=0, keepdims=True)
        zero = jnp.zeros_like(ax)
        out_ref[:] = jnp.concatenate(
            [ax, ay, az, pot, zero, zero, zero, zero], axis=0)

        dzp = jnp.maximum(jnp.abs(z) - zmax, 0.0)        # (1, B)
        outside = dzp > 0.0

        @pl.when(jnp.any(outside))
        def _():
            km = aux_ref[:, 2:3]                         # 2 pi |k|
            k0 = aux_ref[:, 3:4]                         # k = 0 row mask
            top = (z >= 0).astype(jnp.float32)           # (1, B)
            bot = 1.0 - top
            szn = 2.0 * top - 1.0
            Tir = aux_ref[:, 4:5] * top + aux_ref[:, 6:7] * bot
            Tii = aux_ref[:, 5:6] * top + aux_ref[:, 7:8] * bot
            Tdr = aux_ref[:, 8:9] * top + aux_ref[:, 10:11] * bot
            Tdi = aux_ref[:, 9:10] * top + aux_ref[:, 11:12] * bot
            att = jnp.exp(-km * dzp)                     # (Cp, B)
            OEr = (Tir * xyr - Tii * xyi) * att
            OEi = (Tir * xyi + Tii * xyr) * att
            TdEr = Tdr * xyr - Tdi * xyi                 # att = 1 at k = 0
            pot_o = (jnp.sum(OEr, axis=0, keepdims=True)
                     + jnp.sum(k0 * TdEr, axis=0, keepdims=True)
                     * dzp * szn)
            ax_o = jnp.sum(kxw * OEi, axis=0, keepdims=True)
            ay_o = jnp.sum(kyw * OEi, axis=0, keepdims=True)
            az_o = jnp.sum(k0 * (-TdEr) + km * (szn * OEr),
                           axis=0, keepdims=True)
            merged = jnp.concatenate(
                [jnp.where(outside, ax_o, ax),
                 jnp.where(outside, ay_o, ay),
                 jnp.where(outside, az_o, az),
                 jnp.where(outside, pot_o, pot),
                 zero, zero, zero, zero], axis=0)
            out_ref[:] = merged

    def fn(xyzm8, Ct, Aux):
        n = xyzm8.shape[1]
        assert n % block == 0, (
            f"particle count {n} not a multiple of block {block}: pad "
            f"first or the tail is dropped")
        return pl.pallas_call(
            kernel,
            grid=(n // block,),
            out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
            in_specs=[
                pl.BlockSpec((8, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4 * Cp, nzp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Cp, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Cp, kxp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Cp, kyp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(xyzm8, Ct, Aux, Pm, Qm)

    return fn


# ---------------------------------------------------------------------------
# host/XLA-side packing

def resample_z(table, numz, nzc):
    """Linear resample a (numz, ...) uniform-z table onto nzc nodes
    (host-side, once)."""
    t = np.linspace(0.0, numz - 1.0, nzc)
    i0 = np.minimum(t.astype(np.int64), numz - 2)
    f = (t - i0).reshape((-1,) + (1,) * (np.ndim(table) - 1))
    a = np.asarray(table, np.float32)
    return a[i0] * (1.0 - f) + a[i0 + 1] * f


def expand_signed(tab):
    """(nzc, nkx, nky, n) |k| table -> (nzc, 2nkx-1, 2nky-1, n)."""
    a = np.concatenate([tab[:, :0:-1], tab], axis=1)
    return np.concatenate([a[:, :, :0:-1], a[:, :, :]], axis=2)


def contract_coef_output(G, phi_s, sgn):
    """G (C, nzc) complex x phi_s (nzc, A, B2, n) signed z-table ->
    coefficients (A, B2, n) complex with the -4 pi and pairing signs."""
    A, B2, nn = phi_s.shape[1:]
    Gf = G.reshape(A, B2, -1)
    c = jnp.einsum("abj,jabn->abn", Gf,
                   jnp.asarray(phi_s, jnp.float32).astype(Gf.dtype),
                   precision=jax.lax.Precision.HIGHEST)
    return -4.0 * math.pi * c * jnp.asarray(sgn, jnp.float32).astype(c.dtype)


def contract_slab_tables(coef, phi_s, dphi_s, nmaxx, nmaxy):
    """coef (A, B2, n) complex x signed z-tables -> Ct (4*Cp, nzp) f32 for
    the accel kernel: complex z-profiles T_q[j, ab] for q = pot, d/dz
    (the 2 pi k horizontal factors ride the Aux table, slab_accel_aux)."""
    nzc, A, B2, nn = phi_s.shape
    C = A * B2
    Cp = _round_up(C, 8)
    nzp = _round_up(nzc, 128)
    phi = jnp.asarray(phi_s, jnp.float32).astype(coef.dtype)
    dphi = jnp.asarray(dphi_s, jnp.float32).astype(coef.dtype)
    # HIGHEST: the default TPU einsum rounds the pre-contracted
    # z-profiles to bf16, re-introducing the table error the kernel's
    # own fp32-emulated matmuls exist to avoid
    hi = jax.lax.Precision.HIGHEST
    T = jnp.einsum("abn,jabn->jab", coef, phi,
                   precision=hi)                      # (nzc, A, B2)
    Tz = jnp.einsum("abn,jabn->jab", coef, dphi, precision=hi)
    rows = []
    for Tq in (T, Tz):
        M = Tq.reshape(nzc, C).T                      # (C, nzc)
        for part in (jnp.real(M), jnp.imag(M)):
            rows.append(jnp.pad(part.astype(jnp.float32),
                                ((0, Cp - C), (0, nzp - nzc))))
    return jnp.concatenate(rows, axis=0)


def slab_accel_aux(coef, phi_top, phi_bot, dphi_top, dphi_bot,
                   nmaxx, nmaxy):
    """Per-wavevector constants + vacuum-continuation boundary rows for
    the accel kernel's Aux operand (Cp, 128) f32.

    Columns: 0 = 2 pi kx, 1 = 2 pi ky, 2 = 2 pi |k|, 3 = k=0 mask,
    4..7 = top/bottom boundary potential (re, im) and 8..11 = top/bottom
    boundary dPhi/dz (re, im) — Sum_n coef * phi_n(+-zmax), the two fixed
    table rows of forces/slab.py _outside_continuation.

    phi_*/dphi_* are the UNSIGNED (A1, B1, n) boundary rows of the full-
    resolution z-table (phi_t[-1], phi_t[0], ...)."""
    tpi = 2.0 * math.pi
    kxv = np.arange(-nmaxx, nmaxx + 1, dtype=np.float32)
    kyv = np.arange(-nmaxy, nmaxy + 1, dtype=np.float32)
    A, B2 = 2 * nmaxx + 1, 2 * nmaxy + 1
    C = A * B2
    Cp = _round_up(C, 8)
    kmag = np.sqrt(kxv[:, None] ** 2 + kyv[None, :] ** 2)

    def expand(v):          # (nx+1, ny+1, n) -> signed-k layout
        a = jnp.concatenate([v[:0:-1], v], axis=0)
        return jnp.concatenate([a[:, :0:-1], a], axis=1)

    cols = [
        jnp.asarray(np.broadcast_to((tpi * kxv)[:, None],
                                    (A, B2)).reshape(C), jnp.float32),
        jnp.asarray(np.broadcast_to((tpi * kyv)[None, :],
                                    (A, B2)).reshape(C), jnp.float32),
        jnp.asarray((tpi * kmag).reshape(C), jnp.float32),
        jnp.asarray((kmag == 0).astype(np.float32).reshape(C)),
    ]
    hi = jax.lax.Precision.HIGHEST
    for tab in (phi_top, phi_bot):
        Tb = jnp.einsum("abn,abn->ab", coef,
                        expand(tab).astype(coef.dtype),
                        precision=hi).reshape(C)
        cols += [jnp.real(Tb).astype(jnp.float32),
                 jnp.imag(Tb).astype(jnp.float32)]
    # reorder to (top_re, top_im, bot_re, bot_im) then dPhi/dz rows
    for tab in (dphi_top, dphi_bot):
        Td = jnp.einsum("abn,abn->ab", coef,
                        expand(tab).astype(coef.dtype),
                        precision=hi).reshape(C)
        cols += [jnp.real(Td).astype(jnp.float32),
                 jnp.imag(Td).astype(jnp.float32)]
    aux = jnp.stack(cols, axis=1)                    # (C, 12)
    return jnp.pad(aux, ((0, Cp - C), (0, 128 - aux.shape[1])))
