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

The z-axis is resampled to nzc (default 128) coarse nodes — the slab
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
                                     _outer_complex, _round_up, _dotT,
                                     _dotNT, pack_xyzm)  # noqa: F401

_PREC = jax.lax.Precision.DEFAULT


# z interpolation weights (rows, B): the shared hat / prefiltered
# quadratic-B-spline weight rows (ghost offset +1 for spline; see
# pallas_cylinder.prefilter_x)
from exp_tpu.ops.pallas_cylinder import _w2 as _w_rows  # noqa: E402


def _dotp(a, b):
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_PREC)


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
    Cp = _round_up(C, 8)
    kxp, kyp = _round_up(kx, 8), _round_up(ky, 8)
    zrows = nzc + 2 if interp == "spline" else nzc
    nzp = _round_up(zrows, 128)
    Pm, Qm = _select_mats(kx, ky, kxp, kyp, Cp)
    dz = 2.0 * zmax / (nzc - 1)

    def kernel(xs_ref, pm_ref, qm_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        xs = xs_ref[:]
        x, y, z, m = xs[0:1], xs[1:2], xs[2:3], xs[3:4]
        w = jnp.where(jnp.abs(z) <= zmax, m, 0.0)
        exr, exi = _axis_phases(x - jnp.floor(x), nmaxx, -1.0, pad_to=kxp)
        eyr, eyi = _axis_phases(y - jnp.floor(y), nmaxy, -1.0, pad_to=kyp)
        xyr, xyi = _outer_complex(pm_ref[:], qm_ref[:], exr, exi, eyr, eyi)
        t = jnp.clip((z + zmax) / dz, 0.0, nzc - 1.0)
        Wz = _w_rows(t, nzc, interp)
        Wz = jnp.pad(Wz, ((0, nzp - Wz.shape[0]), (0, 0))) \
            if Wz.shape[0] < nzp else Wz
        # one stacked matmul (M = 2 Cp) instead of two M = Cp halves —
        # the 128-wide MXU is under-tiled at Cp ~ 88 (cube-v2 lesson)
        XY = jnp.concatenate([xyr * w, xyi * w], axis=0)
        out_ref[:] += _dotp(XY, Wz)

    def fn(xyzm8):
        n = xyzm8.shape[1]
        assert n % block == 0, (
            f"particle count {n} not a multiple of block {block}: pad "
            f"first or the tail is dropped")
        big = pl.pallas_call(
            kernel,
            grid=(n // block,),
            out_shape=jax.ShapeDtypeStruct((2 * Cp, nzp), jnp.float32),
            in_specs=[
                pl.BlockSpec((8, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Cp, kxp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Cp, kyp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2 * Cp, nzp), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(xyzm8, Pm, Qm)
        return jax.lax.complex(big[:C, :zrows], big[Cp:Cp + C, :zrows])

    return fn


def make_slab_accel_kernel(nmaxx, nmaxy, nzc, zmax, block=1024,
                           interpret=False, interp="linear"):
    """Returns fn(xyzm8 (8, N), Ct (8*Cp, nzp)) -> (8, N) rows
    (ax, ay, az, pot, 0...).

    Ct rows: 4 complex z-profile groups of Cp wavevector rows each,
    ordered [pot_re | pot_im | x_re | x_im | y_re | y_im | z_re | z_im]
    (see contract_slab_tables)."""
    kx, ky = 2 * nmaxx + 1, 2 * nmaxy + 1
    C = kx * ky
    Cp = _round_up(C, 8)
    kxp, kyp = _round_up(kx, 8), _round_up(ky, 8)
    zrows = nzc + 2 if interp == "spline" else nzc
    nzp = _round_up(zrows, 128)
    Pm, Qm = _select_mats(kx, ky, kxp, kyp, Cp)
    dz = 2.0 * zmax / (nzc - 1)

    def kernel(xs_ref, ct_ref, pm_ref, qm_ref, out_ref):
        xs = xs_ref[:]
        x, y, z = xs[0:1], xs[1:2], xs[2:3]
        zc = jnp.clip(z, -zmax, zmax)
        exr, exi = _axis_phases(x - jnp.floor(x), nmaxx, +1.0, pad_to=kxp)
        eyr, eyi = _axis_phases(y - jnp.floor(y), nmaxy, +1.0, pad_to=kyp)
        xyr, xyi = _outer_complex(pm_ref[:], qm_ref[:], exr, exi, eyr, eyi)
        t = jnp.clip((zc + zmax) / dz, 0.0, nzc - 1.0)
        Wz = _w_rows(t, nzc, interp)
        Wz = jnp.pad(Wz, ((0, nzp - Wz.shape[0]), (0, 0))) \
            if Wz.shape[0] < nzp else Wz

        # ONE (8 Cp, nzp) x (nzp, B) matmul for all four complex
        # z-profile groups (was 8 separate M = Cp matmuls starving the
        # MXU's 128-row tiles)
        vall = _dotn(ct_ref[:], Wz)

        def zprof(q):
            return (vall[(2 * q) * Cp:(2 * q + 1) * Cp],
                    vall[(2 * q + 1) * Cp:(2 * q + 2) * Cp])

        v0r, v0i = zprof(0)      # pot profile
        v1r, v1i = zprof(1)      # 2 pi kx pot
        v2r, v2i = zprof(2)      # 2 pi ky pot
        v3r, v3i = zprof(3)      # d/dz
        pot = jnp.sum(xyr * v0r - xyi * v0i, axis=0, keepdims=True)
        ax = jnp.sum(xyr * v1i + xyi * v1r, axis=0, keepdims=True)
        ay = jnp.sum(xyr * v2i + xyi * v2r, axis=0, keepdims=True)
        az = -jnp.sum(xyr * v3r - xyi * v3i, axis=0, keepdims=True)
        zero = jnp.zeros_like(ax)
        out_ref[:] = jnp.concatenate(
            [ax, ay, az, pot, zero, zero, zero, zero], axis=0)

    def fn(xyzm8, Ct):
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
                pl.BlockSpec((8 * Cp, nzp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Cp, kxp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Cp, kyp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(xyzm8, Ct, Pm, Qm)

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
    """coef (A, B2, n) complex x signed z-tables -> Ct (8*Cp, nzp) f32 for
    the accel kernel: complex z-profiles T_q[j, ab] for q = pot, 2 pi kx,
    2 pi ky, d/dz."""
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
    tpi = 2.0 * math.pi
    kxv = (tpi * jnp.arange(-nmaxx, nmaxx + 1,
                            dtype=jnp.float32))[None, :, None]
    kyv = (tpi * jnp.arange(-nmaxy, nmaxy + 1,
                            dtype=jnp.float32))[None, None, :]
    rows = []
    for Tq in (T, T * kxv, T * kyv, Tz):
        M = Tq.reshape(nzc, C).T                      # (C, nzc)
        for part in (jnp.real(M), jnp.imag(M)):
            rows.append(jnp.pad(part.astype(jnp.float32),
                                ((0, Cp - C), (0, nzp - nzc))))
    return jnp.concatenate(rows, axis=0)
