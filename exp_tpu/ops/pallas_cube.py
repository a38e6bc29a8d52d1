"""Fused Pallas TPU kernels for the plane-wave (cube) BFE hot loops.

The XLA einsum path (forces/cube.py) materializes (N, (2K+1)^2) complex
phase intermediates in HBM — ~5.4 GB at 4M particles, nmax=6 — so a full
KDK step is bandwidth-bound at ~250 ms.  These kernels build the phase
factors in VMEM per particle block and contract them on the MXU without
ever touching HBM with an N-sized intermediate; the only HBM traffic is
the (8, N) particle read and (8, N) force write (the reference's
cudaCube.cu coefKernelCube/forceKernel pipeline, collapsed and fused).

  phases    — e^{±2 pi i k x_c} per axis from ONE cos/sin pair and the
              angle-addition recurrence (6 transcendentals per particle).
  coef      — exy = outer(ex, ey) (VMEM), then the complex contraction
              coef[ab, c] += exy[ab, i] (ez*m)[c, i] as 4 real matmuls.
  force     — P[s, i] = R[ab, s]^T exy[ab, i] with the small matrix
              R = [b | 2 pi kx b | 2 pi ky b] (kz folds into the final ez
              contraction), then pot/acc assembled on the VPU.

Data layout: transposed SoA (8, N) rows (x, y, z, mass, 0...) in, (8, N)
rows (ax, ay, az, pot, 0...) out, matching ops/pallas_sphere.py.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PREC = jax.lax.Precision.HIGHEST


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _dotT(a, b, prec=_PREC):
    """a (C, I) x b (J, I) -> (C, J): contract the last dims."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=prec)


def _dotTT(a, b, prec=_PREC):
    """a (J, C) x b (J, I) -> (C, I): contract the first dims."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=prec)


def _axis_phases(u, nmax, sign, pad_to=None):
    """e^{sign * 2 pi i k u} rows for k = -nmax..nmax; u (1, B).

    Returns (re (K, B), im (K, B)) with K = 2*nmax+1 zero-padded to
    `pad_to` rows.  Built as ONE full-width broadcast multiply
    ang[k, i] = sign 2 pi (k - nmax) u_i followed by masked cos/sin on
    the whole (pad_to, B) tile — the earlier angle-addition recurrence
    serialized 2*nmax dependent (1, B) row ops and then paid a
    13..16-row sublane concatenation, which dominated BOTH kernels'
    runtime (measured: the pass floor dropped 12.9 -> ~3 ms at 4M once
    phases went full-width)."""
    K = 2 * nmax + 1
    rows = K if pad_to is None else pad_to
    k_row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    live = k_row < K
    kf = jnp.where(live, k_row - nmax, 0).astype(jnp.float32)
    ang = (sign * 2.0 * math.pi) * (kf * u)          # (rows, B)
    mask = live.astype(jnp.float32)
    return jnp.cos(ang) * mask, jnp.sin(ang) * mask


def _select_mats(ka, kb, ka_p, kb_p, cp):
    """Selection matrices P (cp, ka_p), Q (cp, kb_p): row r = a*kb + b of
    the flattened outer product selects a = r // kb, b = r % kb.  The
    outer product then becomes two small MXU matmuls + an elementwise
    multiply — no sublane-unaligned concatenation."""
    P = np.zeros((cp, ka_p), np.float32)
    Q = np.zeros((cp, kb_p), np.float32)
    for a in range(ka):
        for b in range(kb):
            P[a * kb + b, a] = 1.0
            Q[a * kb + b, b] = 1.0
    # plain numpy (NOT jnp): the kernel maker may run inside a jit trace
    # (lazy _pallas_kernels) and cached closures must not capture tracers
    return P, Q


def _dotNT(a, b, prec=_PREC):
    """a (C, J) x b (J, I) -> (C, I): plain matmul."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=prec)


def _outer_complex(P, Q, ar, ai, br, bi, prec=_PREC):
    """Complex outer product via selection matmuls -> (cp, B) re/im."""
    Ar, Ai = _dotNT(P, ar, prec), _dotNT(P, ai, prec)
    Br, Bi = _dotNT(Q, br, prec), _dotNT(Q, bi, prec)
    return Ar * Br - Ai * Bi, Ar * Bi + Ai * Br


def make_cube_coef_kernel(nmaxx, nmaxy, nmaxz, block=1024, interpret=False,
                          precision=None):
    """Returns fn(xyzm8 (8, N)) -> complex64 (Kx, Ky, Kz) RAW phase sums
    sum_i m_i e^{-2 pi i k.x_i} (caller applies -norm)."""
    prec = _PREC if precision is None else precision
    kx, ky, kz = 2 * nmaxx + 1, 2 * nmaxy + 1, 2 * nmaxz + 1
    C = kx * ky
    Cp = _round_up(C, 8)
    kxp, kyp, kzp = _round_up(kx, 8), _round_up(ky, 8), _round_up(kz, 8)
    Jp = kzp
    Pm, Qm = _select_mats(kx, ky, kxp, kyp, Cp)

    def kernel(xs_ref, pm_ref, qm_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        xs = xs_ref[:]
        x, y, z, m = xs[0:1], xs[1:2], xs[2:3], xs[3:4]
        exr, exi = _axis_phases(x - jnp.floor(x), nmaxx, -1.0, pad_to=kxp)
        eyr, eyi = _axis_phases(y - jnp.floor(y), nmaxy, -1.0, pad_to=kyp)
        ezr, ezi = _axis_phases(z - jnp.floor(z), nmaxz, -1.0, pad_to=kzp)
        xyr, xyi = _outer_complex(pm_ref[:], qm_ref[:], exr, exi, eyr, eyi,
                                  prec)
        zr = ezr * m
        zi = ezi * m
        cre = _dotT(xyr, zr, prec) - _dotT(xyi, zi, prec)   # (Cp, kzp)
        cim = _dotT(xyr, zi, prec) + _dotT(xyi, zr, prec)
        out_ref[:] += jnp.concatenate([cre, cim], axis=0)

    def fn(xyzm8):
        n = xyzm8.shape[1]
        assert n % block == 0, (
            f"particle count {n} not a multiple of block {block}: pad "
            f"first or the tail is dropped")
        grid = n // block
        big = pl.pallas_call(
            kernel,
            grid=(grid,),
            out_shape=jax.ShapeDtypeStruct((2 * Cp, Jp), jnp.float32),
            in_specs=[
                pl.BlockSpec((8, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Cp, kxp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Cp, kyp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2 * Cp, Jp), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(xyzm8, Pm, Qm)
        re = big[:C, :kz].reshape(kx, ky, kz)
        im = big[Cp:Cp + C, :kz].reshape(kx, ky, kz)
        return jax.lax.complex(re, im)

    return fn


def make_cube_accel_kernel(nmaxx, nmaxy, nmaxz, block=1024, interpret=False,
                           precision=None):
    """Returns fn(xyzm8 (8, N), R_re (Cp, Sp), R_im (Cp, Sp)) -> (8, N)
    rows (ax, ay, az, pot, 0...).

    R columns are the 3 contraction paths stacked along kz: s*Kz + c with
    s = 0: b, 1: 2 pi kx b, 2: 2 pi ky b, where b = coef * norm; the z
    wavenumber weight for az folds into the final ez contraction."""
    kx, ky, kz = 2 * nmaxx + 1, 2 * nmaxy + 1, 2 * nmaxz + 1
    C = kx * ky
    Cp = _round_up(C, 8)
    kxp, kyp, kzp = _round_up(kx, 8), _round_up(ky, 8), _round_up(kz, 8)
    # each contraction path padded to kzp rows so the per-path slices of
    # P below are sublane-ALIGNED (a 13-row stride forced 13 separate
    # (1, B) row ops before — lane-starved VPU work dominating the pass)
    Sp = 3 * kzp
    Pm, Qm = _select_mats(kx, ky, kxp, kyp, Cp)
    prec = _PREC if precision is None else precision

    def kernel(xs_ref, rr_ref, ri_ref, pm_ref, qm_ref, out_ref):
        xs = xs_ref[:]
        x, y, z = xs[0:1], xs[1:2], xs[2:3]
        exr, exi = _axis_phases(x - jnp.floor(x), nmaxx, +1.0, pad_to=kxp)
        eyr, eyi = _axis_phases(y - jnp.floor(y), nmaxy, +1.0, pad_to=kyp)
        ezr, ezi = _axis_phases(z - jnp.floor(z), nmaxz, +1.0, pad_to=kzp)
        xyr, xyi = _outer_complex(pm_ref[:], qm_ref[:], exr, exi, eyr, eyi,
                                  prec)
        # P = R^T exy: (Sp, B) complex; path s lives in rows
        # [s*kzp, s*kzp+kz) (zero-padded tail rows)
        pr = _dotTT(rr_ref[:], xyr, prec) - _dotTT(ri_ref[:], xyi, prec)
        pi = _dotTT(rr_ref[:], xyi, prec) + _dotTT(ri_ref[:], xyr, prec)
        p0r, p0i = pr[0:kzp], pi[0:kzp]
        p1r, p1i = pr[kzp:2 * kzp], pi[kzp:2 * kzp]
        p2r, p2i = pr[2 * kzp:3 * kzp], pi[2 * kzp:3 * kzp]
        # full-width (kzp, B) products + one row reduction per output:
        # pot = Re(ez P0), az = Im(2 pi kz ez P0), ax/ay = Im(ez P1/P2);
        # the kz weight row is built from iota (pallas kernels cannot
        # capture constant arrays)
        idx = jax.lax.broadcasted_iota(jnp.int32, (kzp, 1), 0)
        kzw = jnp.where(idx < kz,
                        2.0 * math.pi * (idx.astype(jnp.float32) - nmaxz),
                        0.0)
        pot = jnp.sum(ezr * p0r - ezi * p0i, axis=0, keepdims=True)
        az = jnp.sum(kzw * (ezr * p0i + ezi * p0r), axis=0, keepdims=True)
        ax = jnp.sum(ezr * p1i + ezi * p1r, axis=0, keepdims=True)
        ay = jnp.sum(ezr * p2i + ezi * p2r, axis=0, keepdims=True)
        zero = jnp.zeros_like(ax)
        out_ref[:] = jnp.concatenate(
            [ax, ay, az, pot, zero, zero, zero, zero], axis=0)

    def fn(xyzm8, R_re, R_im):
        n = xyzm8.shape[1]
        assert n % block == 0, (
            f"particle count {n} not a multiple of block {block}: pad "
            f"first or the tail is dropped")
        grid = n // block
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
            in_specs=[
                pl.BlockSpec((8, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Cp, Sp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Cp, Sp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Cp, kxp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Cp, kyp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(xyzm8, R_re, R_im, Pm, Qm)

    return fn


def pack_force_matrix(b, nmaxx, nmaxy, nmaxz):
    """b = coef * norm (Kx, Ky, Kz) complex -> (R_re, R_im) (Cp, Sp) f32:
    columns [b | 2 pi kx b | 2 pi ky b] flattened over (kx, ky) rows,
    each path zero-padded to kzp columns (the accel kernel's per-path
    slices must be sublane-aligned)."""
    kx, ky, kz = 2 * nmaxx + 1, 2 * nmaxy + 1, 2 * nmaxz + 1
    C = kx * ky
    Cp = _round_up(C, 8)
    kzp = _round_up(kz, 8)
    tpi = 2.0 * math.pi
    kxv = (tpi * jnp.arange(-nmaxx, nmaxx + 1,
                            dtype=jnp.float32))[:, None, None]
    kyv = (tpi * jnp.arange(-nmaxy, nmaxy + 1,
                            dtype=jnp.float32))[None, :, None]
    pad = ((0, 0), (0, 0), (0, kzp - kz))
    R = jnp.concatenate([jnp.pad(b, pad), jnp.pad(b * kxv, pad),
                         jnp.pad(b * kyv, pad)],
                        axis=2).reshape(C, 3 * kzp)
    R = jnp.pad(R, ((0, Cp - C), (0, 0)))
    return jnp.real(R).astype(jnp.float32), jnp.imag(R).astype(jnp.float32)


# shared SoA packing (ops/padding.py) re-exported for the callers
from exp_tpu.ops.padding import pack_xyzm  # noqa: E402,F401


# ---------------------------------------------------------------------------
# v2 kernels: MXU-shaped contraction layout.
#
# The v1 kernels spend most of their time in poorly-shaped matmuls: the
# selection-matrix outer product contracts over K = kxp (16) and the
# coefficient contraction emits N = kzp (16) — both an order below the
# 128-wide MXU, so every pass runs at ~12% utilization.  v2 removes the
# selection matmuls entirely (the (kx, ky) outer product is built by a
# broadcast-reshape on the VPU over a PADDED 16x16 row lattice) and fuses
# the four real matmuls of each complex contraction into ONE:
#   coef : [xyr; xyi] (2Cq, B) x [zr; zi] (2 kzp, B)^T -> (2Cq, 2 kzp),
#          M = 512, N = 32, K = block.
#   force: [[Rr, -Ri], [Ri, Rr]] (2Sp, 2Cq) x [xyr; xyi] -> (2Sp, B),
#          M = 96, K = 512, N = block.
# Row index of the padded lattice is a*kyp + b (holes where a >= kx or
# b >= ky carry zeros and drop out).
# ---------------------------------------------------------------------------


def _outer_bcast(ar, ai, br, bi, kxp, kyp, block):
    """Complex outer product rows xy[a*kyp + b] = ea[a] * eb[b] via
    broadcast + reshape (no matmuls; zero-padded rows stay zero)."""
    def expand(e):
        # (kxp, B) -> (kxp, kyp, B) -> (kxp*kyp, B)
        return jax.lax.broadcast_in_dim(
            e, (kxp, kyp, block), (0, 2)).reshape(kxp * kyp, block)

    def tile(e):
        return jax.lax.broadcast_in_dim(
            e, (kxp, kyp, block), (1, 2)).reshape(kxp * kyp, block)

    Ar, Ai = expand(ar), expand(ai)
    Br, Bi = tile(br), tile(bi)
    return Ar * Br - Ai * Bi, Ar * Bi + Ai * Br


def make_cube_coef_kernel_v2(nmaxx, nmaxy, nmaxz, block=1024,
                             interpret=False, precision=None):
    """fn(xyzm8 (8, N)) -> complex64 (Kx, Ky, Kz) raw phase sums."""
    prec = _PREC if precision is None else precision
    kx, ky, kz = 2 * nmaxx + 1, 2 * nmaxy + 1, 2 * nmaxz + 1
    kxp, kyp, kzp = _round_up(kx, 8), _round_up(ky, 8), _round_up(kz, 8)
    Cq = kxp * kyp

    def kernel(xs_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        xs = xs_ref[:]
        x, y, z, m = xs[0:1], xs[1:2], xs[2:3], xs[3:4]
        exr, exi = _axis_phases(x - jnp.floor(x), nmaxx, -1.0, pad_to=kxp)
        eyr, eyi = _axis_phases(y - jnp.floor(y), nmaxy, -1.0, pad_to=kyp)
        ezr, ezi = _axis_phases(z - jnp.floor(z), nmaxz, -1.0, pad_to=kzp)
        xyr, xyi = _outer_bcast(exr, exi, eyr, eyi, kxp, kyp, block)
        XY = jnp.concatenate([xyr, xyi], axis=0)          # (2Cq, B)
        Z = jnp.concatenate([ezr * m, ezi * m], axis=0)   # (2kzp, B)
        out_ref[:] += _dotT(XY, Z, prec)                  # (2Cq, 2kzp)

    def fn(xyzm8):
        n = xyzm8.shape[1]
        assert n % block == 0
        big = pl.pallas_call(
            kernel,
            grid=(n // block,),
            out_shape=jax.ShapeDtypeStruct((2 * Cq, 2 * kzp), jnp.float32),
            in_specs=[pl.BlockSpec((8, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((2 * Cq, 2 * kzp), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(xyzm8)
        # cre = xyr.zr - xyi.zi ; cim = xyr.zi + xyi.zr
        rr = big[:Cq, :kzp].reshape(kxp, kyp, kzp)
        ri = big[:Cq, kzp:].reshape(kxp, kyp, kzp)
        ir = big[Cq:, :kzp].reshape(kxp, kyp, kzp)
        ii = big[Cq:, kzp:].reshape(kxp, kyp, kzp)
        re = (rr - ii)[:kx, :ky, :kz]
        im = (ri + ir)[:kx, :ky, :kz]
        return jax.lax.complex(re, im)

    return fn


def make_cube_accel_kernel_v2(nmaxx, nmaxy, nmaxz, block=1024,
                              interpret=False, precision=None):
    """fn(xyzm8 (8, N), M2 (2 Sp, 2 Cq)) -> (8, N) rows (ax, ay, az,
    pot, 0...).  M2 = [[Rr, -Ri], [Ri, Rr]] from pack_force_matrix_v2."""
    prec = _PREC if precision is None else precision
    kx, ky, kz = 2 * nmaxx + 1, 2 * nmaxy + 1, 2 * nmaxz + 1
    kxp, kyp, kzp = _round_up(kx, 8), _round_up(ky, 8), _round_up(kz, 8)
    Cq = kxp * kyp
    Sp = 3 * kzp

    def kernel(xs_ref, m2_ref, out_ref):
        xs = xs_ref[:]
        x, y, z = xs[0:1], xs[1:2], xs[2:3]
        exr, exi = _axis_phases(x - jnp.floor(x), nmaxx, +1.0, pad_to=kxp)
        eyr, eyi = _axis_phases(y - jnp.floor(y), nmaxy, +1.0, pad_to=kyp)
        ezr, ezi = _axis_phases(z - jnp.floor(z), nmaxz, +1.0, pad_to=kzp)
        xyr, xyi = _outer_bcast(exr, exi, eyr, eyi, kxp, kyp, block)
        XY = jnp.concatenate([xyr, xyi], axis=0)          # (2Cq, B)
        P = _dotNT(m2_ref[:], XY, prec)                   # (2Sp, B)
        pr, pi = P[:Sp], P[Sp:]
        p0r, p0i = pr[0:kzp], pi[0:kzp]
        p1r, p1i = pr[kzp:2 * kzp], pi[kzp:2 * kzp]
        p2r, p2i = pr[2 * kzp:3 * kzp], pi[2 * kzp:3 * kzp]
        idx = jax.lax.broadcasted_iota(jnp.int32, (kzp, 1), 0)
        kzw = jnp.where(idx < kz,
                        2.0 * math.pi * (idx.astype(jnp.float32) - nmaxz),
                        0.0)
        pot = jnp.sum(ezr * p0r - ezi * p0i, axis=0, keepdims=True)
        az = jnp.sum(kzw * (ezr * p0i + ezi * p0r), axis=0, keepdims=True)
        ax = jnp.sum(ezr * p1i + ezi * p1r, axis=0, keepdims=True)
        ay = jnp.sum(ezr * p2i + ezi * p2r, axis=0, keepdims=True)
        zero = jnp.zeros_like(ax)
        out_ref[:] = jnp.concatenate(
            [ax, ay, az, pot, zero, zero, zero, zero], axis=0)

    def fn(xyzm8, M2):
        n = xyzm8.shape[1]
        assert n % block == 0
        return pl.pallas_call(
            kernel,
            grid=(n // block,),
            out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
            in_specs=[
                pl.BlockSpec((8, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * Sp, 2 * Cq), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(xyzm8, M2)

    return fn


def pack_force_matrix_v2(b, nmaxx, nmaxy, nmaxz):
    """b = coef * norm (Kx, Ky, Kz) complex -> M2 (2 Sp, 2 Cq) f32 with
    M2 = [[Rr, -Ri], [Ri, Rr]]; R rows are the padded-lattice transpose
    of pack_force_matrix's columns (path-padded to kzp)."""
    kx, ky, kz = 2 * nmaxx + 1, 2 * nmaxy + 1, 2 * nmaxz + 1
    kxp, kyp, kzp = (_round_up(kx, 8), _round_up(ky, 8),
                     _round_up(kz, 8))
    Cq = kxp * kyp
    Sp = 3 * kzp
    tpi = 2.0 * math.pi
    kxv = (tpi * jnp.arange(-nmaxx, nmaxx + 1,
                            dtype=jnp.float32))[:, None, None]
    kyv = (tpi * jnp.arange(-nmaxy, nmaxy + 1,
                            dtype=jnp.float32))[None, :, None]
    zpad = ((0, 0), (0, 0), (0, kzp - kz))
    Rk = jnp.concatenate([jnp.pad(b, zpad), jnp.pad(b * kxv, zpad),
                          jnp.pad(b * kyv, zpad)], axis=2)  # (kx, ky, Sp)
    Rk = jnp.pad(Rk, ((0, kxp - kx), (0, kyp - ky), (0, 0)))
    R = Rk.reshape(Cq, Sp).T                                # (Sp, Cq)
    Rr = jnp.real(R).astype(jnp.float32)
    Ri = jnp.imag(R).astype(jnp.float32)
    top = jnp.concatenate([Rr, -Ri], axis=1)
    bot = jnp.concatenate([Ri, Rr], axis=1)
    return jnp.concatenate([top, bot], axis=0)              # (2Sp, 2Cq)
