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
    `pad_to` rows (single-row concatenation only — multi-row non-aligned
    concats are pathological in Mosaic)."""
    ang = sign * 2.0 * math.pi * u
    c1 = jnp.cos(ang)
    s1 = jnp.sin(ang)
    pos_re = [jnp.ones_like(u)]
    pos_im = [jnp.zeros_like(u)]
    for _ in range(nmax):
        pos_re.append(pos_re[-1] * c1 - pos_im[-1] * s1)
        pos_im.append(pos_im[-1] * c1 + pos_re[-2] * s1)
    rows_re = [pos_re[k] for k in range(nmax, 0, -1)] + pos_re
    rows_im = [-pos_im[k] for k in range(nmax, 0, -1)] + pos_im
    npad = 0 if pad_to is None else pad_to - len(rows_re)
    zero = jnp.zeros_like(u)
    rows_re += [zero] * npad
    rows_im += [zero] * npad
    return jnp.concatenate(rows_re, axis=0), jnp.concatenate(rows_im, axis=0)


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
    S = 3 * kz
    Sp = _round_up(S, 8)
    kzv = (2.0 * math.pi * np.arange(-nmaxz, nmaxz + 1)).astype(np.float32)
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
        # P = R^T exy: (Sp, B) complex
        pr = _dotTT(rr_ref[:], xyr, prec) - _dotTT(ri_ref[:], xyi, prec)
        pi = _dotTT(rr_ref[:], xyi, prec) + _dotTT(ri_ref[:], xyr, prec)

        pot = jnp.zeros_like(x)
        ax = jnp.zeros_like(x)
        ay = jnp.zeros_like(x)
        az = jnp.zeros_like(x)
        for c in range(kz):
            er, ei = ezr[c:c + 1], ezi[c:c + 1]
            # path 0: pot = Re(ez P0), az = Im(2 pi kz ez P0)
            r0, i0 = pr[c:c + 1], pi[c:c + 1]
            pot += er * r0 - ei * i0
            az += kzv[c] * (er * i0 + ei * r0)
            # path 1: ax = Im(ez P1); path 2: ay = Im(ez P2)
            r1, i1 = pr[kz + c:kz + c + 1], pi[kz + c:kz + c + 1]
            ax += er * i1 + ei * r1
            r2, i2 = pr[2 * kz + c:2 * kz + c + 1], pi[2 * kz + c:2 * kz + c + 1]
            ay += er * i2 + ei * r2
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
    columns [b | 2 pi kx b | 2 pi ky b] flattened over (kx, ky) rows."""
    kx, ky, kz = 2 * nmaxx + 1, 2 * nmaxy + 1, 2 * nmaxz + 1
    C = kx * ky
    Cp = _round_up(C, 8)
    Sp = _round_up(3 * kz, 8)
    tpi = 2.0 * math.pi
    kxv = (tpi * jnp.arange(-nmaxx, nmaxx + 1,
                            dtype=jnp.float32))[:, None, None]
    kyv = (tpi * jnp.arange(-nmaxy, nmaxy + 1,
                            dtype=jnp.float32))[None, :, None]
    R = jnp.concatenate([b, b * kxv, b * kyv], axis=2).reshape(C, 3 * kz)
    R = jnp.pad(R, ((0, Cp - C), (0, Sp - 3 * kz)))
    return jnp.real(R).astype(jnp.float32), jnp.imag(R).astype(jnp.float32)


# shared SoA packing (ops/padding.py) re-exported for the callers
from exp_tpu.ops.padding import pack_xyzm  # noqa: E402,F401
