"""Slab coefficient kernel: phase-STREAM variants vs v3 (VERDICT r5 #5).

v3 (ops/pallas_slab.make_slab_coef_kernel) builds the (kx, ky) phase
lattice on the VPU inside the kernel — a padded 16x16 broadcast outer
product feeding a (2*256, B) x (B, 128) matmul.  The speed-of-light
table (doc/benchmarks.md) pins its 3.10 ms at 1M as 15x the 0.2 ms MXU
bound of the COMPACT (2*81-row) contraction, and the round-4 limiter
note blamed "streaming phases from HBM, the slower XLA design" without
measuring the Pallas version of that design.  This probe measures it:

  stream1 — an XLA producer builds the compact complex phase table
            e^{-2 pi i k.xy} as ONE bf16 (2*Cr, N) array (Cr = 88 =
            round_up(81, 8) rows re + im); the Pallas kernel streams
            (2*Cr, B) blocks from HBM and runs a single DEFAULT matmul
            against the mass-weighted z-hat rows.  Same value precision
            as v3's final DEFAULT matmul (bf16 phase rounding).
  stream2 — hi/lo bf16-compensated phase pairs (4*Cr, N): two DEFAULT
            matmuls reconstruct the f32 phases to ~1e-5 (the
            _outer_select_c2 trick, applied to a streamed table).

Producer + kernel are timed TOGETHER (the table is per-step data — the
positions move every step, so the build cost is part of the pass).
Accuracy is checked against an f64 NumPy reference at small N.

Env: PROBE_N (1048576), PROBE_REPS (30), PROBE_NMAX (4 -> kx=ky=9,
C=81), PROBE_NZC (126), PROBE_INTERP (spline).
Run on the real TPU.  cudaSlabSL.cu:245 coefKernelSlab is the
reference's streamed-from-global-memory analogue.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # sitecustomize force-registers the axon TPU backend; the config
    # update (not the env var) is what actually selects cpu
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exp_tpu.ops.pallas_slab import (make_slab_coef_kernel, pack_xyzm,
                                     _round_up, _w_rows)

N = int(os.environ.get("PROBE_N", 1_048_576))
REPS = int(os.environ.get("PROBE_REPS", 30))
NMAX = int(os.environ.get("PROBE_NMAX", 4))
NZC = int(os.environ.get("PROBE_NZC", 126))
INTERP = os.environ.get("PROBE_INTERP", "spline")
ZMAX = 0.1
BLOCK = 1024

KX = KY = 2 * NMAX + 1
C = KX * KY
CR = _round_up(C, 8)
ZROWS = NZC + 2 if INTERP == "spline" else NZC
NZP = _round_up(ZROWS, 128)
DZ = 2.0 * ZMAX / (NZC - 1)


def make_phase_producer(split: bool):
    """xyzm8 (8, N) -> phase table (rows, N) bf16 with rows = 2*Cr
    (re | im) or 4*Cr (re_hi | im_hi | re_lo | im_lo)."""
    ka = (np.arange(C) // KY - NMAX).astype(np.float32)      # kx per row
    kb = (np.arange(C) % KY - NMAX).astype(np.float32)       # ky per row
    ka = np.pad(ka, (0, CR - C))
    kb = np.pad(kb, (0, CR - C))

    @jax.jit
    def produce(xyzm8):
        x = xyzm8[0] - jnp.floor(xyzm8[0])
        y = xyzm8[1] - jnp.floor(xyzm8[1])
        ang = (-2.0 * math.pi) * (jnp.asarray(ka)[:, None] * x[None, :]
                                  + jnp.asarray(kb)[:, None] * y[None, :])
        re, im = jnp.cos(ang), jnp.sin(ang)
        if not split:
            return jnp.concatenate([re, im]).astype(jnp.bfloat16)
        re_h = re.astype(jnp.bfloat16)
        im_h = im.astype(jnp.bfloat16)
        re_l = (re - re_h.astype(jnp.float32)).astype(jnp.bfloat16)
        im_l = (im - im_h.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.concatenate([re_h, im_h, re_l, im_l])

    return produce


def make_stream_kernel(split: bool, interpret=False):
    rows = (4 if split else 2) * CR

    def kernel(ph_ref, xs_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        xs = xs_ref[:]
        z, m = xs[2:3], xs[3:4]
        w = jnp.where(jnp.abs(z) <= ZMAX, m, 0.0)
        t = jnp.clip((z + ZMAX) / DZ, 0.0, NZC - 1.0)
        Wz = _w_rows(t, NZC, INTERP) * w                 # (ZROWS, B)
        Wz = jnp.pad(Wz, ((0, NZP - Wz.shape[0]), (0, 0))) \
            if Wz.shape[0] < NZP else Wz
        d = jax.lax.Precision.DEFAULT

        def dotp(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=d)

        ph = ph_ref[:]
        hi = ph[:2 * CR].astype(jnp.float32)
        if split:
            lo = ph[2 * CR:].astype(jnp.float32)
            out_ref[:] += dotp(hi, Wz) + dotp(lo, Wz)
        else:
            out_ref[:] += dotp(hi, Wz)

    def fn(ph, xyzm8):
        n = xyzm8.shape[1]
        big = pl.pallas_call(
            kernel,
            grid=(n // BLOCK,),
            out_shape=jax.ShapeDtypeStruct((2 * CR, NZP), jnp.float32),
            in_specs=[
                pl.BlockSpec((rows, BLOCK), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, BLOCK), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2 * CR, NZP), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(ph, xyzm8)
        re = big[:CR, :ZROWS][:C]
        im = big[CR:2 * CR, :ZROWS][:C]
        return jax.lax.complex(re, im)

    return fn


def ref_numpy(xyzm, n):
    """f64 reference G for the first n particles."""
    x, y, z, m = (np.asarray(xyzm[k, :n], np.float64) for k in range(4))
    w = np.where(np.abs(z) <= ZMAX, m, 0.0)
    ka = np.arange(C) // KY - NMAX
    kb = np.arange(C) % KY - NMAX
    ph = np.exp(-2j * np.pi * (ka[:, None] * (x - np.floor(x))[None, :]
                               + kb[:, None] * (y - np.floor(y))[None, :]))
    t = np.clip((z + ZMAX) / DZ, 0.0, NZC - 1.0)
    rows = np.arange(ZROWS)
    if INTERP == "spline":
        # quadratic B-spline vs ghost-extended nodes (pallas _b2/_w2)
        u = np.abs(rows[:, None] - 1.0 - t[None, :])
        Wz = np.where(u <= 0.5, 0.75 - u * u,
                      np.where(u <= 1.5, 0.5 * (1.5 - u) ** 2, 0.0))
    else:
        Wz = np.maximum(0.0, 1.0 - np.abs(rows[:, None] - t[None, :]))
    return (ph * w[None, :]) @ Wz.T


def main():
    rng = np.random.default_rng(9)
    x = rng.uniform(0, 1, N).astype(np.float32)
    y = rng.uniform(0, 1, N).astype(np.float32)
    z = (0.02 * rng.normal(size=N)).astype(np.float32)
    m = np.full(N, 1.0 / N, np.float32)
    xyzm = np.asarray(pack_xyzm(jnp.asarray(np.stack(
        [x, y, z], -1)), jnp.asarray(m)))
    xj = jnp.asarray(xyzm)

    # accuracy check at small n against f64
    nacc = 32768
    xacc = jnp.asarray(xyzm[:, :nacc])
    Gref = ref_numpy(xyzm, nacc)
    sc = np.max(np.abs(Gref))

    results = {}

    # ---- v3 baseline ----
    interp_mode = jax.default_backend() == "cpu"
    v3 = make_slab_coef_kernel(NMAX, NMAX, NZC, ZMAX, block=BLOCK,
                               interp=INTERP, interpret=interp_mode)
    # complex device_get is unimplemented over the TPU tunnel: split
    def _v3_split(a):
        g = v3(a)
        return jnp.real(g), jnp.imag(g)

    v3j = jax.jit(_v3_split)
    Gacc = (lambda t: np.asarray(t[0]) + 1j * np.asarray(t[1]))(v3j(xacc))
    err_v3 = float(np.max(np.abs(Gacc - Gref)) / sc)
    jax.block_until_ready(v3j(xj))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = v3j(xj)
    jax.block_until_ready(out)
    t_v3 = (time.perf_counter() - t0) / REPS
    results["v3_lattice"] = {"ms": t_v3 * 1e3, "max_err": err_v3}
    print(f"v3 lattice     : {t_v3*1e3:7.3f} ms  max_err={err_v3:.2e}",
          flush=True)

    # ---- streamed variants (producer + kernel timed together) ----
    for name, split in (("stream1_bf16", False), ("stream2_bf16x2", True)):
        produce = make_phase_producer(split)
        kern = make_stream_kernel(split, interpret=interp_mode)

        @jax.jit
        def pass_fn(xx):
            g = kern(produce(xx), xx)
            return jnp.real(g), jnp.imag(g)

        Gacc = (lambda t: np.asarray(t[0]) + 1j * np.asarray(t[1]))(
            pass_fn(xacc))
        err = float(np.max(np.abs(Gacc - Gref)) / sc)
        jax.block_until_ready(pass_fn(xj))
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = pass_fn(xj)
        jax.block_until_ready(out)
        sec = (time.perf_counter() - t0) / REPS
        results[name] = {"ms": sec * 1e3, "max_err": err}
        print(f"{name:15s}: {sec*1e3:7.3f} ms  max_err={err:.2e}",
              flush=True)

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "doc", "slab_phasestream.json")
    with open(out_path, "w") as f:
        json.dump({"n": N, "reps": REPS, "nmax": NMAX, "nzc": NZC,
                   "interp": INTERP, "results": results}, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
