"""Probe: the 1M composite at multistep=4 — warmup compile cost, capacity
signature churn, steady-state rate.  Compares fused vs unfused bigstep
dispatch (BENCH_FUSED) so the M=4 flagship bench can pick the right mode.

Usage: [M=4] [FUSED=1] [NBIG=3] python scripts/probe_composite_m4.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import numpy as np

import bench_suite
from bench_suite import CompileMeter
from exp_tpu.nbody.particles import ParticleSystem
from exp_tpu.nbody.multistep import MultistepRunner
from exp_tpu.parallel import particle_mesh


def main():
    import jax.numpy as jnp
    from exp_tpu.basis.empcyl import build_empcyl_tables
    from exp_tpu.forces.cylinder import CylinderForce
    from exp_tpu.forces.spherical import SphereSL

    M = int(os.environ.get("M", 4))
    fused = os.environ.get("FUSED", "1") == "1"
    nbig = int(os.environ.get("NBIG", 3))
    n_halo = int(os.environ.get("NHALO", 786_432))
    n_disk = int(os.environ.get("NDISK", 262_144))

    ts = bench_suite.sphere_tables(lmax=4, nmax=10)
    halo = SphereSL.from_tables(ts, dtype=jnp.float32, backend="pallas")
    tc = build_empcyl_tables(
        mmax=6, nmax=18, lmaxfid=32, nmaxfid=24, acyl=0.01, hcyl=0.002,
        cachename=os.path.join(bench_suite.CACHE_DIR, "eof_m6n18.h5"))
    disk = CylinderForce.from_tables(tc, dtype=jnp.float32,
                                     backend="pallas")
    ic = bench_suite.composite_ics(halo, disk, n_halo, n_disk)
    mesh = particle_mesh(1)
    runner = MultistepRunner(
        {"halo": halo, "disk": disk},
        {"halo": ["halo", "disk"], "disk": ["halo", "disk"]},
        2e-3, M, mesh, dynparams={"dynfracV": 0.01, "dynfracA": 0.03},
        cap_headroom=2, fused=fused)
    flat = {
        "halo": ParticleSystem.from_arrays(ic["xh"], ic["vh"], ic["mh"],
                                           dtype=jnp.float32),
        "disk": ParticleSystem.from_arrays(ic["xd"], ic["vd"], ic["md"],
                                           dtype=jnp.float32),
    }
    t0 = time.perf_counter()
    with CompileMeter() as cm:
        st, regs, coef, diag = runner.init_state(flat)
        jax.block_until_ready(st["halo"][0].x)
    print(json.dumps({"phase": "init", "sec": round(time.perf_counter()-t0, 1),
                      "ncompiles": cm.count,
                      "compile_sec": round(cm.seconds, 1),
                      "levels": runner.level_counts(st),
                      "caps": {n: list(c) for n, c in runner.caps.items()}}),
          flush=True)

    for k in range(12):
        t0 = time.perf_counter()
        with CompileMeter() as cm:
            st, regs, coef, diag = runner.bigstep(st, regs)
            tb = time.perf_counter()
            st, regs = runner.relevel(st, regs)
            jax.block_until_ready(st["halo"][0].x)
        tr = time.perf_counter()
        print(json.dumps({
            "phase": "warm", "k": k,
            "bigstep_sec": round(tb - t0, 2),
            "relevel_sec": round(tr - tb, 2),
            "ncompiles": cm.count, "compile_sec": round(cm.seconds, 1),
            "caps": {n: list(c) for n, c in runner.caps.items()}}),
            flush=True)
        if cm.count == 0 and k >= 2:
            break

    with CompileMeter() as cm:
        t0 = time.perf_counter()
        for _ in range(nbig):
            st, regs, coef, diag = runner.bigstep(st, regs)
            st, regs = runner.relevel(st, regs)
        jax.block_until_ready(st["halo"][0].x)
        sec = (time.perf_counter() - t0) / nbig
    counts = runner.level_counts(st)
    subs = sum(c * 2 ** l for comp in counts.values()
               for l, c in enumerate(comp))
    print(json.dumps({
        "phase": "timed", "M": M, "fused": fused,
        "sec_per_bigstep": round(sec, 3),
        "substeps_per_sec": round(subs / sec),
        "levels": counts, "overrun": runner.overrun,
        "ncompiles": cm.count, "compile_sec": round(cm.seconds, 1)}),
        flush=True)


if __name__ == "__main__":
    main()
