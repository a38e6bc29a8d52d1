"""Split the composite bigstep cost into substep-chain vs relevel on the
real TPU (timing discipline: evolving-state loops, block_until_ready;
see doc/benchmarks.md methodology)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import numpy as np

import bench_suite
from exp_tpu.nbody.particles import ParticleSystem
from exp_tpu.nbody.multistep import MultistepRunner
from exp_tpu.parallel import particle_mesh


def main():
    import jax.numpy as jnp
    from exp_tpu.basis.empcyl import build_empcyl_tables
    from exp_tpu.forces.cylinder import CylinderForce
    from exp_tpu.forces.spherical import SphereSL

    n_halo = int(os.environ.get("NH", 8_388_608))
    n_disk = int(os.environ.get("ND", 2_097_152))
    nbig = int(os.environ.get("NBIG", 4))

    ts = bench_suite.sphere_tables(lmax=4, nmax=10)
    halo = SphereSL.from_tables(ts, dtype=jnp.float32, backend="pallas")
    tc = build_empcyl_tables(
        mmax=6, nmax=18, lmaxfid=32, nmaxfid=24, acyl=0.01, hcyl=0.002,
        cachename=os.path.join(bench_suite.CACHE_DIR, "eof_m6n18.h5"))
    disk = CylinderForce.from_tables(tc, dtype=jnp.float32,
                                     backend="pallas")
    ic = bench_suite.composite_ics(halo, disk, n_halo, n_disk)
    mesh = particle_mesh(1)
    forces = {"halo": halo, "disk": disk}
    couples = {"halo": ["halo", "disk"], "disk": ["halo", "disk"]}
    runner = MultistepRunner(forces, couples, 2e-3, 2, mesh,
                             dynparams={"dynfracV": 0.01,
                                        "dynfracA": 0.03},
                             cap_headroom=2, fused=True,
                             rebucket_style=os.environ.get(
                                 "REBUCKET", "sortfull"))
    flat = {
        "halo": ParticleSystem.from_arrays(ic["xh"], ic["vh"], ic["mh"],
                                           dtype=jnp.float32),
        "disk": ParticleSystem.from_arrays(ic["xd"], ic["vd"], ic["md"],
                                           dtype=jnp.float32),
    }
    t0 = time.perf_counter()
    st, regs, coef, diag = runner.init_state(flat)
    jax.block_until_ready(st["halo"][0].x)
    print(f"init_state: {time.perf_counter() - t0:.1f} s", flush=True)
    # steady-state warmup like bench_composite
    sig = runner._caps_sig(st)
    for it in range(6):
        t0 = time.perf_counter()
        st, regs, coef, diag = runner.bigstep(st, regs)
        st, regs = runner.relevel(st, regs)
        jax.block_until_ready(st["halo"][0].x)
        s2 = runner._caps_sig(st)
        print(f"warmup {it}: {time.perf_counter() - t0:.1f} s "
              f"caps={s2}", flush=True)
        if s2 == sig:
            break
        sig = s2
    print("warm", flush=True)

    # A: bigstep only
    t0 = time.perf_counter()
    for _ in range(nbig):
        st, regs, coef, diag = runner.bigstep(st, regs)
    jax.block_until_ready(st["halo"][0].x)
    tA = (time.perf_counter() - t0) / nbig
    print(f"bigstep only: {tA * 1e3:.1f} ms", flush=True)

    # B: bigstep + relevel (per-iteration timings expose fallbacks)
    t0 = time.perf_counter()
    for it in range(nbig):
        ti = time.perf_counter()
        st, regs, coef, diag = runner.bigstep(st, regs)
        tm = time.perf_counter()
        st, regs = runner.relevel(st, regs)
        jax.block_until_ready(st["halo"][0].x)
        print(f"  iter {it}: bigstep {(tm - ti) * 1e3:.1f} ms, "
              f"relevel {(time.perf_counter() - tm) * 1e3:.1f} ms, "
              f"compactions={getattr(runner, 'n_compactions', 0)}",
              flush=True)
    tB = (time.perf_counter() - t0) / nbig
    print(f"bigstep+relevel: {tB * 1e3:.1f} ms "
          f"(relevel ~ {(tB - tA) * 1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
