"""Long-horizon stability of the 10.5M flagship composite on one chip:
level populations and the virial ratio over NBIG big steps (the physics
evidence that the equilibrium DiskHalo ICs + multistep machinery hold at
the BASELINE.md north-star scale, not just at the 1M test scale)."""

import json
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
    from exp_tpu.ic.diskhalo import virial_ratio  # noqa: F401 (host-side x-check)

    nbig = int(os.environ.get("NBIG", 30))
    M = int(os.environ.get("M", 2))
    ts = bench_suite.sphere_tables(lmax=4, nmax=10)
    halo = SphereSL.from_tables(ts, dtype=jnp.float32, backend="pallas")
    tc = build_empcyl_tables(
        mmax=6, nmax=18, lmaxfid=32, nmaxfid=24, acyl=0.01, hcyl=0.002,
        cachename=os.path.join(bench_suite.CACHE_DIR, "eof_m6n18.h5"))
    disk = CylinderForce.from_tables(tc, dtype=jnp.float32,
                                     backend="pallas")
    ic = bench_suite.composite_ics(halo, disk, 8_388_608, 2_097_152)
    mesh = particle_mesh(1)
    runner = MultistepRunner(
        {"halo": halo, "disk": disk},
        {"halo": ["halo", "disk"], "disk": ["halo", "disk"]},
        2e-3, M, mesh, dynparams={"dynfracV": 0.01, "dynfracA": 0.03},
        cap_headroom=2, fused=True)
    flat = {
        "halo": ParticleSystem.from_arrays(ic["xh"], ic["vh"], ic["mh"],
                                           dtype=jnp.float32),
        "disk": ParticleSystem.from_arrays(ic["xd"], ic["vd"], ic["md"],
                                           dtype=jnp.float32),
    }
    st, regs, coef, diag = runner.init_state(flat)

    def diagnose(st, diag):
        """Level counts + the Clausius virial -2T/VC — all from the
        runner's device-side per-component diagnostics (KE/PE/VC are
        computed inside the jitted substeps from the coupled fields,
        OutLog.cc:24-52 analogues).  The original host-side version
        gathered ~400 MB of phase space and re-uploaded it through the
        tunnel per diagnostic (~10 min each at 10.5M) for the same
        numbers."""
        counts = runner.level_counts(st)
        d = jax.device_get(diag)
        T = sum(float(d[n]["KE"]) for n in d)
        VC = sum(float(d[n]["VC"]) for n in d)
        return counts, (-2.0 * T / VC if VC else float("nan"))

    def etot(diag):
        # KE + 1/2 sum m pot summed over components: pot carries the
        # coupled field, so the halo-disk interaction energy is counted
        # once (each pair term split half-half between the components)
        d = jax.device_get(diag)
        return float(sum(float(d[n]["KE"]) + float(d[n]["PE"])
                         for n in d))

    c0, vr0 = diagnose(st, diag)
    e0 = etot(diag)
    print(json.dumps({"bigstep": 0, "M": M, "virial": round(vr0, 5),
                      "Etot": e0, "levels": c0}), flush=True)
    t0 = time.perf_counter()
    every = int(os.environ.get("DIAG_EVERY", 10))
    for k in range(1, nbig + 1):
        st, regs, coef, diag = runner.bigstep(st, regs)
        st, regs = runner.relevel(st, regs)
        if k % every == 0 or k == nbig:
            cts, vr = diagnose(st, diag)
            ek = etot(diag)
            print(json.dumps({"bigstep": k, "virial": round(vr, 5),
                              "dE_over_E": (ek - e0) / abs(e0),
                              "levels": cts,
                              "sec_per_bigstep": round(
                                  (time.perf_counter() - t0) / k, 3)}),
                  flush=True)


if __name__ == "__main__":
    main()
