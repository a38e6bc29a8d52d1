"""Long-horizon stability of the 10.5M flagship composite on one chip:
level populations, the Clausius virial and |dE/E| over NBIG big steps —
the physics evidence that the equilibrium DiskHalo ICs + multistep
machinery hold at the BASELINE.md north-star scale for the reference's
own gate horizon (tests/Halo/check.py runs 500 steps).

Env knobs:
  NBIG        big steps per M (default 30)
  M           comma list of multistep depths, e.g. "2,4" (default "2");
              all depths share ONE IC upload (the 300 MB host->device
              transfer through the tunnel dominates setup)
  DIAG_EVERY  diagnostic cadence (default 10)
  CAP_HEADROOM  bucket slack factor (default 4 here: at 500 bigsteps the
              level populations drift a few percent, and every capacity-
              grid crossing recompiles all 2^M substep graphs — minutes
              each through the remote runtime.  (1 + 0.15*4) = 60% slack
              makes the signature hold for the whole horizon at ~20%
              more padded rows; the throughput numbers live in bench.py,
              not here)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

if os.environ.get("STAB_CPU", "0") == "1":
    # dt-scaling pairs run here: local XLA:CPU compiles take ~1 min
    # where every fresh bucket-capacity shape costs ~20 min through the
    # remote TPU compiler (env vars alone do not deselect the axon
    # plugin — the config update is required)
    jax.config.update("jax_platforms", "cpu")

import numpy as np

import bench_suite
from exp_tpu.nbody.particles import ParticleSystem
from exp_tpu.nbody.multistep import MultistepRunner
from exp_tpu.parallel import particle_mesh


def run_one(M, nbig, every, cap_headroom, halo, disk, flat, mesh,
            dtime=2e-3):
    runner = MultistepRunner(
        {"halo": halo, "disk": disk},
        {"halo": ["halo", "disk"], "disk": ["halo", "disk"]},
        dtime, M, mesh, dynparams={"dynfracV": 0.01, "dynfracA": 0.03},
        cap_headroom=cap_headroom, fused=True)
    st, regs, coef, diag = runner.init_state(flat)

    def diagnose(st, diag):
        """Level counts + the Clausius virial -2T/VC — all from the
        runner's device-side per-component diagnostics (KE/PE/VC are
        computed inside the jitted substeps from the coupled fields,
        OutLog.cc:24-52 analogues).  A host-side gather version of this
        diagnostic moved ~700 MB of phase space through the tunnel per
        call (~10 min each at 10.5M) for the same numbers (verified
        equal to 5 decimals at bigstep 0)."""
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
    print(json.dumps({"bigstep": 0, "M": M, "dtime": dtime,
                      "virial": round(vr0, 5),
                      "Etot": e0, "levels": c0}), flush=True)
    t0 = time.perf_counter()
    for k in range(1, nbig + 1):
        st, regs, coef, diag = runner.bigstep(st, regs)
        st, regs = runner.relevel(st, regs)
        if k % every == 0 or k == nbig:
            cts, vr = diagnose(st, diag)
            ek = etot(diag)
            print(json.dumps({"bigstep": k, "M": M, "virial": round(vr, 5),
                              "dE_over_E": (ek - e0) / abs(e0),
                              "levels": cts,
                              "sec_per_bigstep": round(
                                  (time.perf_counter() - t0) / k, 3)}),
                  flush=True)


def main():
    import jax.numpy as jnp
    from exp_tpu.basis.empcyl import build_empcyl_tables
    from exp_tpu.forces.cylinder import CylinderForce
    from exp_tpu.forces.spherical import SphereSL

    nbig = int(os.environ.get("NBIG", 30))
    Ms = [int(s) for s in str(os.environ.get("M", "2")).split(",")]
    every = int(os.environ.get("DIAG_EVERY", 10))
    cap_headroom = int(os.environ.get("CAP_HEADROOM", 4))
    n_halo = int(os.environ.get("NHALO", 8_388_608))
    n_disk = int(os.environ.get("NDISK", 2_097_152))
    ts = bench_suite.sphere_tables(lmax=4, nmax=10)
    halo = SphereSL.from_tables(ts, dtype=jnp.float32, backend="pallas")
    tc = build_empcyl_tables(
        mmax=6, nmax=18, lmaxfid=32, nmaxfid=24, acyl=0.01, hcyl=0.002,
        cachename=os.path.join(bench_suite.CACHE_DIR, "eof_m6n18.h5"))
    disk = CylinderForce.from_tables(tc, dtype=jnp.float32,
                                     backend="pallas")
    ic = bench_suite.composite_ics(halo, disk, n_halo, n_disk)
    mesh = particle_mesh(1)
    flat = {
        "halo": ParticleSystem.from_arrays(ic["xh"], ic["vh"], ic["mh"],
                                           dtype=jnp.float32),
        "disk": ParticleSystem.from_arrays(ic["xd"], ic["vd"], ic["md"],
                                           dtype=jnp.float32),
    }
    del ic
    for M in Ms:
        run_one(M, nbig, every, cap_headroom, halo, disk, flat, mesh,
                dtime=float(os.environ.get("DTIME", 2e-3)))


if __name__ == "__main__":
    main()
