"""Relevel-cadence A/B at FLAGSHIP scale (round-5 VERDICT #6).

The boundary-only (NoSwitch-style) relevel was gated in round 4 by an
8k-particle plunging-orbit toy (scripts/ab_relevel.py); this applies the
same discipline at the scale the approximation is actually deployed: the
1M disk+halo composite through the first ~100 bigsteps of the bar
transient, where ~hundreds of thousands of particles migrate across
levels (doc/benchmarks.md).

Design: at this scale the represented-field dE/E is dominated by the
truncated-basis bookkeeping (doc/direct_energy.json), which both arms
inherit almost identically — so the energy gauge here is the TRUE energy
of a fixed subsample, recomputed by direct O(N_sub x N) summation
(scripts/direct_energy_check.py's instrument).  Three arms:

  A: dtime,   relevel every bigstep      (production configuration)
  B: dtime/2, relevel every bigstep      (halves BOTH the step and the
                                          mis-level window)
  C: dtime,   relevel every 2nd bigstep  (doubles the mis-level window
                                          at fixed step)

over the same physical time T.  If the boundary-only relevel added
error above leapfrog truncation, (i) dE_A/dE_B would collapse toward 1
(the cadence-limited error, not the step, would dominate) and (ii) C
would be measurably worse than A.  Order-2 prediction: dE_A/dE_B ~ 4,
dE_C ~ dE_A.  Level populations at the end of each arm are recorded as
the trajectory check.

Env: ABC_NHALO (786432), ABC_NDISK (262144), ABC_M (4), ABC_NBIG (100),
ABC_DTIME (2e-3), ABC_NSUB (65536), ABC_CAP_HEADROOM (4 — see
doc/benchmarks.md's operational note: transient-era level migration
with tight caps thrashes host rebucketize + 2^M-graph recompiles),
ABC_OUT (doc/ab_relevel_composite.json).  Run on the real TPU.
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import numpy as np

import jax
import jax.numpy as jnp

from bench_suite import composite_ics, sphere_tables, CACHE_DIR
from direct_energy_check import make_phi_direct, SCH

NHALO = int(os.environ.get("ABC_NHALO", 786_432))
NDISK = int(os.environ.get("ABC_NDISK", 262_144))
M = int(os.environ.get("ABC_M", 4))
NBIG = int(os.environ.get("ABC_NBIG", 100))
DTIME = float(os.environ.get("ABC_DTIME", 2e-3))
NSUB = int(os.environ.get("ABC_NSUB", 65_536))
CAP_HEADROOM = int(os.environ.get("ABC_CAP_HEADROOM", 4))
OUT = os.environ.get("ABC_OUT", os.path.join(
    os.path.dirname(_HERE), "doc", "ab_relevel_composite.json"))


def main():
    from exp_tpu.basis.empcyl import build_empcyl_tables
    from exp_tpu.forces.cylinder import CylinderForce
    from exp_tpu.forces.spherical import SphereSL
    from exp_tpu.nbody.multistep import (MultistepRunner, flatten_buckets,
                                         LevelBuckets)
    from exp_tpu.nbody.particles import ParticleSystem
    from exp_tpu.parallel import particle_mesh

    ts = sphere_tables(lmax=4, nmax=10)
    halo = SphereSL.from_tables(ts, dtype=jnp.float32, backend="pallas")
    tc = build_empcyl_tables(
        mmax=6, nmax=18, lmaxfid=32, nmaxfid=24, acyl=0.01, hcyl=0.002,
        cachename=os.path.join(CACHE_DIR, "eof_m6n18.h5"))
    disk = CylinderForce.from_tables(tc, dtype=jnp.float32,
                                     backend="pallas")
    ic = composite_ics(halo, disk, NHALO, NDISK)

    mesh = particle_mesh(1)
    forces = {"halo": halo, "disk": disk}
    couples = {"halo": ["halo", "disk"], "disk": ["halo", "disk"]}

    rng = np.random.default_rng(11)
    nsub_h = int(round(NSUB * NHALO / (NHALO + NDISK)))
    sub_ids = {
        "halo": np.sort(rng.choice(np.arange(1, NHALO + 1), nsub_h,
                                   replace=False)),
        "disk": np.sort(rng.choice(np.arange(1, NDISK + 1), NSUB - nsub_h,
                                   replace=False)),
    }

    phi_cache = {}

    def true_energy(st):
        """Fixed-subsample KE + direct-sum PE (true field; all-f32 on
        device, host f64 energy sums — direct_energy_check's
        instrument)."""
        snap = {}
        for n, bs in st.items():
            ps = flatten_buckets(LevelBuckets(list(bs), None))
            snap[n] = {k: np.asarray(getattr(ps, k))
                       for k in ("x", "v", "mass", "pot", "indx")}
        xs = np.concatenate([d["x"] for d in snap.values()])
        ms = np.concatenate([d["mass"] for d in snap.values()])
        npad = (-len(ms)) % SCH
        if npad:
            xs = np.concatenate([xs, np.full((npad, 3), 1e6, np.float32)])
            ms = np.concatenate([ms, np.zeros(npad, np.float32)])
        if len(ms) not in phi_cache:
            phi_cache[len(ms)] = make_phi_direct(len(ms))
        phi_fn = phi_cache[len(ms)]
        xs_j = jnp.asarray(xs, jnp.float32)
        ms_j = jnp.asarray(ms, jnp.float32)
        E = E_rep = 0.0
        for n, d in snap.items():
            live = d["mass"] > 0
            idx = d["indx"][live]
            order = np.argsort(idx)
            rows = order[np.searchsorted(idx[order], sub_ids[n])]
            m = d["mass"][live].astype(np.float64)[rows]
            v = d["v"][live].astype(np.float64)[rows]
            xt = d["x"][live][rows]
            phid = np.asarray(phi_fn(jnp.asarray(xt, jnp.float32),
                                     xs_j, ms_j))
            ke = float((0.5 * m * (v * v).sum(1)).sum())
            E += ke + float(0.5 * (m * phid).sum())
            E_rep += ke + float(0.5 * (m * d["pot"][live][rows]).sum())
        return E, E_rep

    def make_runner(dtime):
        return MultistepRunner(forces, couples, dtime, M, mesh,
                               dynparams={"dynfracV": 0.01,
                                          "dynfracA": 0.03},
                               cap_headroom=CAP_HEADROOM, fused=True)

    def arm(name, runner, dtime, nbig, nrelevel):
        """One arm.  Arms A and C share a runner (same dtime): the
        runner's per-capacity-signature jit caches persist across
        init_state, so C reuses A's compiled substep graphs wherever its
        capacity trajectory matches (identical ICs -> identical initial
        signature) — through the remote-compile tunnel each avoided
        2^M-graph compile saves minutes."""
        flat = {
            "halo": ParticleSystem.from_arrays(ic["xh"], ic["vh"],
                                               ic["mh"],
                                               dtype=jnp.float32),
            "disk": ParticleSystem.from_arrays(ic["xd"], ic["vd"],
                                               ic["md"],
                                               dtype=jnp.float32),
        }
        t0 = time.time()
        st, regs, coef, diag = runner.init_state(flat)
        jax.block_until_ready(st["halo"][0].x)
        E0, E0_rep = true_energy(st)
        for ib in range(1, nbig + 1):
            st, regs, coef, diag = runner.bigstep(st, regs)
            if ib % nrelevel == 0:
                st, regs = runner.relevel(st, regs)
        jax.block_until_ready(st["halo"][0].x)
        E1, E1_rep = true_energy(st)
        lc = runner.level_counts(st)
        out = {"dtime": dtime, "nbig": nbig, "nrelevel": nrelevel,
               "T": dtime * nbig, "E0": E0, "E1": E1,
               "dE_true": abs(E1 - E0) / abs(E0),
               "dE_rep": abs(E1_rep - E0_rep) / abs(E0_rep),
               "levels": lc, "wall_sec": time.time() - t0}
        print(f"{name}: dtime={dtime:g} nrelevel={nrelevel} "
              f"dE_true={out['dE_true']:.3e} dE_rep={out['dE_rep']:.3e} "
              f"levels={lc} ({out['wall_sec']:.0f}s)", flush=True)
        return out

    runner_ac = make_runner(DTIME)
    A = arm("A", runner_ac, DTIME, NBIG, 1)
    C = arm("C", runner_ac, DTIME, NBIG, 2)
    B = arm("B", make_runner(DTIME / 2), DTIME / 2, 2 * NBIG, 1)

    res = {
        "n_halo": NHALO, "n_disk": NDISK, "multistep": M, "nsub": NSUB,
        "A": A, "B": B, "C": C,
        "ratio_AB_true": A["dE_true"] / max(B["dE_true"], 1e-300),
        "ratio_CA_true": C["dE_true"] / max(A["dE_true"], 1e-300),
    }
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", OUT)
    print(f"dE_A/dE_B (true energy) = {res['ratio_AB_true']:.2f} "
          f"(order-2 prediction ~4); dE_C/dE_A = {res['ratio_CA_true']:.2f}"
          f" (cadence-insensitivity ~1)")


if __name__ == "__main__":
    main()
