"""Direct-sum energy check behind the composite 4e-2 dE/E claim (round-5
VERDICT #3).

The 500-bigstep stability artifact (scripts/composite10m_stability.py,
doc/benchmarks.md) attributes the transient-era dE/E ~ 4e-2 of the
disk+halo composite to TRUNCATED-BASIS ENERGY BOOKKEEPING: the OUTLOG PE
is 1/2 sum m_i phi_rep(x_i) with phi_rep the (lmax, nmax)-truncated BFE
field, so energy exchanged with unrepresented harmonics during the bar
transient shows up as apparent drift even when the true dynamics
conserves energy.  This script measures that claim directly (the
reference's own gate discipline, tests/Halo/check.py, never probes this
regime):

  * run the 1M composite (same forces/ICs/multistep depth as
    bench_suite.bench_composite) through the bar transient T = 0..1;
  * at NSNAP evenly spaced bigstep boundaries, recompute the potential
    of a FIXED random subsample (by persistent particle id) by DIRECT
    O(N_sub x N) summation over ALL live sources (unsoftened Newtonian
    pair sum — the true field; all-f32 on device with host f64 energy
    sums, see make_phi_direct for the ~1e-7 noise floor);
  * compare three energy curves:
      E_rep   — KE + 1/2 sum m phi_rep over ALL particles (the OUTLOG
                bookkeeping that shows the 4e-2);
      E_sub_rep — same bookkeeping restricted to the subsample;
      E_sub_dir — subsample KE + 1/2 m phi_direct (the true energy,
                same particles, so sampling error cancels in the drift
                comparison against E_sub_rep);
    plus the Monte-Carlo total estimate E_dir_est = KE_total +
    (M_tot/M_sub) * 1/2 sum_sub m phi_direct.

If |dE_sub_dir/E| stays well below |dE_sub_rep/E| ~ |dE_rep/E|, the
bookkeeping story is PROVEN: the integrator conserves the true energy
and the drift lives in the truncated representation.  If E_sub_dir
drifts comparably, the 4e-2 is real physics error.

Env knobs: DEC_NHALO (786432), DEC_NDISK (262144), DEC_M (4),
DEC_NBIG (500), DEC_NSNAP (6), DEC_NSUB (65536), DEC_CAP_HEADROOM (4:
the bar transient migrates ~500k particles across levels, and every
bucket-capacity overflow pays a host rebucketize + recompile of all
2^M substep graphs through the remote-compile tunnel — the
doc/benchmarks.md operational note; headroom 2 measured ~15 s/bigstep
from that thrash vs ~0.1 s at 4), DEC_OUT (doc/direct_energy.json).

Run on the real TPU (the pair sum is 6.5e11 flops per snapshot).
Reference match: forces/direct.py ring (the same pair kernel used as a
force); Paper/paper/paper.md:64-65 (the method's conservation claim).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bench_suite import composite_ics, sphere_tables, CACHE_DIR

NHALO = int(os.environ.get("DEC_NHALO", 786_432))
NDISK = int(os.environ.get("DEC_NDISK", 262_144))
M = int(os.environ.get("DEC_M", 4))
NBIG = int(os.environ.get("DEC_NBIG", 500))
NSNAP = int(os.environ.get("DEC_NSNAP", 6))
NSUB = int(os.environ.get("DEC_NSUB", 65_536))
DTIME = float(os.environ.get("DEC_DTIME", 2e-3))
CAP_HEADROOM = int(os.environ.get("DEC_CAP_HEADROOM", 4))
OUT = os.environ.get("DEC_OUT", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "doc", "direct_energy.json"))

TCH = 2048      # target chunk rows per pair-kernel step
SCH = 65_536    # source chunk columns


def make_phi_direct(n_src):
    """phi(x_t) = -sum_j m_j / |x_t - x_j| over all sources, unsoftened,
    self-pair masked by r^2 > 0.  All-f32 on device (x64 stays off so
    the production stepping path keeps its exact bench dtypes): XLA's
    pairwise reduction over the 65536-source chunks keeps the
    per-target phi error ~1e-6 relative, random across targets, so the
    65536-target energy sums (done in np.float64 on host) carry a
    ~1e-7 relative noise floor — three orders below the 1e-3-vs-4e-2
    discrimination this instrument is for."""
    nchunks = n_src // SCH
    assert nchunks * SCH == n_src

    @jax.jit
    def phi_direct(xt, xs, ms):
        xs_c = xs.reshape(nchunks, SCH, 3)
        ms_c = ms.reshape(nchunks, SCH)

        def tgt_chunk(xtc):
            def src_chunk(acc, sm):
                xsc, msc = sm
                d = xtc[:, None, :] - xsc[None, :, :]
                r2 = (d * d).sum(-1)
                inv = jnp.where(r2 > 0.0, jax.lax.rsqrt(
                    jnp.maximum(r2, 1e-30)), 0.0)
                p = -(inv * msc[None, :]).sum(-1)
                return acc + p, None

            acc0 = jnp.zeros(xtc.shape[0], jnp.float32)
            acc, _ = jax.lax.scan(src_chunk, acc0, (xs_c, ms_c))
            return acc

        return jax.lax.map(tgt_chunk, xt.reshape(-1, TCH, 3)).reshape(-1)

    return phi_direct


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
    runner = MultistepRunner(forces, couples, DTIME, M, mesh,
                             dynparams={"dynfracV": 0.01,
                                        "dynfracA": 0.03},
                             cap_headroom=CAP_HEADROOM, fused=True)
    flat = {
        "halo": ParticleSystem.from_arrays(ic["xh"], ic["vh"], ic["mh"],
                                           dtype=jnp.float32),
        "disk": ParticleSystem.from_arrays(ic["xd"], ic["vd"], ic["md"],
                                           dtype=jnp.float32),
    }
    # fixed subsample by persistent particle id, split across components
    # in proportion to their counts
    rng = np.random.default_rng(11)
    nsub_h = int(round(NSUB * NHALO / (NHALO + NDISK)))
    nsub_d = NSUB - nsub_h
    sub_ids = {
        "halo": np.sort(rng.choice(np.asarray(flat["halo"].indx),
                                   nsub_h, replace=False)),
        "disk": np.sort(rng.choice(np.asarray(flat["disk"].indx),
                                   nsub_d, replace=False)),
    }

    st, regs, coef, diag = runner.init_state(flat)
    jax.block_until_ready(st["halo"][0].x)

    def snapshot():
        """Host phase space per component at the current bigstep
        boundary (synchronized: the closing kick ran on every level)."""
        out = {}
        for n, bs in st.items():
            ps = flatten_buckets(LevelBuckets(list(bs), None))
            out[n] = {k: np.asarray(getattr(ps, k))
                      for k in ("x", "v", "mass", "pot", "indx")}
        return out

    def energies(snap, phi_fn, xs_all, ms_all):
        KE = PE_rep = Mtot = 0.0
        sub_ke = sub_pe_rep = sub_pe_dir = sub_m = 0.0
        for n, d in snap.items():
            live = d["mass"] > 0
            m = d["mass"][live].astype(np.float64)
            v = d["v"][live].astype(np.float64)
            KE += float((0.5 * m * (v * v).sum(1)).sum())
            PE_rep += float(0.5 * (m * d["pot"][live]).sum())
            Mtot += float(m.sum())
            # subsample rows by persistent id (stable under rebucketing)
            idx = d["indx"][live]
            order = np.argsort(idx)
            rows = order[np.searchsorted(idx[order], sub_ids[n])]
            xs = d["x"][live][rows]
            ms = m[rows]
            vs = v[rows]
            phid = np.asarray(phi_fn(jnp.asarray(xs, jnp.float32),
                                     xs_all, ms_all))
            sub_ke += float((0.5 * ms * (vs * vs).sum(1)).sum())
            sub_pe_rep += float(0.5 * (ms * d["pot"][live][rows]).sum())
            sub_pe_dir += float(0.5 * (ms * phid).sum())
            sub_m += float(ms.sum())
        return {"KE": KE, "PE_rep": PE_rep, "Mtot": Mtot,
                "E_rep": KE + PE_rep,
                "E_sub_rep": sub_ke + sub_pe_rep,
                "E_sub_dir": sub_ke + sub_pe_dir,
                "E_dir_est": KE + (Mtot / sub_m) * sub_pe_dir,
                "sub_m": sub_m}

    def sources(snap):
        xs = np.concatenate([d["x"] for d in snap.values()])
        ms = np.concatenate([d["mass"] for d in snap.values()])
        # keep padding rows (mass 0 contributes 0) but pad the total to
        # the source-chunk quantum
        npad = (-len(ms)) % SCH
        if npad:
            xs = np.concatenate([xs, np.full((npad, 3), 1e6, np.float32)])
            ms = np.concatenate([ms, np.zeros(npad, np.float32)])
        return (jnp.asarray(xs, jnp.float32), jnp.asarray(ms, jnp.float32),
                len(ms))

    snap = snapshot()
    xs_all, ms_all, n_src = sources(snap)
    phi_fn = make_phi_direct(n_src)
    rows = []
    t0 = time.time()
    e = energies(snap, phi_fn, xs_all, ms_all)
    e["t"] = 0.0
    rows.append(e)
    print(f"t=0.000  E_rep={e['E_rep']:.6e}  E_sub_dir={e['E_sub_dir']:.6e}"
          f"  ({time.time()-t0:.0f}s)", flush=True)

    every = max(1, NBIG // NSNAP)
    for ib in range(1, NBIG + 1):
        st, regs, coef, diag = runner.bigstep(st, regs)
        st, regs = runner.relevel(st, regs)
        if ib % every == 0 or ib == NBIG:
            jax.block_until_ready(st["halo"][0].x)
            snap = snapshot()
            xs_all, ms_all, n2 = sources(snap)
            if n2 != n_src:
                phi_fn = make_phi_direct(n2)
                n_src = n2
            e = energies(snap, phi_fn, xs_all, ms_all)
            e["t"] = ib * DTIME
            rows.append(e)
            E0 = rows[0]
            print(f"t={e['t']:.3f}  dE_rep/E={abs(e['E_rep']-E0['E_rep'])/abs(E0['E_rep']):.3e}"
                  f"  dE_sub_rep/E={abs(e['E_sub_rep']-E0['E_sub_rep'])/abs(E0['E_sub_rep']):.3e}"
                  f"  dE_sub_dir/E={abs(e['E_sub_dir']-E0['E_sub_dir'])/abs(E0['E_sub_dir']):.3e}"
                  f"  wall={time.time()-t0:.0f}s", flush=True)

    E0 = rows[0]
    summary = {
        "n_halo": NHALO, "n_disk": NDISK, "multistep": M, "dtime": DTIME,
        "nbig": NBIG, "nsub": NSUB,
        "max_dE_rep": max(abs(r["E_rep"] - E0["E_rep"])
                          / abs(E0["E_rep"]) for r in rows),
        "max_dE_sub_rep": max(abs(r["E_sub_rep"] - E0["E_sub_rep"])
                              / abs(E0["E_sub_rep"]) for r in rows),
        "max_dE_sub_dir": max(abs(r["E_sub_dir"] - E0["E_sub_dir"])
                              / abs(E0["E_sub_dir"]) for r in rows),
        "max_dE_dir_est": max(abs(r["E_dir_est"] - E0["E_dir_est"])
                              / abs(E0["E_dir_est"]) for r in rows),
        "rows": rows,
    }
    with open(OUT, "w") as f:
        json.dump(summary, f, indent=1)
    print("wrote", OUT)
    print(f"VERDICT: represented-field drift {summary['max_dE_sub_rep']:.3e}"
          f" vs direct-sum (true) drift {summary['max_dE_sub_dir']:.3e}"
          f" on the same fixed subsample")


if __name__ == "__main__":
    main()
