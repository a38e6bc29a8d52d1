"""Weak-scaling evidence on the 8-device virtual CPU mesh.

Fixed particles-per-device; mesh sizes 1, 2, 4, 8 over virtual CPU
devices (the only scaling statement possible without multi-chip
hardware).  All devices share ONE physical core, so ideal weak scaling
here is step time growing linearly with the device count (total work)
— any superlinear growth is collective/psum overhead.  Reports
per-particle step time and the overhead ratio
   t(k devices) / (k * t(1 device)).
The coefficient reduction is one psum of a few kB per step
(SphericalBasis.cc:871-896's Allreduce analogue), so the expected
overhead is ~0.

Two sections:
  kdk       — single-rate sphere KDK (the round-2 artifact)
  composite — the FLAGSHIP shape: disk+halo multistep bigstep
              (sphere+cylinder, allcouples) + boundary relevel at fixed
              particles/device, with the bigstep and the relevel timed
              SEPARATELY (the relevel's 13-operand bitonic sort is the
              piece with nontrivial scaling).  WEAK_SKIP_COMPOSITE=1
              skips it.

Writes doc/weak_scaling.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from exp_tpu.basis.model import hernquist_model
from exp_tpu.basis.slgrid import build_sph_sl_tables
from exp_tpu.forces.spherical import SphereSL
from exp_tpu.ic.eddington import sample_spherical_model
from exp_tpu.nbody.particles import ParticleSystem
from exp_tpu.nbody.step import make_kdk_step, init_force_state
from exp_tpu.parallel import particle_mesh

PER_DEV = int(os.environ.get("WEAK_PER_DEV", 32768))
REPS = int(os.environ.get("WEAK_REPS", 5))
NDEVS = tuple(int(v) for v in
              os.environ.get("WEAK_NDEVS", "1,2,4,8").split(","))
SKIP_KDK = os.environ.get("WEAK_SKIP_KDK", "0") == "1"

m = hernquist_model(rmin=1e-3, rmax=20.0)
t = build_sph_sl_tables(m, lmax=4, nmax=10, numr=2000, cmap=1, rmap=1.0,
                        cachename="/tmp/weak_sph_l4n10.h5")
force = SphereSL.from_tables(t, dtype=jnp.float32)

rows = []
for ndev in (() if SKIP_KDK else NDEVS):
    n = PER_DEV * ndev
    x, v, mass = sample_spherical_model(m, n, seed=13)
    mesh = particle_mesh(ndev)
    ps = ParticleSystem.from_arrays(x, v, mass,
                                    dtype=jnp.float32).shard(mesh)
    ps, coef, _ = init_force_state(force, ps, mesh=mesh)
    step = make_kdk_step(force, 1e-3, mesh=mesh, accum_dtype=jnp.float32)
    ps2, c2, d2 = step(ps)                       # compile
    jax.block_until_ready(ps2.x)
    t0 = time.perf_counter()
    cur = ps
    for _ in range(REPS):
        cur, c2, d2 = step(cur)
        jax.block_until_ready(cur.x)             # 1-core rendezvous guard
    sec = (time.perf_counter() - t0) / REPS
    rows.append({"ndev": ndev, "n": n, "step_ms": sec * 1e3,
                 "us_per_particle": sec / n * 1e6})
    print(f"ndev={ndev} n={n} step={sec*1e3:8.1f} ms "
          f"{sec/n*1e6:6.3f} us/particle")

if rows:
    t1 = rows[0]["step_ms"]
    for r in rows:
        r["overhead_vs_linear"] = (r["step_ms"] / (r["ndev"] * t1 / rows[0]["ndev"])
                                   - 1.0)
        print(f"ndev={r['ndev']}: overhead vs linear single-core scaling "
              f"{r['overhead_vs_linear']*100:+.1f}%")

# ---------------------------------------------------------------------------
# composite flagship: multistep bigstep + relevel, fixed particles/device

comp_rows = []
if os.environ.get("WEAK_SKIP_COMPOSITE", "0") != "1":
    from exp_tpu.basis.empcyl import build_empcyl_tables
    from exp_tpu.forces.cylinder import CylinderForce
    from exp_tpu.ic.diskhalo import diskhalo_ics
    from exp_tpu.nbody.multistep import MultistepRunner

    HALO_PER_DEV = int(os.environ.get("WEAK_HALO_PER_DEV", 8192))
    DISK_PER_DEV = int(os.environ.get("WEAK_DISK_PER_DEV", 4096))
    M = int(os.environ.get("WEAK_M", 4))
    CREPS = int(os.environ.get("WEAK_COMPOSITE_REPS", 3))

    tc = build_empcyl_tables(mmax=2, nmax=6, lmaxfid=16, nmaxfid=12,
                             acyl=0.01, hcyl=0.002,
                             cachename="/tmp/weak_eof_m2n6.h5")
    # einsum backends: pallas would run in interpret mode on CPU
    halo_f = SphereSL.from_tables(t, dtype=jnp.float32)
    disk_f = CylinderForce.from_tables(tc, dtype=jnp.float32)

    for ndev in NDEVS:
        nh, nd = HALO_PER_DEV * ndev, DISK_PER_DEV * ndev
        cache = f"/tmp/weak_comp_ics_h{nh}_d{nd}.npz"
        if os.path.exists(cache):
            z = np.load(cache)
            ic = {k: z[k] for k in z.files}
        else:
            ics = diskhalo_ics(m, n_halo=nh, n_disk=nd, Mdisk=0.05,
                               acyl=0.01, hcyl=0.002, halo_force=halo_f,
                               disk_force=disk_f, seed=13)
            ic = {"xh": ics.x_halo, "vh": ics.v_halo,
                  "mh": np.maximum(ics.m_halo, 0.0),
                  "xd": ics.x_disk, "vd": ics.v_disk, "md": ics.m_disk}
            np.savez(cache, **{k: v.astype(np.float32)
                               for k, v in ic.items()})
        mesh = particle_mesh(ndev)
        forces = {"halo": halo_f, "disk": disk_f}
        couples = {"halo": ["halo", "disk"], "disk": ["halo", "disk"]}
        runner = MultistepRunner(forces, couples, 2e-3, M, mesh,
                                 dynparams={"dynfracV": 0.01,
                                            "dynfracA": 0.03},
                                 cap_headroom=2)
        flat = {"halo": ParticleSystem.from_arrays(ic["xh"], ic["vh"],
                                                   ic["mh"],
                                                   dtype=jnp.float32),
                "disk": ParticleSystem.from_arrays(ic["xd"], ic["vd"],
                                                   ic["md"],
                                                   dtype=jnp.float32)}
        st, regs, coef, diag = runner.init_state(flat)
        # warm to a stable capacity signature (compiles outside the
        # timer).  bench_suite discipline: the signature must be
        # UNCHANGED FOR 2 consecutive relevels AND an iteration must run
        # compile-free — breaking on the first unchanged signature let a
        # second cap growth recompile all 2^M substep graphs inside the
        # timed region (the round-5 ndev=2 +5661% artifact: one 17 s
        # recompile averaged into 3 timed reps)
        from bench_suite import CompileMeter
        sig = runner._caps_sig(st)
        stable, last_compiles = 0, 1
        for _ in range(10):
            if stable >= 2 and last_compiles == 0:
                break
            with CompileMeter() as wm:
                st, regs, coef, diag = runner.bigstep(st, regs)
                st, regs = runner.relevel(st, regs)
                jax.block_until_ready(st["halo"][0].x)
            last_compiles = wm.count
            s2 = runner._caps_sig(st)
            stable = stable + 1 if s2 == sig else 0
            sig = s2
        tb = tr = 0.0
        for _ in range(CREPS):
            t0 = time.perf_counter()
            st, regs, coef, diag = runner.bigstep(st, regs)
            jax.block_until_ready(st["halo"][0].x)
            t1 = time.perf_counter()
            st, regs = runner.relevel(st, regs)
            jax.block_until_ready(st["halo"][0].x)
            t2 = time.perf_counter()
            tb += t1 - t0
            tr += t2 - t1
        tb /= CREPS
        tr /= CREPS
        n = nh + nd
        comp_rows.append({"ndev": ndev, "n": n, "multistep": M,
                          "bigstep_ms": tb * 1e3, "relevel_ms": tr * 1e3,
                          "bigstep_us_per_particle": tb / n * 1e6,
                          "relevel_us_per_particle": tr / n * 1e6})
        print(f"composite ndev={ndev} n={n} bigstep={tb*1e3:8.1f} ms "
              f"relevel={tr*1e3:8.1f} ms "
              f"({tb/n*1e6:6.3f}/{tr/n*1e6:6.3f} us/particle)")

    d1 = comp_rows[0]["ndev"]
    b1, r1 = comp_rows[0]["bigstep_ms"], comp_rows[0]["relevel_ms"]
    for r in comp_rows:
        r["bigstep_overhead_vs_linear"] = (r["bigstep_ms"]
                                           / (r["ndev"] * b1 / d1) - 1.0)
        r["relevel_overhead_vs_linear"] = (r["relevel_ms"]
                                           / (r["ndev"] * r1 / d1) - 1.0)
        print(f"composite ndev={r['ndev']}: bigstep overhead "
              f"{r['bigstep_overhead_vs_linear']*100:+.1f}%  relevel "
              f"{r['relevel_overhead_vs_linear']*100:+.1f}%")

out = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "doc", "weak_scaling.json")
# partial runs (WEAK_NDEVS / skip flags) merge into the existing file by
# ndev instead of clobbering the other rows
old = {}
if os.path.exists(out):
    with open(out) as f:
        old = json.load(f)

def _merge(key, new_rows):
    kept = [r for r in old.get(key, []) if isinstance(r, dict)
            and r.get("ndev") not in {x["ndev"] for x in new_rows}]
    return sorted(kept + new_rows, key=lambda r: r["ndev"])

with open(out, "w") as f:
    json.dump({"per_dev": PER_DEV,
               "rows": _merge("rows", rows),
               "composite": _merge("composite", comp_rows)}, f, indent=1)
print("wrote", out)
