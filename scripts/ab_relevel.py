"""A/B artifact: bigstep-boundary-only releveling at multistep=4.

The reference adjusts particle timestep levels EVERY substep
(src/step.cc:223 -> multistep.cc:344, with incremental +- coefficient
patches, SphericalBasis.cc:1013-1228); exp_tpu relevels at bigstep
boundaries only (the reference's opt-in NoSwitch discipline,
multistep.cc:146-155) because the TPU-native rebucketing is a global
sort.  A plunging particle can therefore spend up to one bigstep
mis-leveled.  This script quantifies that approximation at M=4 on a
deliberately nasty population — an equilibrium Hernquist sample whose
inner fifth is put on near-radial plunging orbits — by comparing

  A: multistep M=4, dtime,        relevel every bigstep
  B: multistep M=4, dtime/2,      relevel every (halved) bigstep
  C: single-rate KDK at dtime/2^6 (ground truth; 4x finer than A's
     finest level)

over the same wall of physical time.  If the boundary-only relevel
error were above the leapfrog truncation order, halving dtime (which
ALSO halves the relevel interval) would fail to reduce A's error by
the leapfrog factor ~4.  The measured ratio err(A)/err(B) ~ 4 and the
energy drifts are the artifact recorded in doc/benchmarks.md.

Runs on the CPU in f64 (the drift floor matters more than speed).
Env: AB_N (default 8192), AB_NBIG (default 16), AB_DT (default 2e-3).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=1")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
from dataclasses import replace

from exp_tpu.basis.model import hernquist_model
from exp_tpu.basis.slgrid import build_sph_sl_tables
from exp_tpu.forces.spherical import SphereSL
from exp_tpu.ic.eddington import sample_spherical_model
from exp_tpu.nbody.particles import ParticleSystem
from exp_tpu.nbody.step import make_kdk_step, init_force_state, energies
from exp_tpu.nbody.multistep import MultistepRunner, flatten_buckets, \
    LevelBuckets
from exp_tpu.parallel import particle_mesh

N = int(os.environ.get("AB_N", 8192))
NBIG = int(os.environ.get("AB_NBIG", 16))
DT = float(os.environ.get("AB_DT", 2e-3))
M = 4

m = hernquist_model(rmin=1e-3, rmax=20.0)
t = build_sph_sl_tables(m, lmax=4, nmax=10, numr=1500, cmap=1, rmap=1.0,
                        cachename="/tmp/ab_sph_l4n10.h5")
force = SphereSL.from_tables(t, dtype=jnp.float64)
mesh = particle_mesh(1)

x, v, mass = sample_spherical_model(m, N, seed=21)
# plunging tail: the innermost fifth keeps only 15% of its tangential
# velocity -> near-radial orbits that sweep through many timestep levels
r = np.linalg.norm(x, axis=1)
inner = np.argsort(r)[: N // 5]
rhat = x[inner] / r[inner, None]
vr = np.sum(v[inner] * rhat, axis=1, keepdims=True) * rhat
v = np.array(v)
v[inner] = vr + 0.15 * (v[inner] - vr)


def ms_run(dtime, nbig):
    runner = MultistepRunner({"h": force}, {"h": ["h"]}, dtime, M, mesh,
                             accum_dtype=jnp.float64,
                             dynparams={"dynfracV": 0.01,
                                        "dynfracA": 0.03})
    flat = {"h": ParticleSystem.from_arrays(x, v, mass, dtype=jnp.float64)}
    st, regs, coef, diag = runner.init_state(flat)
    e0 = energies(diag["h"])["Etot"]
    for _ in range(nbig):
        st, regs, coef, diag = runner.bigstep(st, regs)
        st, regs = runner.relevel(st, regs)
    eT = energies(diag["h"])["Etot"]
    ps = flatten_buckets(LevelBuckets(list(st["h"]),
                                      runner.caps["h"]))
    # de-permute by identity
    live = np.asarray(ps.mass) > 0
    idx = np.asarray(ps.indx)[live]
    xs = np.asarray(ps.x)[live]
    order = np.argsort(idx)
    return xs[order], abs((eT - e0) / e0), runner.level_counts(st)


def flat_run(dt_fine, nsteps):
    ps = ParticleSystem.from_arrays(x, v, mass, dtype=jnp.float64)
    ps = ps.shard(mesh)
    ps, coef, diag = init_force_state(force, ps, mesh=mesh,
                                      accum_dtype=jnp.float64)
    e0 = energies(diag)["Etot"]
    step = make_kdk_step(force, dt_fine, mesh=mesh,
                         accum_dtype=jnp.float64)
    for _ in range(nsteps):
        ps, coef, diag = step(ps)
        jax.block_until_ready(ps.x)
    eT = energies(diag)["Etot"]
    live = np.asarray(ps.mass) > 0
    idx = np.asarray(ps.indx)[live]
    xs = np.asarray(ps.x)[live]
    order = np.argsort(idx)
    return xs[order], abs((eT - e0) / e0)


T = NBIG * DT
print(f"N={N} M={M} dtime={DT} horizon T={T}", flush=True)

t0 = time.time()
xC, deC = flat_run(DT / 64, NBIG * 64)         # ground truth: 4x finer
print(f"C (ground truth dt/64): |dE/E|={deC:.3e}  "
      f"[{time.time()-t0:.0f}s]", flush=True)

t0 = time.time()
xA, deA, lcA = ms_run(DT, NBIG)
print(f"A (M=4, dtime):   |dE/E|={deA:.3e}  levels={lcA['h']}  "
      f"[{time.time()-t0:.0f}s]", flush=True)

t0 = time.time()
xB, deB, lcB = ms_run(DT / 2, NBIG * 2)
print(f"B (M=4, dtime/2): |dE/E|={deB:.3e}  levels={lcB['h']}  "
      f"[{time.time()-t0:.0f}s]", flush=True)

scale = np.median(np.linalg.norm(xC, axis=1))
errA = np.sqrt(np.mean(np.sum((xA - xC) ** 2, -1))) / scale
errB = np.sqrt(np.mean(np.sum((xB - xC) ** 2, -1))) / scale
ratio = errA / max(errB, 1e-300)
print(f"RMS position error vs ground truth: A={errA:.3e} B={errB:.3e} "
      f"ratio={ratio:.2f} (leapfrog order-2 predicts ~4)", flush=True)
print(f"energy-drift ratio dE_A/dE_B = {deA / max(deB, 1e-300):.2f}",
      flush=True)

out = {"N": N, "M": M, "dtime": DT, "nbig": NBIG,
       "dE_A": deA, "dE_B": deB, "dE_truth": deC,
       "rms_err_A": float(errA), "rms_err_B": float(errB),
       "err_ratio_A_over_B": float(ratio),
       "levels_A": lcA["h"], "levels_B": lcB["h"]}
path = os.environ.get("AB_OUT") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "doc", "ab_relevel.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print("wrote", path)
