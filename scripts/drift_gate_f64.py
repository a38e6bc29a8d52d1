"""BASELINE drift gate at its full horizon: f64, 1000 steps, with a
chaos control.

Four coefficient trajectories from IDENTICAL Hernquist ICs:
  A. production jitted KDK path with deriv='lerp' — the reference's own
     hat-difference radial derivative (SLGridMP2.cc:767-1100)
  A'. the same with the production default deriv='stencil3' (3-point
     stencil; smoother, but a different scheme from the reference)
  B. the independent NumPy f64 comparator (validate.ReferenceSphereStep,
     transcribed from SphericalBasis.cc:429-599/1476-1700 + step.cc)
  C. the SAME comparator with the particle array randomly permuted —
     identical math, different floating-point summation order (the
     perturbation a reference-EXP run acquires when the MPI rank count
     changes).

Findings this script records (doc/drift_gate_f64.json):
  * |A-B| holds ~1e-15 over the full 1000 steps — the production path
    IS the reference equations (beats the <1e-6 BASELINE gate by nine
    orders);
  * |C-B| stays at 1e-15..1e-13: f64 summation-order noise has not yet
    been chaotically amplified on this horizon;
  * |A'-B| grows to ~1e-4: the round-2 'chaotic saturation' explanation
    was wrong — the f32-era drift was the stencil3-vs-hat DERIVATIVE
    SCHEME difference accumulating coherently, not chaos.  stencil3
    remains the production default (smoother forces); lerp is the
    bit-parity mode.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from exp_tpu.basis.model import hernquist_model
from exp_tpu.basis.slgrid import build_sph_sl_tables
from exp_tpu.forces.spherical import SphereSL
from exp_tpu.ic.eddington import sample_spherical_model
from exp_tpu.validate import ReferenceSphereStep

N = int(os.environ.get("DRIFT_N", 2000))
NSTEPS = int(os.environ.get("DRIFT_STEPS", 1000))
DT = float(os.environ.get("DRIFT_DT", 0.005))
EVERY = 50

t0 = time.time()
m = hernquist_model(rmin=1e-4, rmax=20.0)
t = build_sph_sl_tables(m, lmax=2, nmax=8, numr=1000, cmap=1, rmap=1.0)
x, v, mass = sample_spherical_model(m, N, seed=21)
ref = ReferenceSphereStep(t)

# B: comparator
traj_ref, _ = ref.run(x, v, mass, DT, NSTEPS, record_every=EVERY)
print(f"[{time.time()-t0:.0f}s] comparator done")

# C: comparator, permuted summation order (identical physics)
perm = np.random.default_rng(5).permutation(N)
traj_prm, _ = ref.run(x[perm], v[perm], mass[perm], DT, NSTEPS,
                      record_every=EVERY)
print(f"[{time.time()-t0:.0f}s] permuted comparator done")

# A / A': production path, lerp (reference scheme) and stencil3
from exp_tpu.nbody.particles import ParticleSystem
from exp_tpu.nbody.step import make_kdk_step, init_force_state

recorded = {}
for mode in ("lerp", "stencil3"):
    force = SphereSL.from_tables(t, dtype=jnp.float64, backend="gather",
                                 deriv=mode)
    ps = ParticleSystem.from_arrays(x, v, mass, dtype=jnp.float64)
    ps, coef, _ = init_force_state(force, ps, accum_dtype=jnp.float64)
    step = jax.jit(make_kdk_step(force, DT, accum_dtype=jnp.float64))
    rec = {}
    for k in range(1, NSTEPS + 1):
        ps, coef, _ = step(ps)
        if k % EVERY == 0:
            rec[k] = np.asarray(coef)
    recorded[mode] = rec
    print(f"[{time.time()-t0:.0f}s] production ({mode}) done")

scale = max(np.abs(c).max() for _, c in traj_ref)
rows = []
trp = dict(traj_prm)
for k, c_ref in traj_ref:
    dA = float(np.abs(recorded["lerp"][k] - c_ref).max() / scale)
    dS = float(np.abs(recorded["stencil3"][k] - c_ref).max() / scale)
    dC = float(np.abs(trp[k] - c_ref).max() / scale)
    rows.append({"step": int(k), "lerp_vs_ref": dA,
                 "stencil3_vs_ref": dS, "shuffled_vs_ref": dC})

print(f"{'step':>6} {'lerp-vs-ref':>14} {'stencil3-vs-ref':>16} "
      f"{'shuffled-vs-ref':>16}")
for r in rows:
    print(f"{r['step']:>6} {r['lerp_vs_ref']:>14.3e} "
          f"{r['stencil3_vs_ref']:>16.3e} {r['shuffled_vs_ref']:>16.3e}")
assert rows[-1]["lerp_vs_ref"] < 1e-6, "BASELINE 1000-step gate failed"

out = {"n": N, "nsteps": NSTEPS, "dt": DT, "rows": rows}
path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "doc", "drift_gate_f64.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print("wrote", path)
