"""Probe: multistep level-population stability of the composite run.

VERDICT r2 acceptance: per-level populations stable (within a few %)
over ~20 bigsteps and virial ratio starting within 5% of unity, with
the self-consistent diskhalo ICs (vs. the old ad-hoc epicyclic closure,
which collapsed level 1 from 6450 -> 1 within 5 bigsteps).

Runs on the CPU (optionally the virtual mesh).  Usage:
  python scripts/probe_composite_levels.py [n_halo n_disk nbig] [--old]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from exp_tpu.basis.model import hernquist_model
from exp_tpu.basis.slgrid import build_sph_sl_tables
from exp_tpu.basis.empcyl import build_empcyl_tables
from exp_tpu.forces.spherical import SphereSL
from exp_tpu.forces.cylinder import CylinderForce
from exp_tpu.nbody.particles import ParticleSystem
from exp_tpu.nbody.multistep import MultistepRunner

args = [a for a in sys.argv[1:] if not a.startswith("--")]
OLD = "--old" in sys.argv
n_halo = int(args[0]) if len(args) > 0 else 49152
n_disk = int(args[1]) if len(args) > 1 else 16384
nbig = int(args[2]) if len(args) > 2 else 20

t0 = time.time()
m = hernquist_model(rmin=1e-3, rmax=20.0)
ts = build_sph_sl_tables(m, lmax=4, nmax=10, numr=2000, cmap=1, rmap=1.0,
                         cachename="/tmp/probe_sph_l4n10.h5")
halo = SphereSL.from_tables(ts, dtype=jnp.float32)
tc = build_empcyl_tables(mmax=2, nmax=6, lmaxfid=16, nmaxfid=12,
                         acyl=0.01, hcyl=0.002, cachename="/tmp/probe_eof.h5")
disk = CylinderForce.from_tables(tc, dtype=jnp.float32)

if OLD:
    from exp_tpu.ic.disk import sample_exponential_disk, disk_velocities
    from exp_tpu.ic.eddington import sample_spherical_model
    xh, vh, mh = sample_spherical_model(m, n_halo, seed=3)
    xd, md = sample_exponential_disk(n_disk, acyl=0.01, hcyl=0.002,
                                     mass=0.05, seed=4)
    vd = disk_velocities(xd, lambda R: np.sqrt((0.05 + 1.0) * R * R
                                               / (R * R + 0.01**2) ** 1.5),
                         acyl=0.01)
else:
    from exp_tpu.ic.diskhalo import diskhalo_ics, virial_ratio
    ics = diskhalo_ics(m, n_halo=n_halo, n_disk=n_disk, Mdisk=0.05,
                       acyl=0.01, hcyl=0.002, halo_force=halo,
                       disk_force=disk, seed=3)
    xh, vh, mh = ics.x_halo, ics.v_halo, ics.m_halo
    xd, vd, md = ics.x_disk, ics.v_disk, ics.m_disk
    ch = halo.coefficients(jnp.asarray(xh, jnp.float32),
                           jnp.asarray(mh, jnp.float32))
    cd = disk.coefficients(jnp.asarray(xd, jnp.float32),
                           jnp.asarray(md, jnp.float32))
    vr = virial_ratio([(xh, vh, mh), (xd, vd, md)],
                      [(halo, ch), (disk, cd)])
    print(f"[{time.time()-t0:.0f}s] initial virial -2T/VC = {vr:.4f}")

mesh = Mesh(np.array(jax.devices()[:1]), ("p",))
forces = {"halo": halo, "disk": disk}
couples = {"halo": ["halo", "disk"], "disk": ["halo", "disk"]}
runner = MultistepRunner(forces, couples, 2e-3, 2, mesh,
                         dynparams={"dynfracV": 0.01, "dynfracA": 0.03},
                         cap_headroom=2)
flat = {"halo": ParticleSystem.from_arrays(xh, vh, mh, dtype=jnp.float32),
        "disk": ParticleSystem.from_arrays(xd, vd, md, dtype=jnp.float32)}
st, regs, coef, diag = runner.init_state(flat)
print(f"[{time.time()-t0:.0f}s] init levels:", runner.level_counts(st))

hist = []
for k in range(nbig):
    st, regs, coef, diag = runner.bigstep(st, regs)
    st, regs = runner.relevel(st, regs)
    jax.block_until_ready(st["halo"][0].x)
    counts = runner.level_counts(st)
    hist.append(counts)
    print(f"[{time.time()-t0:.0f}s] bigstep {k+1}: {counts} "
          f"caps={runner.caps}")

# stability check over the second half
half = hist[nbig // 2:]
for comp in ("halo", "disk"):
    arr = np.array([h[comp] for h in half], float)
    mean = arr.mean(axis=0)
    drift = (arr[-1] - arr[0]) / np.maximum(mean, 1.0)
    print(f"{comp}: mean={mean.round(0)} drift(last-first)/mean="
          f"{np.round(drift*100,1)}%")
