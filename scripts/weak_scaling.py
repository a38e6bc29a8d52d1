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

m = hernquist_model(rmin=1e-3, rmax=20.0)
t = build_sph_sl_tables(m, lmax=4, nmax=10, numr=2000, cmap=1, rmap=1.0,
                        cachename="/tmp/weak_sph_l4n10.h5")
force = SphereSL.from_tables(t, dtype=jnp.float32)

rows = []
for ndev in (1, 2, 4, 8):
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

t1 = rows[0]["step_ms"]
for r in rows:
    r["overhead_vs_linear"] = r["step_ms"] / (r["ndev"] * t1) - 1.0
    print(f"ndev={r['ndev']}: overhead vs linear single-core scaling "
          f"{r['overhead_vs_linear']*100:+.1f}%")

out = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "doc", "weak_scaling.json")
with open(out, "w") as f:
    json.dump({"per_dev": PER_DEV, "rows": rows}, f, indent=1)
print("wrote", out)
