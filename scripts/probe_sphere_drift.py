"""1000-step energy drift of the sphere pallas kernel variants.

The physics gate for changing numr_cs / pallas_precision defaults:
drift per 1000 KDK steps of an equilibrium Hernquist sample must match
the fine-grid XLA ('matmul') reference.  Usage:
    python scripts/probe_sphere_drift.py [N] [nsteps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def run(force, x, v, mass, dt, nsteps):
    from exp_tpu.nbody.particles import ParticleSystem
    from exp_tpu.nbody.step import make_kdk_step, init_force_state, energies

    n = x.shape[0]
    ps = ParticleSystem.from_arrays(x, v, mass)
    ps, coef, diag = init_force_state(force, ps)
    e0 = energies(diag)["Etot"]
    step = make_kdk_step(force, dt)
    t0 = time.perf_counter()
    for i in range(nsteps):
        ps, coef, diag = step(ps)
        jax.block_until_ready(ps.x)
    wall = time.perf_counter() - t0
    e1 = energies(diag)["Etot"]
    return abs(e1 - e0) / abs(e0), wall / nsteps * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.basis.slgrid import build_sph_sl_tables
    from exp_tpu.forces.spherical import SphereSL
    from exp_tpu.ic.eddington import sample_spherical_model

    m = hernquist_model(rmin=1e-3, rmax=20.0)
    t = build_sph_sl_tables(m, lmax=4, nmax=10, numr=2000, cmap=1, rmap=1.0)
    x, v, mass = sample_spherical_model(m, n, seed=11)
    x = jnp.asarray(np.asarray(x), jnp.float32)
    v = jnp.asarray(np.asarray(v), jnp.float32)
    mass = jnp.asarray(np.asarray(mass), jnp.float32)
    dt = 0.002

    print(f"N = {n}, steps = {nsteps}, dt = {dt}")
    variants = [("matmul fine-grid", dict(backend="matmul")),
                ("pallas 256 mixed", dict(backend="pallas", numr_cs=256,
                                          pallas_precision="mixed")),
                ("pallas 128 mixed", dict(backend="pallas", numr_cs=128,
                                          pallas_precision="mixed")),
                ("pallas 256 mixed3", dict(backend="pallas", numr_cs=256,
                                           pallas_precision="mixed3")),
                ("pallas 256 default", dict(backend="pallas", numr_cs=256,
                                            pallas_precision="default")),
                ("pallas 128 default", dict(backend="pallas", numr_cs=128,
                                            pallas_precision="default"))]
    for name, kw in variants:
        f = SphereSL.from_tables(t, dtype=jnp.float32, **kw)
        drift, ms = run(f, x, v, mass, dt, nsteps)
        print(f"{name:20s}: |dE/E| {drift:.3e}   {ms:7.3f} ms/step")


if __name__ == "__main__":
    main()
