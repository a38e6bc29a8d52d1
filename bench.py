"""Benchmark: BFE N-body step throughput on the attached accelerator.

Prints ONE JSON line:
  {"metric": "particle_steps_per_sec", "value": ..., "unit": "1/s",
   "vs_baseline": ...}

vs_baseline is the measured speedup over a single-host NumPy implementation
of the same step math (the reference EXP runs the identical O(N*n_basis)
inner loop on CPUs; the NumPy path stands in as the per-core CPU baseline —
BASELINE.md records that the reference publishes no numbers of its own).
"""

import json
import os
import sys
import time

import numpy as np


def _numpy_step_throughput(force_np, x, v, mass, dt, reps=3):
    """CPU baseline: same math in NumPy (vectorized, f64)."""
    pot_t, xmin, dxi, lmax, nmax = force_np
    fac = _real_ylm_norm_np(lmax)

    def coef_and_force(xp):
        r = np.sqrt((xp * xp).sum(-1)) + 1e-16
        costh = xp[:, 2] / r
        phi = np.arctan2(xp[:, 1], xp[:, 0])
        xi = (r - 1.0) / (r + 1.0)
        t = (xi - xmin) / dxi
        idx = np.clip(t.astype(np.int64), 0, pot_t.shape[0] - 2)
        w = (t - idx)[:, None, None]
        potd = pot_t[idx] * (1 - w) + pot_t[idx + 1] * w
        P = _legendre_np(lmax, costh)
        mg = np.arange(lmax + 1)
        cosm = np.cos(phi[:, None] * mg)
        sinm = np.sin(phi[:, None] * mg)
        yc = fac[None] * P * cosm[:, None, :] * mass[:, None, None]
        ys = fac[None] * P * sinm[:, None, :] * mass[:, None, None]
        cc = np.einsum("ilm,iln->lmn", yc, potd)
        cs = np.einsum("ilm,iln->lmn", ys, potd)
        pc = np.einsum("lmn,iln->ilm", cc, potd)
        ps = np.einsum("lmn,iln->ilm", cs, potd)
        pot = (fac[None] * P * (pc * cosm[:, None, :] + ps * sinm[:, None, :])).sum((1, 2))
        return pot

    n = x.shape[0]
    t0 = time.perf_counter()
    for _ in range(reps):
        v = v + 0.5 * dt * 0.0
        x = x + v * dt
        coef_and_force(x)
    t1 = time.perf_counter()
    return n * reps / (t1 - t0)


def _legendre_np(lmax, x):
    n = x.shape[0]
    p = np.zeros((n, lmax + 1, lmax + 1))
    p[:, 0, 0] = 1.0
    somx2 = np.sqrt(np.maximum((1 - x) * (1 + x), 0))
    pll = np.ones(n)
    fact = 1.0
    for m in range(1, lmax + 1):
        pll = pll * (-fact) * somx2
        p[:, m, m] = pll
        fact += 2.0
    for m in range(lmax):
        pl2 = p[:, m, m]
        pl1 = x * (2 * m + 1) * pl2
        p[:, m + 1, m] = pl1
        for l in range(m + 2, lmax + 1):
            pl = (x * (2 * l - 1) * pl1 - (l + m - 1) * pl2) / (l - m)
            p[:, l, m] = pl
            pl2, pl1 = pl1, pl
    return p


def _real_ylm_norm_np(lmax):
    import math
    fac = np.zeros((lmax + 1, lmax + 1))
    for l in range(lmax + 1):
        for m in range(l + 1):
            v = math.sqrt((2 * l + 1) / (4 * math.pi)
                          * math.factorial(l - m) / math.factorial(l + m))
            fac[l, m] = v * (math.sqrt(2) if m else 1.0)
    return fac


def main():
    import jax
    import jax.numpy as jnp
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.basis.slgrid import build_sph_sl_tables
    from exp_tpu.forces.spherical import SphereSL
    from exp_tpu.nbody.particles import ParticleSystem
    from exp_tpu.nbody.step import make_kdk_step, init_force_state

    n = int(os.environ.get("BENCH_N", 1_048_576))
    lmax, nmax = 4, 10
    dt = 0.001
    backend = os.environ.get("BENCH_BACKEND", "pallas")

    m = hernquist_model(rmin=1e-3, rmax=20.0)
    t = build_sph_sl_tables(m, lmax=lmax, nmax=nmax, numr=2000, cmap=1,
                            rmap=1.0)
    force = SphereSL.from_tables(t, dtype=jnp.float32, backend=backend)

    # synthetic positions/velocities drawn cheaply (no need for equilibrium)
    rng = np.random.default_rng(0)
    u = rng.uniform(0.02, 0.98, n)
    r = u / (1 - u)                                  # Hernquist-ish spread
    ct = rng.uniform(-1, 1, n); st = np.sqrt(1 - ct * ct)
    ph = rng.uniform(0, 2 * np.pi, n)
    x = np.stack([r * st * np.cos(ph), r * st * np.sin(ph), r * ct], -1)
    v = rng.normal(0, 0.3, (n, 3))
    mass = np.full(n, 1.0 / n)

    # tiny warmup first: the first compile in a process pays a large fixed
    # backend-init cost; do it on a small shape (results cached persistently)
    tiny = ParticleSystem.from_arrays(x[:1024], v[:1024], mass[:1024],
                                      dtype=jnp.float32)
    tps, _, _ = init_force_state(force, tiny)
    tstep = make_kdk_step(force, dt)
    tout = tstep(tps)
    jax.block_until_ready(tout[0].x)

    ps = ParticleSystem.from_arrays(x, v, mass, dtype=jnp.float32)
    ps, coef, diag = init_force_state(force, ps)
    step = make_kdk_step(force, dt)

    # warmup/compile
    ps2, coef2, diag2 = step(ps)
    jax.block_until_ready(ps2.x)

    reps = int(os.environ.get("BENCH_REPS", 20))
    t0 = time.perf_counter()
    cur = ps
    for _ in range(reps):
        cur, coef, diag = step(cur)
    jax.block_until_ready(cur.x)
    t1 = time.perf_counter()
    tput = n * reps / (t1 - t0)

    # CPU baseline on a smaller N, scaled per-particle
    nb = min(n, 100_000)
    pot_t = np.asarray(t.pot_table)
    cpu_tput = _numpy_step_throughput(
        (pot_t, t.xmin, t.dxi, lmax, nmax),
        x[:nb].astype(np.float64), v[:nb].astype(np.float64),
        mass[:nb].astype(np.float64), dt)

    print(json.dumps({
        "metric": "particle_steps_per_sec",
        "value": tput,
        "unit": "1/s",
        "vs_baseline": tput / cpu_tput,
        "n_particles": n,
        "lmax": lmax, "nmax": nmax,
        "step_ms": (t1 - t0) / reps * 1e3,
        "backend": backend,
        "cpu_baseline_particle_steps_per_sec": cpu_tput,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
