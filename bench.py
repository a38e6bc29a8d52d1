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
    import bench_suite

    n = int(os.environ.get("BENCH_N", 1_048_576))
    reps = int(os.environ.get("BENCH_REPS", 20))
    default_cfgs = "sphere,sphere10m,disk,disk10m,composite,cube,pyexp"
    cfgs = os.environ.get("BENCH_CONFIGS", default_cfgs).split(",")

    suite = {}
    primary = None
    # soft wall-clock budget: stop launching new configs once exceeded so
    # one slow config can't blow the driver's window (first-compile through
    # the remote runtime is expensive; results are cached across runs)
    budget = float(os.environ.get("BENCH_BUDGET", 1200))
    t_start = time.perf_counter()
    for c in cfgs:
        c = c.strip()
        if time.perf_counter() - t_start > budget and primary is not None:
            suite[c] = {"skipped": f"budget {budget:.0f}s exceeded"}
            continue
        try:
            print(f"[bench] running {c} ...", file=sys.stderr, flush=True)
            t0 = time.perf_counter()
            if c == "sphere":
                r = bench_suite.bench_sphere(n=n, reps=reps)
                primary = r
            elif c == "sphere10m":
                r = bench_suite.bench_sphere(n=10_485_760, reps=5)
            elif c == "disk":
                r = bench_suite.bench_disk(n=min(n, 1_048_576),
                                           reps=max(5, reps // 2))
            elif c == "disk10m":
                r = bench_suite.bench_disk(n=10_485_760, reps=5)
            elif c == "composite":
                r = bench_suite.bench_composite()
            elif c == "cube":
                r = bench_suite.bench_cube(n=min(4 * n, 4_194_304),
                                           reps=max(5, reps // 2))
            elif c == "pyexp":
                r = bench_suite.bench_pyexp()
            else:
                continue
            r["wall_sec"] = round(time.perf_counter() - t0, 2)
            suite[c] = r
        except Exception as e:                      # keep the line printable
            suite[c] = {"error": f"{type(e).__name__}: {e}"}

    if primary is None:
        primary = next((v for v in suite.values() if "value" in v),
                       {"value": 0.0, "step_ms": 0.0, "n_particles": 0})

    # CPU baseline: single-host NumPy implementation of the sphere step,
    # measured at <=100k particles, per-particle rate
    try:
        from exp_tpu.basis.model import hernquist_model
        from exp_tpu.basis.slgrid import build_sph_sl_tables

        nb = 100_000
        m = hernquist_model(rmin=1e-3, rmax=20.0)
        t = build_sph_sl_tables(m, lmax=4, nmax=10, numr=2000, cmap=1,
                                rmap=1.0)
        rng = np.random.default_rng(0)
        u = rng.uniform(0.02, 0.98, nb)
        r = u / (1 - u)
        ct = rng.uniform(-1, 1, nb)
        st = np.sqrt(1 - ct * ct)
        ph = rng.uniform(0, 2 * np.pi, nb)
        xb = np.stack([r * st * np.cos(ph), r * st * np.sin(ph), r * ct], -1)
        cpu_tput = _numpy_step_throughput(
            (np.asarray(t.pot_table), t.xmin, t.dxi, 4, 10),
            xb, rng.normal(0, 0.3, (nb, 3)), np.full(nb, 1.0 / nb), 0.001)
    except Exception:
        cpu_tput = float("nan")

    print(json.dumps({
        "metric": "particle_steps_per_sec",
        "value": primary["value"],
        "unit": "1/s",
        "vs_baseline": primary["value"] / cpu_tput,
        "n_particles": primary.get("n_particles", n),
        "step_ms": primary.get("step_ms"),
        "cpu_baseline_particle_steps_per_sec": cpu_tput,
        "device": str(jax.devices()[0]),
        "suite": suite,
    }))


if __name__ == "__main__":
    main()
