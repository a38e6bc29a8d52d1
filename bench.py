"""Benchmark: BFE N-body step throughput on the attached accelerator.

Prints ONE JSON line:
  {"metric": "particle_steps_per_sec", "value": ..., "unit": "1/s",
   "vs_baseline": ...}

vs_baseline is the measured speedup over a single-host NumPy f64
implementation of the FULL reference step equations — coefficient
projection AND the acceleration pass plus both kicks
(exp_tpu/validate.py ReferenceSphereStep, transcribed from
SphericalBasis.cc:429-599/1476-1700 + step.cc:272-322), run on the SAME
phase-space sample as the benched step.  The reference publishes no
numbers of its own (BASELINE.md), so the per-core CPU rate of its own
step math is the stand-in.
"""

import json
import math
import os
import sys
import time

import numpy as np

#: configs whose `value` is particle-steps/sec — the only ones eligible
#: to be the headline metric (composite reports substeps/s, pyexp
#: snapshots/s; mislabeling those would corrupt vs_baseline)
_PSTEP_CONFIGS = ("sphere", "sphere10m", "disk", "disk10m", "cube")


def _cpu_baseline(reps=2, nb=50_000):
    """Per-particle step rate of the full reference NumPy step."""
    import bench_suite
    from exp_tpu.validate import ReferenceSphereStep

    t = bench_suite.sphere_tables(lmax=4, nmax=10)
    x, v, mass = bench_suite.hernquist_sample_np(nb, seed=0)
    ref = ReferenceSphereStep(t)
    ref.run(x, v, mass, 0.001, 1)            # warm caches
    t0 = time.perf_counter()
    ref.run(x, v, mass, 0.001, reps)
    return nb * reps / (time.perf_counter() - t0)


def main():
    import jax
    import bench_suite

    n = int(os.environ.get("BENCH_N", 1_048_576))
    reps = int(os.environ.get("BENCH_REPS", 20))
    # composite rows run at multistep=4 — the reference CI gate depth
    # (tests/Halo/config.yml); *_m2 variants are selectable via
    # BENCH_CONFIGS for continuity with the r01-r03 M=2 records.
    # composite10m (the BASELINE.md north-star scale) runs last so the
    # wall-clock budget guard can shed it if the warm-up ran cold
    default_cfgs = ("sphere,sphere10m,disk,disk10m,composite,cube,pyexp,"
                    "composite10m")
    cfgs = os.environ.get("BENCH_CONFIGS", default_cfgs).split(",")

    suite = {}
    primary = None
    # soft wall-clock budget: stop launching new configs once exceeded so
    # one slow config can't blow the driver's window (first-compile through
    # the remote runtime is expensive; results are cached across runs).
    # Enforced as soon as ANYTHING has run — a failed primary must not
    # unlock unlimited time for the 10M configs.
    # M=4 composite warmups are compile-heavy (~530 s one-time at 10.5M,
    # measured scripts/probe_composite_m4.py) — budget sized to fit them
    budget = float(os.environ.get("BENCH_BUDGET", 2200))
    t_start = time.perf_counter()
    for c in cfgs:
        c = c.strip()
        if time.perf_counter() - t_start > budget and suite:
            suite[c] = {"skipped": f"budget {budget:.0f}s exceeded"}
            continue
        try:
            print(f"[bench] running {c} ...", file=sys.stderr, flush=True)
            t0 = time.perf_counter()
            if c == "sphere":
                r = bench_suite.bench_sphere(n=n, reps=reps)
            elif c == "sphere10m":
                r = bench_suite.bench_sphere(n=10_485_760, reps=10)
            elif c == "disk":
                r = bench_suite.bench_disk(n=min(n, 1_048_576),
                                           reps=max(5, reps // 2))
            elif c == "disk10m":
                r = bench_suite.bench_disk(n=10_485_760, reps=10)
            elif c == "composite":
                r = bench_suite.bench_composite()
            elif c == "composite_m2":
                r = bench_suite.bench_composite(M=2)
            elif c == "composite10m":
                # BASELINE.md north-star scale: 8M halo + 2M disk
                r = bench_suite.bench_composite(n_halo=8_388_608,
                                                n_disk=2_097_152)
            elif c == "composite10m_m2":
                r = bench_suite.bench_composite(n_halo=8_388_608,
                                                n_disk=2_097_152, M=2)
            elif c == "cube":
                r = bench_suite.bench_cube(n=min(4 * n, 4_194_304),
                                           reps=max(5, reps // 2))
            elif c == "pyexp":
                r = bench_suite.bench_pyexp()
            else:
                continue
            r["wall_sec"] = round(time.perf_counter() - t0, 2)
            suite[c] = r
            # headline: the sphere config, else the first completed
            # particle-steps/sec config (NEVER a different-unit metric)
            if c == "sphere" or (primary is None and c in _PSTEP_CONFIGS):
                primary = r
        except Exception as e:                      # keep the line printable
            suite[c] = {"error": f"{type(e).__name__}: {e}"}

    if primary is None:
        primary = {"value": 0.0, "step_ms": None, "n_particles": 0}

    # CPU baseline: the full reference step in NumPy f64 (same sample)
    try:
        cpu_tput = _cpu_baseline()
    except Exception as e:
        print(f"[bench] baseline failed: {e}", file=sys.stderr)
        cpu_tput = None

    def _finite(x):
        return (x is not None and isinstance(x, (int, float))
                and math.isfinite(x))

    vs = (primary["value"] / cpu_tput
          if _finite(cpu_tput) and cpu_tput > 0 else None)

    # cross-round variance guard (round-5 VERDICT #4): compare each
    # config against the previous round's committed values and flag any
    # >5% move so an unexplained regression (or a noisy run) is visible
    # in the bench line itself, not discovered a round later.
    here = os.path.dirname(os.path.abspath(__file__))
    prev_path = os.path.join(here, "doc", "bench_prev.json")
    vs_prev = {}
    try:
        with open(prev_path) as f:
            prev = json.load(f)
        for c, r in suite.items():
            pv = prev.get(c)
            cv = r.get("value") if isinstance(r, dict) else None
            if _finite(pv) and _finite(cv) and pv > 0:
                d = cv / pv - 1.0
                vs_prev[c] = {"delta_pct": round(d * 100, 2)}
                if abs(d) > 0.05:
                    vs_prev[c]["flag"] = (
                        f"{'+' if d > 0 else ''}{d*100:.1f}% vs prev round"
                        f" — investigate (spread_pct says if it's noise)")
    except OSError:
        pass
    # snapshot current values for the NEXT round's comparison (committed
    # as doc/bench_prev.json when a round's numbers are accepted)
    try:
        with open(os.path.join(here, "doc", "bench_last.json"), "w") as f:
            json.dump({c: (r.get("value") if isinstance(r, dict) else None)
                       for c, r in suite.items()}, f, indent=1)
    except OSError:
        pass

    print(json.dumps({
        "metric": "particle_steps_per_sec",
        "value": primary["value"],
        "unit": "1/s",
        "vs_baseline": vs,
        "n_particles": primary.get("n_particles", n),
        "step_ms": primary.get("step_ms"),
        "cpu_baseline_particle_steps_per_sec": cpu_tput,
        "device": str(jax.devices()[0]),
        "vs_prev": vs_prev,
        "suite": suite,
    }, allow_nan=False))


if __name__ == "__main__":
    main()
