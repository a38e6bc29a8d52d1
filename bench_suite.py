"""Benchmark suite: the five BASELINE.md configs, self-contained.

Each bench function returns a dict with at least
  {"metric", "value", "unit", "step_ms", "n_particles"}.
Setup work (table builds, IC sampling, compiles) is excluded from the
timed region; steady-state step time is measured with block_until_ready.

Configs (BASELINE.md "Targets" table):
  1. sphere    — Hernquist halo, SphereSL lmax=4 nmax=10 (1M, and 10M)
  2. disk      — exponential disk, EOF cylinder mmax=6 nmax=18 (1M)
  3. composite — disk+halo with multistep=2 bins
  4. cube      — periodic cube, plane-wave basis 4M
  5. pyexp     — analysis pipeline: coefficients series -> MSSA -> fields
"""

import os
import time

import numpy as np

CACHE_DIR = os.environ.get("BENCH_CACHE",
                           os.path.join(os.path.dirname(
                               os.path.abspath(__file__)), ".bench_cache"))


class CompileMeter:
    """Counts XLA backend compiles (and their seconds) inside a region.

    Surfaces recompile churn in the bench JSON: a steady-state timing
    region must report ncompiles == 0 or its numbers are compile time,
    not compute (the BENCH_r02 composite failure mode).
    """

    EVENT = "/jax/core/compile/backend_compile_duration"

    def __init__(self):
        self.count = 0
        self.seconds = 0.0

    def _listener(self, name, secs, **kw):
        if name == self.EVENT:
            self.count += 1
            self.seconds += secs

    def __enter__(self):
        import jax.monitoring as monitoring

        monitoring.register_event_duration_secs_listener(self._listener)
        return self

    def __exit__(self, *exc):
        import jax.monitoring as monitoring

        monitoring.unregister_event_duration_listener(self._listener)
        return False


def _timeit(step, state, reps, sync, groups=3):
    """Steady-state timing: one warmup call + `reps` timed calls.

    Returns (sec_per_rep, ncompiles, compile_sec, spread) — the compile
    counters cover the TIMED region only and should be zero.  The timed
    region is split into up to `groups` synced groups; `spread` is
    (max - min)/mean of the per-group rates, the run-to-run variance
    guard (round-5 VERDICT #4: headline numbers carry their spread)."""
    out = step(state)
    sync(out)
    g = max(1, min(groups, reps))
    per = [reps // g + (1 if i < reps % g else 0) for i in range(g)]
    times = []
    with CompileMeter() as cm:
        cur = state
        for cnt in per:
            t0 = time.perf_counter()
            for _ in range(cnt):
                cur = step(cur)
            sync(cur)
            times.append((time.perf_counter() - t0) / cnt)
    sec = sum(t * c for t, c in zip(times, per)) / reps
    spread = (max(times) - min(times)) / sec if len(times) > 1 else 0.0
    return sec, cm.count, cm.seconds, spread


def sphere_tables(lmax=4, nmax=10):
    """Shared (disk-cached) spherical SL tables for the sphere benches."""
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.basis.slgrid import build_sph_sl_tables

    os.makedirs(CACHE_DIR, exist_ok=True)
    m = hernquist_model(rmin=1e-3, rmax=20.0)
    return build_sph_sl_tables(
        m, lmax=lmax, nmax=nmax, numr=2000, cmap=1, rmap=1.0,
        cachename=os.path.join(CACHE_DIR, f"sph_l{lmax}n{nmax}.h5"))


def hernquist_sample_np(n, seed=0):
    """The benches' Hernquist-ish phase-space sample (shared with
    bench.py's CPU baseline so both populations stay identical)."""
    rng = np.random.default_rng(seed)
    u = rng.uniform(0.02, 0.98, n)
    r = u / (1 - u)
    ct = rng.uniform(-1, 1, n)
    st = np.sqrt(1 - ct * ct)
    ph = rng.uniform(0, 2 * np.pi, n)
    x = np.stack([r * st * np.cos(ph), r * st * np.sin(ph), r * ct], -1)
    v = rng.normal(0, 0.3, (n, 3))
    mass = np.full(n, 1.0 / n)
    return x, v, mass


def _sphere_problem(n, lmax=4, nmax=10, seed=0):
    import jax.numpy as jnp
    from exp_tpu.forces.spherical import SphereSL

    t = sphere_tables(lmax=lmax, nmax=nmax)
    force = SphereSL.from_tables(t, dtype=jnp.float32, backend="pallas")
    x, v, mass = hernquist_sample_np(n, seed=seed)
    return force, t, x, v, mass


def bench_sphere(n=1_048_576, reps=20, lmax=4, nmax=10):
    """Config #1: SphereSL KDK step throughput."""
    import jax
    import jax.numpy as jnp
    from exp_tpu.nbody.particles import ParticleSystem
    from exp_tpu.nbody.step import make_kdk_step, init_force_state

    force, t, x, v, mass = _sphere_problem(n, lmax, nmax)
    dt = 0.001
    # small-shape warmup amortizes the first-compile backend-init cost
    tiny = ParticleSystem.from_arrays(x[:1024], v[:1024], mass[:1024],
                                      dtype=jnp.float32)
    tps, _, _ = init_force_state(force, tiny)
    jax.block_until_ready(make_kdk_step(force, dt)(tps)[0].x)

    ps = ParticleSystem.from_arrays(x, v, mass, dtype=jnp.float32)
    ps, _, _ = init_force_state(force, ps)
    step = make_kdk_step(force, dt)
    sec, ncomp, csec, spread = _timeit(lambda s: step(s)[0], ps, reps,
                               lambda s: jax.block_until_ready(s.x))
    return {"metric": "sphere_particle_steps_per_sec", "value": n / sec,
            "unit": "1/s", "step_ms": sec * 1e3, "n_particles": n,
            "lmax": lmax, "nmax": nmax, "spread_pct": round(spread * 100, 2),
            "ncompiles": ncomp, "compile_sec": round(csec, 2)}


def bench_disk(n=1_048_576, reps=10, mmax=6, nmax=18):
    """Config #2: EOF cylinder disk step throughput (cached EOF tables)."""
    import jax
    import jax.numpy as jnp
    from exp_tpu.basis.empcyl import build_empcyl_tables
    from exp_tpu.forces.cylinder import CylinderForce
    from exp_tpu.ic.disk import sample_exponential_disk, disk_velocities
    from exp_tpu.nbody.particles import ParticleSystem
    from exp_tpu.nbody.step import make_kdk_step, init_force_state

    os.makedirs(CACHE_DIR, exist_ok=True)
    t = build_empcyl_tables(
        mmax=mmax, nmax=nmax, lmaxfid=int(os.environ.get("BENCH_LMAXFID", 32)),
        nmaxfid=int(os.environ.get("BENCH_NMAXFID", 24)),
        acyl=0.01, hcyl=0.002,
        cachename=os.path.join(CACHE_DIR, f"eof_m{mmax}n{nmax}.h5"))
    force = CylinderForce.from_tables(
        t, dtype=jnp.float32,
        backend=os.environ.get("BENCH_CYL_BACKEND", "pallas"))
    x, mass = sample_exponential_disk(n, acyl=0.01, hcyl=0.002, mass=0.05,
                                      seed=2)
    v = disk_velocities(x, lambda R: np.sqrt(0.05 * R * R
                                             / (R * R + 0.01 ** 2) ** 1.5),
                        acyl=0.01)
    dt = 1e-4
    ps = ParticleSystem.from_arrays(x, v, mass, dtype=jnp.float32)
    ps, _, _ = init_force_state(force, ps)
    step = make_kdk_step(force, dt)
    sec, ncomp, csec, spread = _timeit(lambda s: step(s)[0], ps, reps,
                               lambda s: jax.block_until_ready(s.x))
    return {"metric": "disk_particle_steps_per_sec", "value": n / sec,
            "unit": "1/s", "step_ms": sec * 1e3, "n_particles": n,
            "mmax": mmax, "nmax": nmax, "spread_pct": round(spread * 100, 2),
            "ncompiles": ncomp, "compile_sec": round(csec, 2)}


def composite_ics(halo_force, disk_force, n_halo, n_disk, seed=3):
    """Self-consistent disk+halo ICs for the composite bench, disk-cached.

    ic/diskhalo.py equilibrium construction (halo DF in the combined
    potential, disk Jeans moments from the measured expansions): level
    populations are stationary, so the multistep capacity signature is
    too — the property that makes a steady-state timing reachable."""
    from exp_tpu.ic.diskhalo import diskhalo_ics

    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR,
                        f"composite_ics_h{n_halo}_d{n_disk}_s{seed}_v1.npz")
    if os.path.exists(path):
        z = np.load(path)
        return {k: z[k] for k in ("xh", "vh", "mh", "xd", "vd", "md")}
    from exp_tpu.basis.model import hernquist_model

    m = hernquist_model(rmin=1e-3, rmax=20.0)
    ics = diskhalo_ics(m, n_halo=n_halo, n_disk=n_disk, Mdisk=0.05,
                       acyl=0.01, hcyl=0.002, halo_force=halo_force,
                       disk_force=disk_force, seed=seed)
    out = {"xh": ics.x_halo, "vh": ics.v_halo,
           "mh": np.maximum(ics.m_halo, 0.0),
           "xd": ics.x_disk, "vd": ics.v_disk, "md": ics.m_disk}
    np.savez(path, **{k: v.astype(np.float32) for k, v in out.items()})
    return out


def bench_composite(n_halo=786_432, n_disk=262_144, nbig=3, M=4,
                    max_warmup=8):
    """Config #3: disk+halo composite with multistep bins.

    M defaults to 4 — the reference's own CI gate depth
    (tests/Halo/config.yml `multistep: 4`); BENCH_M overrides.  Measured
    on the v5e (scripts/probe_composite_m4.py): M=4 at 10.5M runs
    4.3e7 particle-substeps/s vs 3.2e7 at M=2 — the deeper hierarchy
    concentrates work on the few fast particles, and the capacity
    signature stays stable after one relevel.

    Reports per-BIG-step time (= 2^M substeps) and aggregate
    particle-substeps/s, the multistep figure of merit.  Warmup runs
    bigstep+relevel until the bucket-capacity signature is unchanged for
    2 consecutive relevels (every growth recompiles all 2^M substep
    graphs — the BENCH_r02 failure), then the timed region is entered
    with a compile meter that must read zero."""
    import jax
    import jax.numpy as jnp
    from exp_tpu.basis.empcyl import build_empcyl_tables
    from exp_tpu.forces.cylinder import CylinderForce
    from exp_tpu.parallel import particle_mesh
    from exp_tpu.forces.spherical import SphereSL
    from exp_tpu.nbody.particles import ParticleSystem
    from exp_tpu.nbody.multistep import MultistepRunner

    M = int(os.environ.get("BENCH_M", M))
    ts = sphere_tables(lmax=4, nmax=10)
    halo = SphereSL.from_tables(ts, dtype=jnp.float32, backend="pallas")
    os.makedirs(CACHE_DIR, exist_ok=True)
    tc = build_empcyl_tables(
        mmax=6, nmax=18, lmaxfid=int(os.environ.get("BENCH_LMAXFID", 32)),
        nmaxfid=int(os.environ.get("BENCH_NMAXFID", 24)),
        acyl=0.01, hcyl=0.002,
        cachename=os.path.join(CACHE_DIR, "eof_m6n18.h5"))
    disk = CylinderForce.from_tables(
        tc, dtype=jnp.float32,
        backend=os.environ.get("BENCH_CYL_BACKEND", "pallas"))

    ic = composite_ics(halo, disk, n_halo, n_disk)

    mesh = particle_mesh(1)
    forces = {"halo": halo, "disk": disk}
    couples = {"halo": ["halo", "disk"], "disk": ["halo", "disk"]}
    # fused default: one jit of all 2^M substeps per bigstep — measured
    # 108.9 ms/bigstep vs 116-161 ms unfused through the remote runtime
    # (5 dispatch round-trips collapse to 2)
    runner = MultistepRunner(forces, couples, 2e-3, M, mesh,
                             dynparams={"dynfracV": 0.01, "dynfracA": 0.03},
                             cap_headroom=2,
                             fused=os.environ.get("BENCH_FUSED", "1") == "1")
    flat = {
        "halo": ParticleSystem.from_arrays(ic["xh"], ic["vh"], ic["mh"],
                                           dtype=jnp.float32),
        "disk": ParticleSystem.from_arrays(ic["xd"], ic["vd"], ic["md"],
                                           dtype=jnp.float32),
    }
    t_w = time.perf_counter()
    st, regs, coef, diag = runner.init_state(flat)
    # warm up to the steady capacity signature: stop once it is stable
    # for 2 consecutive relevels (src/step.cc:347-374's steady-state
    # timing discipline) AND an iteration ran compile-free, bounded by
    # max_warmup bigsteps
    sig = runner._caps_sig(st)
    stable, warmup_bigsteps, last_compiles = 0, 0, 1
    while (stable < 2 or last_compiles > 0) and warmup_bigsteps < max_warmup:
        with CompileMeter() as wm:
            st, regs, coef, diag = runner.bigstep(st, regs)
            st, regs = runner.relevel(st, regs)
            jax.block_until_ready(st["halo"][0].x)
        last_compiles = wm.count
        warmup_bigsteps += 1
        s2 = runner._caps_sig(st)
        stable = stable + 1 if s2 == sig else 0
        sig = s2
    warmup_sec = time.perf_counter() - t_w

    # up to 3 synced groups: per-group rates give the run-to-run spread
    # without paying a tunnel sync round-trip on every bigstep
    g = max(1, min(3, nbig))
    per = [nbig // g + (1 if i < nbig % g else 0) for i in range(g)]
    times = []
    with CompileMeter() as cm:
        for cnt in per:
            t0 = time.perf_counter()
            for _ in range(cnt):
                st, regs, coef, diag = runner.bigstep(st, regs)
                st, regs = runner.relevel(st, regs)
            jax.block_until_ready(st["halo"][0].x)
            times.append((time.perf_counter() - t0) / cnt)
        sec = sum(t * c for t, c in zip(times, per)) / nbig
    spread = ((max(times) - min(times)) / sec) if g > 1 else 0.0
    # particle-substeps per big step: level-l particles take 2^l substeps
    counts = runner.level_counts(st)
    subs = sum(c * 2 ** l for comp in counts.values()
               for l, c in enumerate(comp))
    return {"metric": "composite_particle_substeps_per_sec",
            "value": subs / sec, "unit": "1/s", "step_ms": sec * 1e3,
            "n_particles": n_halo + n_disk, "multistep": M,
            "level_counts": counts, "spread_pct": round(spread * 100, 2),
            "warmup_bigsteps": warmup_bigsteps,
            "warmup_stable": stable >= 2 and last_compiles == 0,
            "warmup_sec": round(warmup_sec, 2),
            "ncompiles": cm.count, "compile_sec": round(cm.seconds, 2)}


def bench_cube(n=4_194_304, reps=10, nmax=6):
    """Config #4: periodic cube plane-wave basis, 4M particles."""
    import jax
    import jax.numpy as jnp
    from exp_tpu.forces.cube import Cube
    from exp_tpu.ic.cubeics import sample_cube
    from exp_tpu.nbody.particles import ParticleSystem
    from exp_tpu.nbody.step import make_kdk_step, init_force_state

    force = Cube.create(nmaxx=nmax, nmaxy=nmax, nmaxz=nmax,
                        dtype=jnp.float32, backend="pallas")
    x, v, mass = sample_cube(n, seed=5)
    dt = 1e-3
    ps = ParticleSystem.from_arrays(x, v, mass, dtype=jnp.float32)
    ps, _, _ = init_force_state(force, ps)
    step = make_kdk_step(force, dt)
    sec, ncomp, csec, spread = _timeit(lambda s: step(s)[0], ps, reps,
                               lambda s: jax.block_until_ready(s.x))
    return {"metric": "cube_particle_steps_per_sec", "value": n / sec,
            "unit": "1/s", "step_ms": sec * 1e3, "n_particles": n,
            "nmax": nmax, "spread_pct": round(spread * 100, 2),
            "ncompiles": ncomp, "compile_sec": round(csec, 2)}


def bench_pyexp(n=262_144, ntimes=32):
    """Config #5: analysis pipeline — per-snapshot coefficients from
    particles, expMSSA over the series, FieldGenerator surface grids.
    Reports snapshots/sec through createFromReader-style projection."""
    import jax
    import jax.numpy as jnp
    from exp_tpu.analysis.basis import Basis
    from exp_tpu.analysis.mssa import expMSSA
    from exp_tpu.analysis.field import FieldGenerator

    force, t, x, v, mass = _sphere_problem(n, lmax=4, nmax=10, seed=6)
    xj = jnp.asarray(x, jnp.float32)
    mj = jnp.asarray(mass, jnp.float32)

    proj = jax.jit(lambda xx: force.coefficients(xx, mj))
    jax.block_until_ready(proj(xj))                    # compile
    # warm the rotation matmul + transfer graphs too (they cost 3 small
    # compiles otherwise — visible as ncompiles>0 in the timed region)
    R0 = jnp.eye(3, dtype=jnp.float32)
    np.asarray(proj(xj @ R0.T))
    # rigid rotations emulate an evolving snapshot stream; prebuilt
    # OUTSIDE the timer — the first jnp.asarray of a host nested list
    # compiles a convert_element_type program (~0.4 s through the
    # tunnel), which used to land inside the timed region (the
    # ncompiles=1 every round + the r03<->r04 pyexp wobble)
    Rs = [jnp.asarray([[np.cos(a), -np.sin(a), 0],
                       [np.sin(a), np.cos(a), 0], [0, 0, 1]], jnp.float32)
          for a in (0.05 * k for k in range(ntimes))]
    jax.block_until_ready(Rs[-1])
    with CompileMeter() as cm:
        t0 = time.perf_counter()
        series = []
        marks = [t0]
        for k in range(ntimes):
            series.append(np.asarray(proj(xj @ Rs[k].T)))
            if (k + 1) % max(1, ntimes // 3) == 0:
                marks.append(time.perf_counter())
        t_coef = time.perf_counter() - t0
    # per-third snapshot rates -> run-to-run spread (VERDICT r5 #4)
    gts = np.diff(marks[:4])
    spread = (float((gts.max() - gts.min()) / gts.mean())
              if len(gts) > 1 else 0.0)

    t0 = time.perf_counter()
    mssa = expMSSA({"halo": np.stack(series)}, window=ntimes // 2, numpc=8)
    ev = mssa.eigenvalues()
    mssa.reconstructed(groups=[0, 1])
    fg = FieldGenerator(times=[0.0], pmin=[-1, -1, 0], pmax=[1, 1, 0],
                        grid=[64, 64, 0])
    sl = fg.slices(Basis(force, name="halo"), jnp.asarray(series[0]))
    assert np.isfinite(sl[0.0]["dens"]).all()
    t_analysis = time.perf_counter() - t0

    return {"metric": "pyexp_snapshots_per_sec", "value": ntimes / t_coef,
            "unit": "1/s", "step_ms": t_coef / ntimes * 1e3,
            "n_particles": n, "ntimes": ntimes,
            "spread_pct": round(spread * 100, 2),
            "analysis_sec": t_analysis,
            "ncompiles": cm.count, "compile_sec": round(cm.seconds, 2),
            "mssa_top_ev": float(np.asarray(ev)[0])}


ALL = {
    "sphere": bench_sphere,
    "disk": bench_disk,
    "composite": bench_composite,
    "cube": bench_cube,
    "pyexp": bench_pyexp,
}
