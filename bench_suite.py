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


def _timeit(step, state, reps, sync):
    """Steady-state timing: one warmup call + `reps` timed calls."""
    out = step(state)
    sync(out)
    t0 = time.perf_counter()
    cur = state
    for _ in range(reps):
        cur = step(cur)
    sync(cur)
    return (time.perf_counter() - t0) / reps


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
    sec = _timeit(lambda s: step(s)[0], ps, reps,
                  lambda s: jax.block_until_ready(s.x))
    return {"metric": "sphere_particle_steps_per_sec", "value": n / sec,
            "unit": "1/s", "step_ms": sec * 1e3, "n_particles": n,
            "lmax": lmax, "nmax": nmax}


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
    sec = _timeit(lambda s: step(s)[0], ps, reps,
                  lambda s: jax.block_until_ready(s.x))
    return {"metric": "disk_particle_steps_per_sec", "value": n / sec,
            "unit": "1/s", "step_ms": sec * 1e3, "n_particles": n,
            "mmax": mmax, "nmax": nmax}


def bench_composite(n_halo=786_432, n_disk=262_144, nbig=3, M=2):
    """Config #3: disk+halo composite with multistep bins.

    Reports per-BIG-step time (= 2^M substeps) and aggregate
    particle-substeps/s, the multistep figure of merit."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from exp_tpu.basis.empcyl import build_empcyl_tables
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.basis.slgrid import build_sph_sl_tables
    from exp_tpu.forces.cylinder import CylinderForce
    from exp_tpu.forces.spherical import SphereSL
    from exp_tpu.ic.disk import sample_exponential_disk, disk_velocities
    from exp_tpu.ic.eddington import sample_spherical_model
    from exp_tpu.nbody.particles import ParticleSystem
    from exp_tpu.nbody.multistep import MultistepRunner

    m = hernquist_model(rmin=1e-3, rmax=20.0)
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

    xh, vh, mh = sample_spherical_model(m, n_halo, seed=3)
    xd, md = sample_exponential_disk(n_disk, acyl=0.01, hcyl=0.002,
                                     mass=0.05, seed=4)
    vd = disk_velocities(xd, lambda R: np.sqrt((0.05 + 1.0) * R * R
                                               / (R * R + 0.01 ** 2) ** 1.5),
                         acyl=0.01)

    mesh = Mesh(np.array(jax.devices()[:1]), ("p",))
    forces = {"halo": halo, "disk": disk}
    couples = {"halo": ["halo", "disk"], "disk": ["halo", "disk"]}
    runner = MultistepRunner(forces, couples, 2e-3, M, mesh,
                             dynparams={"dynfracV": 0.01, "dynfracA": 0.03},
                             cap_headroom=2,
                             fused=os.environ.get("BENCH_FUSED", "0") == "1")
    flat = {
        "halo": ParticleSystem.from_arrays(xh, vh, mh, dtype=jnp.float32),
        "disk": ParticleSystem.from_arrays(xd, vd, md, dtype=jnp.float32),
    }
    st, regs, coef, diag = runner.init_state(flat)
    st, regs, coef, diag = runner.bigstep(st, regs)     # compile all substeps
    st, regs = runner.relevel(st, regs)
    st, regs, coef, diag = runner.bigstep(st, regs)     # possible recompiles
    jax.block_until_ready(st["halo"][0].x)
    t0 = time.perf_counter()
    for _ in range(nbig):
        st, regs, coef, diag = runner.bigstep(st, regs)
        st, regs = runner.relevel(st, regs)
    jax.block_until_ready(st["halo"][0].x)
    sec = (time.perf_counter() - t0) / nbig
    # particle-substeps per big step: level-l particles take 2^l substeps
    counts = runner.level_counts(st)
    subs = sum(c * 2 ** l for comp in counts.values()
               for l, c in enumerate(comp))
    return {"metric": "composite_particle_substeps_per_sec",
            "value": subs / sec, "unit": "1/s", "step_ms": sec * 1e3,
            "n_particles": n_halo + n_disk, "multistep": M,
            "level_counts": counts}


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
    sec = _timeit(lambda s: step(s)[0], ps, reps,
                  lambda s: jax.block_until_ready(s.x))
    return {"metric": "cube_particle_steps_per_sec", "value": n / sec,
            "unit": "1/s", "step_ms": sec * 1e3, "n_particles": n,
            "nmax": nmax}


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
    t0 = time.perf_counter()
    series = []
    for k in range(ntimes):
        # rigid rotation emulates an evolving snapshot stream
        ang = 0.05 * k
        R = jnp.asarray([[np.cos(ang), -np.sin(ang), 0],
                         [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
                        jnp.float32)
        series.append(np.asarray(proj(xj @ R.T)))
    t_coef = time.perf_counter() - t0

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
            "analysis_sec": t_analysis,
            "mssa_top_ev": float(np.asarray(ev)[0])}


ALL = {
    "sphere": bench_sphere,
    "disk": bench_disk,
    "composite": bench_composite,
    "cube": bench_cube,
    "pyexp": bench_pyexp,
}
