"""Multi-process execution path (SURVEY §2.8 DCN half; expand.cc:184-187).

Launches 2 OS processes x 4 virtual CPU devices each — a genuine
jax.distributed world with gloo cross-process collectives — running the
sharded KDK step over the 8-device GLOBAL mesh, and checks the coefficient
trajectory and final phase space against the single-(this-)process
8-device run.  This is the test the reference runs by prefixing its CI
commands with mpirun (tests/CMakeLists.txt:57-66)."""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _hernquist_bodies(path, n=4096, seed=7):
    rng = np.random.default_rng(seed)
    u = rng.uniform(0.05, 0.95, n)
    r = u / (1 - u)
    ct = rng.uniform(-1, 1, n)
    st = np.sqrt(1 - ct * ct)
    ph = rng.uniform(0, 2 * np.pi, n)
    x = np.stack([r * st * np.cos(ph), r * st * np.sin(ph), r * ct], -1)
    v = rng.normal(0, 0.2, (n, 3))
    mass = np.full(n, 1.0 / n)
    from exp_tpu.nbody.particles import write_ascii_bodies

    write_ascii_bodies(path, (x, v, mass))
    return x, v, mass


def _launch_world(tmp, bodyfile, nproc=2, ndev=4, nsteps=5):
    port = _free_port()
    procs = []
    out = os.path.join(tmp, "world0.npz")
    for pid in range(nproc):
        env = dict(os.environ)
        env.pop("PYTEST_CURRENT_TEST", None)
        env.update({
            "EXP_COORDINATOR": f"127.0.0.1:{port}",
            "EXP_NPROCS": str(nproc),
            "EXP_PROCID": str(pid),
            "WORKER_NDEV": str(ndev),
            "WORKER_NSTEPS": str(nsteps),
            "WORKER_BODYFILE": bodyfile,
            "WORKER_OUT": out,
            # the parent conftest pinned 8 devices; the worker re-pins
            "XLA_FLAGS": f"--xla_force_host_platform_device_count={ndev}",
        })
        procs.append(subprocess.Popen(
            [sys.executable,
             os.path.join(os.path.dirname(__file__),
                          "distributed_worker.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    return out


def test_two_process_kdk_matches_single_process(tmp_path):
    tmp = str(tmp_path)
    bodyfile = os.path.join(tmp, "halo.bods")
    x, v, mass = _hernquist_bodies(bodyfile)
    out = _launch_world(tmp, bodyfile, nproc=2, ndev=4, nsteps=5)
    z = np.load(out)

    # single-process reference on this process's own 8-device mesh
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.basis.slgrid import build_sph_sl_tables
    from exp_tpu.forces.spherical import SphereSL
    from exp_tpu.nbody.particles import ParticleSystem
    from exp_tpu.nbody.step import make_kdk_step, init_force_state
    from exp_tpu.parallel import particle_mesh

    m = hernquist_model(rmin=1e-3, rmax=20.0)
    t = build_sph_sl_tables(m, lmax=2, nmax=6, numr=400, cmap=1, rmap=1.0,
                            cachename=os.path.join(tmp, "sltab_ref.h5"))
    force = SphereSL.from_tables(t, dtype=jnp.float64)
    mesh = particle_mesh(8)
    ps = ParticleSystem.from_arrays(x, v, mass, dtype=jnp.float64,
                                    pad_to=8).shard(mesh)
    ps, coef0, _ = init_force_state(force, ps, mesh=mesh,
                                    accum_dtype=jnp.float64)
    step = make_kdk_step(force, 1e-3, mesh=mesh, accum_dtype=jnp.float64)
    coefs = [np.asarray(coef0)]
    for _ in range(5):
        ps, coef, diag = step(ps)
        coefs.append(np.asarray(coef))
    ref = np.stack(coefs)

    # coefficient-trajectory equality: only the cross-process psum
    # reduction order differs, so f64 agreement must be ~roundoff
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(z["coefs"], ref, atol=1e-12 * scale,
                               rtol=1e-12)

    # phase space: same rows in the same global order
    np.testing.assert_allclose(z["x"], np.asarray(ps.x), atol=1e-12)
    np.testing.assert_allclose(z["v"], np.asarray(ps.v), atol=1e-12)
    np.testing.assert_array_equal(z["indx"], np.asarray(ps.indx))
    assert np.isfinite(z["ke"]) and z["pe"] < 0


def test_row_block_partition():
    """row_block tiles [0, N) contiguously over the (single) process."""
    from exp_tpu.parallel import particle_mesh
    from exp_tpu.parallel.distributed import row_block, pad_global_count

    mesh = particle_mesh(8)
    n = pad_global_count(1000, mesh)
    assert n == 1000  # 1000 % 8 == 0
    lo, hi = row_block(n, mesh)
    assert (lo, hi) == (0, 1000)


def test_allgather_ps_single_process():
    from exp_tpu.nbody.particles import ParticleSystem
    from exp_tpu.parallel import particle_mesh
    from exp_tpu.parallel.distributed import allgather_ps

    mesh = particle_mesh(8)
    rng = np.random.default_rng(0)
    ps = ParticleSystem.from_arrays(rng.normal(size=(64, 3)),
                                    rng.normal(size=(64, 3)),
                                    np.full(64, 1.0 / 64),
                                    dtype=jnp.float64).shard(mesh)
    host = allgather_ps(ps)
    assert isinstance(host.x, np.ndarray)
    np.testing.assert_array_equal(host.x, np.asarray(ps.x))


# ---------------------------------------------------------------------------
# full YAML driver, 2 OS processes (the mpirun'd-whole-binary CI analogue)
# ---------------------------------------------------------------------------

DRIVER_CONFIG = """\
Global:
  dtime: 0.01
  nsteps: {nsteps}
  runtag: drun
  multistep: 2
  compute_dtype: float64
  accum_dtype: float64
{extra}
Components:
  - name: halo
    bodyfile: halo.bods
    force:
      id: sphereSL
      parameters:
        numr: 400
        Lmax: 2
        nmax: 6
        rmapping: 1.0
        modelname: halo.model
        cachename: halo.cache.h5
Output:
  - id: outlog
    parameters: {{nint: 1}}
  - id: outcoef
    parameters: {{nint: 1, name: halo}}
  - id: outchkpt
    parameters: {{nint: 3}}
  - id: outmulti
    parameters: {{nint: 1}}
"""


def _driver_workdir(base, name, nsteps=6, extra=""):
    """Model + bodies + YAML config in a fresh directory."""
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.ic.eddington import sample_spherical_model
    from exp_tpu.nbody.particles import write_ascii_bodies

    d = os.path.join(base, name)
    os.makedirs(d, exist_ok=True)
    m = hernquist_model(rmin=1e-4, rmax=20.0, numr=800)
    m.to_file(os.path.join(d, "halo.model"))
    x, v, mass = sample_spherical_model(m, 4096, seed=23)
    write_ascii_bodies(os.path.join(d, "halo.bods"), (x, v, mass))
    with open(os.path.join(d, "config.yml"), "w") as f:
        f.write(DRIVER_CONFIG.format(nsteps=nsteps, extra=extra))
    return d


def _launch_driver_world(workdir, nproc=2, ndev=4):
    port = _free_port()
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.pop("PYTEST_CURRENT_TEST", None)
        env.update({
            "EXP_COORDINATOR": f"127.0.0.1:{port}",
            "EXP_NPROCS": str(nproc),
            "EXP_PROCID": str(pid),
            "WORKER_NDEV": str(ndev),
            "WORKER_CONFIG": os.path.join(workdir, "config.yml"),
            "XLA_FLAGS": f"--xla_force_host_platform_device_count={ndev}",
        })
        procs.append(subprocess.Popen(
            [sys.executable,
             os.path.join(os.path.dirname(__file__),
                          "distributed_driver_worker.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"driver worker failed:\n{log[-6000:]}"
    return logs


def _outlog_rows(path):
    """OUTLOG rows as a float matrix, Clock column (idx 17) dropped
    (wall-clock differs between runs by construction)."""
    rows = []
    for line in open(path):
        if line.startswith("#") or "Time" in line:
            continue
        vals = [float(v) for v in line.split("|")]
        del vals[17]
        rows.append(vals)
    return np.array(rows)


def test_two_process_full_driver_matches_single_process(tmp_path):
    """The round-5 closure of the multi-process driver: 2 OS processes x 4
    devices run the FULL YAML driver (multistep bigsteps + relevel +
    outlog/outcoef/outchkpt/outmulti), outputs are written ONCE (primary
    process only) and match the single-process 8-device run to f64
    roundoff; a restart from the 2-process checkpoint continues."""
    base = str(tmp_path)
    d2 = _driver_workdir(base, "world2", nsteps=6)
    d1 = _driver_workdir(base, "world1", nsteps=6)

    # --- 2-process x 4-device world runs the real CLI ---
    _launch_driver_world(d2, nproc=2, ndev=4)

    # --- single-process reference on this process's 8-device mesh ---
    from exp_tpu.nbody.simulation import Simulation

    sim = Simulation.from_file(os.path.join(d1, "config.yml"))
    sim.prime()
    sim.run()

    # outputs written once: row count = prime + nsteps
    log2 = _outlog_rows(os.path.join(d2, "OUTLOG.drun"))
    log1 = _outlog_rows(os.path.join(d1, "OUTLOG.drun"))
    assert log2.shape == log1.shape, (log2.shape, log1.shape)
    assert log2.shape[0] == 7
    # identical physics to f64 roundoff (only the cross-process psum
    # reduction order differs)
    np.testing.assert_allclose(log2, log1, rtol=1e-9, atol=1e-12)

    # coefficient trajectories equal
    from exp_tpu.io.coefs import open_coefs

    t2, c2 = open_coefs(os.path.join(d2, "outcoef.halo.drun.h5")).read_all()
    t1, c1 = open_coefs(os.path.join(d1, "outcoef.halo.drun.h5")).read_all()
    np.testing.assert_allclose(t2, t1, atol=1e-12)
    scale = np.max(np.abs(c1))
    np.testing.assert_allclose(c2, c1, atol=1e-10 * scale)

    # multistep level populations identical (deterministic integers)
    lv2 = [ln for ln in open(os.path.join(d2, "drun.levels"))
           if not ln.startswith("#")]
    lv1 = [ln for ln in open(os.path.join(d1, "drun.levels"))
           if not ln.startswith("#")]
    assert lv2 == lv1

    # config echo written exactly once (primary), checkpoint exists
    assert os.path.exists(os.path.join(d2, "config.drun.yml"))
    chk = os.path.join(d2, "OUT.drun.chkpt")
    assert os.path.exists(chk)

    # --- restart the 2-process world from its own checkpoint ---
    with open(os.path.join(d2, "config.yml"), "w") as f:
        f.write(DRIVER_CONFIG.format(nsteps=3,
                                     extra="  infile: OUT.drun.chkpt"))
    _launch_driver_world(d2, nproc=2, ndev=4)
    log2b = _outlog_rows(os.path.join(d2, "OUTLOG.drun"))
    # the restart appends: original 7 rows + the forced row at the
    # restored time (begin_run's output->Run(0), begin.cc:135-142)
    # + 3 continued steps
    assert log2b.shape[0] == 11, log2b.shape
    # time strictly advances past the first segment
    assert log2b[-1, 0] > log2[-1, 0] + 0.02
    # energy stays sane across the restart boundary
    E = log2b[:, 15]
    assert abs(E[-1] - E[0]) / abs(E[0]) < 5e-3
