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
