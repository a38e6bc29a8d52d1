"""End-to-end N-body gates (the reference's CI physics checks).

Mirrors the reference expNbodyTest: evolve an equilibrium halo and assert
the time-averaged virial ratio 2T/VC stays near 1 (tests/Halo/check.py:17-22)
plus energy-conservation checks the reference does via OUTLOG inspection.
Runs on the 8-device virtual CPU mesh so the sharded step path is what is
being tested.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from exp_tpu.basis.model import hernquist_model
from exp_tpu.basis.slgrid import build_sph_sl_tables
from exp_tpu.forces.spherical import SphereSL
from exp_tpu.ic.eddington import sample_spherical_model
from exp_tpu.nbody.particles import ParticleSystem
from exp_tpu.nbody.step import make_kdk_step, init_force_state, energies


@pytest.fixture(scope="module")
def sim():
    m = hernquist_model(rmin=1e-4, rmax=20.0)
    t = build_sph_sl_tables(m, lmax=2, nmax=10, numr=1000, cmap=1, rmap=1.0)
    force = SphereSL.from_tables(t, dtype=jnp.float64)
    x, v, mass = sample_spherical_model(m, 5000, seed=7)
    return m, force, x, v, mass


def _run(force, x, v, mass, nsteps, dt, mesh=None):
    n_dev = len(jax.devices())
    ps = ParticleSystem.from_arrays(x, v, mass, dtype=jnp.float64,
                                    pad_to=(n_dev if mesh is not None else None))
    if mesh is not None:
        ps = ps.shard(mesh)
    ps, coef, diag0 = init_force_state(force, ps, mesh=mesh)
    step = make_kdk_step(force, dt, mesh=mesh, accum_dtype=jnp.float64)
    history = [energies(diag0)]
    for _ in range(nsteps):
        ps, coef, diag = step(ps)
        history.append(energies(diag))
    return ps, history


def test_virial_and_energy_conservation(sim):
    m, force, x, v, mass = sim
    mesh = Mesh(np.array(jax.devices()), ("p",))
    dt = 0.02
    nsteps = 100
    ps, hist = _run(force, x, v, mass, nsteps, dt, mesh=mesh)

    # virial ratio: time-averaged 2T/VC close to 1 (reference gate:
    # (mean-1)^2 < 0.003 over 500 steps at 10k particles)
    ratios = [h["2T/VC"] for h in hist[5:]]
    mean = float(np.mean(ratios))
    assert (mean - 1.0) ** 2 < 0.003, f"virial ratio {mean}"

    # total energy (KE + PE) drift small relative to |E|
    E0 = hist[0]["Etot"]
    Emax_drift = max(abs(h["Etot"] - E0) for h in hist)
    assert Emax_drift / abs(E0) < 2e-3, f"energy drift {Emax_drift/abs(E0)}"


def test_sharded_matches_single_device(sim):
    """One step on the 8-device mesh == one step on a single device."""
    _, force, x, v, mass = sim
    mesh = Mesh(np.array(jax.devices()), ("p",))
    dt = 0.02

    ps1, h1 = _run(force, x, v, mass, 3, dt, mesh=None)
    ps8, h8 = _run(force, x, v, mass, 3, dt, mesh=mesh)

    # identical math up to f64 reduction-order noise in the coefficient sums
    np.testing.assert_allclose(np.asarray(ps8.x)[: ps1.n], np.asarray(ps1.x),
                               rtol=1e-6, atol=1e-9)
    assert h1[-1]["Etot"] == pytest.approx(h8[-1]["Etot"], rel=1e-9)


def test_angular_momentum_conservation(sim):
    _, force, x, v, mass = sim
    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("p",))
    ps = ParticleSystem.from_arrays(x, v, mass, dtype=jnp.float64, pad_to=n_dev)
    ps = ps.shard(mesh)
    ps, coef, d0 = init_force_state(force, ps, mesh=mesh)
    step = make_kdk_step(force, 0.02, mesh=mesh, accum_dtype=jnp.float64)
    L0 = np.asarray(d0["L"])
    for _ in range(20):
        ps, coef, d = step(ps)
    L1 = np.asarray(d["L"])
    scale = np.linalg.norm(L0) + 1e-3
    assert np.linalg.norm(L1 - L0) / scale < 5e-3
