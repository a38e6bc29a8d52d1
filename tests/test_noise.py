"""NOISE coefficient playback (SphericalBasis.cc:2109-2214)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def sphere_force():
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.basis.slgrid import build_sph_sl_tables
    from exp_tpu.forces.spherical import SphereSL

    m = hernquist_model(rmin=1e-3, rmax=20.0)
    t = build_sph_sl_tables(m, lmax=2, nmax=6, numr=400)
    return SphereSL.from_tables(t), m


def test_noise_moment_tables(sphere_force):
    """compute_rms_coefs analogue: quadrature moments match an independent
    trapezoid integration of the same integrands."""
    import jax

    from exp_tpu.nbody.noise import SphereNoise

    force, model = sphere_force
    # numg=4000 isolates the integrand from Gauss-Legendre truncation (the
    # production default mirrors the reference's numg=100; its quadrature
    # error only touches the tiny high-n entries)
    nz = SphereNoise.build(force, model, noiseN=1e-4, seedN=3, numg=4000)
    # independent moment integration on a fine grid
    r = np.linspace(model.rmin, model.rmax, 20001)
    u = np.asarray(jax.device_get(force.grid.get_pot(
        np.asarray(r / force.scale, np.float64)))).astype(np.float64)
    rho = np.asarray([model.get_density(ri) for ri in r])
    w = 4.0 * np.pi * r * r * rho
    meanC = np.trapezoid(w * u[:, 0, :].T / force.scale, r, axis=1)
    rmsC0 = np.trapezoid(w * (u[:, 0, :].T / force.scale) ** 2, r, axis=1)
    np.testing.assert_allclose(nz.meanC, meanC, rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(nz.rmsC[0], rmsC0, rtol=2e-3, atol=1e-6)


def test_noise_draw_statistics(sphere_force):
    """update_noise analogue: draws have the prescribed std and mean, zero
    sin m=0 / m>l entries, and are seed-reproducible."""
    from exp_tpu.nbody.noise import SphereNoise

    force, model = sphere_force
    nz = SphereNoise.build(force, model, noiseN=1e-4, seedN=3)
    assert nz.std.shape == (2, 3, 3, 6)
    # structural zeros
    assert np.all(nz.std[1, :, 0, :] == 0)          # sin m=0
    assert np.all(nz.std[:, 1, 2, :] == 0)          # m > l
    draws = np.stack([nz.interpolate(0.0) for _ in range(4000)])
    emp_std = draws.std(axis=0)
    live = nz.std > 0
    np.testing.assert_allclose(emp_std[live], nz.std[live], rtol=0.12)
    np.testing.assert_allclose(draws.mean(axis=0)[0, 0, 0, :],
                               nz.mean[0, 0, 0, :],
                               atol=4 * nz.std[0, 0, 0, :].max() / 60)
    # reproducibility: same seed -> same stream
    nz2 = SphereNoise.build(force, model, noiseN=1e-4, seedN=3)
    np.testing.assert_array_equal(nz2.interpolate(0.0), draws[0])


def test_noise_run_end_to_end(tmp_path):
    """A YAML run with NOISE: true integrates against per-step noise draws
    (the force parameters come straight from the reference's valid_keys,
    SphericalBasis.cc:40-43)."""
    import yaml

    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.config import RunConfig
    from exp_tpu.ic.eddington import sample_spherical_model
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation

    m = hernquist_model(rmin=1e-3, rmax=20.0)
    x, v, mass = sample_spherical_model(m, 500, seed=5)
    bods = str(tmp_path / "h.bods")
    write_ascii_bodies(bods, (x, v, mass))
    conf = {
        "Global": {"dtime": 0.01, "nsteps": 4, "runtag": "ntest",
                   "outdir": str(tmp_path)},
        "Components": [{"name": "halo", "bodyfile": bods,
                        "force": {"id": "sphereSL",
                                  "parameters": {
                                      "lmax": 2, "nmax": 6,
                                      "modelname": "hernquist",
                                      "NOISE": True, "noiseN": 1e-2,
                                      "seedN": 7}}}],
        "Output": [{"id": "outcoef", "parameters": {"nint": 1}}],
    }
    cfg = str(tmp_path / "run.yml")
    with open(cfg, "w") as fh:
        yaml.safe_dump(conf, fh)
    sim = Simulation(RunConfig.from_file(cfg), workdir=str(tmp_path))
    from exp_tpu.nbody.noise import SphereNoise

    assert isinstance(sim.components["halo"].playback, SphereNoise)
    sim.run()
    # the written coefficient series is the noise stream: finite, changing
    # step to step, with the monopole mean offset present
    from exp_tpu.analysis.coefs import Coefs

    co = Coefs.from_file(str(tmp_path / "outcoef.halo.ntest.h5"))
    A = co.as_array()
    assert np.isfinite(A).all()
    assert A.shape[0] >= 4
    d01 = np.abs(np.asarray(A[1] - A[0], np.float64))
    assert d01.max() > 0.0
