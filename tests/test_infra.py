"""Run-infrastructure physics: EJ centering, adiabatic turn-on, shells force,
halobulge, twocenter."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from exp_tpu.basis.model import hernquist_model, plummer_model
from exp_tpu.ic.eddington import sample_spherical_model
from exp_tpu.nbody.particles import ParticleSystem, write_ascii_bodies
from exp_tpu.nbody.centering import EJOrient, _most_bound_centroid
from exp_tpu.forces.shells import ShellsForce, HaloBulgeForce


def test_most_bound_centroid():
    """Offset halo: the most-bound centroid finds the offset, COM of the
    full set (with unbound contaminant) does not."""
    m = hernquist_model(rmin=1e-4, rmax=20.0, numr=600)
    x, v, mass = sample_spherical_model(m, 5000, seed=1)
    off = np.array([0.5, -0.3, 0.2])
    x = x + off
    # fake potential: deeper near the halo center
    pot = m.get_pot(np.linalg.norm(x - off, axis=1))
    # contaminate with distant unbound particles
    rng = np.random.default_rng(2)
    xb = rng.uniform(-30, 30, (500, 3))
    vb = rng.normal(0, 2, (500, 3))
    x2 = np.vstack([x, xb]); v2 = np.vstack([v, vb])
    m2 = np.concatenate([mass, np.full(500, mass[0])])
    p2 = np.concatenate([pot, np.full(500, -1e-3)])
    ps = ParticleSystem.from_arrays(x2, v2, m2, dtype=jnp.float64)
    from dataclasses import replace
    ps = replace(ps, pot=jnp.asarray(p2))
    c, L = _most_bound_centroid(ps.x, ps.v, ps.mass, ps.pot, k=256)
    assert np.linalg.norm(np.asarray(c) - off) < 0.1

    orient = EJOrient(nkeep=256, window=4)
    est = orient.update(ps)
    assert np.linalg.norm(est - off) < 0.1


def test_shells_force_monopole():
    """Shells binned monopole ~= M(<r)/r^2 for a Plummer ball."""
    pm = plummer_model(a=0.5, M=1.0, rmin=1e-3, rmax=9.0)
    x, v, mass = sample_spherical_model(pm, 40000, seed=3)
    f = ShellsForce(rmax=10.0, nbins=256)
    coef = f.coefficients(jnp.asarray(x), jnp.asarray(mass),
                          accum_dtype=jnp.float64)
    rt = np.array([0.3, 0.7, 1.5, 4.0])
    pts = jnp.asarray(np.stack([rt, 0 * rt, 0 * rt], -1))
    acc, pot = f.acceleration(coef, pts)
    g = -pm.get_mass(rt) / rt ** 2
    np.testing.assert_allclose(np.asarray(acc)[:, 0], g, rtol=0.05)
    np.testing.assert_allclose(np.asarray(pot), pm.get_pot(rt), rtol=0.05)


def test_halobulge_force():
    pm = plummer_model(a=0.5, M=2.0)
    f = HaloBulgeForce.from_model(pm, dtype=jnp.float64)
    pts = jnp.asarray([[1.0, 0.0, 0.0]])
    acc, pot = f.acceleration(f.coefficients(pts, jnp.ones(1)), pts)
    assert float(pot[0]) == pytest.approx(float(pm.get_pot(1.0)), rel=1e-3)
    assert float(acc[0, 0]) == pytest.approx(-float(pm.get_mass(1.0)), rel=1e-3)


def test_adiabatic_rampup(tmp_path):
    """Component with adiabatic turn-on: coefficients grow with the ramp."""
    from exp_tpu.nbody.simulation import Simulation

    m = hernquist_model(rmin=1e-4, rmax=20.0, numr=600)
    m.to_file(tmp_path / "h.model")
    x, v, mass = sample_spherical_model(m, 2000, seed=4)
    write_ascii_bodies(tmp_path / "h.bods", (x, v, mass))
    (tmp_path / "c.yml").write_text("""\
Global:
  dtime: 0.05
  nsteps: 8
  runtag: adb0
Components:
  - name: halo
    bodyfile: h.bods
    parameters: {adiabatic: true, ton: 0.2, twid: 0.1}
    force:
      id: sphereSL
      parameters: {numr: 400, Lmax: 0, nmax: 6, rmapping: 1.0,
                   modelname: h.model}
Output: []
""")
    sim = Simulation.from_file(str(tmp_path / "c.yml"))
    sim.run(2)          # t = 0.1: ramp ~ 0.27
    c_early = float(np.abs(np.asarray(sim._coefs["halo"])).max())
    sim.run(6)          # t = 0.4: ramp ~ 0.98
    c_late = float(np.abs(np.asarray(sim._coefs["halo"])).max())
    assert c_late > 2.0 * c_early


def test_twocenter_matches_single_when_centers_equal():
    from exp_tpu.basis.slgrid import build_sph_sl_tables
    from exp_tpu.forces.spherical import SphereSL
    from exp_tpu.forces.twocenter import TwoCenterForce

    m = hernquist_model(rmin=1e-4, rmax=20.0, numr=600)
    t = build_sph_sl_tables(m, lmax=2, nmax=6, numr=600, cmap=1, rmap=1.0)
    f1 = SphereSL.from_tables(t, dtype=jnp.float64)
    tc = TwoCenterForce(inner=SphereSL.from_tables(t, dtype=jnp.float64),
                        outer=SphereSL.from_tables(t, dtype=jnp.float64),
                        c1=jnp.zeros(3), c2=jnp.zeros(3))
    x, v, mass = sample_spherical_model(m, 5000, seed=5)
    x = jnp.asarray(x); mass = jnp.asarray(mass)
    cs = f1.coefficients(x, mass, accum_dtype=jnp.float64)
    ct = tc.coefficients(x, mass, accum_dtype=jnp.float64)
    pts = x[:50]
    a1, p1 = f1.acceleration(cs, pts)
    a2, p2 = tc.acceleration(ct, pts)
    # with equal centers the mixture splits mass 50/50: sum == single basis
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), rtol=1e-10)


def test_ej_centering_in_driver(tmp_path):
    """EJ-tracked component: center estimate follows an offset halo."""
    from exp_tpu.nbody.simulation import Simulation

    m = hernquist_model(rmin=1e-4, rmax=20.0, numr=600)
    m.to_file(tmp_path / "h.model")
    x, v, mass = sample_spherical_model(m, 3000, seed=6)
    off = np.array([0.8, 0.0, 0.0])
    write_ascii_bodies(tmp_path / "h.bods", (x + off, v, mass))
    (tmp_path / "c.yml").write_text("""\
Global:
  dtime: 0.02
  nsteps: 6
  runtag: ej0
Components:
  - name: halo
    bodyfile: h.bods
    parameters: {EJ: true, nEJkeep: 256, EJwindow: 4}
    force:
      id: sphereSL
      parameters: {numr: 400, Lmax: 2, nmax: 6, rmapping: 1.0,
                   modelname: h.model}
Output: []
""")
    sim = Simulation.from_file(str(tmp_path / "c.yml"))
    sim.prime()
    sim.run()
    c = sim._centers["halo"]
    assert np.linalg.norm(c - off) < 0.15, c
