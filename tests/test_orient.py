"""Orient (EJ center/axis tracking) gates: least-squares regression,
tilted-disk axis recovery with basis-frame feedback, orient-log restart
(src/Orient.cc parity)."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from exp_tpu.nbody.centering import EJOrient, _axis_to_body, euler_slater


def test_regression_tracks_moving_center():
    """A linearly-drifting center is recovered exactly by the regression
    (the boxcar mean would lag by half a window)."""
    o = EJOrient(window=8, damp=1.0)
    vel = np.array([0.1, -0.05, 0.02])
    for k in range(12):
        t = 0.1 * k
        c1 = vel * t + np.random.default_rng(k).normal(0, 1e-12, 3)
        o._push(t, c1, np.array([0.0, 0.0, 1.0]))
        o._refresh(t)
    np.testing.assert_allclose(o.center, vel * 1.1, atol=1e-9)


def test_axis_to_body_maps_axis_to_z():
    rng = np.random.default_rng(3)
    for _ in range(5):
        a = rng.normal(size=3)
        body, orig = _axis_to_body(a)
        z = body @ (a / np.linalg.norm(a))
        np.testing.assert_allclose(z, [0, 0, 1], atol=1e-12)
        np.testing.assert_allclose(body @ orig, np.eye(3), atol=1e-12)


def _tilted_disk(n=4000, tilt=0.5, seed=4):
    """Thin cold disk tilted by `tilt` radians about the x-axis."""
    from exp_tpu.ic.disk import sample_exponential_disk

    x, mass = sample_exponential_disk(n, acyl=1.0, hcyl=0.02, mass=1.0,
                                      seed=seed)
    R = np.hypot(x[:, 0], x[:, 1])
    vc = np.sqrt(R / (R * R + 1.0) ** 1.5 + 1e-12)  # arbitrary smooth curve
    v = np.stack([-vc * x[:, 1] / R, vc * x[:, 0] / R, np.zeros(n)], -1)
    ct, st = np.cos(tilt), np.sin(tilt)
    Rx = np.array([[1, 0, 0], [0, ct, -st], [0, st, ct]])
    return x @ Rx.T, v @ Rx.T, mass, Rx @ np.array([0.0, 0, 1])


def test_tilted_disk_axis_recovery():
    """EJOrient recovers a tilted disk's normal from the most-bound set."""
    from exp_tpu.nbody.particles import ParticleSystem
    from dataclasses import replace

    x, v, mass, normal = _tilted_disk()
    ps = ParticleSystem.from_arrays(x, v, mass, dtype=jnp.float64)
    # binding energy proxy: deeper potential at smaller R
    r = np.linalg.norm(x, axis=1)
    ps = replace(ps, pot=jnp.asarray(-1.0 / (r + 0.1)))
    o = EJOrient(nkeep=512, window=4)
    o.update(ps, time=0.0)
    cosang = abs(float(np.dot(o.axis, normal)))
    assert cosang > 0.999, f"axis {o.axis} vs normal {normal}"
    # the body frame puts the disk normal on z
    np.testing.assert_allclose(np.abs(o.body @ normal), [0, 0, 1],
                               atol=5e-3)


def test_axis_feedback_restores_m_spectrum(tmp_path):
    """With EJ axis tracking, a tilted disk's cylinder-basis coefficient
    spectrum matches the untilted disk's (rotation applied in-frame);
    without it, power leaks to m > 0."""
    from exp_tpu.basis.flatdisk import build_flatdisk_tables
    from exp_tpu.forces.cylinder import CylinderForce

    t = build_flatdisk_tables(mmax=4, nmax=6, model="expon", acyl=1.0,
                              rcylmin=1e-3, rcylmax=20.0,
                              numx=128, numy=64, knots=200, numk=128)
    force = CylinderForce.from_tables(t, dtype=jnp.float64)
    x, v, mass, normal = _tilted_disk(tilt=0.5)
    body, orig = _axis_to_body(normal)

    def mpower(coef):
        c = np.asarray(coef)
        p = (c ** 2).sum(axis=(0, 2))
        return p / p.sum()

    c_tilt = force.coefficients(jnp.asarray(x), jnp.asarray(mass))
    c_rot = force.coefficients(jnp.asarray(x @ body.T), jnp.asarray(mass))
    p_tilt = mpower(c_tilt)
    p_rot = mpower(c_rot)
    assert p_rot[0] > 0.99, f"rotated-frame m-power {p_rot}"
    # rotating into the body frame must cut the non-axisymmetric leakage
    # several-fold (a tilted razor-thin disk still projects mostly onto
    # m=0, so compare the m>0 power directly)
    leak_tilt = float(p_tilt[1:].sum())
    leak_rot = float(p_rot[1:].sum())
    assert leak_rot < 0.3 * leak_tilt, (
        f"m>0 power: rotated {leak_rot:.2e} vs tilted {leak_tilt:.2e}")


def test_orient_log_restart(tmp_path):
    """Orient state round-trips through its log file (Orient.cc:86-188)."""
    log = str(tmp_path / "t.orient.disk")
    o = EJOrient(window=6, damp=1.0, logfile=log)
    rng = np.random.default_rng(8)
    for k in range(10):
        t = 0.05 * k
        c1 = np.array([0.2 * t, 0.0, 0.01]) + rng.normal(0, 1e-10, 3)
        a1 = np.array([np.sin(0.3), 0.0, np.cos(0.3)])
        o._push(t, c1, a1)
        o._refresh(t)
        o._log(t, c1, a1)

    o2 = EJOrient(window=6, damp=1.0, logfile=log)
    o2.load_log()
    np.testing.assert_allclose(o2.center, o.center, atol=1e-10)
    np.testing.assert_allclose(o2.axis, o.axis, atol=1e-10)
    np.testing.assert_allclose(o2.body, o.body, atol=1e-10)
    assert os.path.exists(log)


def test_ej_axis_in_simulation(rundir_factory=None, tmp_path=None):
    pass  # covered end-to-end below


def test_simulation_ej_axis_flag(tmp_path):
    """EJ: 3 (AXIS|CENTER) drives both the center and the rotation into the
    step; the orient log is written and the run stays finite."""
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.ic.eddington import sample_spherical_model
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation

    m = hernquist_model(rmin=1e-4, rmax=20.0, numr=800)
    m.to_file(tmp_path / "halo.model")
    x, v, mass = sample_spherical_model(m, 2000, seed=13)
    write_ascii_bodies(tmp_path / "halo.bods", (x, v, mass))
    (tmp_path / "c.yml").write_text("""\
Global:
  dtime: 0.02
  nsteps: 6
  runtag: ej3
Components:
  - name: halo
    bodyfile: halo.bods
    parameters: {EJ: 3, nEJkeep: 128, EJwindow: 4}
    force:
      id: sphereSL
      parameters: {numr: 600, Lmax: 2, nmax: 6, rmapping: 1.0,
                   modelname: halo.model}
Output:
  - id: outlog
    parameters: {nint: 2}
""")
    sim = Simulation.from_file(str(tmp_path / "c.yml"), steps_per_block=2)
    sim.prime()
    sim.run()
    assert np.isfinite(np.asarray(sim._state["halo"].x)).all()
    # rotation was engaged (non-identity allowed but must be orthonormal)
    Rm = sim._rots["halo"]
    np.testing.assert_allclose(Rm @ Rm.T, np.eye(3), atol=1e-10)
    assert os.path.exists(tmp_path / "ej3.orient.halo")


def test_pseudoaccel_estimator():
    """Quadratic-LS frame acceleration (include/PseudoAccel.H:60-90):
    exact for a quadratic center trajectory once the window fills; axis
    samples give omega = n x dn/dt."""
    from exp_tpu.nbody.centering import PseudoAccel

    g = np.array([0.3, -0.1, 0.05])
    pa = PseudoAccel(nsize=5, center=True, axis=True)
    w = 0.2    # axis precession rate about y
    for k in range(5):
        t = 0.1 * k
        c = 0.5 * g * t * t
        ax = np.array([np.sin(w * t), 0.0, np.cos(w * t)])
        a, om, dom = pa()
        if k < 5:
            # window not yet full before the 5th add
            assert np.all(a == 0.0) if k < 5 else True
        pa.add(t, c, ax)
    a, om, dom = pa()
    np.testing.assert_allclose(a, g, rtol=1e-8)
    # omega = n x dn/dt: the z -> x precession is a rotation about +y
    np.testing.assert_allclose(om, [0.0, w, 0.0], atol=5e-4)


def test_pseudo_collapses_uniform_field(tmp_path):
    """The reference's non-inertial frame option (Component.cc:4407-4425,
    VERDICT r3 #7): an equilibrium halo in a uniform external field g,
    with its expansion center prescribed on the free-fall trajectory
    X(t) = g t^2 / 2, free-falls when `nEJaccel` is off (COM ~ X(t)); with
    the pseudo-acceleration enabled the estimated frame acceleration
    cancels the bulk field and the COM stays put."""
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.ic.eddington import sample_spherical_model
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation
    from exp_tpu.forces.external import ExternalField, register_external

    gx = 0.05
    nstep = 40
    dt = 0.01

    class UniformX(ExternalField):
        def acceleration(self, x, t):
            acc = jnp.zeros_like(x).at[:, 0].set(gx)
            return acc, -gx * x[:, 0]

    register_external("test_uniform_x", UniformX)

    m = hernquist_model(rmin=1e-3, rmax=10.0)
    m.to_file(tmp_path / "halo.model")
    x, v, mass = sample_spherical_model(m, 2000, seed=7)
    write_ascii_bodies(tmp_path / "halo.bods", (x, v, mass))
    ts = np.arange(0, (nstep + 2) * dt, dt)
    np.savetxt(tmp_path / "ctr.dat",
               np.column_stack([ts, 0.5 * gx * ts * ts,
                                np.zeros_like(ts), np.zeros_like(ts)]))

    def com_path(naccel):
        tag = f"ps{naccel}"
        (tmp_path / f"c{naccel}.yml").write_text(f"""\
Global: {{dtime: {dt}, nsteps: {nstep}, runtag: {tag}}}
Components:
  - name: halo
    bodyfile: halo.bods
    parameters: {{centerfile: ctr.dat, nEJaccel: {naccel}}}
    force:
      id: sphereSL
      parameters: {{numr: 600, Lmax: 2, nmax: 6, rmapping: 1.0,
                   modelname: halo.model}}
External:
  - id: test_uniform_x
Output: []
""")
        sim = Simulation.from_file(str(tmp_path / f"c{naccel}.yml"),
                                   steps_per_block=1)
        sim.prime()
        coms = []
        for _ in range(nstep):
            sim.run(nsteps=1)
            d = sim._diag["halo"]
            coms.append(float(np.asarray(d["com"])[0])
                        / float(np.asarray(d["mass"])))
        return np.array(coms)

    com_off = com_path(0)     # plain free fall
    com_on = com_path(3)      # frame correction on
    T = nstep * dt
    # free-fall displacement at the end ~ g T^2 / 2
    np.testing.assert_allclose(com_off[-1], 0.5 * gx * T * T, rtol=0.1)
    # corrected run: residual only from the 3-sample fill transient
    assert abs(com_on[-1]) < 0.2 * abs(com_off[-1]), (com_on[-1],
                                                      com_off[-1])
    # and its residual ACCELERATION (quadratic coefficient) collapses
    tt = (np.arange(nstep) + 1) * dt
    a_off = 2.0 * np.polyfit(tt, com_off, 2)[0]
    a_on = 2.0 * np.polyfit(tt[5:], com_on[5:], 2)[0]
    np.testing.assert_allclose(a_off, gx, rtol=0.1)
    assert abs(a_on) < 0.05 * gx, (a_on, gx)
