"""Triaxial EllipsoidForce (ic/ellipsoid.py) — exact homoeoid potential
(utils/ICs/EllipsoidForce.cc analogue) + the UserEllipsoid external bar."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from exp_tpu.ic.ellipsoid import EllipsoidForce


def test_homogeneous_sphere_limit():
    """powerlaw p=0 with equal axes is the homogeneous sphere:
    Phi = -M(3a^2-r^2)/(2a^3) inside, -M/r outside."""
    M, a = 2.0, 1.0
    e = EllipsoidForce(a=(a, a, a), mass=M, bartype="powerlaw", param=0.0)
    r = np.array([0.0, 0.3, 0.7, 0.999])
    pts = np.stack([r, 0 * r, 0 * r], 1)
    got = np.asarray(e.potential(jnp.asarray(pts)))
    expect = -M * (3 * a * a - r * r) / (2 * a ** 3)
    np.testing.assert_allclose(got, expect, rtol=2e-4)
    pts_out = np.array([[1.5, 0.5, 0.2], [0, 0, 4.0]])
    got = np.asarray(e.potential(jnp.asarray(pts_out)))
    expect = -M / np.linalg.norm(pts_out, axis=1)
    np.testing.assert_allclose(got, expect, rtol=2e-4)


def test_ferrers_sphere_center():
    """Ferrers p=1 sphere: Phi(0) = -4 pi int rho(r) r dr."""
    M = 1.3
    e = EllipsoidForce(a=(1.0, 1.0, 1.0), mass=M, bartype="ferrers",
                       param=1.0)
    rho0 = e.rho0
    # rho = rho0 (1 - r^2): int_0^1 rho r dr = rho0 (1/2 - 1/4)
    expect = -4 * np.pi * rho0 * 0.25
    got = float(e.potential(jnp.zeros((1, 3)))[0])
    np.testing.assert_allclose(got, expect, rtol=2e-4)
    # total mass normalization (rho0 = 15 M / (8 pi) for p=1 sphere)
    np.testing.assert_allclose(rho0, 15 * M / (8 * np.pi), rtol=1e-12)


@pytest.mark.parametrize("bartype,param", [("powerlaw", 1.0),
                                           ("ferrers", 2.0),
                                           ("expon", 0.2)])
def test_triaxial_mass_and_far_field(bartype, param):
    e = EllipsoidForce(a=(0.5, 0.25, 0.125), mass=0.37, bartype=bartype,
                       param=param, num=96)
    M, inertia = e.mass_inertia()
    # the 1/m expon density integrates roughly on a product grid
    tol = 0.02 if bartype == "expon" else 2e-3
    np.testing.assert_allclose(M, 0.37, rtol=tol)
    assert inertia[0] < inertia[1] < inertia[2]   # a0 > a1 > a2
    pts = np.array([[3.0, 1.0, 0.5], [0.0, 0.0, 5.0]])
    got = np.asarray(e.potential(jnp.asarray(pts)))
    expect = -0.37 / np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(got, expect, rtol=0.01)


def test_potential_continuity_and_forces():
    e = EllipsoidForce(a=(0.5, 0.25, 0.125), mass=0.1, bartype="ferrers",
                       param=1.0)
    # continuity across the boundary along a skew ray
    d = np.array([0.6, 0.5, 0.4])
    d /= np.sqrt(np.sum(d ** 2 / np.array([0.5, 0.25, 0.125]) ** 2))
    eps = 1e-4
    pin = (1 - eps) * d
    pout = (1 + eps) * d
    pi_, po_ = np.asarray(e.potential(jnp.asarray([pin, pout])))
    assert abs(pi_ - po_) < 5e-4 * abs(pi_)
    # autodiff force matches central differences (inside and outside)
    for p in (0.5 * d, 1.7 * d):
        acc, _ = e.acceleration(jnp.asarray([p]))
        acc = np.asarray(acc)[0]
        h = 1e-4
        num = np.zeros(3)
        for k in range(3):
            dp = np.zeros(3)
            dp[k] = h
            fp = float(e.potential(jnp.asarray([p + dp]))[0])
            fm = float(e.potential(jnp.asarray([p - dp]))[0])
            num[k] = -(fp - fm) / (2 * h)
        np.testing.assert_allclose(acc, num, rtol=5e-3, atol=1e-8)
        assert np.isfinite(acc).all()


def test_monopole_quadrupole_tables():
    e = EllipsoidForce(a=(0.5, 0.25, 0.125), mass=0.1, bartype="ferrers",
                       param=1.0)
    r, rhobar, u22 = e.monopole_quadrupole(numr=60)
    # rhobar integrates back to the total mass
    M = np.trapezoid(4 * np.pi * rhobar * r * r, r)
    np.testing.assert_allclose(M, 0.1, rtol=0.02)
    # bar quadrupole: negative U22 (potential deeper along the major
    # axis at phi=0), vanishing at the center and far field
    assert u22.min() < 0 and abs(u22[0]) < abs(u22).max() * 0.2
    assert abs(u22[-1]) < abs(u22).max() * 0.6


def test_user_ellipsoid_external():
    from exp_tpu.forces.external import UserEllipsoid, build_external

    ue = UserEllipsoid(a=(0.5, 0.25, 0.125), mass=0.1, omega=2.0,
                       Ton=-1e9)
    x = jnp.asarray([[0.4, 0.0, 0.0]])
    # pattern rotation: after a quarter turn the major axis lies along y
    p0 = float(ue.potential(x, 0.0)[0])
    p_quarter = float(ue.potential(x, (np.pi / 2) / 2.0)[0])
    py0 = float(ue.potential(jnp.asarray([[0.0, 0.4, 0.0]]), 0.0)[0])
    np.testing.assert_allclose(p_quarter, py0, rtol=1e-5)
    assert p0 < p_quarter      # deeper along the instantaneous major axis
    acc, pot = ue.acceleration(x, 0.0)
    assert np.isfinite(np.asarray(acc)).all()
    # registry id
    f = build_external({"id": "userellipsoid",
                        "parameters": {"mass": 0.1, "omega": 2.0}})
    assert isinstance(f, UserEllipsoid)


def test_user_ellipsoid_in_simulation(tmp_path):
    """The rotating ellipsoid bar drives a live run through the YAML
    External stanza: the bisection+Newton lambda solve and the autodiff
    force trace inside the jitted KDK step."""
    import yaml

    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.config import RunConfig
    from exp_tpu.ic.eddington import sample_spherical_model
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation

    m = hernquist_model(rmin=1e-3, rmax=20.0)
    x, v, mass = sample_spherical_model(m, 1200, seed=9)
    bods = str(tmp_path / "h.bods")
    write_ascii_bodies(bods, (x, v, mass))
    conf = {
        "Global": {"dtime": 0.02, "nsteps": 3, "runtag": "ebar",
                   "outdir": str(tmp_path)},
        "Components": [{"name": "halo", "bodyfile": bods,
                        "force": {"id": "sphereSL",
                                  "parameters": {"lmax": 1, "nmax": 4,
                                                 "modelname":
                                                 "hernquist"}}}],
        "External": [{"id": "userellipsoid",
                      "parameters": {"a": [0.5, 0.25, 0.125],
                                     "mass": 0.2, "omega": 1.0,
                                     "Ton": -1e9}}],
        "Output": [{"id": "outlog", "parameters": {"nint": 1}}],
    }
    cfg = str(tmp_path / "run.yml")
    with open(cfg, "w") as fh:
        yaml.safe_dump(conf, fh)
    sim = Simulation(RunConfig.from_file(cfg), workdir=str(tmp_path))
    sim.run()
    import glob

    logs = glob.glob(str(tmp_path / "*.outlog")) + \
        glob.glob(str(tmp_path / "OUTLOG*"))
    assert logs, "outlog written"
    txt = open(logs[0]).read()
    assert "nan" not in txt.lower().split("#")[-1]
