"""SphericalOrbit actions/frequencies (Kepler closure gate) and
Osipkov-Merritt anisotropic sampling."""

import numpy as np
import pytest

from exp_tpu.basis.model import SphericalModelTable, hernquist_model
from exp_tpu.analysis.orbit import SphericalOrbit
from exp_tpu.ic.eddington import sample_spherical_model


def kepler_model(M=1.0):
    r = np.geomspace(1e-4, 1e3, 4000)
    return SphericalModelTable(r, np.zeros_like(r) + 1e-12,
                               np.full_like(r, M), -M / r)


def test_kepler_orbit():
    """Kepler: Omega_r == Omega_phi (closed ellipses), Jr + J = M/sqrt(-2E),
    Tr = 2 pi a^(3/2)."""
    m = kepler_model()
    E = -0.5
    for kappa in (0.3, 0.7, 0.95):
        o = SphericalOrbit(m, E, kappa=kappa)
        wr, wp = o.frequencies()
        assert wr == pytest.approx(wp, rel=1e-4)
        Jr, J = o.actions()
        assert Jr + J == pytest.approx(1.0 / np.sqrt(-2 * E), rel=1e-4)
        a = -0.5 / E
        assert o.Tr == pytest.approx(2 * np.pi * a ** 1.5, rel=1e-4)
        # apsidal angle pi for Kepler
        assert o.dphi == pytest.approx(np.pi, rel=1e-4)


def test_hernquist_orbit_sane():
    m = hernquist_model(rmin=1e-4, rmax=100.0, numr=3000)
    o = SphericalOrbit(m, E=-0.3, kappa=0.6)
    assert 0 < o.peri < o.apo
    wr, wp = o.frequencies()
    # spherical potentials: pi/2 <= apsidal angle <= pi
    assert np.pi / 2 - 0.01 <= o.dphi <= np.pi + 0.01
    assert o.resonance(1, -2) == pytest.approx(wr - 2 * wp)


def test_osipkov_merritt_anisotropy():
    """beta(r) = r^2/(r^2+ra^2): tangential dispersion suppressed outside
    ra relative to the isotropic model."""
    m = hernquist_model(rmin=1e-4, rmax=20.0, numr=1000)
    ra = 1.0
    x, v, mass = sample_spherical_model(m, 40000, seed=2, ra=ra,
                                        zero_com=False)
    r = np.linalg.norm(x, axis=1)
    rhat = x / r[:, None]
    vr = (v * rhat).sum(1)
    vt2 = (v ** 2).sum(1) - vr ** 2
    for rlo, rhi in ((2.0, 4.0), (4.0, 8.0)):
        sel = (r > rlo) & (r < rhi)
        beta = 1.0 - 0.5 * vt2[sel].mean() / (vr[sel] ** 2).mean()
        rc = np.sqrt(rlo * rhi)
        expect = rc ** 2 / (rc ** 2 + ra ** 2)
        assert beta == pytest.approx(expect, abs=0.12), (rc, beta, expect)

    # isotropic control: beta ~ 0
    xi, vi, _ = sample_spherical_model(m, 40000, seed=3, zero_com=False)
    ri = np.linalg.norm(xi, axis=1)
    rhat = xi / ri[:, None]
    vri = (vi * rhat).sum(1)
    vti2 = (vi ** 2).sum(1) - vri ** 2
    sel = (ri > 2) & (ri < 8)
    beta0 = 1.0 - 0.5 * vti2[sel].mean() / (vri[sel] ** 2).mean()
    assert abs(beta0) < 0.08


def test_angle_grid_consistency():
    """compute_angles: w1 reaches pi at apocenter, the relative azimuthal
    phase f vanishes at both turning points, and w1 is monotone
    (orbit_trans.cc:362-520)."""
    m = hernquist_model(rmin=1e-4, rmax=50.0, numr=2000)
    o = SphericalOrbit(m, E=-0.35, kappa=0.5)
    g = o.compute_angles()
    assert g["w1"][0] == pytest.approx(0.0, abs=1e-12)
    assert g["w1"][-1] == pytest.approx(np.pi, abs=1e-6)
    assert g["f"][0] == pytest.approx(0.0, abs=1e-8)
    assert g["f"][-1] == pytest.approx(0.0, abs=1e-6)
    assert (np.diff(g["w1"]) > 0).all()
    # get_angle round trips: r at time Tr/2 is the apocenter
    assert o.get_angle("r", o.Tr / 2) == pytest.approx(o.apo, rel=1e-5)
    assert o.get_angle("r", 0.0) == pytest.approx(o.peri, rel=1e-5)
    # get_w1 inverse on both branches
    rmid = 0.5 * (o.peri + o.apo)
    w_up = o.get_w1(rmid, +1.0)
    w_dn = o.get_w1(rmid, -1.0)
    assert 0 < w_up < np.pi
    assert w_dn == pytest.approx(2 * np.pi - w_up, rel=1e-12)


def test_pot_trans_orbit_average():
    """pot_trans(0, 0, V) is the orbit average of V: unity for V=1 and the
    time-averaged radius for V=r (orbit_trans.cc:761-795)."""
    m = hernquist_model(rmin=1e-4, rmax=50.0, numr=2000)
    o = SphericalOrbit(m, E=-0.35, kappa=0.5)
    assert o.pot_trans(0, 0, np.ones_like) == pytest.approx(1.0, abs=1e-5)
    wr = o.pot_trans(0, 0, lambda r: r)
    assert o.peri < wr < o.apo
    # vectorized multi-channel form
    wv = o.pot_trans(2, -1, lambda r: np.stack([r, r * r], -1))
    assert wv.shape == (2,)
    # near-circular collapse: l1 != 0 components vanish
    oc = SphericalOrbit(m, E=-0.35, kappa=0.9999)
    assert oc.pot_trans(1, 2, lambda r: r) == pytest.approx(0.0)
    assert oc.pot_trans(0, 2, lambda r: r) == pytest.approx(
        oc.rcirc(oc.E), rel=1e-3)


def test_find_orb_roundtrip():
    """find_orb inverts (peri, apo) back to (E, kappa) (FindOrb.cc)."""
    from exp_tpu.analysis.orbit import find_orb

    m = hernquist_model(rmin=1e-4, rmax=50.0, numr=2000)
    o = SphericalOrbit(m, E=-0.35, kappa=0.5)
    res = find_orb(m, o.peri, o.apo)
    assert res["energy"] == pytest.approx(-0.35, abs=1e-6)
    assert res["kappa"] == pytest.approx(0.5, abs=1e-6)
    assert res["radial_period"] == pytest.approx(o.Tr, rel=1e-6)


def test_circular_orbit_epicyclic_limit():
    """kappa = 1 (circular): frequencies come from the epicyclic limit
    instead of a 0/0 turning-point quadrature (FindOrb circular limit)."""
    m = hernquist_model(rmin=1e-4, rmax=100.0, numr=3000)
    o = SphericalOrbit(m, E=-0.3, kappa=1.0)
    assert o.peri == pytest.approx(o.apo)
    wr, wp = o.frequencies()
    assert np.isfinite(wr) and np.isfinite(wp) and wr > 0 and wp > 0
    # epicyclic consistency against a nearly-circular orbit
    o2 = SphericalOrbit(m, E=-0.3, kappa=0.999)
    wr2, wp2 = o2.frequencies()
    assert wr == pytest.approx(wr2, rel=0.05)
    assert wp == pytest.approx(wp2, rel=0.05)
    # spherical potentials: kappa_epi between Omega and 2 Omega
    assert wp < wr < 2.0 * wp + 1e-12
