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
