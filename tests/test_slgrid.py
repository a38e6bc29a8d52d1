"""SL basis construction: biorthogonality and Poisson-pair checks.

Mirrors the reference's in-code orthoTest self-check (exputil/orthoTest.cc)
and adds a direct Poisson check the reference lacks.
"""

import numpy as np
import pytest

from exp_tpu.basis.model import hernquist_model, plummer_model
from exp_tpu.basis.slgrid import (build_sph_sl_tables, biorthogonality_matrix,
                                  SphSLTables)


@pytest.fixture(scope="module")
def hern_tables():
    m = hernquist_model(rmin=1e-4, rmax=20.0)
    return build_sph_sl_tables(m, lmax=4, nmax=10, numr=2000, cmap=1, rmap=1.0)


def test_biorthogonality(hern_tables):
    for l in range(hern_tables.lmax + 1):
        B = biorthogonality_matrix(hern_tables, l)
        np.testing.assert_allclose(B, -np.eye(hern_tables.nmax), atol=5e-5)


def test_poisson_pair(hern_tables):
    """laplacian_l(pot_ln) == dens_ln (the defining property of the pair)."""
    t = hern_tables
    r = t.r
    for l in (0, 2):
        for n in (0, 3):
            pot = t.pot_table[:, l, n]
            dens = t.dens_table[:, l, n]
            # numerical radial Laplacian on the (non-uniform) r grid
            dp = np.gradient(pot, r)
            lap = np.gradient(r**2 * dp, r) / r**2 - l * (l + 1) / r**2 * pot
            # compare away from the boundaries
            sl = slice(50, -50)
            resid = lap[sl] - dens[sl]
            scale = np.max(np.abs(dens[sl]))
            assert np.max(np.abs(resid)) / scale < 2e-2


def test_lowest_mode_is_background(hern_tables):
    """For the conditioned SL basis, ev[l=0,n=0] ~ 1 and pot_00 ~ psi."""
    t = hern_tables
    assert t.ev[0, 0] == pytest.approx(1.0, rel=2e-2)
    ratio = t.pot_table[:, 0, 0] / t.p0
    # should be nearly constant over the grid interior
    inner = ratio[100:-100]
    assert np.std(inner) / np.abs(np.mean(inner)) < 5e-2


def test_eigenvalues_positive_increasing(hern_tables):
    t = hern_tables
    for l in range(t.lmax + 1):
        assert np.all(t.ev[l] > 0)
        assert np.all(np.diff(t.ev[l]) > 0)


def test_cache_roundtrip(tmp_path, hern_tables):
    p = tmp_path / "sl.cache.h5"
    hern_tables.write_cache(p)
    t2 = SphSLTables.read_cache(p)
    np.testing.assert_array_equal(t2.ef, hern_tables.ef)
    np.testing.assert_array_equal(t2.ev, hern_tables.ev)
    assert t2.model_key == hern_tables.model_key

    # build_sph_sl_tables should hit the cache (same fingerprint)
    m = hernquist_model(rmin=1e-4, rmax=20.0)
    t3 = build_sph_sl_tables(m, lmax=4, nmax=10, numr=2000, cmap=1, rmap=1.0,
                             cachename=str(p))
    np.testing.assert_array_equal(t3.ef, hern_tables.ef)


def test_plummer_model_consistency():
    m = plummer_model()
    r = np.geomspace(1e-3, 50, 200)
    # M(r) from rho by quadrature matches table
    from scipy.integrate import quad
    M5 = 4 * np.pi * quad(lambda s: s**2 * float(m.get_density(s)), 0, 5.0)[0]
    assert M5 == pytest.approx(float(m.get_mass(5.0)), rel=1e-3)
    # dPhi/dr == M/r^2
    np.testing.assert_allclose(m.get_dpot(r), m.get_mass(r) / r**2, rtol=1e-12)


def test_king_model_physics():
    """King model: self-consistent table, samplable, virialized sample."""
    from exp_tpu.basis.model import king_model
    from exp_tpu.ic.eddington import sample_spherical_model

    m = king_model(W0=5.0, M=1.0, rt=1.0)
    assert abs(m.total_mass - 1.0) < 1e-10
    assert abs(m.rmax - 1.0) < 1e-5
    # mass/density consistency
    integ = 4 * np.pi * m.rho * m.r ** 2
    dm = 0.5 * (integ[1:] + integ[:-1]) * np.diff(m.r)
    np.testing.assert_allclose(np.cumsum(dm)[-1], m.total_mass, atol=1e-10)
    # dPhi/dr = M/r^2 mid-profile
    i = len(m.r) // 2
    dphi = (m.pot[i + 1] - m.pot[i - 1]) / (m.r[i + 1] - m.r[i - 1])
    np.testing.assert_allclose(dphi, m.mass[i] / m.r[i] ** 2, rtol=1e-6)
    # Eddington sampling gives a bound, roughly virialized realization
    x, v, mass = sample_spherical_model(m, 20000, seed=13)
    ke = 0.5 * np.sum(mass * np.sum(v * v, axis=1))
    r = np.linalg.norm(x, axis=1)
    W = -np.sum(mass * np.interp(r, m.r, m.mass) / r)
    assert 0.9 < 2 * ke / abs(W) < 1.1        # virial 2T/|W| = 1
