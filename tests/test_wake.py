"""BiorthWake analogue: band-limited wake reconstruction and multipole
orientation (exputil/biorth_wake.cc, biorth_wake_orientation.cc)."""

import math

import numpy as np
import pytest

from exp_tpu.analysis.wake import BiorthWake, lband, wigner_d
from exp_tpu.basis.analytic import make_analytic_force


def test_wigner_d_l1_closed_form():
    """Standard d^1 closed form, written in this module's ascending
    (m' = -1, 0, +1) index order."""
    b = 0.7
    d1 = wigner_d(1, b)
    s2 = math.sin(b) / math.sqrt(2.0)
    expect = np.array([
        [math.cos(b / 2) ** 2, s2, math.sin(b / 2) ** 2],
        [-s2, math.cos(b), s2],
        [math.sin(b / 2) ** 2, -s2, math.cos(b / 2) ** 2]])
    assert np.abs(d1 - expect).max() < 1e-14


def test_wigner_d_orthogonal():
    for l in (2, 3, 5):
        d = wigner_d(l, 1.1)
        assert np.abs(d @ d.T - np.eye(2 * l + 1)).max() < 1e-12


def test_wake_band_split():
    """monopole + wake (L1=1..lmax) reproduces the full field."""
    import jax.numpy as jnp

    force = make_analytic_force("CBsphere", lmax=3, nmax=4)
    w = BiorthWake(force)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 0.3, (5000, 3))
    mass = np.full(len(x), 1.0 / len(x))
    coef = w.accumulate(x, mass)
    pts = rng.normal(0, 0.4, (64, 3))
    d0, dw, p0, pw = w.reconstruct(coef, pts, L1=1)
    full_d = np.asarray(force.density(jnp.asarray(np.array(coef)),
                                      jnp.asarray(pts)))
    _, full_p = force.acceleration(jnp.asarray(np.array(coef)),
                                   jnp.asarray(pts))
    scale_d = np.abs(full_d).max()
    assert np.abs(d0 + dw - full_d).max() < 1e-5 * scale_d
    assert np.abs(p0 + pw - np.asarray(full_p)).max() < 1e-5 * np.abs(
        np.asarray(full_p)).max()
    # band selection really zeroes the band
    c_hi = lband(coef, 2, 3)
    assert np.asarray(c_hi)[:, :2].max() == 0.0


def test_orientation_recovers_tilt():
    """A pure (2,0) multipole tilted by beta: the orientation solver
    recovers theta = beta with cost -> -1 (normalized alignment)."""
    force = make_analytic_force("CBsphere", lmax=2, nmax=2)
    w = BiorthWake(force)
    beta = 0.6
    d2 = wigner_d(2, beta)
    coef = np.zeros((2, 3, 3, 2))
    fac1 = math.sqrt((0.5 * 2 + 0.25) / math.pi)
    for m in range(3):
        amp = d2[2 + m, 2]
        if m == 0:
            coef[0, 2, 0, 0] = amp / fac1
        else:
            fac2 = fac1 * math.sqrt(
                math.exp(math.lgamma(2 - m + 1) - math.lgamma(2 + m + 1)))
            coef[0, 2, m, 0] = amp / fac2
    o = w.orientation(coef, 2, 0)
    th = o["theta"][0] % np.pi
    th = min(th, np.pi - th)
    assert th == pytest.approx(beta, abs=1e-5)
    assert o["cost"][0] == pytest.approx(-1.0, abs=1e-6)
