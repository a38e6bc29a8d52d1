"""Solid-harmonic monomial matrices: exactness of values and tangential
gradients against direct spherical-harmonic evaluation."""

import math

import numpy as np
import pytest

from exp_tpu.ops.solidharm import (derivative_matrices,
                                   harmonic_and_gradient_matrices,
                                   harmonic_matrix, monomial_build_plan,
                                   monomial_exponents)


def _rows(lmax):
    from exp_tpu.ops.pallas_sphere import packed_rows
    return tuple(packed_rows(lmax))


def _fac(l, m):
    v = math.sqrt((2 * l + 1) / (4 * math.pi)
                  * math.factorial(l - m) / math.factorial(l + m))
    return v * (math.sqrt(2) if m else 1.0)


def _direct_rows(rows, u):
    from exp_tpu.ops.solidharm import _assoc_legendre
    costh = u[:, 2]
    phi = np.arctan2(u[:, 1], u[:, 0])
    P = _assoc_legendre(max(l for _, l, _ in rows), costh)
    out = np.empty((len(rows), u.shape[0]))
    for r, (cs, l, m) in enumerate(rows):
        out[r] = _fac(l, m) * P[(l, m)] * (
            np.cos(m * phi) if cs == 0 else np.sin(m * phi))
    return out


def _mono(lmax, u):
    exps = monomial_exponents(lmax)
    return np.stack([u[:, 0] ** i * u[:, 1] ** j * u[:, 2] ** k
                     for (i, j, k) in exps])


@pytest.mark.parametrize("lmax", [2, 4, 6])
def test_values_exact(lmax):
    rows = _rows(lmax)
    M = harmonic_matrix(lmax, rows)
    rng = np.random.default_rng(1)
    u = rng.normal(size=(257, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    got = M @ _mono(lmax, u)
    want = _direct_rows(rows, u)
    assert np.abs(got - want).max() < 1e-10


def test_gradient_tangential_matches_finite_difference():
    lmax = 4
    rows = _rows(lmax)
    M, Mx, My, Mz = harmonic_and_gradient_matrices(lmax, rows)
    rng = np.random.default_rng(2)
    u = rng.normal(size=(64, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)

    grad_poly = np.stack([Mx @ _mono(lmax, u), My @ _mono(lmax, u),
                          Mz @ _mono(lmax, u)])        # (3, rows, npts)
    # tangential projection (delta - u u^T)
    radial = np.einsum("jrp,pj->rp", grad_poly, u)
    tang = grad_poly - u.T[:, None, :] * radial[None]

    # finite-difference on the sphere: f(normalize(u + h e_j))
    h = 1e-6
    fd = np.empty_like(tang)
    base = _direct_rows(rows, u)
    for j in range(3):
        up = u.copy()
        up[:, j] += h
        up /= np.linalg.norm(up, axis=1, keepdims=True)
        fd[j] = (_direct_rows(rows, up) - base) / h
    assert np.abs(tang - fd).max() < 1e-4


def test_poles_are_regular():
    """At u = +-z the tangential gradient must be finite and match the
    analytic limit (the dP/dtheta recurrence needs clamping there)."""
    lmax = 4
    rows = _rows(lmax)
    M, Mx, My, Mz = harmonic_and_gradient_matrices(lmax, rows)
    for sz in (1.0, -1.0):
        u = np.array([[0.0, 0.0, sz]])
        g = np.stack([Mx @ _mono(lmax, u), My @ _mono(lmax, u),
                      Mz @ _mono(lmax, u)])
        assert np.all(np.isfinite(g))
        # m == 0 rows: gradient has no z-tangential component at the pole
        # but l=1 m=0 row fac*P10 = fac*uz has du = fac e_z (radial there)


def test_monomial_build_plan_reconstructs():
    lmax = 4
    exps = monomial_exponents(lmax)
    rng = np.random.default_rng(3)
    u = rng.normal(size=(33, 3))
    mono = np.zeros((len(exps), u.shape[0]))
    mono[0] = 1.0
    mono[1:4] = u.T
    for dst, s_mono, s_u in monomial_build_plan(lmax):
        mono[dst] = mono[s_mono] * u.T[s_u]
    want = _mono(lmax, u)
    assert np.abs(mono - want).max() < 1e-12


def test_derivative_matrices():
    lmax = 3
    exps = monomial_exponents(lmax)
    D = derivative_matrices(lmax)
    rng = np.random.default_rng(4)
    u = rng.normal(size=(17, 3))
    mono = _mono(lmax, u)
    h = 1e-7
    for j in range(3):
        up = u.copy()
        up[:, j] += h
        fd = (_mono(lmax, up) - mono) / h
        got = D[j] @ mono
        assert np.abs(got - fd).max() < 1e-4
