"""Unit tests for special-function ops against SciPy."""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy.special import lpmv

from exp_tpu.ops.special import legendre_lm, dlegendre_lm, sincos_m, real_ylm_norm


@pytest.mark.parametrize("lmax", [0, 1, 4, 8])
def test_legendre_matches_scipy(lmax):
    xs = np.linspace(-0.999, 0.999, 17)
    P = np.asarray(legendre_lm(lmax, jnp.asarray(xs, dtype=jnp.float64)))
    for l in range(lmax + 1):
        for m in range(l + 1):
            ref = lpmv(m, l, xs)
            np.testing.assert_allclose(P[:, l, m], ref, rtol=1e-12, atol=1e-12)


def test_dlegendre_matches_scipy():
    lmax = 6
    xs = np.linspace(-0.95, 0.95, 11)
    P, dP = dlegendre_lm(lmax, jnp.asarray(xs, dtype=jnp.float64))
    P, dP = np.asarray(P), np.asarray(dP)
    eps = 1e-6
    for l in range(lmax + 1):
        for m in range(l + 1):
            dref = (lpmv(m, l, xs + eps) - lpmv(m, l, xs - eps)) / (2 * eps)
            np.testing.assert_allclose(dP[:, l, m], dref, rtol=1e-6, atol=1e-6)


def test_sincos():
    phis = np.linspace(-np.pi, np.pi, 9)
    c, s = sincos_m(5, jnp.asarray(phis, dtype=jnp.float64))
    for m in range(6):
        np.testing.assert_allclose(np.asarray(c)[:, m], np.cos(m * phis), atol=1e-14)
        np.testing.assert_allclose(np.asarray(s)[:, m], np.sin(m * phis), atol=1e-14)


def test_real_ylm_orthonormal():
    """int |fac_lm P_lm trig|^2 dOmega = 1 via quadrature."""
    lmax = 3
    fac = np.asarray(real_ylm_norm(lmax))
    # Gauss-Legendre in cos(theta), trapezoid in phi
    xq, wq = np.polynomial.legendre.leggauss(64)
    nphi = 128
    phi = np.linspace(0, 2 * np.pi, nphi, endpoint=False)
    dphi = 2 * np.pi / nphi
    P = np.asarray(legendre_lm(lmax, jnp.asarray(xq, dtype=jnp.float64)))
    for l in range(lmax + 1):
        for m in range(l + 1):
            trig = np.cos(m * phi)
            y2 = (fac[l, m] * P[:, l, m])[:, None] ** 2 * trig[None, :] ** 2
            val = np.sum(y2 * wq[:, None]) * dphi
            assert val == pytest.approx(1.0, rel=1e-10)


def test_qdht_gaussian_pair():
    """QDHT: the zero-order Hankel transform of exp(-r^2/2) is its own
    transform, the matrix is orthogonal, and forward/backward round-trips
    (exputil/QDHT.cc)."""
    from exp_tpu.ops.transforms import QDHT

    q = QDHT(0, 128, 12.0)
    assert q.check() < 1e-8
    f = np.exp(-q.r ** 2 / 2)
    F = q(f)
    assert np.abs(F - np.exp(-q.k ** 2 / 2)).max() < 1e-12
    assert np.abs(q(F, forward=False) - f).max() < 1e-12
    assert abs(q.interp(1.3, F) - np.exp(-1.3 ** 2 / 2)) < 1e-12


def test_transform_fft_power_peak():
    from exp_tpu.ops.transforms import TransformFFT

    t = TransformFFT(0.1, np.cos(2 * np.pi * 1.5 * np.arange(256) * 0.1))
    fr, P = t.power()
    assert abs(fr[P.argmax()] / (2 * np.pi) - 1.5) < 0.05
    fr2, W = t.inverse()
    assert W.shape == fr2.shape


def test_lerp_and_deriv3_first_cell():
    """The fused value+derivative lookup INTERPOLATES in the first grid
    cell (idx is clipped to 1 there, making the offset negative — a
    one-sided lerp would extrapolate backwards past table[0])."""
    import jax.numpy as jnp
    from exp_tpu.ops.interp import lerp_and_deriv3, lerp_uniform

    tab = (jnp.arange(11.0) ** 2)[:, None]          # f(x) = x^2 on 0..10
    xq = jnp.asarray([0.0, 0.25, 0.5, 0.99, 1.5, 9.5])
    val, der = lerp_and_deriv3(tab, xq, 0.0, 1.0)
    want = lerp_uniform(tab, xq, 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(val), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # derivative from the 3-point stencil: exact for a parabola
    np.testing.assert_allclose(np.asarray(der)[:, 0], 2.0 * np.asarray(xq),
                               rtol=1e-5, atol=1e-5)
