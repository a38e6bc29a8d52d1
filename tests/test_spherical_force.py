"""Physics tests for the SphereSL force: monopole recovery, autodiff
consistency of the acceleration, psum sharding equivalence."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from exp_tpu.basis.model import hernquist_model
from exp_tpu.basis.slgrid import build_sph_sl_tables
from exp_tpu.forces.spherical import SphereSL
from exp_tpu.ic.eddington import sample_spherical_model


@pytest.fixture(scope="module")
def setup():
    m = hernquist_model(rmin=1e-4, rmax=20.0)
    t = build_sph_sl_tables(m, lmax=4, nmax=10, numr=2000, cmap=1, rmap=1.0)
    force = SphereSL.from_tables(t, dtype=jnp.float64)
    x, v, mass = sample_spherical_model(m, 20000, seed=42)
    return m, t, force, jnp.asarray(x), jnp.asarray(mass)


def test_monopole_potential_recovery(setup):
    """Expansion of an equilibrium sample reproduces the model potential."""
    m, t, force, x, mass = setup
    coef = force.coefficients(x, mass, accum_dtype=jnp.float64)

    # l=0 coefficients dominate
    c = np.asarray(coef)
    power = np.einsum("clmn->l", c[..., :]**2)
    assert power[0] > 50 * power[1:].sum()

    # potential at test radii vs model
    rt = np.array([0.1, 0.3, 1.0, 3.0, 8.0])
    pts = jnp.asarray(np.stack([rt, np.zeros_like(rt), np.zeros_like(rt)], -1))
    _, pot = force.acceleration(coef, pts)
    expected = m.get_pot(rt)
    np.testing.assert_allclose(np.asarray(pot), expected, rtol=0.03)


def test_acceleration_matches_autodiff(setup):
    """Analytic force assembly == -grad(potential) via jax autodiff.

    Uses deriv='lerp' (the exact derivative of the interpolant) so the
    comparison isolates the angular/Cartesian assembly — any sign or factor
    error in the potr/pott/potp formulas would show at machine precision.
    """
    _, _, force, x, mass = setup
    coef = force.coefficients(x, mass, accum_dtype=jnp.float64)

    pts = jnp.asarray(np.array([[0.3, 0.1, -0.2],
                                [1.0, -0.5, 0.7],
                                [0.05, 0.02, 0.01],
                                [-2.0, 1.0, 3.0]]))
    acc, pot = force.acceleration(coef, pts, deriv="lerp")

    def pot_at(p):
        _, ph = force.acceleration(coef, p[None], deriv="lerp")
        return ph[0]

    g = jax.vmap(jax.grad(pot_at))(pts)
    np.testing.assert_allclose(np.asarray(acc), -np.asarray(g),
                               rtol=1e-9, atol=1e-12)

    # the production 3-point stencil should agree to table resolution
    acc3, _ = force.acceleration(coef, pts)
    np.testing.assert_allclose(np.asarray(acc3), np.asarray(acc),
                               rtol=2e-3, atol=1e-6)


def test_outside_rmax_keplerian(setup):
    """Beyond rmax the monopole term falls off as M/r^2."""
    m, _, force, x, mass = setup
    coef = force.coefficients(x, mass, accum_dtype=jnp.float64)
    r_out = 30.0   # > rmax = 20
    pts = jnp.asarray([[r_out, 0.0, 0.0]])
    acc, pot = force.acceleration(coef, pts)
    M = float(jnp.sum(mass))
    assert float(pot[0]) == pytest.approx(-M / r_out, rel=0.02)
    assert float(acc[0, 0]) == pytest.approx(-M / r_out**2, rel=0.02)


def test_scaled_boundary_continuity(setup):
    """With scale != 1 the radial force is continuous and conservative
    across the table boundary r = rmax*scale (regression: the outside
    vacuum-continuation derivative used physical r where a scaled radius
    was required, halving the exterior force at scale=2)."""
    m, t, _, x, mass = setup
    scale = 2.0
    for backend in ("matmul", "pallas"):
        dtype = jnp.float64 if backend == "matmul" else jnp.float32
        f = SphereSL.from_tables(t, scale=scale, dtype=dtype,
                                 backend=backend, numr_c=512)
        coef = f.coefficients(x.astype(dtype) * scale, mass.astype(dtype),
                              accum_dtype=jnp.float64).astype(dtype)
        rb = t.rmax * scale
        pts = jnp.asarray([[rb * (1 - 1e-4), 0.0, 0.0],
                           [rb * (1 + 1e-4), 0.0, 0.0],
                           [rb * 1.5, 0.0, 0.0]], dtype=dtype)
        acc, pot = f.acceleration(coef, pts)
        ax = np.asarray(acc[:, 0])
        # continuity across the boundary
        assert abs(ax[1] - ax[0]) / abs(ax[0]) < 5e-3
        # exterior force is Keplerian: M_total / r^2
        M = float(jnp.sum(mass))
        r_out = rb * 1.5
        assert ax[2] == pytest.approx(-M / r_out**2, rel=0.02)
        # conservative: -dPhi/dr == a_r numerically outside
        r1, r2 = rb * 1.4, rb * 1.6
        p2 = jnp.asarray([[r1, 0, 0], [r2, 0, 0]], dtype=dtype)
        _, pots = f.acceleration(coef, p2)
        dphidr = float(pots[1] - pots[0]) / (r2 - r1)
        assert ax[2] == pytest.approx(-dphidr, rel=0.02)


def test_density_recovery(setup):
    m, _, force, x, mass = setup
    coef = force.coefficients(x, mass, accum_dtype=jnp.float64)
    rt = np.array([0.2, 0.5, 1.0, 2.0])
    pts = jnp.asarray(np.stack([rt, np.zeros_like(rt), np.zeros_like(rt)], -1))
    dens = np.asarray(force.density(coef, pts))
    expected = m.get_density(rt)
    # BFE density converges much slower than potential at fixed nmax —
    # 25-35% pointwise wiggles at nmax=10 are physical truncation error.
    np.testing.assert_allclose(dens, expected, rtol=0.35)


def test_sharded_psum_equivalence(setup):
    """Coefficients from an 8-device shard_map == single-device result."""
    from jax.sharding import Mesh, PartitionSpec as P
    from exp_tpu.nbody.step import shard_map

    _, _, force, x, mass = setup
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest should provide 8 virtual CPU devices"

    ref = force.coefficients(x, mass, accum_dtype=jnp.float64)

    mesh = Mesh(np.array(jax.devices()), ("p",))

    def body(xs, ms):
        return force.coefficients(xs, ms, axis_name="p",
                                  accum_dtype=jnp.float64)

    fn = jax.jit(shard_map(body, mesh, (P("p", None), P("p")), P()))
    # pad to multiple of 8
    n = x.shape[0]
    npad = (-n) % n_dev
    xp = jnp.concatenate([x, jnp.zeros((npad, 3), x.dtype)])
    mp = jnp.concatenate([mass, jnp.zeros((npad,), mass.dtype)])
    out = fn(xp, mp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_backend_equivalence(setup):
    """'matmul' (hat-weight MXU path) == 'gather' (reference table path)
    within coarse-grid interpolation error."""
    m, t, _, x, mass = setup
    fg = SphereSL.from_tables(t, dtype=jnp.float64, backend="gather")
    fm = SphereSL.from_tables(t, dtype=jnp.float64, backend="matmul",
                              numr_c=512, chunk=4096)
    cg = fg.coefficients(x, mass, accum_dtype=jnp.float64)
    cm = fm.coefficients(x, mass, accum_dtype=jnp.float64)
    scale = float(jnp.abs(cg).max())
    assert float(jnp.abs(cg - cm).max()) / scale < 5e-5

    pts = x[:200]
    ag, pg = fg.acceleration(cg, pts)
    am, pm = fm.acceleration(cg, pts)
    np.testing.assert_allclose(np.asarray(am), np.asarray(ag),
                               rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(pg),
                               rtol=1e-4, atol=1e-8)

    # chunking must not change results at all
    fm2 = SphereSL.from_tables(t, dtype=jnp.float64, backend="matmul",
                               numr_c=512, chunk=10**9)
    cm2 = fm2.coefficients(x, mass, accum_dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(cm2), np.asarray(cm))


def test_pallas_backend_equivalence(setup):
    """backend='pallas' interp='hat' (interpret mode on CPU) == 'matmul'
    backend (identical hat math)."""
    m, t, _, x, mass = setup
    x32 = x.astype(jnp.float32)
    m32 = mass.astype(jnp.float32)
    fm = SphereSL.from_tables(t, dtype=jnp.float32, backend="matmul",
                              numr_c=256)
    fp = SphereSL.from_tables(t, dtype=jnp.float32, backend="pallas",
                              numr_c=256, pallas_interp="hat")
    # small N exercises the padding path too
    xs, ms = x32[:1500], m32[:1500]
    cm = fm.coefficients(xs, ms)
    cp = fp.coefficients(xs, ms)
    scale = float(jnp.abs(cm).max())
    assert float(jnp.abs(cp - cm).max()) / scale < 5e-5

    pts = xs[:300]
    am, pm = fm.acceleration(cm, pts)
    ap, pp = fp.acceleration(cm, pts)
    np.testing.assert_allclose(np.asarray(ap), np.asarray(am),
                               rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(pm),
                               rtol=1e-4, atol=1e-6)


def test_pallas_poly_matches_recurrence(setup):
    """pallas_harmonics='poly' (solid-harmonic monomial matmuls) matches
    'recurrence' (Legendre/dP/trig row loops) on both passes — same radial
    interpolation, only the angular evaluation differs."""
    m, t, _, x, mass = setup
    x32, m32 = x.astype(jnp.float32), mass.astype(jnp.float32)
    fr = SphereSL.from_tables(t, dtype=jnp.float32, backend="pallas",
                              pallas_harmonics="recurrence")
    fp = SphereSL.from_tables(t, dtype=jnp.float32, backend="pallas",
                              pallas_harmonics="poly")
    assert fr._harmonics_eff("accel") == "recurrence"
    assert fp._harmonics_eff("accel") == "poly"

    xs, ms = x32[:2048], m32[:2048]
    cr = fr.coefficients(xs, ms)
    cp = fp.coefficients(xs, ms)
    scale = float(jnp.abs(cr).max())
    assert float(jnp.abs(cp - cr).max()) / scale < 5e-5

    pts = xs[:300]
    ar, pr_ = fr.acceleration(cr, pts)
    ap, pp_ = fp.acceleration(cr, pts)
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ar),
                               rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pp_), np.asarray(pr_),
                               rtol=1e-4, atol=1e-6)

    # the auto default: poly coefficients at low l (measured faster),
    # recurrence force pass; recurrence everywhere above the f32 cutoff
    fauto = SphereSL.from_tables(t, backend="pallas")
    assert fauto._harmonics_eff("coef") == "poly"
    assert fauto._harmonics_eff("accel") == "recurrence"


def test_pallas_poly_lmax0_and_custom_fac(setup):
    """Monopole-only (Lmax=0) configs run through the poly coefficient
    path, and a custom real-Ylm normalization `fac` is honored by BOTH
    harmonics paths (the kernel cache must not alias on fac)."""
    import dataclasses

    m, _, _, x, mass = setup
    from exp_tpu.basis.slgrid import build_sph_sl_tables

    t0 = build_sph_sl_tables(m, lmax=0, nmax=6, numr=400, cmap=1, rmap=1.0)
    f0 = SphereSL.from_tables(t0, dtype=jnp.float32, backend="pallas")
    assert f0._harmonics_eff("coef") == "poly"
    xs, ms = x[:1024].astype(jnp.float32), mass[:1024].astype(jnp.float32)
    c0 = f0.coefficients(xs, ms)
    assert np.isfinite(np.asarray(c0)).all() and abs(c0[0, 0, 0, 0]) > 0

    for harm in ("poly", "recurrence"):
        f1 = SphereSL.from_tables(t0, dtype=jnp.float32, backend="pallas",
                                  pallas_harmonics=harm)
        f2 = dataclasses.replace(f1, fac=2.0 * f1.fac)
        c1 = f1.coefficients(xs, ms)
        c2 = f2.coefficients(xs, ms)
        np.testing.assert_allclose(np.asarray(c2), 2.0 * np.asarray(c1),
                                   rtol=1e-6, err_msg=harm)


def test_pallas_spline_backend_accuracy(setup):
    """backend='pallas' interp='spline' (the default; prefiltered quadratic
    B-spline at numr_cs=256 + tabulated d(pot)/dxi) tracks the exact f64
    'gather' backend at least as well as the hat path at 512 nodes — the
    O(h^3) interpolant buys accuracy AND halves the kernel work."""
    m, t, _, x, mass = setup
    fg = SphereSL.from_tables(t, dtype=jnp.float64, backend="gather")
    fs = SphereSL.from_tables(t, dtype=jnp.float32, backend="pallas")
    assert fs._interp_eff == "spline"
    x32, m32 = x.astype(jnp.float32), mass.astype(jnp.float32)
    xs, ms = x32[:2048], m32[:2048]

    cg = np.asarray(fg.coefficients(x[:2048], mass[:2048],
                                    accum_dtype=jnp.float64))
    cs = np.asarray(fs.coefficients(xs, ms))
    scale = np.abs(cg).max()
    assert np.abs(cs - cg).max() / scale < 5e-5

    pts = xs[:300]
    ag, pg = fg.acceleration(jnp.asarray(cg), x[:300])
    asp, psp = fs.acceleration(jnp.asarray(cg, jnp.float32), pts)
    np.testing.assert_allclose(np.asarray(asp), np.asarray(ag),
                               rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(psp), np.asarray(pg),
                               rtol=2e-4, atol=1e-6)


def test_pallas_mixed3_accuracy(setup):
    """pallas_precision='mixed3' (accel interpolation matmul via the
    3-pass bf16-compensated _dotNT_c3) stays within ~1e-4 of the exact
    'mixed' accel — the compensation recovers ~16 mantissa bits, unlike
    'default' whose single bf16 pass costs ~1e-3 per-particle force
    error (doc/benchmarks.md variants table)."""
    m, t, _, x, mass = setup
    f1 = SphereSL.from_tables(t, dtype=jnp.float32, backend="pallas",
                              pallas_precision="mixed")
    f3 = SphereSL.from_tables(t, dtype=jnp.float32, backend="pallas",
                              pallas_precision="mixed3")
    x32, m32 = x.astype(jnp.float32)[:4096], mass.astype(jnp.float32)[:4096]
    c = f1.coefficients(x32, m32)
    a1, p1 = f1.acceleration(c, x32)
    a3, p3 = f3.acceleration(c, x32)
    a1, a3 = np.asarray(a1), np.asarray(a3)
    err = (np.abs(a3 - a1).max(1)
           / np.maximum(np.linalg.norm(a1, axis=1), 1e-8))
    assert err.max() < 2e-4, err.max()
    np.testing.assert_allclose(np.asarray(p3), np.asarray(p1),
                               rtol=2e-4, atol=1e-6)


def test_pallas_precision_validation(setup):
    """Unknown pallas_precision values raise instead of silently falling
    through to HIGHEST (round-4 advisor), and the unvalidated
    mixed3+poly accel combination is rejected (mixed3 has real-TPU
    coverage with the recurrence accel kernel only)."""
    m, t, _, x, mass = setup
    with pytest.raises(ValueError, match="pallas_precision"):
        SphereSL.from_tables(t, dtype=jnp.float32, backend="pallas",
                             pallas_precision="mixed-3")
    with pytest.raises(ValueError, match="recurrence"):
        SphereSL.from_tables(t, dtype=jnp.float32, backend="pallas",
                             pallas_precision="mixed3",
                             pallas_harmonics="poly")
