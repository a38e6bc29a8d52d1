"""QPDistF tests — the quadratic-programming DF inversion
(exputil/QPDistF.cc analogue in ic/qpdistf.py)."""

import numpy as np
import pytest

from exp_tpu.basis.model import hernquist_model, plummer_model
from exp_tpu.ic.qpdistf import QPDistF, sample_qp_model


@pytest.fixture(scope="module")
def hern():
    return hernquist_model(rmin=1e-3, rmax=20.0)


@pytest.fixture(scope="module")
def df(hern):
    return QPDistF(hern, egrid=14, kgrid=6, mgrid=56, nint=28)


def test_df_nonnegative(df):
    """The QP constrains x >= 0, so f >= 0 EVERYWHERE — the property
    Eddington inversion cannot guarantee."""
    assert (df.X >= 0).all()
    E = np.linspace(df.Egrid[0], df.Egrid[-1], 40)
    K = np.linspace(0.0, 1.0, 17)
    EE, KK = np.meshgrid(E, K, indexing="ij")
    assert (df.f_EK(EE, KK) >= 0).all()


def test_density_reconstruction(df, hern):
    """Velocity-space integral of the fitted DF reproduces the model
    density over the interior (the truncation edge is excluded — smooth
    kernels cannot follow the hard rmax cutoff; the reference QP has
    the same edge behavior)."""
    R = df._Rgrid
    # the kernel DF resolves the profile over the region its energy
    # knots cover well; with 14 knots that is r <~ 1.3 scale radii
    # (the outer, nearly-unbound tail sags ~25% — same finite-kernel
    # truncation the reference QP shows).  The virial gate below is
    # the global equilibrium check.
    sel = (R > R[2]) & (R < 1.3)
    ratio = df.density(R[sel]) / hern.get_density(R[sel])
    assert np.abs(ratio - 1.0).max() < 0.15, ratio


def test_jmax_circular(df, hern):
    """Jmax(E) equals the circular orbit's angular momentum: for
    E = Phi(r) + r Phi'(r)/2, Jmax = r v_c."""
    for r in (0.1, 1.0, 5.0):
        dp = float(hern.get_dpot(r))
        E = float(hern.get_pot(r)) + 0.5 * r * dp
        assert np.isclose(float(df.jmax(E)), r * np.sqrt(r * dp),
                          rtol=2e-2)


def test_sample_equilibrium(df, hern):
    """Realization from the QP DF starts in virial equilibrium."""
    # zero_com=False: the COM shift would move particles relative to
    # the potential and spoil the exact E < Emax bound checked below
    x, v, mass = sample_qp_model(hern, 8192, seed=3, df=df,
                                 zero_com=False)
    r = np.linalg.norm(x, axis=1)
    T = 0.5 * np.sum(mass * np.sum(v * v, 1))
    VC = np.sum(mass * r * hern.get_dpot(r))
    assert abs(2 * T / VC - 1.0) < 0.06
    # speeds bounded by the local escape speed
    vesc2 = 2.0 * (df._Emax - hern.get_pot(r))
    assert (np.sum(v * v, 1) <= vesc2 * (1 + 1e-10)).all()


def test_anisotropy_penalty(hern):
    """LAMBDA penalizes tangentially-biased kernels: a heavily
    penalized fit is more radially anisotropic than LAMBDA=0."""
    kw = dict(egrid=10, kgrid=6, mgrid=40, nint=24)
    d0 = QPDistF(hern, lam=0.0, **kw)
    d1 = QPDistF(hern, lam=1e4, alpha=2.0, **kw)
    # mean K weighted by kernel amplitude drops under the penalty
    Kcol = np.tile(d0.Kgrid, d0.egrid)
    k0 = np.sum(d0.X * Kcol) / np.sum(d0.X)
    k1 = np.sum(d1.X * Kcol) / np.sum(d1.X)
    assert k1 < k0


def test_gensph_qp_cli(tmp_path):
    from exp_tpu.cli.gensph import main
    from exp_tpu.nbody.particles import read_ascii_arrays

    out = tmp_path / "qp.bods"
    main(["-N", "2000", "-i", "hernquist", "--rmin", "1e-3",
          "--rmax", "20.0", "--qp", "-o", str(out), "-s", "2"])
    x, v, m = read_ascii_arrays(str(out))
    assert len(x) == 2000 and np.isfinite(v).all()
    assert np.isclose(m.sum(),
                      hernquist_model(rmin=1e-3, rmax=20.0).total_mass,
                      rtol=1e-6)
