"""Analysis package tests: basis factory, coefs round-trip, MSSA separating
known signals, DMD recovering known frequencies, field generation, centers.
The pyEXP-pipeline gate (reader -> coefficients -> MSSA -> fields)."""

import numpy as np
import pytest
import jax.numpy as jnp

from exp_tpu.basis.model import hernquist_model
from exp_tpu.ic.eddington import sample_spherical_model
from exp_tpu.analysis.basis import Basis
from exp_tpu.analysis.coefs import Coefs
from exp_tpu.analysis.mssa import expMSSA
from exp_tpu.analysis.edmd import Koopman
from exp_tpu.analysis.field import FieldGenerator
from exp_tpu.analysis import util


@pytest.fixture(scope="module")
def halo_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("analysis")
    m = hernquist_model(rmin=1e-4, rmax=20.0, numr=1000)
    m.to_file(d / "halo.model")
    conf = {
        "id": "sphereSL",
        "parameters": {"modelname": "halo.model", "Lmax": 2, "nmax": 8,
                       "numr": 800, "rmapping": 1.0},
    }
    basis = Basis.factory(conf, workdir=str(d))
    x, v, mass = sample_spherical_model(m, 10000, seed=3)
    return d, m, basis, x, mass


def test_basis_factory_and_coefs(halo_setup, tmp_path):
    d, m, basis, x, mass = halo_setup
    # time series of jittered snapshots
    snaps = [(x * (1.0 + 0.01 * np.sin(0.3 * t)), mass) for t in range(12)]
    coefs = basis.create_from_snapshots(snaps, times=np.arange(12) * 0.1)
    assert len(coefs.times()) == 12
    A = coefs.as_array()
    assert A.shape == (12, 2, 3, 3, 8)

    # HDF5 round-trip
    p = tmp_path / "coefs.h5"
    coefs.to_file(str(p))
    back = Coefs.from_file(str(p))
    np.testing.assert_allclose(back.as_array(), A, rtol=1e-12)
    assert back.geometry == "sphere"

    # power: monopole dominates
    P = coefs.power()
    assert P.shape == (12, 3)
    assert np.all(P[:, 0] > 10 * P[:, 1:].sum(axis=1))


def test_field_generator(halo_setup):
    d, m, basis, x, mass = halo_setup
    c = basis.create_coefficients(x, mass)
    coefs = Coefs(geometry="sphere", meta=basis._meta())
    coefs.add(0.0, c)

    fg = FieldGenerator([0.0], pmin=[-2, -2, 0], pmax=[2, 2, 0],
                        grid=[32, 32, 0])
    out = fg.slices(basis, coefs)
    sl = out[0.0]
    assert sl["dens"].shape == (32, 32)
    assert np.isfinite(sl["potl"]).all()
    # density peaks near the center
    cidx = np.unravel_index(np.argmax(sl["dens"]), sl["dens"].shape)
    assert abs(cidx[0] - 15.5) < 4 and abs(cidx[1] - 15.5) < 4

    pts = np.array([[0.5, 0, 0], [1.0, 0, 0]])
    po = fg.points(basis, coefs, pts)[0.0]
    assert po["potl"][0] < po["potl"][1] < 0


def test_mssa_separates_signals():
    """Two channels driven by distinct oscillations + noise: the leading
    MSSA pair must reconstruct the dominant oscillation."""
    rng = np.random.default_rng(0)
    T = 200
    t = np.arange(T)
    s1 = np.sin(2 * np.pi * t / 20.0)
    s2 = 0.3 * np.sin(2 * np.pi * t / 7.0)
    noise = 0.02 * rng.standard_normal((T, 2))
    A = np.stack([s1 + noise[:, 0], s1 * 0.5 + s2 + noise[:, 1]], axis=1)

    coefs = Coefs(geometry="table")
    for i in range(T):
        coefs.add(float(i), A[i])

    m = expMSSA({"c": coefs}, window=50, numpc=8)
    contrib = m.contributions()
    assert contrib[:2].sum() > 0.6          # dominant pair

    rec = m.reconstruct_coefs(coefs, groups=[0, 1])
    R = rec.as_array()
    # channel 0 reconstruction correlates strongly with s1
    r = np.corrcoef(R[:, 0], s1)[0, 1]
    assert r > 0.98

    W = m.wcorr(6)
    assert W.shape == (6, 6)
    assert np.allclose(np.diag(W), 1.0)


def test_koopman_recovers_frequency():
    T = 120
    dt = 0.1
    t = np.arange(T) * dt
    om1, om2 = 2.0, 5.0
    A = np.stack([np.cos(om1 * t), np.sin(om1 * t) + 0.5 * np.cos(om2 * t)],
                 axis=1)
    coefs = Coefs(geometry="table")
    for i in range(T):
        coefs.add(float(i), A[i])

    k = Koopman({"c": coefs}, numev=6, window=10)
    freqs = np.abs(k.frequencies(dt))
    # both frequencies present among the eigenvalues
    assert np.min(np.abs(freqs - om1)) < 0.05
    assert np.min(np.abs(freqs - om2)) < 0.05

    rec = k.reconstruction()
    # reconstruction covers the embedded span T-window+1
    err = np.abs(rec.T - A[: rec.shape[1]]).max()
    assert err < 0.05


def test_centers():
    rng = np.random.default_rng(1)
    # dense clump at (1,2,3) + sparse background
    clump = rng.normal([1, 2, 3], 0.1, (2000, 3))
    bg = rng.uniform(-10, 10, (500, 3))
    x = np.vstack([clump, bg])
    m = np.ones(len(x))
    com = util.centerOfMass(x, m)
    dc = util.getDensityCenter(x, m, k=16)
    # density center much closer to the clump than plain COM
    assert np.linalg.norm(dc - [1, 2, 3]) < 0.2
    assert np.linalg.norm(dc - [1, 2, 3]) < np.linalg.norm(com - [1, 2, 3])

    centers, labels = util.kmeans(x, 2, seed=2)
    assert len(np.unique(labels)) == 2


def test_cross_validation(halo_setup):
    """BFE force within a few % of the direct sum across radii."""
    from exp_tpu.analysis.crossval import cross_validate, kl_divergence_radial

    d, m, basis, x, mass = halo_setup
    out = cross_validate(basis.force, x, mass, ntest=256, eps=5e-3)
    assert out["ferr_all_med"] < 0.08
    assert out["perr_all_med"] < 0.02

    # KL of a snapshot against itself is ~0; against a stretched one > 0
    kl0 = kl_divergence_radial(x, mass, x, mass)
    kl1 = kl_divergence_radial(x, mass, x * 1.5, mass)
    assert kl0 < 1e-10 and kl1 > 0.05


def test_vtk_and_pvd(tmp_path):
    """write_vtk/write_pvd emit parseable files; FieldGenerator.file_slices
    writes one VTK per time plus the .pvd index."""
    from exp_tpu.analysis.field import write_vtk, write_pvd

    f2 = {"dens": np.arange(12.0).reshape(3, 4),
          "potl": -np.ones((3, 4))}
    p = tmp_path / "t.vtk"
    write_vtk(p, f2, [0, 0, 0], [1, 1, 0])
    txt = p.read_text()
    assert "DIMENSIONS 3 4 1" in txt and "SCALARS dens" in txt
    # x varies fastest in legacy VTK: first 3 values are dens[:,0]
    body = txt.split("LOOKUP_TABLE default\n")[1].split()[:3]
    np.testing.assert_allclose([float(v) for v in body], [0.0, 4.0, 8.0])
    write_pvd(tmp_path / "t.pvd", [(0.0, str(p)), (0.5, str(p))])
    pvd = (tmp_path / "t.pvd").read_text()
    assert pvd.count("<DataSet") == 2 and 'timestep="0.5"' in pvd
