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


def test_mssa_dft_kmeans_autogroup():
    """Round-2 expMSSA extras: pcDFT/channelDFT frequency identification,
    kmeans eigentriple grouping (w-correlation distance), and
    w-correlation auto-grouping (expMSSA.H:170-286, KMeans.cc)."""
    rng = np.random.default_rng(1)
    T = 240
    t = np.arange(T)
    p1, p2 = 24.0, 9.0
    s1 = np.sin(2 * np.pi * t / p1)
    s2 = 0.6 * np.sin(2 * np.pi * t / p2)
    A = np.stack([s1 + 0.01 * rng.standard_normal(T),
                  s2 + s1 * 0.2 + 0.01 * rng.standard_normal(T)], axis=1)
    coefs = Coefs(geometry="table")
    for i in range(T):
        coefs.add(float(i), A[i])
    m = expMSSA({"c": coefs}, window=60, numpc=8)

    # pcDFT: the leading PC pair peaks at 2 pi / p1
    freq, P = m.pcDFT()
    om1 = 2 * np.pi / p1
    f_peak = freq[np.argmax(P[1:, 0]) + 1]
    assert abs(f_peak - om1) < 0.35 * om1

    # channelDFT of the [0,1]-group reconstruction is dominated by om1
    freq, chan = m.channelDFT(groups=[0, 1])
    pw = chan[("c", 0)]
    assert abs(freq[np.argmax(pw[1:]) + 1] - om1) < 0.35 * om1

    # singleDFT returns per-PC spectra for a channel
    freq, ps = m.singleDFT(("c", 0))
    assert ps.shape == (freq.size, m.S.size)

    # kmeans with 2 clusters separates the p1 pair from the p2 pair
    ids, dists, tol = m.kmeans(2, stride=1)
    assert ids[0] == ids[1], f"leading pair split: {ids}"
    assert len(set(ids)) == 2
    assert np.isfinite(dists).all()

    # auto-group: the leading group contains the first eigentriple pair
    groups = m.auto_group(threshold=0.25, ncomp=6)
    lead = groups[0]
    assert 0 in lead and 1 in lead, f"groups: {groups}"


def test_slab_table_coef_files(tmp_path):
    """Slab / table / trajectory coefficient-file geometries round-trip
    through the pyEXP-compatible schema (CoefStruct.H:214-420)."""
    from exp_tpu.io.coefs import (SlabCoefsFile, TableCoefsFile, open_coefs)

    rng = np.random.default_rng(5)
    # slab: complex (2 nx+1, 2 ny+1, nz)
    p = tmp_path / "slab.h5"
    w = SlabCoefsFile(str(p), "w", name="s", nmaxx=2, nmaxy=2, nmaxz=4)
    cs = rng.normal(size=(3, 5, 5, 4)) + 1j * rng.normal(size=(3, 5, 5, 4))
    for i in range(3):
        w.append(float(i), cs[i])
    w.close()
    r = open_coefs(str(p))
    assert isinstance(r, SlabCoefsFile)
    times, back = r.read_all()
    np.testing.assert_array_equal(times, [0, 1, 2])
    np.testing.assert_allclose(back, cs)
    r.close()

    # table + trajectory
    for geom in ("table", "trajectory"):
        p = tmp_path / f"{geom}.h5"
        w = TableCoefsFile(str(p), "w", name="t", cols=6, geometry=geom)
        data = rng.normal(size=(4, 6))
        for i in range(4):
            w.append(float(i), data[i])
        w.close()
        r = open_coefs(str(p))
        assert r.geometry == geom
        times, back = r.read_all()
        np.testing.assert_allclose(back.real, data)
        r.close()


def test_velocity_field_basis(halo_setup):
    """VelocityBasis-style spherical velocity-field expansion: a rotating
    halo's v_phi field is recovered; v_r stays ~0 (FieldBasis.H:23-186)."""
    from exp_tpu.analysis.field_basis import FieldBasis

    d, m, basis, x, mass = halo_setup
    # impose solid-body-ish rotation about z
    R = np.hypot(x[:, 0], x[:, 1])
    om = 0.3
    vrot = np.stack([-om * x[:, 1], om * x[:, 0], np.zeros(len(x))], -1)
    fb = FieldBasis(basis.force, fields="spherical")
    coefs = fb.coefficients(x, vrot, mass)

    pts = np.array([[1.0, 0, 0], [0, 1.5, 0], [0.5, 0.5, 0.0]])
    out = fb.evaluate(coefs, pts)
    Rp = np.hypot(pts[:, 0], pts[:, 1])
    np.testing.assert_allclose(out["vp"], om * Rp, rtol=0.35)
    assert np.abs(out["vr"]).max() < 0.1 * om
    assert np.isfinite(out["vt"]).all()


def test_unit_validator_and_h5_units(tmp_path):
    """UnitValidator alias canonicalization and the Units dataset
    round-trip on a coefficient file (expui/UnitValidator.cc,
    Coefficients.cc:142-180)."""
    import h5py

    from exp_tpu.analysis.units import (UnitValidator, write_units,
                                        read_units, grav_constant)

    v = UnitValidator()
    assert v("Len", "kiloparsec") == (True, "length", "kpc")
    assert v("M", "solar_mass") == (True, "mass", "Msun")
    assert v("t", "Myr") == (True, "time", "Myr")
    assert v("grav", "unitless") == (True, "G", "none")
    assert v("bogus", "kpc")[0] is False
    assert v("length", "furlong")[0] is False
    assert "velocity" in v.allowed_types()

    p = str(tmp_path / "u.h5")
    with h5py.File(p, "w") as f:
        write_units(f, [("Len", "kpc", 1.0), ("M", "Msun", 1e12),
                        ("t", "Gyr", 1.0), ("grav", "none", 1.0)])
    with h5py.File(p, "r") as f:
        u = read_units(f)
    assert ("length", "kpc", 1.0) in u
    assert grav_constant(u) == 1.0
    assert grav_constant([]) == 1.0
