"""pyEXP-compatibility layer (exp_tpu/pyexp): reference-named workflows
end-to-end — reader -> basis -> coefs -> mssa/edmd -> field, plus orbit
integration, units, power diagnostics, and the accumulation API."""

import numpy as np
import pytest

import exp_tpu.pyexp as pyEXP
from exp_tpu.basis.model import hernquist_model
from exp_tpu.ic.eddington import sample_spherical_model
from exp_tpu.nbody.particles import write_ascii_bodies

YAML_SPHERE = """
id: sphereSL
parameters:
  modelname: hernquist
  Lmax: 2
  nmax: 6
  numr: 400
"""


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    d = tmp_path_factory.mktemp("pyexp")
    m = hernquist_model(rmin=1e-3, rmax=20.0)
    x, v, mass = sample_spherical_model(m, 3000, seed=9)
    path = d / "halo.bods"
    write_ascii_bodies(path, (x, v, mass))
    return str(path), x, v, mass


@pytest.fixture(scope="module")
def basis():
    return pyEXP.basis.Basis.factory(YAML_SPHERE)


def test_reader_and_create_from_reader(snapshot, basis):
    path, x, v, mass = snapshot
    reader = pyEXP.read.ParticleReader.createReader("ascii", path)
    assert reader.CurrentNumber() == 3000
    assert reader.GetTypes() == ["comp"]
    reader.SelectType("comp")
    coefs = basis.createFromReader(reader)
    assert coefs.Times() == [0.0]
    assert coefs.getGeometry() == "sphere"
    st = coefs.getCoefStruct(0.0)
    assert np.isfinite(st.getCoefs()).all()
    # monopole dominates an equilibrium halo
    c = st.getCoefs()
    assert abs(c[0, 0, 0, 0]) > np.abs(c[0, 1:]).max()


def test_accumulation_api_matches_oneshot(snapshot, basis):
    path, x, v, mass = snapshot
    one = basis.createFromArray(mass, x, time=1.5)
    basis.initFromArray()
    basis.addFromArray(mass[:1000], x[:1000])
    basis.addFromArray(mass[1000:], x[1000:])
    st = basis.makeFromArray(time=1.5)
    np.testing.assert_allclose(st.getCoefs(), one.getCoefs(), rtol=1e-10)
    assert st.getCoefTime() == 1.5


def test_get_fields_labels_and_values(snapshot, basis):
    path, x, v, mass = snapshot
    st = basis.createFromArray(mass, x)
    basis.set_coefs(st)
    labels = basis.getFieldLabels()
    assert labels[:6] == ["dens m=0", "dens m>0", "dens",
                          "potl m=0", "potl m>0", "potl"]
    out = basis.getFields(1.0, 0.0, 0.0)
    assert out.shape == (len(labels),)
    # dens m=0 + dens m>0 == dens
    np.testing.assert_allclose(out[0] + out[1], out[2], rtol=1e-6,
                               atol=1e-12)
    assert out[5] < 0        # potential is negative
    # total mass from the monopole field
    M = basis.getMass(25.0)
    assert abs(M - float(np.sum(mass))) / float(np.sum(mass)) < 0.05


def test_ortho_and_basis_dump(basis):
    grams = basis.orthoCheck()
    assert len(grams) == 3
    for G in grams:
        # potential/density biorthogonality: -identity
        np.testing.assert_allclose(G, -np.eye(G.shape[0]), atol=5e-2)
    tab = basis.getBasis(-2, 1, 64)
    assert len(tab) == 3 and set(tab[0][0]) == {"potential", "density",
                                                "rforce"}


def test_coefs_io_power_units(snapshot, basis, tmp_path):
    path, x, v, mass = snapshot
    coefs = None
    for i, t in enumerate([0.0, 0.5, 1.0]):
        st = basis.createFromArray(mass, x * (1 + 0.02 * i), time=t)
        if coefs is None:
            coefs = pyEXP.coefs.Coefs.makecoefs(st, "halo")
        coefs.add(st)
    P = coefs.Power()
    assert P.shape == (3, 3)
    assert (P[:, 0] > P[:, 1]).all()
    # units
    coefs.setUnits([("length", "kpc", 1.0), ("mass", "Msun", 1e12),
                    ("time", "Myr", 10.0), ("G", "none", 1.0)])
    assert coefs.getGravConstant() == 1.0
    with pytest.raises(ValueError):
        coefs.setUnits([("length", "cubits", 1.0)])
    # HDF5 round trip + extension + comparison
    f = tmp_path / "halo_coefs.h5"
    coefs.WriteH5Coefs(str(f))
    back = pyEXP.coefs.Coefs.factory(str(f))
    assert back.CompareStanzas(coefs)
    st2 = basis.createFromArray(mass, x, time=2.0)
    more = pyEXP.coefs.Coefs.makecoefs(st2, "halo")
    more.add(st2)
    more.ExtendH5Coefs(str(f))
    again = pyEXP.coefs.Coefs.factory(str(f))
    assert len(again.Times()) == 4
    assert pyEXP.coefs.getAllowedUnitNames("length")
    assert "length" in pyEXP.coefs.getAllowedUnitTypes()


def test_mssa_workflow(snapshot, basis, tmp_path):
    path, x, v, mass = snapshot
    rng = np.random.default_rng(0)
    coefs = None
    for i, t in enumerate(np.linspace(0, 2 * np.pi, 24)):
        xt = x * (1 + 0.05 * np.sin(t))
        st = basis.createFromArray(mass, xt, time=float(i))
        if coefs is None:
            coefs = pyEXP.coefs.Coefs.makecoefs(st, "halo")
        coefs.add(st)
    ssa = pyEXP.mssa.expMSSA({"halo": (coefs, None, [])}, window=8, numpc=4)
    ev = ssa.eigenvalues()
    assert len(ev) == 4 and (np.diff(ev) <= 1e-9).all()
    assert ssa.getPC().shape[1] == 4
    assert 0 < ssa.getTotVar()
    ssa.reconstruct([0, 1])
    rec = ssa.getReconstructed()
    assert "halo" in rec and len(rec["halo"].Times()) == 24
    W = ssa.wCorrAll()
    assert W.shape == (4, 4)
    png = ssa.wcorrPNG(str(tmp_path / "wc"))
    import os
    assert os.path.exists(png)
    km = ssa.kmeans(2)
    assert set(c for c, d in km.values()) <= {0, 1}
    ssa.saveState(str(tmp_path / "st"))
    ssa.restoreState(str(tmp_path / "st"))

    # the (name, multi-index) keys this surface hands out round-trip
    # through every key-taking method (native keys are (name, flat))
    k0 = ssa.getAllKeys()[0]
    assert len(k0) == 5                     # ('halo', cs, l, m, n)
    rc = ssa.getRC(k0)
    assert rc.shape == (24,)
    f, p = ssa.singleDFT(k0)
    assert len(f) == p.shape[0]
    Wk = ssa.wCorrKey(k0)
    assert Wk.shape == W.shape
    # single-channel w-corr differs from the channel-summed matrix
    assert np.abs(Wk - W).max() > 1e-12
    kc = ssa.kmeansChannel(k0, 2)
    assert set(c for c, d in kc.values()) <= {0, 1}
    # per-name wcorr == global for a single dataset
    np.testing.assert_allclose(ssa.wCorr(name="halo"), W, atol=1e-12)


def test_edmd_workflow(snapshot, basis):
    path, x, v, mass = snapshot
    coefs = None
    for i in range(16):
        st = basis.createFromArray(mass, x * (1 + 0.03 * np.cos(0.7 * i)),
                                   time=float(i))
        if coefs is None:
            coefs = pyEXP.coefs.Coefs.makecoefs(st, "halo")
        coefs.add(st)
    koop = pyEXP.edmd.Koopman({"halo": (coefs, None, [])}, numev=4)
    assert len(koop.eigenvalues()) <= 4
    koop.reconstruct()
    rec = koop.getReconstructedKoopman()
    assert "halo" in rec
    assert (koop.getReconstructed.__func__
            is koop.getReconstructedKoopman.__func__)

    # channelDFT (Koopman.cc:435): the driven 0.7 rad/step line dominates
    freq, power = koop.channelDFT(dt=1.0)
    assert power.shape == (len(freq), koop._k.nchan)
    dom = freq[np.argmax(power.sum(axis=1))]
    assert abs(dom - 0.7) < 2 * np.pi / 16

    # contrib (Koopman.cc:210): amplitude images, rows/cols normalized
    F, G = koop.contrib()
    nev = len(koop.eigenvalues())
    assert F.shape == G.shape == (nev, koop._k.nchan)
    np.testing.assert_allclose((F ** 2).sum(axis=1),
                               np.ones(nev), rtol=1e-8)
    np.testing.assert_allclose((G ** 2).sum(axis=0),
                               np.ones(koop._k.nchan), rtol=1e-8)


def test_field_generator(snapshot, basis):
    path, x, v, mass = snapshot
    st = basis.createFromArray(mass, x, time=0.0)
    coefs = pyEXP.coefs.Coefs.makecoefs(st, "halo")
    coefs.add(st)
    fg = pyEXP.field.FieldGenerator([0.0], (-2, -2, 0), (2, 2, 0),
                                    (16, 16, 0))
    sl = fg.slices(basis, coefs)
    assert sl[0.0]["dens"].shape == (16, 16)
    ln = fg.lines(basis, coefs, (0.1, 0, 0), (3.0, 0, 0), 32)
    assert ln[0.0]["potl"].shape == (32,)
    assert (np.diff(ln[0.0]["potl"]) > 0).all()   # rising toward 0
    H, edges = fg.histo1d(x, mass, axis=0, nbins=8)
    assert H.sum() > 0


def test_integrate_orbits(snapshot, basis):
    path, x, v, mass = snapshot
    st = basis.createFromArray(mass, x, time=0.0)
    coefs = pyEXP.coefs.Coefs.makecoefs(st, "halo")
    coefs.add(st)
    # circular-ish orbit at r=1 (enclosed mass sets vc)
    basis.set_coefs(st)
    M1 = basis.getMass(1.0)
    vc = np.sqrt(M1 / 1.0)
    ps = np.array([[1.0, 0, 0, 0, vc, 0.0]])
    T, O = pyEXP.basis.IntegrateOrbits(
        0.0, 3.0, 0.01, ps, [(basis, coefs)],
        pyEXP.basis.AllTimeAccel(), nout=30)
    assert O.shape[0] == len(T)
    r = np.sqrt(O[:, 0, 0] ** 2 + O[:, 0, 1] ** 2 + O[:, 0, 2] ** 2)
    assert abs(r.max() - 1.0) < 0.2 and abs(r.min() - 1.0) < 0.2


def test_index_helpers(basis):
    assert basis.I(0, 0) == 0
    l, m = basis.invI(basis.I(2, 1))
    assert (l, m) == (2, 1)
    assert pyEXP.util.getVersionInfo()
    assert pyEXP.read.getReaders()
    groups = pyEXP.read.parseStringList(
        ["snap_0", "snap_1", "other_0", "other_1"])
    assert ["snap_0", "snap_1"] in groups


YAML_DISK = """
id: cylinder
parameters:
  mmax: 2
  nmax: 4
  lmaxfid: 12
  nmaxfid: 8
  acyl: 0.01
  hcyl: 0.002
  ncylnx: 64
  ncylny: 32
  rnum: 60
  tnum: 30
"""


def test_cylinder_geometry_compat():
    """Disk basis through the compat layer: cylindrical field type,
    m-split fields, coefficient round trip."""
    basis = pyEXP.basis.Basis.factory(YAML_DISK)
    assert basis.getFieldType() == "cylindrical"
    assert basis.getFieldLabels()[6:] == ["rad force", "ver force",
                                          "azi force"]
    rng = np.random.default_rng(4)
    n = 2000
    R = rng.exponential(0.01, n)
    ph = rng.uniform(0, 2 * np.pi, n)
    x = np.stack([R * np.cos(ph), R * np.sin(ph),
                  rng.normal(0, 0.002, n)], -1)
    mass = np.full(n, 1.0 / n)
    st = basis.createFromArray(mass, x, time=0.0)
    assert st.getGeometry() == "cylinder"
    basis.set_coefs(st)
    out = basis.getFields(0.02, 0.0, 0.001)
    np.testing.assert_allclose(out[0] + out[1], out[2], rtol=1e-6,
                               atol=1e-10)
    coefs = pyEXP.coefs.Coefs.makecoefs(st, "disk")
    coefs.add(st)
    P = coefs.Power()
    assert P.shape == (1, 3)


def test_get_all_coefs_packed_layout(snapshot, basis):
    """getAllCoefs returns the reference's packed complex (lm, n, T)
    layout, indexable with Basis.I."""
    path, x, v, mass = snapshot
    st = basis.createFromArray(mass, x, time=0.0)
    coefs = pyEXP.coefs.Coefs.makecoefs(st, "halo")
    coefs.add(st)
    allc = coefs.getAllCoefs()
    L, nmax = 2, 6
    assert allc.shape == ((L + 1) * (L + 2) // 2, nmax, 1)
    assert np.iscomplexobj(allc)
    c = st.getCoefs()
    np.testing.assert_allclose(allc[basis.I(1, 1), :, 0].real, c[0, 1, 1],
                               rtol=1e-12)
    np.testing.assert_allclose(allc[basis.I(1, 1), :, 0].imag, c[1, 1, 1],
                               rtol=1e-12)


def test_set_data_and_matrix_aliases(snapshot, basis):
    """setData rewrites one time slot from the packed complex layout
    (Coefs::setData); setMatrix/setTensor alias CoefStruct.assign."""
    path, x, v, mass = snapshot
    st = basis.createFromArray(mass, x, time=0.0)
    coefs = pyEXP.coefs.Coefs.makecoefs(st, "halo")
    coefs.add(st)

    allc = coefs.getAllCoefs()            # (lm, n, 1) complex
    # getData/__call__ returns the same packed slice (CoefWrappers.cc:1132)
    np.testing.assert_allclose(coefs(0.0), allc[:, :, 0], rtol=1e-14)
    coefs.setData(0.0, 2.0 * allc[:, :, 0])
    allc2 = coefs.getAllCoefs()
    np.testing.assert_allclose(allc2, 2.0 * allc, rtol=1e-12)
    np.testing.assert_allclose(coefs.getData(0.0), 2.0 * allc[:, :, 0],
                               rtol=1e-12)

    # real native layout round-trips too
    raw = np.asarray(coefs.getCoefStruct(0.0).getCoefs())
    coefs.setData(0.0, raw / 2.0)
    np.testing.assert_allclose(coefs.getAllCoefs(), allc, rtol=1e-12)

    st2 = st.deepcopy()
    st2.setMatrix(np.asarray(st.getCoefs()) * 3.0)
    np.testing.assert_allclose(np.asarray(st2.getCoefs()),
                               3.0 * np.asarray(st.getCoefs()), rtol=1e-12)
    assert st2.setTensor is not None

    # setData on an absent time must raise, not guess a slot
    # (SphCoefs::setData, Coefficients.cc:698-705)
    with pytest.raises(KeyError):
        coefs.setData(1.0, allc[:, :, 0])
    # wrong packed dimensions must raise, not silently truncate
    with pytest.raises(ValueError):
        coefs.setData(0.0, np.zeros((3, 4), complex))

    # struct edits propagate to the container (shared storage, like the
    # reference's shared_ptr structs) — including packed complex input
    live = coefs.getCoefStruct(0.0)
    packed = coefs.getData(0.0)
    live.setMatrix(0.5 * packed)
    np.testing.assert_allclose(coefs.getData(0.0), 0.5 * packed,
                               rtol=1e-12, atol=1e-30)
    # getData returns a copy: mutating it must NOT touch the container
    d = coefs.getData(0.0)
    d *= 0.0
    np.testing.assert_allclose(coefs.getData(0.0), 0.5 * packed,
                               rtol=1e-12, atol=1e-30)


def test_multi_name_mssa_and_edmd(snapshot, basis):
    """Two datasets with DIFFERENT coefficient shapes: per-name channel
    keys and reconstructions must not cross-contaminate."""
    path, x, v, mass = snapshot
    halo = None
    table = None
    rng = np.random.default_rng(1)
    series = np.cumsum(rng.normal(size=(20, 3)), axis=0)
    from exp_tpu.analysis.coefs import Coefs as NativeCoefs

    tbl = NativeCoefs(geometry="table", name="tbl")
    for i in range(20):
        st = basis.createFromArray(mass, x * (1 + 0.02 * np.sin(i)),
                                   time=float(i))
        if halo is None:
            halo = pyEXP.coefs.Coefs.makecoefs(st, "halo")
        halo.add(st)
        tbl.add(float(i), series[i])
    ssa = pyEXP.mssa.expMSSA({"halo": (halo, None, []),
                              "tbl": (tbl, None, [])}, window=6, numpc=3)
    keys = ssa.getAllKeys()
    assert any(k[0] == "halo" and len(k) == 5 for k in keys)
    assert any(k[0] == "tbl" and len(k) == 2 for k in keys)
    ssa.reconstruct([0, 1])
    rec = ssa.getReconstructed()
    assert rec["halo"]._c.as_array().shape[1:] == (2, 3, 3, 6)
    assert rec["tbl"].as_array().shape[1:] == (3,)

    koop = pyEXP.edmd.Koopman({"halo": (halo, None, []),
                               "tbl": (tbl, None, [])}, numev=3)
    kk = koop.getAllKeys()
    assert any(k[0] == "tbl" for k in kk)
    koop.reconstruct()
    out = koop.getReconstructedKoopman()
    assert out["halo"]._c.as_array().shape[1:] == (2, 3, 3, 6)


def test_even_odd_power_explicit_nodd():
    """Explicit nodd overrides file metadata (reference precedence)."""
    from exp_tpu.analysis.coefs import Coefs as NativeCoefs

    nat = NativeCoefs(geometry="cylinder", name="d",
                      meta={"mmax": 1, "nmax": 4, "ncylodd": 0})
    c = np.zeros((2, 2, 4))
    c[0, 0] = [1.0, 1.0, 2.0, 2.0]
    nat.add(0.0, c)
    coefs = pyEXP.coefs.Coefs(nat)
    Pe, Po = coefs.EvenOddPower(nodd=2)
    np.testing.assert_allclose(Pe[0, 0], 2.0)   # first 2 channels
    np.testing.assert_allclose(Po[0, 0], 8.0)   # last 2 channels


def test_parse_string_list_delimiter():
    groups = pyEXP.read.parseStringList(
        ["run.00010.0", "run.00010.1", "run.00011.0"], delimit=".")
    assert ["run.00010.0", "run.00010.1"] in groups
    assert ["run.00011.0"] in groups


def test_field_generator_midplane():
    """setMidplane: disk slices are evaluated at the local density-max
    height and report a 'midplane' surface (per-time coefficients are
    interpolated — the bug class this guards)."""
    basis = pyEXP.basis.Basis.factory(YAML_DISK)
    rng = np.random.default_rng(6)
    n = 3000
    R = rng.exponential(0.01, n)
    ph = rng.uniform(0, 2 * np.pi, n)
    x = np.stack([R * np.cos(ph), R * np.sin(ph),
                  0.001 + rng.normal(0, 0.002, n)], -1)   # offset plane
    mass = np.full(n, 1.0 / n)
    coefs = None
    for t in (0.0, 1.0):
        st = basis.createFromArray(mass, x, time=t)
        if coefs is None:
            coefs = pyEXP.coefs.Coefs.makecoefs(st, "disk")
        coefs.add(st)
    fg = pyEXP.field.FieldGenerator([0.0, 1.0], (-0.03, -0.03, 0),
                                    (0.03, 0.03, 0), (12, 12, 0))
    fg.setMidplane(True)
    fg.setColumnHeight(3.0)
    sl = fg.slices(basis, coefs)
    assert set(sl) == {0.0, 1.0}
    assert "midplane" in sl[0.0]
    mp = sl[0.0]["midplane"]
    assert mp.shape == (12, 12)
    assert np.isfinite(sl[0.0]["dens"]).all()
    # midplane heights stay within the scan range (the offset itself may
    # not be recoverable with so few odd vertical functions — the test
    # guards the per-time interpolation path, not the basis resolution)
    assert np.abs(mp).max() <= 3.0 * 0.002 + 1e-12


def test_ortho_and_basis_all_geometries():
    """orthoCheck/getBasis across the non-spherical geometries
    (BasisWrappers.cc: Cylindrical:1851, Slab:2574/2613, Cube:2697)."""
    # cylinder: EOF pot/dens tables biorthogonal per m
    disk = pyEXP.basis.Basis.factory(YAML_DISK)
    grams = disk.orthoCheck()
    assert len(grams) == 3
    for G in grams:
        np.testing.assert_allclose(G, -np.eye(G.shape[0]), atol=5e-2)

    # slab: sign-folded vertical Gram ~ +I per (kx, ky) pair
    slab = pyEXP.basis.Basis.factory(
        "{id: slabSL, parameters: {nmaxx: 2, nmaxy: 2, nmaxz: 4}}")
    grams = slab.orthoCheck()
    assert len(grams) == 9
    for G in grams:
        np.testing.assert_allclose(G, np.eye(G.shape[0]), atol=5e-2)
    tab = slab.getBasis(numgrid=64)
    assert len(tab) == 3 and len(tab[0]) == 3
    assert set(tab[1][2][0]) == {"potential", "density", "zforce"}
    assert all(len(v["potential"]) == 64 for v in tab[1][2].values())
    # zforce is -d(potential)/dz at interior points
    f0 = tab[0][0][0]
    zq = np.linspace(-slab._b.force.zmax, slab._b.force.zmax, 64)
    dz = zq[1] - zq[0]
    num = -np.gradient(f0["potential"], dz)
    np.testing.assert_allclose(num[5:-5], f0["zforce"][5:-5], rtol=0.05,
                               atol=1e-3 * np.abs(f0["zforce"]).max())

    # cube: plane waves exactly orthonormal -> |Gram| = I
    cube = pyEXP.basis.Basis.factory(
        "{id: cube, parameters: {nmaxx: 2, nmaxy: 2, nmaxz: 2}}")
    (G,) = cube.orthoCheck()
    assert G.shape == (125, 125)
    np.testing.assert_allclose(G, np.eye(125), atol=1e-12)


def test_selector_and_accel(snapshot, basis):
    """setSelector filters particles; getAccel returns the acceleration
    columns (BasisWrappers.cc:1132, 1548)."""
    path, x, v, mass = snapshot
    st_all = basis.createFromArray(mass, x, time=0.0)
    basis.setSelector(lambda m, p, vv: p[2] > 0)
    st_up = basis.createFromArray(mass, x, time=0.0)
    basis.clrSelector()
    ref = pyEXP.basis.Basis.factory(YAML_SPHERE).createFromArray(
        mass[x[:, 2] > 0], x[x[:, 2] > 0], time=0.0)
    np.testing.assert_allclose(st_up.getCoefs(), ref.getCoefs(),
                               rtol=1e-10, atol=1e-12)
    assert np.abs(st_up.getCoefs() - st_all.getCoefs()).max() > 1e-6

    basis.set_coefs(st_all)
    a = basis.getAccel(0.5, 0.0, 0.0)
    assert a.shape == (3,) and a[0] < 0  # inward pull
    aa = basis.getAccel([0.5, 1.0], [0.0, 0.0], [0.0, 0.0])
    assert aa.shape == (2, 3)


def test_noninertial_pseudo_accel(snapshot, basis):
    """setNonInertial + setNonInertialAccel: quadratic-LS pseudo
    acceleration from a center trajectory (BasisFactory.cc:286-398)."""
    t = np.linspace(0.0, 1.0, 21)
    acc_true = np.array([0.3, -0.2, 0.1])
    pos = 0.5 * acc_true[None, :] * t[:, None] ** 2
    basis.setNonInertial(8, t, pos=pos)
    ps = basis.setNonInertialAccel(0.5)
    np.testing.assert_allclose(ps, acc_true, rtol=1e-6, atol=1e-9)
    basis.setInertial()
    assert np.all(basis.pseudo == 0.0)


def test_coef_covariance(snapshot, basis, tmp_path):
    """enableCoefCovariance / getCoefCovariance / writeCoefCovariance
    (BasisWrappers.cc:1933, Cylindrical::writeCoefCovariance)."""
    path, x, v, mass = snapshot
    basis.enableCoefCovariance(True, sampT=8)
    st = basis.createFromArray(mass, x, time=0.0)
    mu, C = basis.getCoefCovariance()
    full = st.getCoefs().ravel()
    # partition mean scaled to totals ~ full-population coefficients
    scale = np.abs(full).max()
    assert np.abs(mu - full).max() / scale < 0.2
    assert C.shape == (mu.size, mu.size)
    # diagonal nonnegative
    assert np.all(np.diag(C) >= -1e-12)
    f = str(tmp_path / "covar.h5")
    basis.writeCoefCovariance(f, time=0.0)
    import h5py

    with h5py.File(f) as h5:
        g = h5["covariance"]
        key = list(g)[0]
        assert g[key]["samples"].shape[0] == 8

    # CovarianceReader (the reference's SubsampleCovariance binding,
    # BasisWrappers.cc:3172-3242): times, ID, strided read-back
    rdr = pyEXP.basis.CovarianceReader(f)
    assert rdr.Times() == [0.0]
    assert rdr.basisIDname() == basis.basisIDname() == "sphereSL"
    counts, masses, coefs, C2 = rdr.getCoefCovariance(0.0)
    assert coefs.shape[0] == 8 and counts.sum() == len(mass)
    np.testing.assert_allclose(masses.sum(), mass.sum(), rtol=1e-12)
    np.testing.assert_allclose(C2, C, rtol=1e-12, atol=1e-30)
    r2 = pyEXP.basis.CovarianceReader(f, stride=2)
    c2, m2, s2, Cs = r2.getCoefCovariance(0.0)
    assert s2.shape[0] == 4
    np.testing.assert_allclose(s2, coefs[::2], rtol=1e-12)
    # strided covariance keeps the population scaling (x sampT, not x4)
    V = s2 * 8
    d = V - V.mean(axis=0)
    np.testing.assert_allclose(Cs, d.T @ d / 3, rtol=1e-12, atol=1e-30)

    # rewriting the same time slot replaces the group instead of raising
    basis.writeCoefCovariance(f, time=0.0)
    assert pyEXP.basis.CovarianceReader(f).Times() == [0.0]
    basis.enableCoefCovariance(False)


def test_make_from_function(basis):
    """makeFromFunction: quadrature projection of the analytic Hernquist
    density reproduces the monopole of the sampled halo
    (BiorthBasis.cc:5230)."""
    def rho(x, y, z, t):
        r = np.sqrt(x * x + y * y + z * z)
        return 1.0 / (2 * np.pi * r * (1 + r) ** 3)

    st = basis.makeFromFunction(rho, {"knots": 64}, time=0.0)
    c = st.getCoefs()
    # monopole dominates, sin block ~ 0
    assert abs(c[0, 0, 0, 0]) > 30 * np.abs(c[0, 1:]).max()
    # total mass via the quadrature helper: Hernquist M(<20) = (20/21)^2
    Mtot = basis.computeQuadrature(lambda x, y, z: rho(x, y, z, 0.0),
                                   {"knots": 64})
    assert abs(Mtot - (20.0 / 21.0) ** 2) < 1e-3


def test_koopman_modes_and_background(snapshot, basis):
    """getKoopmanModes / getReconstructedKoopman / cumulative /
    background (MSSAWrappers.cc:211, 338, 633)."""
    path, x, v, mass = snapshot
    coefs = None
    rng = np.random.default_rng(2)
    for i, t in enumerate(np.linspace(0.0, 1.0, 12)):
        ph = 2 * np.pi * 0.9 * t
        R = np.array([[np.cos(ph), -np.sin(ph), 0],
                      [np.sin(ph), np.cos(ph), 0], [0, 0, 1.0]])
        st = basis.createFromArray(mass, x @ R.T, time=t)
        if coefs is None:
            coefs = pyEXP.coefs.Coefs.makecoefs(st, "halo")
        coefs.add(st)
    mssa = pyEXP.mssa.expMSSA({"halo": (coefs, [])}, window=6, numpc=6)
    cum = mssa.cumulative()
    assert cum.shape[0] >= 2 and np.all(np.diff(cum) >= -1e-9)
    ev, modes = mssa.getKoopmanModes(tol=1e-10)
    assert ev.ndim == 1 and modes.shape[1] == ev.shape[0]
    # rotating pattern -> leading eigenvalues near the unit circle
    assert np.abs(np.abs(ev[0]) - 1.0) < 0.2
    rec = mssa.getReconstructedKoopman(0)
    assert "halo" in rec and rec["halo"].Times() == coefs.Times()

    # zerodata + background restores the working data
    orig = np.array(coefs.getAllCoefs())
    coefs.zerodata()
    assert np.abs(np.array(coefs.getAllCoefs())).max() == 0.0
    mssa.background()
    np.testing.assert_allclose(np.array(coefs.getAllCoefs()), orig)


def test_kddensity_and_reader_summary(snapshot, capsys):
    """util.KDdensity point/index density; reader NumFiles/PrintSummary
    (UtilWrappers.cc:248, ParticleReaderWrappers.cc)."""
    path, x, v, mass = snapshot
    reader = pyEXP.read.ParticleReader.createReader("ascii", path)
    assert reader.NumFiles() == 1
    reader.PrintSummary(verbose=True)
    out = capsys.readouterr().out
    assert "N=3000" in out and "COM=" in out

    kd = pyEXP.util.KDdensity(reader, Ndens=16)
    rho_in = kd.getDensityAtPoint(0.3, 0.0, 0.0)
    rho_out = kd.getDensityAtPoint([8.0, 0.0, 0.0])
    assert rho_in > 30 * rho_out > 0
    assert kd.getDensityByIndex(0) > 0


def test_field_basis_compat(snapshot):
    """pyEXP.basis.FieldBasis / VelocityBasis with addPSFunction
    (BasisWrappers.cc FieldBasis; FieldBasis.cc:41)."""
    path, x, v, mass = snapshot
    fb = pyEXP.basis.VelocityBasis(
        "{parameters: {modelname: hernquist, lmax: 2, nmax: 6, dof: 3}}")
    fb.addPSFunction(lambda m, pos, vel: [float(vel @ vel)], ["v2"])
    reader = pyEXP.read.ParticleReader.createReader("ascii", path)
    coefs = fb.createFromReader(reader)
    assert {"dens", "vr", "vt", "vp", "v2"} <= set(coefs)
    out = fb.getFields(coefs, 0.5, 0.0, 0.0)
    # isotropic equilibrium: mean radial velocity ~ 0, v2 > 0
    assert abs(out["vr"]) < 0.2 * np.sqrt(out["v2"])
    assert out["v2"] > 0
    # incremental API matches one-shot
    fb2 = pyEXP.basis.VelocityBasis(
        "{parameters: {modelname: hernquist, lmax: 2, nmax: 6, dof: 3}}")
    fb2.initFromArray()
    ps6 = np.concatenate([x, v], axis=1)
    fb2.addFromArray(mass, ps6)
    c2 = fb2.makeFromArray()
    np.testing.assert_allclose(c2["vr"], coefs["vr"], rtol=1e-8, atol=1e-12)
    # tables + ortho
    grams = fb.orthoCheck()
    assert len(grams) == 3
