"""PSP binary round-trip, reader family, OutPSN driver output."""

import numpy as np
import pytest

from exp_tpu.io.psp import PSPDump, PSPComponent, write_psp, read_psp
from exp_tpu.io.readers import (Snapshot, createReader, read_gadget_hdf5,
                                write_gadget_hdf5, read_tipsy)


def _dump(n=100, ncomp=2, seed=0):
    rng = np.random.default_rng(seed)
    d = PSPDump(time=1.25)
    for c in range(ncomp):
        d.components.append(PSPComponent(
            name=f"c{c}", info=f"name: c{c}\n",
            mass=rng.uniform(0.5, 1.0, n),
            x=rng.normal(0, 1, (n, 3)),
            v=rng.normal(0, 1, (n, 3)),
            pot=-rng.uniform(0, 1, n)))
    return d


@pytest.mark.parametrize("real4,indexing", [(False, False), (True, False),
                                            (False, True), (True, True)])
def test_psp_roundtrip(tmp_path, real4, indexing):
    d = _dump()
    p = tmp_path / "OUT.test"
    write_psp(str(p), d, real4=real4, indexing=indexing)
    back = read_psp(str(p))
    assert back.time == 1.25
    assert len(back.components) == 2
    for c0, c1 in zip(d.components, back.components):
        tol = 1e-6 if real4 else 1e-14
        np.testing.assert_allclose(c1.mass, c0.mass, rtol=tol)
        np.testing.assert_allclose(c1.x, c0.x, rtol=tol, atol=tol)
        np.testing.assert_allclose(c1.pot, c0.pot, rtol=tol, atol=tol)
        assert c1.name == c0.name


def test_psp_multidump(tmp_path):
    p = tmp_path / "OUT.run"
    write_psp(str(p), _dump(seed=1))
    d2 = _dump(seed=2)
    d2.time = 2.5
    write_psp(str(p), d2, append=True)
    dumps = read_psp(str(p))
    assert isinstance(dumps, list) and len(dumps) == 2
    assert dumps[0].time == 1.25 and dumps[1].time == 2.5


def test_psp_multidump_indexed_one_octant(tmp_path):
    """Indexed multi-dump OUT files parse deterministically even when all
    positions/velocities are non-negative (regression: the old mass-sanity
    heuristic could misread the indexed layout as non-indexed here)."""
    rng = np.random.default_rng(7)
    p = tmp_path / "OUT.oct"
    for k, t in enumerate([0.5, 1.0, 1.5]):
        d = PSPDump(time=t)
        n = 64
        d.components.append(PSPComponent(
            name="oct", info="name: oct\n",
            mass=rng.uniform(0.5, 1.0, n),
            x=rng.uniform(0.0, 1.0, (n, 3)),       # one octant: all >= 0
            v=rng.uniform(0.0, 1.0, (n, 3)),
            pot=np.zeros(n)))
        write_psp(str(p), d, indexing=True, append=(k > 0))
    dumps = read_psp(str(p))
    assert isinstance(dumps, list) and len(dumps) == 3
    for k, t in enumerate([0.5, 1.0, 1.5]):
        assert dumps[k].time == t
        c = dumps[k].components[0]
        assert c.indx is not None
        np.testing.assert_array_equal(c.indx, np.arange(1, 65))
        assert np.all(c.mass >= 0.5) and np.all(c.mass <= 1.0)


def test_gadget_hdf5_roundtrip(tmp_path):
    s = Snapshot(0.5)
    rng = np.random.default_rng(3)
    s.add("halo", rng.normal(0, 1, (50, 3)), rng.normal(0, 1, (50, 3)),
          np.full(50, 0.02))
    p = tmp_path / "snap.h5"
    write_gadget_hdf5(str(p), s)
    back = read_gadget_hdf5(str(p))
    assert back.time == 0.5
    x, v, m = back.GetParticles()
    np.testing.assert_allclose(m, 0.02)
    assert x.shape == (50, 3)


def test_tipsy_read(tmp_path):
    # synthesize a little-endian tipsy file
    import numpy as np

    hdr = np.zeros(1, np.dtype([("time", "<f8"), ("nbodies", "<i4"),
                                ("ndim", "<i4"), ("nsph", "<i4"),
                                ("ndark", "<i4"), ("nstar", "<i4"),
                                ("pad", "<i4")]))
    hdr["time"] = 0.75
    hdr["nbodies"] = 10
    hdr["ndim"] = 3
    hdr["ndark"] = 10
    dark = np.zeros(10, np.dtype([("mass", "<f4"), ("pos", "<f4", (3,)),
                                  ("vel", "<f4", (3,)), ("eps", "<f4"),
                                  ("phi", "<f4")]))
    dark["mass"] = 0.1
    dark["pos"] = np.arange(30).reshape(10, 3)
    p = tmp_path / "snap.tipsy"
    with open(p, "wb") as f:
        f.write(hdr.tobytes())
        f.write(dark.tobytes())
    s = read_tipsy(str(p))
    assert s.time == 0.75
    x, v, m = s.GetParticles("dark")
    np.testing.assert_allclose(m, 0.1, rtol=1e-6)
    assert x[3, 1] == 10.0


def test_tipsy_write_roundtrip(tmp_path):
    """write_tipsy emits the XDR 'standard' layout (big-endian, 28-byte
    header) that read_tipsy and the reference's tipsyxdr.c expect."""
    import numpy as np
    from exp_tpu.io.readers import Snapshot, write_tipsy

    rng = np.random.default_rng(3)
    s = Snapshot(1.25)
    s.add("gas", rng.normal(size=(7, 3)), rng.normal(size=(7, 3)),
          rng.uniform(0.1, 1, 7), pot=rng.normal(size=7))
    s.add("dark", rng.normal(size=(11, 3)), rng.normal(size=(11, 3)),
          rng.uniform(0.1, 1, 11), pot=rng.normal(size=11))
    s.add("star", rng.normal(size=(5, 3)), rng.normal(size=(5, 3)),
          rng.uniform(0.1, 1, 5))
    p = tmp_path / "out.tipsy"
    write_tipsy(str(p), s, eps=0.01)
    # unpadded 28-byte header + full payload, big-endian time
    raw = p.read_bytes()
    assert len(raw) == 28 + 7 * 48 + 11 * 36 + 5 * 44
    assert np.frombuffer(raw, ">f8", 1)[0] == 1.25
    back = read_tipsy(str(p))
    assert back.time == 1.25
    assert sorted(back.GetTypes()) == ["dark", "gas", "star"]
    for name in ("gas", "dark", "star"):
        x0, v0, m0 = s.GetParticles(name)
        x1, v1, m1 = back.GetParticles(name)
        np.testing.assert_allclose(x1, x0, rtol=1e-6)
        np.testing.assert_allclose(v1, v0, rtol=1e-6)
        np.testing.assert_allclose(m1, m0, rtol=1e-6)
    np.testing.assert_allclose(back["gas"]["pot"], s["gas"]["pot"],
                               rtol=1e-6)


def test_outpsn_driver(tmp_path):
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.ic.eddington import sample_spherical_model
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation

    m = hernquist_model(rmin=1e-4, rmax=20.0, numr=600)
    m.to_file(tmp_path / "h.model")
    x, v, mass = sample_spherical_model(m, 1000, seed=9)
    write_ascii_bodies(tmp_path / "h.bods", (x, v, mass))
    (tmp_path / "c.yml").write_text("""\
Global:
  dtime: 0.02
  nsteps: 4
  runtag: psn0
Components:
  - name: halo
    bodyfile: h.bods
    force:
      id: sphereSL
      parameters: {numr: 400, Lmax: 2, nmax: 6, rmapping: 1.0,
                   modelname: h.model}
Output:
  - id: outpsn
    parameters: {nint: 2}
""")
    sim = Simulation.from_file(str(tmp_path / "c.yml"))
    sim.prime()
    sim.run()
    out = sorted(tmp_path.glob("OUT.psn0.*"))
    assert len(out) >= 2
    d = read_psp(str(out[-1]))
    assert d.components[0].name == "halo"
    assert len(d.components[0].mass) == 1000
    # and the reader factory path
    s = createReader("psp", str(out[-1]))
    xx, vv, mm = s.GetParticles("halo")
    assert xx.shape == (1000, 3)


def test_native_fastio(tmp_path):
    """Native parser == numpy on a table with extra attribute columns."""
    from exp_tpu import native

    if native.get_lib() is None:
        pytest.skip("no compiler for the native lib")
    rng = np.random.default_rng(5)
    n = 500
    arr = rng.normal(0, 1, (n, 9))     # 7 body columns + 2 attributes
    p = tmp_path / "t.bods"
    with open(p, "w") as f:
        f.write(f"{n} 0 2\n")
        np.savetxt(f, arr, fmt="%.10e")
    fast = native.read_ascii_table(str(p), max_rows=n, ncols=7, skip_lines=1)
    np.testing.assert_allclose(fast, arr[:, :7], rtol=1e-9)

    from exp_tpu.nbody.particles import read_ascii_bodies
    ps = read_ascii_bodies(str(p))
    assert ps.n == n
    np.testing.assert_allclose(np.asarray(ps.mass), arr[:, 0], rtol=1e-6)


def test_psp_restart(tmp_path):
    """infile: pointing at a PSP snapshot restarts the run (reference
    parity: OUT.runtag.chkpt is PSP in the reference)."""
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.ic.eddington import sample_spherical_model
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation
    from exp_tpu.nbody.output import restore_checkpoint
    from exp_tpu.io.psp import PSPDump, PSPComponent, write_psp

    m = hernquist_model(rmin=1e-4, rmax=20.0, numr=600)
    m.to_file(tmp_path / "h.model")
    x, v, mass = sample_spherical_model(m, 800, seed=8)
    write_ascii_bodies(tmp_path / "h.bods", (x, v, mass))
    (tmp_path / "c.yml").write_text("""\
Global: {dtime: 0.02, nsteps: 2, runtag: pr0}
Components:
  - name: halo
    bodyfile: h.bods
    force:
      id: sphereSL
      parameters: {numr: 400, Lmax: 1, nmax: 4, rmapping: 1.0,
                   modelname: h.model}
Output: []
""")
    # write a PSP with shifted positions and restart from it
    d = PSPDump(time=3.5, components=[PSPComponent(
        name="halo", info="name: halo\n", mass=mass, x=x + 0.1, v=v,
        pot=np.zeros(len(mass)))])
    write_psp(str(tmp_path / "snap.psp"), d)
    sim = Simulation.from_file(str(tmp_path / "c.yml"))
    restore_checkpoint(sim, str(tmp_path / "snap.psp"))
    assert sim.time == 3.5
    np.testing.assert_allclose(np.asarray(sim._state["halo"].x)[:800],
                               x + 0.1, atol=1e-6)
    sim.prime()
    sim.run(2)
    assert np.isfinite(np.asarray(sim._state["halo"].x)).all()


def test_outps_and_outhdf5_driver(tmp_path):
    """OutPS appends dumps to one OUT file; OutHDF5 writes a snapshot
    series; both round-trip."""
    import numpy as np
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation

    rng = np.random.default_rng(9)
    n = 100
    write_ascii_bodies(tmp_path / "b.bods",
                       (rng.normal(0, 0.5, (n, 3)),
                        rng.normal(0, 0.2, (n, 3)), np.full(n, 1.0 / n)))
    (tmp_path / "c.yml").write_text("""\
Global:
  dtime: 0.01
  nsteps: 4
  runtag: psrun
Components:
  - name: halo
    bodyfile: b.bods
    force: {id: noforce, parameters: {}}
Output:
  - id: outps
    parameters: {nint: 2, real4: false}
  - id: outhdf5
    parameters: {nint: 2}
""")
    sim = Simulation.from_file(str(tmp_path / "c.yml"))
    sim.prime()
    sim.run()
    from exp_tpu.io.psp import read_psp

    dumps = read_psp(tmp_path / "OUT.psrun")
    # initial dump at prime + one every 2 of 4 steps = 3
    assert isinstance(dumps, list) and len(dumps) == 3
    assert dumps[0].time < dumps[-1].time
    assert len(dumps[-1].components[0].mass) == n
    np.testing.assert_allclose(
        dumps[-1].components[0].x,
        np.asarray(sim._state["halo"].x)[:n], atol=1e-12)

    import h5py

    with h5py.File(tmp_path / "OUT.psrun.h5") as f:
        assert f.attrs["count"] == 3
        snap = f["snapshots/00000002"]
        assert abs(snap.attrs["Time"] - sim.time) < 1e-9
        np.testing.assert_allclose(snap["halo/pos"][()],
                                   np.asarray(sim._state["halo"].x)[:n],
                                   rtol=1e-6)


def test_gadget_native_roundtrip(tmp_path):
    """Gadget-1 native binary round-trip (ParticleReader.cc:103 parity):
    mixed per-type content, header-mass and mass-block variants."""
    from exp_tpu.io.readers import (Snapshot, read_gadget_native,
                                    write_gadget_native, createReader)

    rng = np.random.default_rng(11)
    s = Snapshot(0.75)
    s.add("Halo", rng.normal(0, 1, (200, 3)), rng.normal(0, 1, (200, 3)),
          rng.uniform(0.5, 1.0, 200))
    s.add("Disk", rng.normal(0, 1, (100, 3)), rng.normal(0, 1, (100, 3)),
          rng.uniform(0.1, 0.2, 100))
    p = tmp_path / "snap_000"
    write_gadget_native(str(p), s)

    back = read_gadget_native(str(p))
    assert back.time == 0.75
    assert set(back.GetTypes()) == {"Halo", "Disk"}
    for name in ("Halo", "Disk"):
        x0, v0, m0 = s.GetParticles(name)
        x1, v1, m1 = back.GetParticles(name)
        np.testing.assert_allclose(x1, x0, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(v1, v0, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(m1, m0, rtol=1e-6)

    via = createReader("gadgetnative", str(p))
    assert set(via.GetTypes()) == {"Halo", "Disk"}


def test_field_coefs_roundtrip(tmp_path):
    """SphFld field coefficient files: write a FieldBasis snapshot series,
    read it back through the factory, bit-exact (SphFldCoefs,
    expui/Coefficients.cc:461-560; fieldID dispatch :2953-2964)."""
    from exp_tpu.analysis.field_basis import FieldBasis
    from exp_tpu.basis.analytic import make_analytic_force
    from exp_tpu.io.coefs import open_coefs, pack_sph_matrix

    force = make_analytic_force("CBsphere", lmax=2, nmax=3)
    fb = FieldBasis(force, "spherical")
    rng = np.random.default_rng(1)
    snaps = []
    for _ in range(3):
        x = rng.normal(0, 0.3, (2000, 3)).astype(np.float32)
        v = rng.normal(0, 0.1, (2000, 3)).astype(np.float32)
        snaps.append((x, v, np.full(2000, 1 / 2000, np.float32)))
    ser = fb.create_from_snapshots(snaps)
    p = str(tmp_path / "fld.h5")
    fb.write_coefs(p, [0.0, 0.5, 1.0], ser, name="halo")
    times, back = FieldBasis.read_coefs(p)
    assert np.allclose(times, [0.0, 0.5, 1.0])
    for i in range(3):
        # default read returns the NATIVE layout so evaluate() can
        # consume the round-tripped series directly
        assert np.allclose(back["vt"][i], ser["vt"][i], atol=1e-12)
    ev = fb.evaluate({k: v[0] for k, v in back.items()},
                     rng.normal(0, 0.3, (64, 3)))
    assert np.isfinite(ev["vt"]).all()
    _, packed = FieldBasis.read_coefs(p, native_layout=False)
    for i in range(3):
        assert np.allclose(packed["vt"][i], pack_sph_matrix(ser["vt"][i]))
    with open_coefs(p) as f:
        assert f.geometry == "sphere" and f.nfld == 4
        assert f.labels == ["dens", "vr", "vt", "vp"]


def test_native_binary_coefs_roundtrip(tmp_path):
    """EXP native (pre-HDF5) outcoef binary files: new-style magic+YAML
    records and legacy raw-header records, sphere and cylinder
    (expui/Coefficients.cc readNativeCoefs; CoefStruct.cc read)."""
    import struct
    import numpy as np
    from exp_tpu.io.coefs import (read_native_coefs, pack_sph_matrix,
                                  _sph_prefactors)
    from exp_tpu.analysis.coefs import Coefs

    rng = np.random.default_rng(0)
    lmax, nmax = 2, 4
    coef = rng.normal(size=(2, lmax + 1, lmax + 1, nmax))
    for l in range(lmax + 1):       # zero invalid m > l and m=0 sin
        coef[:, l, l + 1:] = 0.0
    coef[1, :, 0] = 0.0
    mat = pack_sph_matrix(coef)     # 'true normed' packed matrix

    # -- new-style sphere record (normed: true) --------------------------
    p = tmp_path / "outcoef.sph.bin"
    with open(p, "wb") as f:
        for it, t in enumerate([0.0, 0.5]):
            hdr = (f"lmax: {lmax}\nnmax: {nmax}\ntime: {t}\n"
                   f"scale: 1.0\nnormed: true\nid: sphereSL\n").encode()
            f.write(struct.pack("<II", 0xc0a57a2, len(hdr)))
            f.write(hdr)
            m = mat * (1 + it)
            for ir in range(nmax):
                L = 0
                for l in range(lmax + 1):
                    for mm in range(l + 1):
                        f.write(struct.pack("<d", m[L, ir].real))
                        if mm:
                            f.write(struct.pack("<d", m[L, ir].imag))
                        L += 1
    geom, times, arrs, meta = read_native_coefs(str(p))
    assert geom == "sphere" and list(times) == [0.0, 0.5]
    np.testing.assert_allclose(arrs[0], coef, atol=1e-12)
    np.testing.assert_allclose(arrs[1], 2 * coef, atol=1e-12)
    c = Coefs.from_file(str(p))     # factory sniffs non-HDF5
    assert c.geometry == "sphere" and len(c.times()) == 2

    # -- legacy sphere record (un-normed; prefactors applied on read) ----
    p2 = tmp_path / "outcoef.sph.legacy.bin"
    fac = _sph_prefactors(lmax)
    with open(p2, "wb") as f:
        f.write(b"sphereSL".ljust(64, b"\0"))
        f.write(struct.pack("<ddii", 0.25, 1.0, nmax, lmax))
        for ir in range(nmax):
            L = 0
            for l in range(lmax + 1):
                for mm in range(l + 1):
                    f.write(struct.pack("<d", mat[L, ir].real / fac[l, mm]))
                    if mm:
                        f.write(struct.pack("<d",
                                            mat[L, ir].imag / fac[l, mm]))
                    L += 1
    geom, times, arrs, meta = read_native_coefs(str(p2))
    assert geom == "sphere" and times[0] == 0.25
    assert meta["forceID"] == "sphereSL"
    np.testing.assert_allclose(arrs[0], coef, atol=1e-12)

    # -- cylinder records (new-style + legacy) ---------------------------
    mmax, cn = 3, 5
    cc = rng.normal(size=(2, mmax + 1, cn))
    cc[1, 0] = 0.0
    p3 = tmp_path / "outcoef.cyl.bin"
    with open(p3, "wb") as f:
        hdr = f"time: 1.5\nnmax: {cn}\nmmax: {mmax}\n".encode()
        f.write(struct.pack("<II", 0xc0a57a3, len(hdr)))
        f.write(hdr)
        for mm in range(mmax + 1):
            f.write(cc[0, mm].astype("<f8").tobytes())
            if mm:
                f.write(cc[1, mm].astype("<f8").tobytes())
        # legacy header record appended to the same file
        f.write(struct.pack("<dii", 2.5, mmax, cn))
        for mm in range(mmax + 1):
            f.write(cc[0, mm].astype("<f8").tobytes())
            if mm:
                f.write(cc[1, mm].astype("<f8").tobytes())
    geom, times, arrs, meta = read_native_coefs(str(p3))
    assert geom == "cylinder" and list(times) == [1.5, 2.5]
    np.testing.assert_allclose(arrs[0], cc, atol=1e-12)
    np.testing.assert_allclose(arrs[1], cc, atol=1e-12)


def test_bytes_string_attrs(tmp_path):
    """Files whose string attributes are fixed-length ASCII (bytes in
    h5py — what the reference's HighFive writer produces) open cleanly."""
    import h5py
    import numpy as np
    from exp_tpu.io.coefs import open_coefs
    from exp_tpu.analysis.coefs import Coefs

    p = tmp_path / "ref_style.h5"
    with h5py.File(p, "w") as f:
        f.attrs["CoefficientOutputVersion"] = np.bytes_("1.0")
        f.attrs["geometry"] = np.bytes_("sphere")
        f.attrs["name"] = np.bytes_("dark halo")
        f.attrs["config"] = np.bytes_("")
        f.attrs["forceID"] = np.bytes_("sphereSL")
        f.attrs["lmax"] = np.int32(1)
        f.attrs["nmax"] = np.int32(2)
        f.attrs["scale"] = 1.0
        f.create_dataset("count", data=np.uint32(1))
        g = f.create_group("snapshots").create_group("00000000")
        g.attrs["Time"] = 0.0
        g.attrs["Center"] = np.zeros(3)
        g.create_dataset("coefficients",
                         data=np.ones((3, 2), np.complex128))
    cf = open_coefs(str(p))
    assert cf.geometry == "sphere" and cf.lmax == 1
    cf.close()
    c = Coefs.from_file(str(p))
    assert c.name == "dark halo"


def test_psp_truncated_tail_keeps_complete_dumps(tmp_path):
    """Reading a live (partially-written) OUT file returns the complete
    dumps instead of raising on the truncated tail."""
    p = tmp_path / "OUT.live"
    write_psp(str(p), _dump(seed=1))
    d2 = _dump(seed=2)
    d2.time = 2.5
    write_psp(str(p), d2, append=True)
    raw = p.read_bytes()
    for cut in (len(raw) - 37, len(raw) - len(raw) // 3):
        q = tmp_path / f"OUT.cut{cut}"
        q.write_bytes(raw[:cut])
        d = read_psp(str(q))
        d = d if isinstance(d, list) else [d]
        assert len(d) >= 1 and d[0].time == 1.25
        np.testing.assert_allclose(d[0].components[0].mass,
                                   _dump(seed=1).components[0].mass)
