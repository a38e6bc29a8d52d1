"""Kinematic Fourier coefficient tools (psp2bess / psp2lagu /
psp2rings), SPL split-PSP IO, and the small PSP converters."""

import os

import numpy as np
import pytest


# ---------------------------------------------------------------- bases

def test_bess_basis_orthonormal():
    """J_m(alpha_mn R/rmax)/(N rmax) is orthonormal under R dR on
    [0, rmax] (Bess.H normalization)."""
    from exp_tpu.analysis.kincoefs import BessBasis

    rmax = 0.04
    for m in (0, 2):
        b = BessBasis(m, 5)
        R = np.linspace(0, rmax, 20001)[1:]
        B = b(R / rmax) / rmax                    # (N, nmax)
        G = (B * R[:, None]).T @ B * (R[1] - R[0])
        assert np.allclose(G, np.eye(5), atol=2e-3)


def test_lagu_basis_orthonormal():
    """L^1_n(2r/a) e^{-r/a} / (a sqrt(1+n)/2) is orthonormal under
    r dr on [0, inf) (psp2lagu.cc Laguerre)."""
    from exp_tpu.analysis.kincoefs import LaguBasis

    a = 0.01
    b = LaguBasis(a, 5)
    r = np.linspace(0, 40 * a, 40001)[1:]
    B = b(r)
    G = (B * r[:, None]).T @ B * (r[1] - r[0])
    assert np.allclose(G, np.eye(5), atol=2e-3)


def _pattern_disk(n=40000, seed=0, rmax=0.04):
    """Uniform-in-R ring disk with a pure m=2 tangential pattern."""
    rng = np.random.default_rng(seed)
    R = rng.uniform(0.2 * rmax, 0.9 * rmax, n)
    phi = rng.uniform(-np.pi, np.pi, n)
    x = np.stack([R * np.cos(phi), R * np.sin(phi), np.zeros(n)], 1)
    vt = 1.0 + 0.5 * np.cos(2 * phi) + 0.25 * np.sin(2 * phi)
    v = np.stack([-vt * np.sin(phi), vt * np.cos(phi), np.zeros(n)], 1)
    mass = np.full(n, 1.0 / n)
    return mass, x, v, R, phi


def test_ring_coefs_recover_m2_pattern():
    from exp_tpu.analysis.kincoefs import ring_coefs

    rmax = 0.04
    mass, x, v, R, phi = _pattern_disk(rmax=rmax)
    cos_c, sin_c = ring_coefs(mass, x, v, 0.0, rmax, 10, mmin=1, mmax=3)
    # <vt cos 2phi> = 0.25, <vt sin 2phi> = 0.125 in every populated ring
    pop = slice(2, 9)                 # rings inside [0.2, 0.9] rmax
    assert np.allclose(cos_c[1, 1, pop], 0.25, atol=0.03)
    assert np.allclose(sin_c[1, 1, pop], 0.125, atol=0.03)
    # no m=1 or m=3 power
    assert np.max(np.abs(cos_c[0, 1, pop])) < 0.03
    assert np.max(np.abs(cos_c[2, 1, pop])) < 0.03


def test_bess_coefs_density_roundtrip():
    """Projecting sampled density onto the orthonormal Bessel set and
    re-summing the m=0 series recovers the (uniform-in-R) line density
    profile lambda(R)/(2 pi R) ~ 1/R."""
    from exp_tpu.analysis.kincoefs import BessBasis, bess_coefs

    rmax = 0.04
    mass, x, v, R, phi = _pattern_disk(n=200000, rmax=rmax)
    cos_c, sin_c = bess_coefs(mass, x, v, rmax, mmax=2, nmax=16)
    # density coefficients: a_n = int Sigma(R) f_n(R) R dR 2pi-angle part;
    # reconstruct Sigma at test radii and compare with the known sampling
    # density Sigma(R) = M / (0.7 rmax * 2 pi R)
    b = BessBasis(0, 16)
    Rt = np.array([0.3, 0.5, 0.7]) * rmax
    # the m=0 angular factor: 1/sqrt(pi) * 1/sqrt(2) applied once in the
    # projection; the reconstruction carries the same factor so that
    # sum_n a_n f_n(R) * (angnorm) = Sigma(R)
    angnorm = 0.5 * 2.0 / np.sqrt(np.pi) * np.sqrt(0.5)
    rec = (b(Rt / rmax) / rmax) @ cos_c[0, 0] * angnorm
    expect = 1.0 / (0.7 * rmax * 2 * np.pi * Rt)
    assert np.allclose(rec, expect, rtol=0.08)


def test_lagu_coefs_velocity_orthogonality():
    """The m=2 vt rows carry the pattern; m=1 and m=3 stay near zero."""
    from exp_tpu.analysis.kincoefs import lagu_coefs

    mass, x, v, R, phi = _pattern_disk()
    cos_c, sin_c = lagu_coefs(mass, x, v, 0.02, mmax=3, nmax=6)
    p2 = np.linalg.norm(cos_c[2, 2]) + np.linalg.norm(sin_c[2, 2])
    p1 = np.linalg.norm(cos_c[1, 2]) + np.linalg.norm(sin_c[1, 2])
    p3 = np.linalg.norm(cos_c[3, 2]) + np.linalg.norm(sin_c[3, 2])
    assert p2 > 10 * max(p1, p3)


# ------------------------------------------------------- binary formats

def test_coef_file_roundtrip(tmp_path):
    from exp_tpu.analysis import kincoefs as K

    assert K.BESS_HEADER.itemsize == 32      # C++ struct w/ padding
    assert K.LAGU_HEADER.itemsize == 32
    assert K.RING_HEADER.itemsize == 16

    rng = np.random.default_rng(1)
    cb, sb = rng.normal(size=(2, 3, 4, 8))
    sb[0] = 0.0
    p = tmp_path / "t.bess_coefs"
    with open(p, "wb") as fh:
        K.write_bess_coefs(fh, 1.5, 0.04, cb, sb)
        K.write_bess_coefs(fh, 2.5, 0.04, cb * 2, sb * 2)
    blocks = K.read_bess_coefs(p)
    assert [b["time"] for b in blocks] == [1.5, 2.5]
    assert blocks[0]["ms"] == [0, 1, 2]
    np.testing.assert_allclose(blocks[1]["cos"], cb * 2)
    np.testing.assert_allclose(blocks[1]["sin"], sb * 2)

    p = tmp_path / "t.lagu_coefs"
    with open(p, "wb") as fh:
        K.write_lagu_coefs(fh, 0.25, 0.01, cb, sb)
    lb = K.read_lagu_coefs(p)
    assert lb[0]["rscl"] == 0.01
    np.testing.assert_allclose(lb[0]["cos"], cb)

    cr, sr = rng.normal(size=(2, 4, 3, 10))
    p = tmp_path / "t.ring_coefs"
    with open(p, "wb") as fh:
        K.write_ring_preamble(fh, 0.0, 0.04, 10)
        K.write_ring_coefs(fh, 3.0, cr, sr, mmin=1)
    rb = K.read_ring_coefs(p)
    assert len(rb["redge_lo"]) == 10 and rb["redge_hi"][-1] == 0.04
    assert rb["blocks"][0]["ms"] == [1, 2, 3, 4]
    np.testing.assert_allclose(rb["blocks"][0]["cos"], cr)
    np.testing.assert_allclose(rb["blocks"][0]["sin"], sr)


# ------------------------------------------------------------ SPL files

def _dump(n=100, seed=0, with_attrs=False):
    from exp_tpu.io.psp import PSPComponent, PSPDump

    rng = np.random.default_rng(seed)
    c = PSPComponent(
        name="disk", info="name: disk\n",
        mass=rng.uniform(0.5, 1.0, n), x=rng.normal(size=(n, 3)),
        v=rng.normal(size=(n, 3)), pot=rng.normal(size=n),
        iattr=rng.integers(0, 9, (n, 2)).astype(np.int32)
        if with_attrs else None,
        dattr=rng.normal(size=(n, 1)) if with_attrs else None)
    return PSPDump(time=0.75, components=[c])


@pytest.mark.parametrize("indexing", [False, True])
def test_spl_roundtrip(tmp_path, indexing):
    from exp_tpu.io.psp import read_spl, write_spl

    d = _dump(n=101, with_attrs=True)
    master = str(tmp_path / "SPL.run9.00003")
    write_spl(master, d, nparts=3, indexing=indexing)
    back = read_spl(master)
    assert back.time == d.time
    c0, c1 = d.components[0], back.components[0]
    np.testing.assert_allclose(c1.mass, c0.mass)
    np.testing.assert_allclose(c1.x, c0.x)
    np.testing.assert_allclose(c1.dattr, c0.dattr)
    np.testing.assert_array_equal(c1.iattr, c0.iattr)
    if indexing:
        np.testing.assert_array_equal(c1.indx, np.arange(1, 102))
    else:
        assert c1.indx is None


def test_spl2psp_cli(tmp_path, capsys):
    from exp_tpu.cli.spl2psp import main as spl2psp
    from exp_tpu.io.psp import read_psp, write_spl

    for seq in (0, 1):
        write_spl(str(tmp_path / f"SPL.runA.{seq:05d}"), _dump(seed=seq),
                  nparts=2)
    assert spl2psp(["-d", str(tmp_path), "-r", "runA",
                    "-1", "0", "-2", "1"]) == 0
    for seq in (0, 1):
        out = tmp_path / f"OUT.runA.{seq:05d}"
        assert out.exists()
        back = read_psp(str(out))
        np.testing.assert_allclose(back.components[0].mass,
                                   _dump(seed=seq).components[0].mass)


def test_reader_spl_dispatch(tmp_path):
    from exp_tpu.io.psp import write_spl
    from exp_tpu.io.readers import createReader

    master = str(tmp_path / "SPL.runB.00000")
    write_spl(master, _dump(), nparts=2)
    s = createReader("pspspl", master)
    assert len(s["disk"]["mass"]) == 100
    s2 = createReader("psp", master)      # filename sniffing path
    assert len(s2["disk"]["mass"]) == 100


# ---------------------------------------------------------- CLI drivers

def _write_sequence(tmp_path, nsnap=2):
    from exp_tpu.io.psp import PSPComponent, PSPDump, write_psp

    rmax = 0.04
    for n in range(nsnap):
        mass, x, v, R, phi = _pattern_disk(n=20000, seed=n, rmax=rmax)
        d = PSPDump(time=0.1 * n, components=[PSPComponent(
            name="comp", info="name: comp\n", mass=mass, x=x, v=v,
            pot=np.zeros(len(mass)))])
        write_psp(str(tmp_path / f"OUT.runK.{n:05d}"), d)
    return rmax


def test_kincoef_clis(tmp_path, monkeypatch):
    from exp_tpu.analysis import kincoefs as K
    from exp_tpu.cli.psp2bess import main as psp2bess
    from exp_tpu.cli.psp2lagu import main as psp2lagu
    from exp_tpu.cli.psp2rings import main as psp2rings

    rmax = _write_sequence(tmp_path)
    monkeypatch.chdir(tmp_path)
    assert psp2bess(["-T", "runK", "-R", str(rmax), "-n", "6",
                     "-s", "bess_coefs"]) == 0
    blocks = K.read_bess_coefs(tmp_path / "runK.bess_coefs")
    assert len(blocks) == 2 and blocks[1]["time"] == pytest.approx(0.1)
    assert blocks[0]["cos"].shape == (5, 4, 6)

    assert psp2lagu(["-T", "runK", "-a", "0.02", "-n", "5",
                     "-M", "3"]) == 0
    lb = K.read_lagu_coefs(tmp_path / "runK.lagu_coefs")
    assert lb[0]["cos"].shape == (4, 4, 5)

    assert psp2rings(["-T", "runK", "-R", str(rmax), "-b", "8"]) == 0
    rb = K.read_ring_coefs(tmp_path / "runK.ring_coefs")
    assert len(rb["blocks"]) == 2
    # the m=2 tangential pattern shows up in the ring coefficients
    assert np.allclose(rb["blocks"][0]["cos"][1, 1, 3:6], 0.25, atol=0.05)


def test_psp2range_pspreal(tmp_path, capsys):
    from exp_tpu.cli.psp2range import main as psp2range
    from exp_tpu.cli.pspreal import main as pspreal
    from exp_tpu.io.psp import read_psp, write_psp

    d = _dump(with_attrs=True)
    p = str(tmp_path / "OUT.t.00000")
    write_psp(p, d)
    assert psp2range([p]) == 0
    out = capsys.readouterr().out
    assert "mass" in out and "datr" in out and "disk" in out

    assert pspreal([p, "-o", str(tmp_path / "f4.psp")]) == 0
    back = read_psp(str(tmp_path / "f4.psp"))
    np.testing.assert_allclose(back.components[0].mass,
                               d.components[0].mass, rtol=1e-6)
    assert back.components[0].mass.dtype == np.float64  # promoted on read


def test_hdf52accel(tmp_path):
    import h5py

    from exp_tpu.cli.ics_tools import hdf52accel

    n = 50
    rng = np.random.default_rng(3)
    src = str(tmp_path / "snap.hdf5")
    with h5py.File(src, "w") as f:
        h = f.create_group("Header")
        h.attrs["MassTable"] = np.array([0, 0, 0.25, 0, 0, 0.0])
        g = f.create_group("PartType2")
        g.create_dataset("Coordinates", data=rng.normal(size=(n, 3)))
        g.create_dataset("Acceleration", data=rng.normal(size=(n, 3)))
    out = str(tmp_path / "force.data")
    assert hdf52accel(["--hdf5", src, "--output", out]) == 0
    with open(out, "rb") as fh:
        buf = fh.read()
    assert int(np.frombuffer(buf, np.int32, 1, 0)[0]) == n
    rec = np.frombuffer(buf, dtype=[("mass", "f4"), ("pos", "f4", (3,)),
                                    ("acc", "f4", (3,))], count=n,
                        offset=4)
    assert np.allclose(rec["mass"], 0.25)
    with h5py.File(src, "r") as f:
        np.testing.assert_allclose(rec["pos"],
                                   f["PartType2/Coordinates"][...],
                                   rtol=1e-6)


def test_psphisto_2d(tmp_path):
    """--field2 writes the 2D (R, z) mass grid (gas2dcyl / psp2histo)."""
    from exp_tpu.cli.psptools import psphisto
    from exp_tpu.io.psp import write_psp

    d = _dump(n=4000, seed=4)
    p = str(tmp_path / "h.psp")
    write_psp(p, d)
    out = str(tmp_path / "rz.histo")
    psphisto([p, "--field", "R", "--field2", "z", "--nbins", "10",
              "--nbins2", "6", "-o", out])
    rows = np.loadtxt(out)
    assert rows.shape == (10, 7)              # R center + 6 z columns
    np.testing.assert_allclose(rows[:, 1:].sum(),
                               d.components[0].mass.sum(), rtol=1e-6)


def test_mssafilter_multirun(tmp_path, capsys):
    """exp_haloN mode: joint M-SSA over several runs' channels with
    per-run recon/recon_diff outputs."""
    from exp_tpu.analysis.coefs import Coefs
    from exp_tpu.cli.mssafilter import main as mssafilter

    rng = np.random.default_rng(9)
    files = []
    bases = []
    for k in range(2):
        c = Coefs(geometry="sphere", name=f"r{k}",
                  meta={"lmax": 1, "nmax": 3})
        base = rng.normal(0, 1, (2, 2, 2, 3))
        for l in range(2):
            base[:, l, l + 1:] = 0.0
        base[1, :, 0] = 0.0
        bases.append(base)
        for i in range(48):
            sig = base * (1.0 + 0.5 * np.sin(2 * np.pi * i / 24.0))
            noise = 0.01 * rng.normal(0, 1, base.shape)
            for l in range(2):
                noise[:, l, l + 1:] = 0.0
            noise[1, :, 0] = 0.0
            c.add(i * 0.1, sig + noise)
        f = str(tmp_path / f"c{k}.h5")
        c.to_file(f)
        files.append(f)

    pre = str(tmp_path / "nf")
    assert mssafilter(["-d", files[0], "-d", files[1], "-o", pre,
                       "-W", "12", "-e", "0.05"]) == 0
    out = capsys.readouterr().out
    assert "keeping" in out
    for k in range(2):
        rec = Coefs.from_file(f"{pre}.{k}.recon")
        dif = Coefs.from_file(f"{pre}.{k}.recon_diff")
        A = Coefs.from_file(files[k]).as_array()
        R, D = rec.as_array(), dif.as_array()
        assert np.allclose(R + D, A, atol=1e-10)
        assert np.abs(D).mean() < 0.1 * np.abs(A).mean()


def test_snap2vtk_grid(tmp_path):
    """--grid writes the makegrid.cc STRUCTURED_POINTS density volume."""
    from exp_tpu.cli.psptools import snap2vtk
    from exp_tpu.io.psp import write_psp

    d = _dump(n=2000, seed=6)
    p = str(tmp_path / "g.psp")
    write_psp(p, d)
    out = str(tmp_path / "g.vtk")
    snap2vtk([p, "--grid", "8", "--rmax", "3.0", "-o", out])
    txt = open(out).read()
    assert "STRUCTURED_POINTS" in txt and "DIMENSIONS 8 8 8" in txt
    vals = np.loadtxt(out, skiprows=10)
    # total mass recovered: sum(density) * cell volume
    dx = 6.0 / 8
    np.testing.assert_allclose(vals.sum() * dx ** 3,
                               d.components[0].mass[
                                   (np.abs(d.components[0].x) < 3.0)
                                   .all(axis=1)].sum(), rtol=1e-5)


def test_makecoefs_coefstoh5(tmp_path, capsys):
    import yaml

    from exp_tpu.analysis.coefs import Coefs
    from exp_tpu.cli.analysis_tools import coefstoh5, makecoefs
    from exp_tpu.ic.eddington import sample_spherical_model
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.io.psp import PSPComponent, PSPDump, write_psp

    stanza = {"id": "sphereSL",
              "parameters": {"modelname": "hernquist", "Lmax": 2,
                             "nmax": 4, "numr": 400, "rmin": 1e-3,
                             "rmax": 20.0, "rmapping": 1.0}}
    cfg = str(tmp_path / "b.yml")
    with open(cfg, "w") as fh:
        yaml.safe_dump(stanza, fh)
    m = hernquist_model(rmin=1e-3, rmax=20.0)
    files = []
    for k in range(2):
        x, v, mass = sample_spherical_model(m, 4000, seed=k)
        f = str(tmp_path / f"OUT.mk.{k:05d}")
        write_psp(f, PSPDump(time=0.1 * k, components=[PSPComponent(
            name="halo", info="name: halo\n", mass=mass, x=x, v=v,
            pot=np.zeros(len(mass)))]))
        files.append(f)
    out = str(tmp_path / "mk.h5")
    assert makecoefs(files + ["--config", cfg, "--type", "psp",
                              "-o", out]) == 0
    c = Coefs.from_file(out)
    assert len(c.times()) == 2 and c.geometry == "sphere"
    # the monopole dominates an equilibrium sample
    arr = c(c.times()[0])
    assert np.abs(arr[0, 0, 0]).max() > 5 * np.abs(arr[0, 2]).max()


def test_every_tool_help():
    """Every registered CLI tool has a main() whose --help exits 0 —
    catches argparse wiring/option-conflict regressions across the
    whole 54-tool registry."""
    import contextlib
    import importlib
    import io

    from exp_tpu.cli import TOOLS

    for t in TOOLS:
        mod = importlib.import_module(f"exp_tpu.cli.{t}")
        with pytest.raises(SystemExit) as e, \
                contextlib.redirect_stdout(io.StringIO()):
            mod.main(["--help"])
        assert e.value.code in (0, None), t


def test_outspl_writer(tmp_path):
    """The outspl writer emits the reference's split SPL format from a
    real run; readable directly and via spl2psp assembly."""
    import yaml

    from exp_tpu.cli.spl2psp import main as spl2psp
    from exp_tpu.io.psp import read_psp, read_spl
    from exp_tpu.nbody.simulation import Simulation
    from exp_tpu.config import RunConfig
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.ic.eddington import sample_spherical_model
    from exp_tpu.nbody.particles import write_ascii_bodies

    m = hernquist_model(rmin=1e-3, rmax=20.0)
    x, v, mass = sample_spherical_model(m, 1500, seed=2)
    bods = str(tmp_path / "h.bods")
    write_ascii_bodies(bods, (x, v, mass))
    conf = {
        "Global": {"dtime": 0.02, "nsteps": 4, "runtag": "spltest",
                   "outdir": str(tmp_path)},
        "Components": [{"name": "halo", "bodyfile": bods,
                        "force": {"id": "sphereSL",
                                  "parameters": {"lmax": 1, "nmax": 4,
                                                 "modelname":
                                                 "hernquist"}}}],
        "Output": [{"id": "outspl",
                    "parameters": {"nint": 2, "nparts": 3}}],
    }
    cfg = str(tmp_path / "run.yml")
    with open(cfg, "w") as fh:
        yaml.safe_dump(conf, fh)
    sim = Simulation(RunConfig.from_file(cfg), workdir=str(tmp_path))
    sim.run()
    master = tmp_path / "SPL.spltest.00004"
    assert master.exists()
    d = read_spl(str(master))
    assert len(d.components[0].mass) == 1500
    assert spl2psp(["-d", str(tmp_path), "-r", "spltest", "-s", "4"]) == 0
    back = read_psp(str(tmp_path / "OUT.spltest.00004"))
    np.testing.assert_allclose(back.components[0].x.sum(),
                               d.components[0].x.sum(), rtol=1e-6)


def test_spl_indexing_yaml_parse(tmp_path):
    """Reference-style component configs with 'indexing: false' next to
    other true/1 values must NOT be sniffed as indexed (the naive
    substring check misread them); write_spl rewrites a contradicting
    header so the reference reader's cconf['indexing'] stays truthful."""
    from exp_tpu.io.psp import (PSPComponent, PSPDump, _info_indexing,
                                read_spl, write_spl)

    info = ("name: halo\nindexing: false\nnlevel: 1\n"
            "self_consistent: true\n")
    assert _info_indexing(info) is False
    assert _info_indexing("name: x\nindexing: true\n") is True
    assert _info_indexing("name: x\n") is False

    rng = np.random.default_rng(4)
    c = PSPComponent(name="halo", info=info, mass=rng.uniform(1, 2, 20),
                     x=rng.normal(size=(20, 3)),
                     v=rng.normal(size=(20, 3)), pot=np.zeros(20))
    # records carry indices -> the header must be rewritten to true
    m1 = str(tmp_path / "SPL.ix.00000")
    write_spl(m1, PSPDump(time=0.0, components=[c]), nparts=2,
              indexing=True)
    back = read_spl(m1)
    np.testing.assert_array_equal(back.components[0].indx,
                                  np.arange(1, 21))
    # records carry NO indices -> 'indexing: false' header preserved
    m2 = str(tmp_path / "SPL.ix.00001")
    write_spl(m2, PSPDump(time=0.0, components=[c]), nparts=2,
              indexing=False)
    back2 = read_spl(m2)
    assert back2.components[0].indx is None
    np.testing.assert_allclose(back2.components[0].mass, c.mass)


def test_h5power(tmp_path, capsys):
    from exp_tpu.analysis.coefs import Coefs
    from exp_tpu.cli.analysis_tools import h5power

    rng = np.random.default_rng(7)
    c = Coefs(geometry="sphere", name="t", meta={"lmax": 2, "nmax": 3})
    base = rng.normal(size=(2, 3, 3, 3))
    for i in range(5):
        c.add(0.1 * i, base * (1 + i))
    f = str(tmp_path / "p.h5")
    c.to_file(f)
    out = str(tmp_path / "p.pow")
    assert h5power([f, "-o", out]) == 0
    tab = np.loadtxt(out)
    assert tab.shape[0] == 5 and tab.shape[1] >= 2
    # power grows with the (1+i) scaling: strictly increasing rows
    assert np.all(np.diff(tab[:, 1]) > 0)


def test_outpsq_id_nbeg_counter(tmp_path):
    """The outpsq/outpsr ids write split dumps numbered by the nbeg
    sequence counter (src/OutPSQ.H:6-24), not the step number."""
    import yaml

    from exp_tpu.io.psp import read_spl
    from exp_tpu.nbody.simulation import Simulation
    from exp_tpu.config import RunConfig
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.ic.eddington import sample_spherical_model
    from exp_tpu.nbody.particles import write_ascii_bodies

    m = hernquist_model(rmin=1e-3, rmax=20.0)
    x, v, mass = sample_spherical_model(m, 400, seed=3)
    bods = str(tmp_path / "h.bods")
    write_ascii_bodies(bods, (x, v, mass))
    conf = {
        "Global": {"dtime": 0.02, "nsteps": 4, "runtag": "qtest",
                   "outdir": str(tmp_path)},
        "Components": [{"name": "halo", "bodyfile": bods,
                        "force": {"id": "sphereSL",
                                  "parameters": {"lmax": 1, "nmax": 4,
                                                 "modelname":
                                                 "hernquist"}}}],
        "Output": [{"id": "outpsq",
                    "parameters": {"nint": 2, "nparts": 2, "nbeg": 7}}],
    }
    cfg = str(tmp_path / "run.yml")
    with open(cfg, "w") as fh:
        yaml.safe_dump(conf, fh)
    sim = Simulation(RunConfig.from_file(cfg), workdir=str(tmp_path))
    sim.run()
    # dumps at steps 0,2,4 -> sequence suffixes 7,8,9
    for suf in (7, 8, 9):
        assert (tmp_path / f"SPL.qtest.{suf:05d}").exists()
    d = read_spl(str(tmp_path / "SPL.qtest.00009"))
    assert len(d.components[0].mass) == 400
