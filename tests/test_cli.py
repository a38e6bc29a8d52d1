"""CLI toolbox tests: the full pipeline gensph -> run -> psp tools ->
analysis tools exercised end-to-end through the argv interfaces."""

import os
import numpy as np
import pytest


@pytest.fixture(scope="module")
def workdir(tmp_path_factory, monkeypatch_module=None):
    d = tmp_path_factory.mktemp("cliwork")
    return d


def test_gensph_and_stats(workdir, capsys):
    from exp_tpu.cli.gensph import main as gensph
    from exp_tpu.cli.psptools import ascii2psp, pspinfo, pspstat, psp2ascii

    bods = str(workdir / "h.bods")
    gensph(["-N", "2000", "-i", "hernquist", "-o", bods, "-s", "3"])
    assert os.path.exists(bods)

    psp = str(workdir / "h.psp")
    ascii2psp([bods, "-o", psp, "--name", "halo"])
    pspinfo([psp])
    out = capsys.readouterr().out
    assert "ntot=2000" in out and "halo" in out

    pspstat([psp])
    out = capsys.readouterr().out
    assert "N=2000" in out

    # --all iterates every dump of a multi-dump OUT file (pspstatT)
    from exp_tpu.io.psp import read_psp, write_psp

    d = read_psp(psp)
    multi = str(workdir / "h.out")
    write_psp(multi, d)
    d.time = 0.5
    write_psp(multi, d, append=True)
    pspstat([multi, "--all"])
    out = capsys.readouterr().out
    assert out.count("N=2000") == 2 and "time = 0.5" in out

    psp2ascii([psp, "-o", str(workdir / "back")])
    assert os.path.exists(str(workdir / "back.halo.ascii"))


def test_diffpsp(workdir, capsys):
    from exp_tpu.cli.psptools import diffpsp

    psp = str(workdir / "h.psp")
    assert diffpsp([psp, psp]) == 0
    out = capsys.readouterr().out
    assert "max=0" in out


def test_orthochk_slcheck(capsys):
    from exp_tpu.cli.analysis_tools import orthochk, slcheck

    assert orthochk(["-i", "hernquist", "--lmax", "1", "--nmax", "6",
                     "--numr", "500"]) == 0
    out = capsys.readouterr().out
    assert "PASS" in out

    slcheck(["-i", "plummer", "--lmax", "1", "--nmax", "4", "--numr", "400"])
    out = capsys.readouterr().out
    assert "eigenvalues" in out


def test_coef_tools(workdir, tmp_path, capsys):
    from exp_tpu.cli.analysis_tools import viewcoefs, h5compare, mssaprof
    from exp_tpu.analysis.coefs import Coefs

    # synthesize a small spherical coefficient file
    rng = np.random.default_rng(0)
    c = Coefs(geometry="sphere", name="t", meta={"lmax": 2, "nmax": 4})
    base = rng.normal(0, 1, (2, 3, 3, 4))
    for i in range(20):
        c.add(i * 0.1, base * (1 + 0.1 * np.sin(0.7 * i)))
    f1 = str(tmp_path / "a.h5")
    c.to_file(f1)

    viewcoefs([f1])
    out = capsys.readouterr().out
    assert "snaps=20" in out

    assert h5compare([f1, f1]) == 0
    c2 = c.deepcopy()
    c2._data[list(c2._data)[0]] = c2._data[list(c2._data)[0]] * 1.01
    f2 = str(tmp_path / "b.h5")
    c2.to_file(f2)
    assert h5compare([f1, f2]) == 1
    capsys.readouterr()

    mssaprof([f1, "--window", "8", "--numpc", "4"])
    out = capsys.readouterr().out
    assert "contributions" in out
    assert os.path.exists(f1 + ".mssa")


def test_profiles(workdir, capsys):
    from exp_tpu.cli.analysis_tools import haloprof
    from exp_tpu.cli.gendisk import main as gendisk
    from exp_tpu.cli.analysis_tools import diskprof

    bods = str(workdir / "h.bods")
    haloprof([bods, "--type", "ascii", "--nbins", "20"])
    assert os.path.exists(bods + ".haloprof")
    prof = np.loadtxt(bods + ".haloprof")
    # density decreasing overall
    assert prof[0, 1] > prof[-1, 1]

    db = str(workdir / "d.bods")
    gendisk(["-N", "3000", "-o", db, "--acyl", "1.0", "--hcyl", "0.1",
             "--mass", "1.0"])
    diskprof([db, "--type", "ascii", "--nbins", "15"])
    assert os.path.exists(db + ".diskprof")


def test_sphprof_coefficient_profiles(tmp_path, capsys):
    """sphprof recovers the model density/force from a coefficient file
    (the coefficient-based analogue of haloprof; sphprof.cc parity)."""
    import yaml
    from exp_tpu.analysis.basis import Basis
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.cli.analysis_tools import sphprof
    from exp_tpu.ic.eddington import sample_spherical_model

    stanza = {"id": "sphereSL",
              "parameters": {"modelname": "hernquist", "Lmax": 2,
                             "nmax": 6, "numr": 800, "rmin": 1e-3,
                             "rmax": 20.0, "rmapping": 1.0}}
    cfg = str(tmp_path / "basis.yml")
    with open(cfg, "w") as fh:
        yaml.safe_dump(stanza, fh)

    m = hernquist_model(rmin=1e-3, rmax=20.0)
    b = Basis.factory(stanza)
    x, v, mass = sample_spherical_model(m, 20000, seed=7)
    c = b.create_from_snapshots([(x, mass)], times=[0.0])
    f = str(tmp_path / "sph.h5")
    c.to_file(f)

    out = str(tmp_path / "prof")
    sphprof([f, "--config", cfg, "--rmin", "0.05", "--rmax", "2.0",
             "--nbins", "16", "--avg", "12", "-o", out])
    capsys.readouterr()
    prof = np.loadtxt(out)
    r, dens, pot, fr = prof.T
    assert np.all(fr < 0)          # attractive radial force everywhere
    assert np.all(np.diff(pot) > 0)  # potential rises outward
    rho_true = np.array([float(m.get_density(ri)) for ri in r])
    # N=20k, lmax=2 reconstruction: track the model within ~tens of %
    assert np.abs(np.log(dens / rho_true)).max() < 0.5

    # harmonic truncation to the monopole barely changes an equilibrium
    # sample's density profile
    out0 = str(tmp_path / "prof0")
    sphprof([f, "--config", cfg, "--rmin", "0.05", "--rmax", "2.0",
             "--nbins", "16", "--avg", "12", "--lcut", "0", "-o", out0])
    capsys.readouterr()
    dens0 = np.loadtxt(out0)[:, 1]
    assert np.abs(np.log(dens0 / dens)).max() < 0.2


def test_scalarprod_and_orthochk_geometries(workdir, tmp_path, capsys):
    """scalarprod prints per-channel amplitudes; orthochk --geometry
    slab/cube runs the pyexp orthoCheck path."""
    import yaml
    from exp_tpu.cli.analysis_tools import orthochk, scalarprod

    stanza = {"id": "sphereSL",
              "parameters": {"modelname": "hernquist", "Lmax": 1,
                             "nmax": 4, "numr": 400, "rmin": 1e-3,
                             "rmax": 20.0, "rmapping": 1.0}}
    cfg = str(tmp_path / "b.yml")
    with open(cfg, "w") as fh:
        yaml.safe_dump(stanza, fh)
    bods = str(workdir / "h.bods")
    assert scalarprod([bods, "--type", "ascii", "--config", cfg,
                       "--center"]) == 0
    out = capsys.readouterr().out
    assert "geometry=sphere" in out and "l  m" in out
    # the monopole l=0 amplitudes dominate an equilibrium sample
    lines = [ln for ln in out.splitlines() if ln.strip().startswith("0  0")]
    assert lines

    assert orthochk(["--geometry", "slab", "--nmax", "4",
                     "--tol", "1e-2"]) == 0
    assert "PASS" in capsys.readouterr().out
    assert orthochk(["--geometry", "cube", "--tol", "1e-6"]) == 0
    assert "PASS" in capsys.readouterr().out


def test_pspinterp(workdir, tmp_path, capsys):
    """pspinterp midpoint of two dumps == average of the dumps."""
    from exp_tpu.cli.psptools import pspinterp
    from exp_tpu.io.psp import PSPDump, PSPComponent, read_psp, write_psp

    rng = np.random.default_rng(8)
    x = rng.normal(size=(100, 3))
    v = rng.normal(size=(100, 3))
    m = np.full(100, 0.01)

    def dump(path, t, shift):
        c = PSPComponent(name="c", info="name: c\n", mass=m,
                         x=x + shift, v=v, pot=np.zeros(100))
        write_psp(path, PSPDump(time=t, components=[c]))

    f1, f2 = str(tmp_path / "a.psp"), str(tmp_path / "b.psp")
    dump(f1, 0.0, 0.0)
    dump(f2, 1.0, 1.0)
    out = str(tmp_path / "mid.psp")
    assert pspinterp([f1, f2, "-t", "0.5", "-o", out]) == 0
    d = read_psp(out)
    d = d[-1] if isinstance(d, list) else d
    assert abs(d.time - 0.5) < 1e-12
    np.testing.assert_allclose(d.components[0].x, x + 0.5, atol=1e-6)


def test_eofinfo_dump(tmp_path, capsys):
    """eofinfo --dump writes finite midplane basis functions."""
    import os
    from exp_tpu.basis.empcyl import build_empcyl_tables
    from exp_tpu.cli.analysis_tools import eofinfo

    cache = str(tmp_path / "eof.h5")
    build_empcyl_tables(mmax=1, nmax=4, lmaxfid=8, nmaxfid=6,
                        acyl=0.01, hcyl=0.002, numx=48, numy=24,
                        rnum=50, tnum=16, cachename=cache)
    assert os.path.exists(cache)
    eofinfo([cache, "--dump"])
    out = capsys.readouterr().out
    assert "EOF cache" in out
    tab = np.loadtxt(cache + ".midplane")
    assert tab.shape[1] == 1 + 2 * 4      # R + (mmax+1)*nmax columns
    assert np.isfinite(tab).all()
    # the m=0, n=0 potential function is largest near the disk center
    assert np.abs(tab[:5, 1]).max() > np.abs(tab[-5:, 1]).max()

    # --compare against itself: zero difference (eof_compare.cc)
    eofinfo([cache, "--compare", cache])
    out = capsys.readouterr().out
    assert "worst relative difference: 0.000e+00" in out

    # --compare against a different-conditioning cache: nonzero, finite
    cache2 = str(tmp_path / "eof2.h5")
    build_empcyl_tables(mmax=1, nmax=4, lmaxfid=8, nmaxfid=6,
                        acyl=0.012, hcyl=0.002, numx=48, numy=24,
                        rnum=50, tnum=16, cachename=cache2)
    eofinfo([cache, "--compare", cache2])
    out = capsys.readouterr().out
    worst = float(out.strip().splitlines()[-1].split()[-1])
    assert worst > 0


def test_umbrella_dispatch(capsys, monkeypatch):
    import sys
    from exp_tpu.cli.__main__ import main

    monkeypatch.setattr(sys, "argv", ["exp_tpu.cli"])
    assert main() == 0
    out = capsys.readouterr().out
    assert "gensph" in out


def test_psp2hdf5_and_shrinkics(workdir, capsys):
    from exp_tpu.cli.psptools import psp2hdf5, shrinkics

    psp = str(workdir / "h.psp")      # from test_gensph_and_stats
    psp2hdf5([psp])
    import h5py

    with h5py.File(psp + ".h5") as f:
        assert f.attrs["count"] == 1
        assert f["snapshots/00000000/halo/pos"].shape == (2000, 3)

    bods = str(workdir / "h.bods")
    shrinkics([bods, "-f", "5", "--seed", "1"])
    a = np.loadtxt(bods, skiprows=1)
    b = np.loadtxt(bods + ".shrink", skiprows=1)
    assert len(b) == 400
    np.testing.assert_allclose(a[:, 0].sum(), b[:, 0].sum(), rtol=1e-12)


def test_crossval_cylinder(tmp_path, capsys):
    """crossval --eof: cylinder-basis cross-validation end to end."""
    import jax
    from exp_tpu.basis.empcyl import build_empcyl_tables
    from exp_tpu.ic.disk import sample_exponential_disk
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.cli.crossval import main as crossval

    cache = str(tmp_path / "eof.h5")
    build_empcyl_tables(mmax=1, nmax=4, lmaxfid=8, nmaxfid=8,
                        acyl=1.0, hcyl=0.1, rcylmin=1e-3, rcylmax=20.0,
                        numx=64, numy=32, rnum=60, tnum=20, cachename=cache)
    x, m = sample_exponential_disk(1500, acyl=1.0, hcyl=0.1, mass=1.0,
                                   seed=4)
    bods = str(tmp_path / "d.bods")
    write_ascii_bodies(bods, (x, np.zeros_like(x), m))
    crossval([bods, "--eof", cache, "--ntest", "128"])
    out = capsys.readouterr().out
    assert "overall median force error" in out
    err = float(out.strip().splitlines()[-1].split(":")[1])
    assert np.isfinite(err) and err < 1.0


def test_diskfreqs(tmp_path, capsys):
    from exp_tpu.basis.empcyl import build_empcyl_tables
    from exp_tpu.ic.disk import sample_exponential_disk
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.cli.diskfreqs import main as diskfreqs

    cache = str(tmp_path / "eof.h5")
    build_empcyl_tables(mmax=1, nmax=4, lmaxfid=8, nmaxfid=8,
                        acyl=1.0, hcyl=0.1, rcylmin=1e-3, rcylmax=20.0,
                        numx=64, numy=32, rnum=60, tnum=20, cachename=cache)
    x, m = sample_exponential_disk(4000, acyl=1.0, hcyl=0.1, mass=1.0,
                                   seed=3)
    bods = str(tmp_path / "d.bods")
    write_ascii_bodies(bods, (x, np.zeros_like(x), m))
    diskfreqs([bods, "--eof", cache, "--nout", "16"])
    tab = np.loadtxt(bods + ".diskfreqs")
    assert tab.shape == (16, 5) and np.isfinite(tab).all()
    assert np.all(tab[:, 1] > 0)                 # rotation curve positive
    assert tab[-1, 1] < tab[-5, 1]               # Keplerian outer decline
    # vertical frequency exceeds the rotation frequency for a thin disk
    mid = slice(3, 12)
    assert np.median(tab[mid, 4] / tab[mid, 2]) > 1.0


def test_psphisto_pspbox(workdir, capsys):
    from exp_tpu.cli.psptools import psphisto, pspbox, pspinfo

    psp = str(workdir / "h.psp")
    psphisto([psp, "--field", "r", "--log", "--nbins", "12"])
    tab = np.loadtxt(psp + ".histo.r")
    assert tab.shape == (12, 2)
    from exp_tpu.io.psp import read_psp
    mtot = read_psp(psp).components[0].mass.sum()
    np.testing.assert_allclose(tab[:, 1].sum(), mtot, rtol=1e-6)

    # energy/potential fields (psp2histoE): mass is conserved per bin set
    psphisto([psp, "--field", "E", "--nbins", "16"])
    tabE = np.loadtxt(psp + ".histo.E")
    assert tabE.shape == (16, 2)
    np.testing.assert_allclose(tabE[:, 1].sum(), mtot, rtol=1e-6)

    pspbox([psp, "--radius", "1.0"])
    capsys.readouterr()
    pspinfo([psp + ".box"])
    out = capsys.readouterr().out
    n = int(out.split("ntot=")[1].split()[0])
    assert 0 < n < 2000


def test_addsphmod(tmp_path, capsys):
    """addsphmod: composite of two spherical model tables
    (utils/ICs/addsphmod.cc AddSpheres)."""
    from exp_tpu.basis.model import SphericalModelTable, hernquist_model
    from exp_tpu.cli.ics_tools import addsphmod

    m1 = hernquist_model(rmin=1e-3, rmax=20.0)
    p1 = str(tmp_path / "one.model")
    m1.to_file(p1)
    out = str(tmp_path / "combo.model")
    addsphmod([p1, "plummer", "--bmass", "0.5", "-o", out])
    txt = capsys.readouterr().out
    assert "wrote" in txt
    combo = SphericalModelTable.from_file(out)
    # total mass = M1 + bmass*M2(<rmax of m1's grid)
    assert combo.mass[-1] > m1.mass[-1] + 0.3
    # potential deepened everywhere by the added sphere
    assert np.all(combo.pot <= m1.pot + 1e-12)
    # density strictly increased at the center
    assert combo.rho[0] > m1.rho[0]


def test_kldiv(workdir, capsys):
    from exp_tpu.cli.kldiv import main as kldiv

    bods = str(workdir / "h.bods")
    kldiv([bods, bods])
    out = capsys.readouterr().out
    assert "KL(p1 || p2) = 0 " in out
    db = str(workdir / "d.bods")        # disk from test_profiles
    kldiv([bods, db, "--cyl"])
    out = capsys.readouterr().out
    kl = float(out.split("=")[1].split()[0])
    assert kl > 0.1                     # halo vs disk profiles differ


def test_yamldiff(tmp_path, capsys):
    from exp_tpu.cli.yamldiff import main as yamldiff

    (tmp_path / "a.yml").write_text("Global: {dtime: 0.01, nsteps: 5}\n")
    (tmp_path / "b.yml").write_text(
        "Global: {dtime: 0.02, nsteps: 5, fpe: true}\n")
    assert yamldiff([str(tmp_path / "a.yml"), str(tmp_path / "a.yml")]) == 0
    capsys.readouterr()
    assert yamldiff([str(tmp_path / "a.yml"), str(tmp_path / "b.yml")]) == 1
    out = capsys.readouterr().out
    assert "~ Global.dtime: 0.01 -> 0.02" in out
    assert "+ Global.fpe: True" in out


def test_gendisk2d(tmp_path, capsys):
    from exp_tpu.cli.gendisk2d import main as gendisk2d

    out = str(tmp_path / "z.bods")
    gendisk2d(["-N", "3000", "-i", "zang", "-o", out, "-s", "2"])
    a = np.loadtxt(out, skiprows=1)
    assert len(a) == 3000
    assert (a[:, 3] == 0).all() and (a[:, 6] == 0).all()   # razor-thin
    R = np.hypot(a[:, 1], a[:, 2])
    vphi = (-a[:, 4] * a[:, 2] + a[:, 5] * a[:, 1]) / R
    assert vphi.mean() > 0.1                # net rotation
    gendisk2d(["-N", "2000", "-i", "kuzmin", "-o", out, "-s", "2"])
    b = np.loadtxt(out, skiprows=1)
    # Kuzmin mass inside rmax = 10a: 1 - 1/sqrt(101)
    np.testing.assert_allclose(b[:, 0].sum(), 1.0 - 1.0 / np.sqrt(101.0),
                               rtol=0.02)


def test_slabprof(tmp_path, capsys):
    from exp_tpu.cli.genslab import main as genslab
    from exp_tpu.cli.analysis_tools import slabprof

    bods = str(tmp_path / "s.bods")
    genslab(["-N", "8000", "-o", bods, "--z0", "0.02", "-s", "4"])
    slabprof([bods, "--nbins", "20"])
    tab = np.loadtxt(bods + ".slabprof")
    # density peaks near z = 0 and is roughly symmetric
    zpk = tab[np.argmax(tab[:, 1]), 0]
    assert abs(zpk) < 0.02
    assert tab[:, 1].max() > 5 * tab[0, 1]


def test_snapconvert_and_vtk(tmp_path, monkeypatch):
    """snapconvert round-trips ascii -> psp -> gadget_hdf5 -> ascii and
    snap2vtk emits a readable legacy-VTK point cloud."""
    import numpy as np
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.cli.psptools import snapconvert, snap2vtk
    from exp_tpu.io.readers import createReader

    rng = np.random.default_rng(0)
    n = 200
    x = rng.normal(size=(n, 3))
    v = rng.normal(size=(n, 3))
    m = rng.uniform(0.5, 1.5, n)
    src = tmp_path / "b.ascii"
    write_ascii_bodies(src, (x, v, m))

    psp = tmp_path / "b.psp"
    snapconvert([str(src), "--from", "ascii", "--to", "psp",
                 "-o", str(psp)])
    h5 = tmp_path / "b.hdf5"
    snapconvert([str(psp), "--from", "psp", "--to", "gadgethdf5",
                 "-o", str(h5)])
    back = createReader("gadgethdf5", str(h5))
    xb, vb, mb = back.GetParticles(back.GetTypes()[0])
    assert len(mb) == n
    np.testing.assert_allclose(np.sort(np.asarray(mb)), np.sort(m),
                               rtol=1e-5)

    vtk = tmp_path / "b.vtk"
    snap2vtk([str(psp), "--type", "psp", "-o", str(vtk)])
    txt = vtk.read_text()
    assert txt.startswith("# vtk DataFile")
    assert f"POINTS {n} float" in txt
    assert "SCALARS mass" in txt and "VECTORS velocity" in txt


def test_tipstd2psp_and_psp2vtu(tmp_path, monkeypatch):
    """tipsy-std -> PSP named converter and the XML .vtu point writer
    (utils/PhaseSpace/tipstd2psp.cc, psp2vtu.cc)."""
    import numpy as np
    from exp_tpu.io.readers import Snapshot, write_tipsy
    from exp_tpu.io.psp import read_psp
    from exp_tpu.cli.tipstd2psp import main as tipstd2psp
    from exp_tpu.cli.psp2vtu import main as psp2vtu

    rng = np.random.default_rng(7)
    n = 60
    s = Snapshot(0.5)
    s.add("dark", rng.normal(size=(n, 3)), rng.normal(size=(n, 3)),
          rng.uniform(0.5, 1.5, n), pot=rng.normal(size=n))
    tip = tmp_path / "in.tipsy"
    write_tipsy(str(tip), s)

    psp = tmp_path / "in.psp"
    assert tipstd2psp([str(tip), str(psp)]) == 0
    dump = read_psp(str(psp))
    assert dump.time == 0.5
    assert dump.components[0].name == "dark"
    x0, _, m0 = s.GetParticles("dark")
    np.testing.assert_allclose(dump.components[0].mass, m0, rtol=1e-6)
    np.testing.assert_allclose(dump.components[0].x, x0, rtol=1e-6)

    monkeypatch.chdir(tmp_path)
    assert psp2vtu(["-c", "dark", "-w", str(tmp_path), "-T", "t0",
                    "--dens", "8", str(psp)]) == 0
    vtu = (tmp_path / "t0_00000.vtu").read_text()
    assert f'NumberOfPoints="{n}"' in vtu
    assert 'Name="masses"' in vtu and 'Name="velocities"' in vtu
    assert 'Name="density"' in vtu
    # the density column is positive everywhere
    import re
    dens = re.search(r'Name="density"[^>]*>([^<]*)<', vtu).group(1)
    vals = np.fromstring(dens, sep=" ")
    assert len(vals) == n and (vals > 0).all()


def test_modelfit_addring_forcetest(tmp_path, capsys):
    """ICs toolbox: fit a profile to a realization, add a ring, and
    measure BFE force errors vs the direct sum (utils/ICs ModelFit.cc /
    addring.cc / force_test.cc)."""
    from exp_tpu.cli.gensph import main as gensph
    from exp_tpu.cli.ics_tools import modelfit, addring, forcetest

    bods = str(tmp_path / "h.bods")
    gensph(["-N", "8000", "-i", "hernquist", "-o", bods, "-s", "7"])
    capsys.readouterr()

    mfile = str(tmp_path / "fit.model")
    modelfit([bods, "--family", "hernquist", "-o", mfile])
    out = capsys.readouterr().out
    # recover the Hernquist scale radius within ~30% from 8k particles
    a_fit = float(out.split("a=")[1].split()[0])
    assert 0.7 < a_fit < 1.3, out
    assert os.path.exists(mfile)
    from exp_tpu.basis.model import SphericalModelTable

    mt = SphericalModelTable.from_file(mfile)
    assert mt.total_mass > 0.3

    ringed = str(tmp_path / "ring.bods")
    addring([bods, "-o", ringed, "--nring", "500", "--radius", "1.0",
             "--mring", "0.01"])
    out = capsys.readouterr().out
    assert "500 ring particles" in out
    from exp_tpu.nbody.particles import read_ascii_bodies

    ps = read_ascii_bodies(ringed)
    assert ps.x.shape[0] == 8500
    # ring rows orbit near R=1 with |v| ~ vc = sqrt(M(<1) + mring/2)
    xr = np.asarray(ps.x)[-500:]
    vr = np.asarray(ps.v)[-500:]
    R = np.sqrt(xr[:, 0] ** 2 + xr[:, 1] ** 2)
    assert abs(np.median(R) - 1.0) < 0.1
    m_old = np.asarray(ps.mass)[:8000]
    r_old = np.sqrt((np.asarray(ps.x)[:8000] ** 2).sum(axis=1))
    vc = np.sqrt(m_old[r_old < 1.0].sum() + 0.005)
    assert abs(np.median(np.linalg.norm(vr, axis=1)) - vc) / vc < 0.1

    forcetest([bods, "--nsample", "200", "--lmax", "2", "--nmax", "8",
               "--numr", "500"])
    out = capsys.readouterr().out
    p50 = float(out.split("p50 relative force error: ")[1].split()[0])
    # BFE vs direct sum: median error set by sampling noise at 8k bodies
    assert p50 < 0.1, out


def test_psporbv(workdir, capsys):
    from exp_tpu.cli.gensph import main as gensph
    from exp_tpu.cli.psporbv import main as psporbv

    bods = str(workdir / "h.bods")
    if not os.path.exists(bods):
        gensph(["-N", "2000", "-i", "hernquist", "-o", bods, "-s", "3"])
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        assert psporbv(["-f", bods, "--type", "ascii", "-m", "hernquist",
                        "-R", "2.0", "-k", "0.9", "-s", "t",
                        "--nE", "24", "--nK", "12", "-N", "8"]) == 0
    finally:
        os.chdir(cwd)
    out = capsys.readouterr().out
    assert "orbits" in out
    tab = np.loadtxt(workdir / "orbv.t")
    assert tab.shape[1] == 19
    r, E, kappa = tab[:, 0], tab[:, 1], tab[:, 2]
    assert (kappa > 0).all() and (kappa < 0.9).all()
    assert (E < 0).all()
    # r inside [peri, apo] up to the (E, kappa)-grid interpolation error:
    # columns 11/12 are r/r_apo and r/r_peri
    assert (tab[:, 10] <= 1.05).all()
    assert (tab[:, 11] >= 0.95).all()
    # w1 in [0, 2 pi]
    assert (tab[:, 12] >= 0).all() and (tab[:, 12] <= 2 * np.pi).all()
    # frequencies positive, Omega_1 > Omega_2 for a Hernquist interior
    assert (tab[:, 8] > 0).all() and (tab[:, 9] > 0).all()
    assert os.path.exists(workdir / "orbv.t.histo")
    # spot-check w1 and Omega_1 against the exact per-orbit machinery
    from exp_tpu.analysis.orbit import SphericalOrbit
    from exp_tpu.cli._common import load_model

    model = load_model("hernquist")
    for row in tab[:: max(1, len(tab) // 5)][:5]:
        r, E, J, w1, vr = row[0], row[1], row[4], row[12], row[16]
        orb = SphericalOrbit(model, E, J=J)
        assert abs(orb.omega_r - row[8]) / orb.omega_r < 0.05
        if orb.peri * 1.05 < r < orb.apo * 0.95:
            w1x = orb.get_w1(r, vr)
            assert abs(w1 - w1x) < 0.2, (w1, w1x)


def test_bonnerebert(tmp_path, capsys):
    from exp_tpu.cli.bonnerebert import main as bonnerebert

    prof = str(tmp_path / "be.prof")
    assert bonnerebert(["-N", "0", "--xmax", "40", "-o", prof]) == 0
    tab = np.loadtxt(prof)
    # columns: r, rho, M(r), m2 — density decreasing, mass increasing
    assert (np.diff(tab[:, 1]) <= 1e-12).all()
    assert (np.diff(tab[:, 2]) >= -1e-15).all()
    # edge contrast: rho_c/rho_edge ~ the requested ratio (14)
    assert abs(tab[0, 1] / tab[-1, 1] - 14.0) < 0.5

    bods = str(tmp_path / "be.bods")
    assert bonnerebert(["-N", "500", "--xmax", "40", "-o", bods]) == 0
    with open(bods) as f:
        header = f.readline().split()
    assert header[0] == "500" and header[2] == "4"
    data = np.loadtxt(bods, skiprows=1)
    assert data.shape == (500, 11)
    # radii inside the truncation radius (last profile row)
    r = np.sqrt((data[:, 1:4] ** 2).sum(axis=1))
    assert r.max() <= tab[-1, 0] * 1.01


def test_mssafilter(tmp_path, capsys):
    from exp_tpu.cli.mssafilter import main as mssafilter
    from exp_tpu.analysis.coefs import Coefs

    # signal (slow oscillation) + noise on a few channels
    rng = np.random.default_rng(5)
    c = Coefs(geometry="sphere", name="t", meta={"lmax": 1, "nmax": 3})
    base = rng.normal(0, 1, (2, 2, 2, 3))
    # zero the channels the packed file schema cannot carry (m > l and
    # the sin part of m = 0) so the round trip is exact
    for l in range(2):
        base[:, l, l + 1:] = 0.0
    base[1, :, 0] = 0.0
    T = 48
    for i in range(T):
        sig = base * (1.0 + 0.5 * np.sin(2 * np.pi * i / 24.0))
        noise = 0.01 * rng.normal(0, 1, base.shape)
        for l in range(2):
            noise[:, l, l + 1:] = 0.0
        noise[1, :, 0] = 0.0
        c.add(i * 0.1, sig + noise)
    f1 = str(tmp_path / "c.h5")
    c.to_file(f1)

    pre = str(tmp_path / "nf")
    assert mssafilter(["-d", f1, "-o", pre, "-W", "12",
                       "-e", "0.05"]) == 0
    out = capsys.readouterr().out
    assert "keeping" in out
    rec = Coefs.from_file(pre + ".recon")
    dif = Coefs.from_file(pre + ".recon_diff")
    A = c.as_array()
    R = rec.as_array()
    D = dif.as_array()
    # recon + residual == original
    assert np.allclose(R + D, A, atol=1e-10)
    # the filter removes most of the noise: residual is small vs signal
    assert np.abs(D).mean() < 0.1 * np.abs(A).mean()

    # eigenvalue listing mode
    assert mssafilter(["-d", f1, "-E", "-W", "12"]) == 0
    out = capsys.readouterr().out
    assert len(out.strip().splitlines()) > 3


def test_expmssa_tool(tmp_path, capsys):
    """The standalone expmssa analysis tool writes the reference's text
    products and a grouped reconstruction (utils/MSSA/expmssa.cc)."""
    import os
    from exp_tpu.cli.expmssa import main as expmssa
    from exp_tpu.analysis.coefs import Coefs

    rng = np.random.default_rng(11)
    c = Coefs(geometry="sphere", name="t", meta={"lmax": 1, "nmax": 3})
    base = rng.normal(0, 1, (2, 2, 2, 3))
    for l in range(2):
        base[:, l, l + 1:] = 0.0
    base[1, :, 0] = 0.0
    T = 48
    for i in range(T):
        sig = base * (1.0 + 0.5 * np.sin(2 * np.pi * i / 24.0))
        noise = 0.01 * rng.normal(0, 1, base.shape)
        for l in range(2):
            noise[:, l, l + 1:] = 0.0
        noise[1, :, 0] = 0.0
        c.add(i * 0.1, sig + noise)
    f1 = str(tmp_path / "c.h5")
    c.to_file(f1)

    pre = str(tmp_path / "em")
    grp = tmp_path / "group.list"
    grp.write_text("0 1\n2 3\n")
    assert expmssa(["-d", f1, "-o", pre, "-W", "12", "-C", "-H",
                    "-G", str(grp)]) == 0
    for suf in (".data", ".ev", ".evec", ".pc", ".f_contrib",
                ".wcorr", ".g0.recon", ".g1.recon"):
        assert os.path.exists(pre + suf), suf
    ev = np.loadtxt(pre + ".ev")
    assert (np.diff(ev[:, 0]) <= 1e-12).all()       # sorted eigenvalues
    assert abs(ev[-1, 1] - 1.0) < 1e-10             # cumfrac ends at 1
    fc = np.loadtxt(pre + ".f_contrib")
    assert np.allclose(fc.sum(axis=0), 1.0)         # per-channel norm
    w = np.loadtxt(pre + ".wcorr")
    assert np.allclose(np.diag(w), 1.0, atol=1e-8)
    # the leading group carries the oscillation (both reconstructions
    # re-add the channel means, so compare the time-variation)
    rec0 = Coefs.from_file(pre + ".g0.recon").as_array()
    rec1 = Coefs.from_file(pre + ".g1.recon").as_array()
    assert rec0.std(axis=0).sum() > 10 * rec1.std(axis=0).sum()

    # kmeans grouping path
    pre2 = str(tmp_path / "km")
    assert expmssa(["-d", f1, "-o", pre2, "-W", "12",
                    "--kmeans", "2"]) == 0
    assert os.path.exists(pre2 + ".g0.recon")


def test_slshift(tmp_path, capsys):
    from exp_tpu.cli.slshift import main as slshift

    pre = str(tmp_path / "sh")
    assert slshift(["-i", "hernquist", "--offset", "0.2", "--lmax", "6",
                    "--nmax", "10", "--numr", "600", "--nquad-r", "200",
                    "--nquad-t", "120", "-o", pre]) == 0
    out = capsys.readouterr().out
    assert "rel err" in out
    coefs = np.loadtxt(pre + ".coefs")
    assert coefs.shape == (7, 11)
    # the shifted monopole feeds l=1; higher odd l decay with (d/r)^l
    pw = np.abs(coefs[:, 1:]).max(axis=1)
    assert pw[1] > 0.05 * pw[0]
    assert pw[1] > pw[3] > pw[5]
    prof = np.loadtxt(pre + ".profile")
    # on-axis reconstruction tracks the true shifted density away from
    # the origin cusp
    mask = np.abs(prof[:, 0]) > 0.2
    rel = np.abs(prof[mask, 3]) / np.maximum(np.abs(prof[mask, 2]), 1e-30)
    assert np.median(rel) < 0.2


def test_gensph_addsphere(tmp_path, capsys):
    from exp_tpu.basis.model import (hernquist_model, plummer_model,
                                     add_sphere_to_model)
    from exp_tpu.cli.gensph import main as gensph

    halo = hernquist_model(rmin=1e-3, rmax=20.0)
    bulge = plummer_model(a=0.1, M=0.5, rmin=1e-3, rmax=20.0)
    comp = add_sphere_to_model(halo, bulge)
    # enclosed mass adds; tracer density unchanged
    assert np.allclose(comp.rho, halo.rho)
    assert abs(comp.mass[-1] - (halo.mass[-1] + bulge.mass[-1])) < 1e-6
    # the ADDED potential tends to -Mb/r at the outer edge (the halo's
    # own table carries the analytic untruncated convention, so test the
    # bulge term in isolation)
    r = comp.r[-1]
    dpot = comp.pot[-1] - halo.pot[-1]
    assert abs(dpot * r + bulge.mass[-1]) < 2e-2
    # potential is strictly deeper everywhere
    assert (comp.pot < halo.pot).all()
    # full composite density variant
    full = add_sphere_to_model(halo, bulge, include_density=True)
    assert (full.rho > halo.rho).all()

    bods = str(tmp_path / "hb.bods")
    gensph(["-N", "4000", "-i", "hernquist", "-o", bods, "-s", "7",
            "--addsphere", "plummer:a=0.1,M=0.5"])
    out = capsys.readouterr().out
    assert "4000 bodies" in out
    data = np.loadtxt(bods, skiprows=1)
    v2_emb = (data[:, 4:7] ** 2).sum(axis=1).mean()

    gensph(["-N", "4000", "-i", "hernquist", "-o", bods, "-s", "7"])
    capsys.readouterr()
    data0 = np.loadtxt(bods, skiprows=1)
    v2_0 = (data0[:, 4:7] ** 2).sum(axis=1).mean()
    # the embedded sphere deepens the potential -> hotter tracer
    assert v2_emb > v2_0 * 1.05


def test_zangics_cli(tmp_path):
    """Tapered-Mestel Zang disk (utils/ICs/ZangICs.cc): flat rotation
    curve at v0 in the untapered window, requested dispersion."""
    from exp_tpu.cli.zangics import main
    from exp_tpu.nbody.particles import read_ascii_arrays

    out = tmp_path / "zang.bods"
    main(["-N", "12000", "-S", "0.4", "-s", "3", "-f", str(out)])
    x, v, m = read_ascii_arrays(str(out))
    R = np.hypot(x[:, 0], x[:, 1])
    vphi = (-v[:, 0] * x[:, 1] + v[:, 1] * x[:, 0]) / R
    vrad = (v[:, 0] * x[:, 0] + v[:, 1] * x[:, 1]) / R
    sel = (R > 2) & (R < 10)
    assert abs(vphi[sel].mean() - 1.0) < 0.12        # v0 = 1 - drift
    assert abs(vrad[sel].std() - 0.4) < 0.08
    assert np.abs(x[:, 2]).max() == 0.0              # razor thin


def test_zangics_nrepl_quiet_start(tmp_path):
    from exp_tpu.cli.zangics import main
    from exp_tpu.nbody.particles import read_ascii_arrays

    out = tmp_path / "zq.bods"
    main(["-N", "1000", "-q", "4", "-s", "5", "-P", "-V",
          "-f", str(out)])
    x, v, m = read_ascii_arrays(str(out))
    assert len(x) == 1000
    # each orbit has 4 replicates at 90-degree offsets: radii repeat
    R = np.hypot(x[:, 0], x[:, 1]).reshape(250, 4)
    assert np.allclose(R, R[:, :1], rtol=1e-10)


def test_pspmono_cli(tmp_path):
    """pspmono: model table from a snapshot round-trips through
    SphericalModelTable and reproduces the source profile."""
    from exp_tpu.basis.model import SphericalModelTable, hernquist_model
    from exp_tpu.cli.pspmono import main
    from exp_tpu.ic.eddington import sample_spherical_model
    from exp_tpu.nbody.particles import write_ascii_bodies

    m0 = hernquist_model(rmin=1e-3, rmax=20.0)
    x, v, mass = sample_spherical_model(m0, 60000, seed=4)
    src = tmp_path / "halo.bods"
    write_ascii_bodies(str(src), (x, v, mass))
    out = tmp_path / "mono.model"
    main([str(src), "--type", "ascii", "--rnum", "400",
          "-o", str(out)])
    m1 = SphericalModelTable.from_file(str(out))
    assert np.isclose(m1.total_mass, mass.sum(), rtol=0.02)
    for rq in (0.3, 1.0, 5.0):
        assert np.isclose(float(m1.get_mass(rq)), float(m0.get_mass(rq)),
                          rtol=0.1), rq


def test_ellipforce_and_gensph_ebar(tmp_path, capsys):
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.cli.gensph import main as gensph
    from exp_tpu.ic.ellip import (EllipForce, add_ellip_to_model,
                                  ellip_monopole_mass)

    # sphere limit: homogeneous sphere mass profile and potential
    sph = EllipForce(1.0, 1.0, 1.0, 2.0, num=48, numr=120)
    r = np.array([0.25, 0.5, 0.75, 1.0])
    np.testing.assert_allclose(sph.get_mass(r), 2.0 * r ** 3, rtol=2e-3)
    np.testing.assert_allclose(sph.get_pot(2.0), -1.0, rtol=1e-3)
    np.testing.assert_allclose(sph.get_pot(0.0), -3.0, rtol=5e-3)

    # triaxial bar: total mass at r=a, strictly increasing profile
    bar = EllipForce(0.5, 0.25, 0.125, 0.1, num=48, numr=120)
    assert abs(bar.get_mass(0.5) - 0.1) < 1e-3
    assert (np.diff(bar.m) >= -1e-12).all()
    # smoothing preserves the asymptotic mass and the inner raw profile
    rg = np.geomspace(1e-3, 5.0, 300)
    ms = ellip_monopole_mass(bar, rg, 0.5, smooth=0.02)
    assert abs(ms[-1] - 0.1) < 1e-3
    np.testing.assert_allclose(ms[rg < 0.03], bar.get_mass(rg[rg < 0.03]),
                               rtol=0.05)   # erf blend ~1% at 0.06 RBAR

    halo = hernquist_model(rmin=1e-3, rmax=20.0)
    comp = add_ellip_to_model(halo, bar, rbar=0.5)
    assert np.allclose(comp.rho, halo.rho)
    assert abs(comp.mass[-1] - (halo.mass[-1] + 0.1)) < 1e-3
    assert (comp.pot < halo.pot).all()

    bods = str(tmp_path / "eb.bods")
    gensph(["-N", "3000", "-i", "hernquist", "-o", bods, "-s", "5",
            "--ebar", "0.5,0.5,0.25,0.3"])
    out = capsys.readouterr().out
    assert "3000 bodies" in out
    data = np.loadtxt(bods, skiprows=1)
    assert np.isfinite(data).all()
    v2_bar = (data[:, 4:7] ** 2).sum(axis=1).mean()
    gensph(["-N", "3000", "-i", "hernquist", "-o", bods, "-s", "5"])
    capsys.readouterr()
    v2_0 = (np.loadtxt(bods, skiprows=1)[:, 4:7] ** 2).sum(axis=1).mean()
    assert v2_bar > v2_0 * 1.02   # the bar deepens the halo potential


def test_orthochk_flatdisk(capsys):
    """EOF2d-style biorthogonality of the razor-thin 2D set
    (utils/SL/EOF2d.cc --ortho): midplane Hankel energy integral."""
    from exp_tpu.cli.analysis_tools import orthochk

    rc = orthochk(["--geometry", "flatdisk", "--nmax", "6",
                   "-i", "kuzmin", "--tol", "5e-2"])
    out = capsys.readouterr().out
    assert rc == 0 and "PASS" in out and "max|G-2I|" in out
