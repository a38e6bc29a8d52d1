"""Self-consistent razor-thin disk + halo ICs (ic/diskhalo2d.py — the
Disk2dHalo path, utils/ICs/Disk2dHalo.cc analogue)."""

import numpy as np
import pytest
import jax.numpy as jnp

from exp_tpu.basis.flatdisk import (build_flatdisk_tables,
                                    surface_density_model)
from exp_tpu.basis.model import hernquist_model
from exp_tpu.basis.slgrid import build_sph_sl_tables
from exp_tpu.forces.cylinder import CylinderForce
from exp_tpu.forces.spherical import SphereSL
from exp_tpu.ic.diskhalo import virial_ratio
from exp_tpu.ic.diskhalo2d import (add_disk2d_to_model, diskhalo2d_ics,
                                   sample_surface_density)

ACYL, MDISK = 0.01, 0.05


@pytest.fixture(scope="module")
def bases():
    m = hernquist_model(rmin=1e-3, rmax=20.0)
    ts = build_sph_sl_tables(m, lmax=2, nmax=6, numr=800, cmap=1, rmap=1.0)
    halo = SphereSL.from_tables(ts, dtype=jnp.float32)
    td = build_flatdisk_tables(mmax=2, nmax=8, model="expon", acyl=ACYL,
                               Mtot=MDISK)
    disk = CylinderForce.from_tables(td, dtype=jnp.float32)
    return m, halo, disk


@pytest.fixture(scope="module")
def ics(bases):
    m, halo, disk = bases
    return diskhalo2d_ics(m, n_halo=8192, n_disk=4096, Mdisk=MDISK,
                          acyl=ACYL, halo_force=halo, disk_force=disk,
                          model="expon", Q=0.0, sig0=0.1, seed=5)


def test_monopole_fold_in(bases):
    m, halo, disk = bases
    Sigma = surface_density_model("expon", a=ACYL, M=MDISK)
    comp = add_disk2d_to_model(m, Sigma, 10 * ACYL)
    # razor-thin exponential disk: M(<r) = M (1 - (1 + r/a) e^{-r/a})
    r = np.array([0.005, 0.01, 0.05, 1.0])
    expect = MDISK * (1 - (1 + r / ACYL) * np.exp(-r / ACYL))
    got = np.interp(r, comp.r, comp.mass - m.mass)
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=1e-8)
    assert (comp.pot < m.pot).all()


def test_razor_thin_geometry(ics):
    assert np.all(ics.x_disk[:, 2] == 0.0)
    assert np.all(ics.v_disk[:, 2] == 0.0)
    # rotation dominates: mean tangential speed well above dispersions
    R = np.hypot(ics.x_disk[:, 0], ics.x_disk[:, 1])
    phi = np.arctan2(ics.x_disk[:, 1], ics.x_disk[:, 0])
    vp = (-np.sin(phi) * ics.v_disk[:, 0]
          + np.cos(phi) * ics.v_disk[:, 1])
    vr = (np.cos(phi) * ics.v_disk[:, 0]
          + np.sin(phi) * ics.v_disk[:, 1])
    sel = (R > 0.5 * ACYL) & (R < 3 * ACYL)
    assert vp[sel].mean() > 2.0 * vr[sel].std()
    assert ics.diag["n_oob"] < 0.05 * len(R)


def test_virial_equilibrium_2d(bases, ics):
    m, halo, disk = bases
    ch = halo.coefficients(jnp.asarray(ics.x_halo, jnp.float32),
                           jnp.asarray(np.maximum(ics.m_halo, 0),
                                       jnp.float32))
    cd = disk.coefficients(jnp.asarray(ics.x_disk, jnp.float32),
                           jnp.asarray(ics.m_disk, jnp.float32))
    vr = virial_ratio([(ics.x_halo, ics.v_halo, ics.m_halo),
                       (ics.x_disk, ics.v_disk, ics.m_disk)],
                      [(halo, ch), (disk, cd)])
    assert abs(vr - 1.0) < 0.05, vr


def test_sample_surface_density_profile():
    Sigma = surface_density_model("expon", a=1.0, M=1.0)
    x, mass = sample_surface_density(Sigma, 200_000, 10.0, seed=2)
    R = np.hypot(x[:, 0], x[:, 1])
    # enclosed-mass fractions match the analytic profile
    for rq in (0.5, 1.0, 2.0, 4.0):
        frac = mass[R < rq].sum() / mass.sum()
        expect = (1 - (1 + rq) * np.exp(-rq)) / (1 - 11 * np.exp(-10.0))
        assert abs(frac - expect) < 5e-3, (rq, frac, expect)


def test_gendisk2d_nhalo_cli(tmp_path, capsys):
    from exp_tpu.cli.gendisk2d import main as gendisk2d

    disk = str(tmp_path / "d2.bods")
    halo = str(tmp_path / "h2.bods")
    cache = str(tmp_path / "fd.h5")
    gendisk2d(["-N", "2000", "--model", "expon", "--acyl", "0.01",
               "--mass", "0.05", "--halo", "hernquist", "--nhalo", "4000",
               "-o", disk, "--ohalo", halo, "--disk-cache", cache,
               "--mmax", "2", "--nmaxd", "6", "--lmax", "2",
               "--nmaxh", "6", "-s", "3"])
    out = capsys.readouterr().out
    assert "2000 disk bodies" in out and "-2T/VC=" in out
    vr = float(out.split("-2T/VC=")[1].split(",")[0])
    assert abs(vr - 1.0) < 0.08
    d = np.loadtxt(disk, skiprows=1)
    assert np.all(d[:, 3] == 0.0) and np.all(d[:, 6] == 0.0)  # z = vz = 0
