"""diskeof — empirical re-orthogonalization of a disk basis from a
snapshot sequence (utils/Analysis/diskeof.cc analogue)."""

import os

import numpy as np
import pytest

ACYL, HCYL = 0.01, 0.002


@pytest.fixture(scope="module")
def small_tables():
    from exp_tpu.basis.empcyl import build_empcyl_tables

    return build_empcyl_tables(mmax=2, nmax=6, lmaxfid=12, nmaxfid=10,
                               acyl=ACYL, hcyl=HCYL, rcylmax=20.0,
                               numx=128, numy=64, rnum=100, tnum=40)


def _disk(n, seed=0, m2=0.0):
    rng = np.random.default_rng(seed)
    R = -ACYL * (np.log(rng.uniform(size=n)) + np.log(rng.uniform(size=n)))
    z = HCYL * np.arctanh(rng.uniform(-1, 1, n) * 0.999999)
    phi = rng.uniform(0, 2 * np.pi, n)
    if m2:
        # crude m=2 overdensity via rejection-free phase reweighting
        keep = rng.uniform(size=n) < 0.5 * (1 + m2 * np.cos(2 * phi))
        R, z, phi = R[keep], z[keep], phi[keep]
    x = np.stack([R * np.cos(phi), R * np.sin(phi), z], 1)
    mass = np.full(len(R), 1.0 / n)
    return x, mass


def test_accumulate_and_rotate(small_tables):
    from exp_tpu.analysis import diskeof as DE
    from exp_tpu.forces.cylinder import CylinderForce

    cyl = CylinderForce.from_tables(small_tables)
    snaps = [(0.1 * t, *reversed(_disk(20000, seed=t, m2=0.4)))
             for t in range(3)]
    times, cc, ss, D = DE.accumulate(cyl, iter(snaps))
    assert cc.shape == (3, 3, 6) and np.allclose(times, [0.0, 0.1, 0.2])
    # D is symmetric positive semidefinite per harmonic
    for m in range(3):
        assert np.allclose(D[m], D[m].T)
        assert np.linalg.eigvalsh(D[m]).min() > -1e-10
    # the coefficient projection matches the force's own pass
    import jax.numpy as jnp

    t0, m0, x0 = snaps[0]
    ref = np.asarray(cyl.coefficients_local(jnp.asarray(x0, jnp.float32),
                                            jnp.asarray(m0, jnp.float32),
                                            accum_dtype=jnp.float64))
    np.testing.assert_allclose(cc[0], ref[0], rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(ss[0], ref[1], rtol=2e-3, atol=2e-5)

    svals, Urot, rotC, rotS = DE.rotate(cc, ss, D)
    # singular values descend; rotation is orthogonal; amplitude is
    # preserved per harmonic (U orthogonal => norms equal)
    assert np.all(np.diff(svals, axis=1) <= 1e-12)
    for m in range(3):
        np.testing.assert_allclose(Urot[m] @ Urot[m].T, np.eye(6),
                                   atol=1e-12)
        np.testing.assert_allclose(
            np.linalg.norm(rotC[:, m], axis=1),
            np.linalg.norm(cc[:, m], axis=1), rtol=1e-12)


def test_diskeof_cli(tmp_path, small_tables, monkeypatch, capsys):
    from exp_tpu.cli.diskeof import main as diskeof
    from exp_tpu.io.psp import PSPComponent, PSPDump, write_psp

    cache = str(tmp_path / "eof.h5")
    small_tables.write_cache(cache)
    for t in range(2):
        x, mass = _disk(8000, seed=t, m2=0.3)
        d = PSPDump(time=0.05 * t, components=[PSPComponent(
            name="disk", info="name: disk\n", mass=mass, x=x, v=0 * x,
            pot=np.zeros(len(mass)))])
        write_psp(str(tmp_path / f"OUT.de.{t:05d}"), d)
    monkeypatch.chdir(tmp_path)
    rc = diskeof(["-T", "de", "-c", "disk", "--cachefile", cache,
                  "--grid", "16", "--rmax", str(4 * ACYL),
                  "--mbeg", "2", "--mend", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Singular values for m=0" in out
    amp = np.loadtxt(tmp_path / "de_diskeof.coefs")
    assert amp.shape == (2 * 3, 2 + 6)     # (times x harmonics) rows
    g = np.load(tmp_path / "de_diskeof_rotated.00002.npz")
    assert g["pot"].shape == (2, 6, 16, 16)
    assert np.isfinite(g["pot"]).all() and np.isfinite(g["dens"]).all()
    # the m=2 seeded pattern puts real power in the leading rotated order
    assert np.abs(g["pot"][0, 0]).max() > 0
