"""Harmonic-restriction knobs (SphericalBasis.cc:33-39, 1568-1600,
1689-1694): NO_L0 / NO_L1 / EVEN_L / EVEN_M / M0_ONLY / FIX_L0."""

import numpy as np
import pytest
import yaml


def _run(tmp_path, force_extra, nsteps=4, multistep=0, seed=9, n=600):
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.config import RunConfig
    from exp_tpu.ic.eddington import sample_spherical_model
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation

    m = hernquist_model(rmin=1e-3, rmax=20.0)
    x, v, mass = sample_spherical_model(m, n, seed=seed)
    bods = str(tmp_path / "h.bods")
    write_ascii_bodies(bods, (x, v, mass))
    fpar = {"lmax": 2, "nmax": 4, "modelname": "hernquist"}
    fpar.update(force_extra)
    conf = {
        "Global": {"dtime": 0.01, "nsteps": nsteps, "runtag": "rtest",
                   "outdir": str(tmp_path), "multistep": multistep},
        "Components": [{"name": "halo", "bodyfile": bods,
                        "force": {"id": "sphereSL", "parameters": fpar}}],
        "Output": [{"id": "outcoef", "parameters": {"nint": 1}}],
    }
    cfg = str(tmp_path / "run.yml")
    with open(cfg, "w") as fh:
        yaml.safe_dump(conf, fh)
    sim = Simulation(RunConfig.from_file(cfg), workdir=str(tmp_path))
    sim.run()
    from exp_tpu.analysis.coefs import Coefs

    co = Coefs.from_file(str(tmp_path / "outcoef.halo.rtest.h5"))
    return np.asarray(co.as_array(), np.float64), sim


def test_m0_only(tmp_path):
    A, _ = _run(tmp_path, {"M0_ONLY": True})
    assert np.isfinite(A).all()
    assert np.abs(A[..., :, 1:, :]).max() == 0.0        # all m>0 suppressed
    assert np.abs(A[..., 0, 0, 0, :]).max() > 0.0       # monopole live


def test_even_l_and_no_l1(tmp_path):
    A, _ = _run(tmp_path, {"EVEN_L": True})
    assert np.abs(A[:, :, 1, :, :]).max() == 0.0        # odd l suppressed
    assert np.abs(A[:, :, 2, :, :]).max() > 0.0
    B, _ = _run(tmp_path, {"NO_L1": True})
    assert np.abs(B[:, :, 1, :, :]).max() == 0.0
    assert np.abs(B[:, :, 0, :, :]).max() > 0.0
    assert np.abs(B[:, :, 2, :, :]).max() > 0.0


def test_no_l0_matches_unrestricted_above_monopole(tmp_path):
    """NO_L0 zeroes only the monopole channel of the recorded series;
    the restriction feeds back through the dynamics, so compare at the
    FIRST dump (same positions)."""
    A, _ = _run(tmp_path, {"NO_L0": True}, nsteps=1)
    B, _ = _run(tmp_path, {}, nsteps=1)
    assert np.abs(A[0, :, 0, :, :]).max() == 0.0
    np.testing.assert_allclose(A[0, :, 1:, :, :], B[0, :, 1:, :, :],
                               rtol=1e-6, atol=1e-9)


def test_fix_l0_freezes_monopole(tmp_path):
    A, sim = _run(tmp_path, {"FIX_L0": True}, nsteps=5)
    mono = A[:, 0, 0, 0, :]
    # monopole identical across all dumps (frozen at the prime value)
    np.testing.assert_array_equal(mono, np.broadcast_to(mono[0], mono.shape))
    # higher harmonics stay live
    dl2 = np.abs(A[-1, :, 2, :, :] - A[0, :, 2, :, :]).max()
    assert dl2 > 0.0
    assert sim._restrict["halo"]["c0"] is not None


def test_m0_only_multistep(tmp_path):
    """The restriction applies identically through the multistep tableau
    assembly."""
    A, _ = _run(tmp_path, {"M0_ONLY": True}, nsteps=2, multistep=1)
    assert np.isfinite(A).all()
    assert np.abs(A[..., :, 1:, :]).max() == 0.0
    assert np.abs(A[..., 0, 0, 0, :]).max() > 0.0


def test_flatdisk_mlim_even_m(tmp_path):
    """Polar restriction knobs (PolarBasis.cc:36-45) on a flatdisk run:
    mlim truncates m, EVEN_M suppresses odd m."""
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation

    rng = np.random.default_rng(1)
    n = 1500
    R = -0.5 * (np.log(rng.uniform(size=n)) + np.log(rng.uniform(size=n)))
    ph = rng.uniform(0, 2 * np.pi, n)
    x = np.stack([R * np.cos(ph), R * np.sin(ph), np.zeros(n)], -1)
    vc = np.sqrt(np.clip(R, 0.05, None)) * 0.5
    v = np.stack([-vc * np.sin(ph), vc * np.cos(ph), np.zeros(n)], -1)
    mass = np.full(n, 1.0 / n)
    write_ascii_bodies(tmp_path / "d.bods", (x, v, mass))
    (tmp_path / "fd.yml").write_text("""\
Global:
  dtime: 0.01
  nsteps: 2
  runtag: fdr
Components:
  - name: disk
    bodyfile: d.bods
    force:
      id: flatdisk
      parameters: {mmax: 3, nmax: 4, acyl: 0.5, rcylmax: 20.0,
                   numx: 128, numy: 64, knots: 200, numk: 128,
                   EVEN_M: true, mlim: 2}
Output:
  - id: outcoef
    parameters: {nint: 1}
""")
    sim = Simulation.from_file(str(tmp_path / "fd.yml"))
    sim.prime()
    sim.run()
    from exp_tpu.analysis.coefs import Coefs

    co = Coefs.from_file(str(tmp_path / "outcoef.disk.fdr.h5"))
    A = np.asarray(co.as_array())
    assert np.isfinite(A).all()
    # odd m suppressed (EVEN_M); m=3 also beyond mlim=2
    assert np.abs(A[..., 1, :]).max() == 0.0
    assert np.abs(A[..., 3, :]).max() == 0.0
    # m=0, 2 live
    assert np.abs(A[..., 0, :]).max() > 0.0
    assert np.abs(A[..., 2, :]).max() > 0.0
