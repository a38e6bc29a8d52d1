"""Exact mirror of the reference's CI regression gate (expNbodyTest):
tests/Halo/config.yml run end-to-end through the driver — 10k-particle
halo sampled from the reference's own SLGridSph.model, 500 steps at
dtime=0.002 with multistep=4, sphereSL Lmax=2/nmax=10/rmapping=0.0667 —
then the tests/Halo/check.py assertion: (mean 2T/VC - 1)^2 < 0.003.

Skipped when the reference tree (the model file) is not present."""

import os

import numpy as np
import pytest

REF_MODEL = "/root/reference/tests/Halo/SLGridSph.model"


@pytest.mark.skipif(not os.path.exists(REF_MODEL),
                    reason="reference model file not available")
def test_reference_ci_gate(tmp_path):
    import shutil

    from exp_tpu.basis.model import SphericalModelTable
    from exp_tpu.ic.eddington import sample_spherical_model
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation

    shutil.copy(REF_MODEL, tmp_path / "SLGridSph.model")
    m = SphericalModelTable.from_file(str(tmp_path / "SLGridSph.model"))
    x, v, mass = sample_spherical_model(m, 10000, seed=11)
    write_ascii_bodies(tmp_path / "new.bods", (x, v, mass))

    # tests/Halo/config.yml parameters verbatim (infile omitted: fresh run)
    (tmp_path / "config.yml").write_text("""\
Global:
  dtime: 0.002
  runtag: run0
  nsteps: 500
  multistep: 4
  dynfracV: 0.05
  dynfracA: 0.03
  VERBOSE: 0
Components:
  - name: halo
    parameters: {nlevel: 1, indexing: true}
    bodyfile: new.bods
    force:
      id: sphereSL
      parameters:
        numr: 4000
        rmin: 0.0001
        rmax: 1.95
        Lmax: 2
        nmax: 10
        rmapping: 0.0667
        self_consistent: true
        modelname: SLGridSph.model
        cachename: SLGridSph.cache.run0
Output:
  - id: outlog
    parameters: {nint: 10}
  - id: outcoef
    parameters: {nint: 50, name: halo}
""")
    sim = Simulation.from_file(str(tmp_path / "config.yml"))
    sim.run()

    # tests/Halo/check.py:1-22 verbatim logic
    mean = 0.0
    n = 0
    with open(tmp_path / "OUTLOG.run0") as f:
        for line in f:
            if n >= 6:
                v = [float(tok) for tok in line.split("|")]
                mean += v[16]
            n += 1
    assert n > 6
    mean /= n - 6
    assert (mean - 1.0) ** 2 < 0.003, f"virial gate failed: mean={mean}"

    # coefficient file written and finite
    from exp_tpu.io.coefs import open_coefs

    cf = open_coefs(str(tmp_path / "outcoef.halo.run0.h5"))
    times, coefs = cf.read_all()
    assert len(times) >= 9
    assert np.isfinite(coefs).all()
    cf.close()
