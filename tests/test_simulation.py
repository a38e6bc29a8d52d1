"""Driver tests: YAML config -> run -> outputs (the expNbodyTest shape).

Builds a small equilibrium halo fixture on disk (model file + body file +
YAML config mirroring the reference's tests/Halo/config.yml), runs the CLI
driver, and checks OUTLOG virial ratio, coefficient-file round-trip, and
checkpoint/restart.
"""

import os
import numpy as np
import pytest
import jax

from exp_tpu.basis.model import hernquist_model
from exp_tpu.config import RunConfig, ConfigError
from exp_tpu.ic.eddington import sample_spherical_model
from exp_tpu.nbody.particles import write_ascii_bodies


CONFIG_TMPL = """\
Global:
  dtime: {dtime}
  nsteps: {nsteps}
  runtag: trun
Components:
  - name: halo
    bodyfile: halo.bods
    force:
      id: sphereSL
      parameters:
        numr: 800
        Lmax: 2
        nmax: 8
        rmapping: 1.0
        modelname: halo.model
        cachename: halo.cache.h5
Output:
  - id: outlog
    parameters: {{nint: 1}}
  - id: outcoef
    parameters: {{nint: 2, name: halo}}
  - id: outchkpt
    parameters: {{nint: 10}}
"""


@pytest.fixture(scope="module")
def rundir(tmp_path_factory):
    d = tmp_path_factory.mktemp("halorun")
    m = hernquist_model(rmin=1e-4, rmax=20.0, numr=1000)
    m.to_file(d / "halo.model")
    x, v, mass = sample_spherical_model(m, 3000, seed=11)
    write_ascii_bodies(d / "halo.bods", (x, v, mass))
    (d / "config.yml").write_text(CONFIG_TMPL.format(dtime=0.02, nsteps=20))
    return d


def test_config_validation(rundir):
    cfg = RunConfig.from_file(rundir / "config.yml")
    assert cfg.glob.nsteps == 20
    assert cfg.components[0].force.id == "sphereSL"

    # unknown keys hard-fail (YamlCheck behavior)
    bad = (rundir / "config.yml").read_text().replace(
        "dtime", "dtmie")
    (rundir / "bad.yml").write_text(bad)
    with pytest.raises(ConfigError):
        RunConfig.from_file(rundir / "bad.yml")


def test_run_and_outputs(rundir):
    from exp_tpu.nbody.simulation import Simulation

    sim = Simulation.from_file(str(rundir / "config.yml"))
    sim.prime()
    sim.run()

    # OUTLOG exists and virial ratio is sane
    log = (rundir / "OUTLOG.trun").read_text().splitlines()
    rows = [r for r in log if not r.startswith("#") and "Time" not in r]
    ratios = [float(r.split("|")[16]) for r in rows[1:]]
    mean = np.mean(ratios)
    assert (mean - 1.0) ** 2 < 0.01, f"virial {mean}"

    # energy column stable
    E = [float(r.split("|")[15]) for r in rows]
    assert abs(E[-1] - E[0]) / abs(E[0]) < 5e-3

    # coefficient file round-trips and matches live coefficients
    from exp_tpu.io.coefs import SphCoefsFile, open_coefs

    cf = open_coefs(str(rundir / "outcoef.halo.trun.h5"))
    assert isinstance(cf, SphCoefsFile)
    times, coefs = cf.read_all()
    assert len(times) == 11                      # t=0 prime + 20 steps/nint=2
    assert coefs.shape[1:] == (2, 3, 3, 8)
    live = np.asarray(sim._coefs["halo"])
    np.testing.assert_allclose(coefs[-1], live, rtol=1e-6, atol=1e-10)
    cf.close()

    # monopole coefficient dominates and is stable over the run
    c000 = coefs[:, 0, 0, 0, 0]
    assert np.all(np.abs(c000 - c000[0]) < 0.05 * np.abs(c000[0]))


def test_checkpoint_restart(rundir):
    from exp_tpu.nbody.simulation import Simulation
    from exp_tpu.nbody.output import restore_checkpoint

    sim = Simulation.from_file(str(rundir / "config.yml"))
    sim.prime()
    sim.run(10)
    x10 = np.asarray(sim._state["halo"].x)

    sim2 = Simulation.from_file(str(rundir / "config.yml"))
    restore_checkpoint(sim2, str(rundir / "OUT.trun.chkpt"))
    assert sim2.istep == 10
    np.testing.assert_allclose(np.asarray(sim2._state["halo"].x), x10,
                               rtol=1e-12)
    # continues cleanly
    sim2.prime()
    sim2.run(4)
    assert np.isfinite(np.asarray(sim2._state["halo"].x)).all()


def test_cli_main(rundir, capsys):
    from exp_tpu.run import main

    main([str(rundir / "config.yml"), "-n", "4"])
    out = capsys.readouterr().out
    assert "particle-steps/s" in out
    assert (rundir / "config.trun.yml").exists()


def test_multistep_config_run(rundir):
    """Driver with Global.multistep: runs, conserves energy, writes outputs."""
    txt = (rundir / "config.yml").read_text().replace(
        "runtag: trun", "runtag: msrun\n  multistep: 2\n  dynfracV: 0.05\n  dynfracA: 0.05")
    (rundir / "config_ms.yml").write_text(txt)
    from exp_tpu.nbody.simulation import Simulation

    sim = Simulation.from_file(str(rundir / "config_ms.yml"))
    assert sim.M == 2
    sim.run(15)
    log = (rundir / "OUTLOG.msrun").read_text().splitlines()
    rows = [r for r in log if not r.startswith("#") and "Time" not in r]
    E = [float(r.split("|")[15]) for r in rows]
    assert abs(E[-1] - E[0]) / abs(E[0]) < 5e-3
    ratios = [float(r.split("|")[16]) for r in rows]
    assert (np.mean(ratios) - 1.0) ** 2 < 0.01
    counts = sim._ms_runner.level_counts(sim._ms_state)["halo"]
    assert sum(counts) == 3000


def test_self_consistent_false_freezes_coefficients(rundir):
    """self_consistent: false (the reference's fixed-potential component):
    the expansion is captured at prime and never responds to the live
    particles, while a self-consistent run's coefficients drift."""
    from exp_tpu.nbody.simulation import Simulation

    txt = (rundir / "config.yml").read_text().replace(
        "runtag: trun", "runtag: frz").replace(
        "        numr: 800", "        numr: 800\n"
        "        self_consistent: false")
    (rundir / "config_frz.yml").write_text(txt)
    sim = Simulation.from_file(str(rundir / "config_frz.yml"))
    sim.prime()
    c0 = np.asarray(sim._coefs["halo"]).copy()
    sim.run(3)
    c3 = np.asarray(sim._coefs["halo"]).copy()
    sim.run(3)
    # frozen to the prime-time projection (up to the compute-dtype cast
    # of the stored constant), and EXACTLY constant step to step
    np.testing.assert_allclose(c3, c0, rtol=1e-6, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(sim._coefs["halo"]), c3)
    # per-particle energies in the static field stay finite and sane
    assert np.isfinite(np.asarray(sim._state["halo"].x)).all()

    sim2 = Simulation.from_file(str(rundir / "config.yml"))
    sim2.prime()
    c2 = np.asarray(sim2._coefs["halo"]).copy()
    sim2.run(6)
    assert np.abs(np.asarray(sim2._coefs["halo"]) - c2).max() > 0


def test_interaction_one_way_and_dedup(rundir):
    """Interaction `a: b` means 'b feels a' ONE-WAY (Interaction.l,
    ComponentContainer.H:27-35); reciprocal/duplicate entries dedupe."""
    from exp_tpu.config import RunConfig
    from exp_tpu.nbody.simulation import Simulation

    txt = (rundir / "config.yml").read_text().replace(
        "runtag: trun", "runtag: iact\n  allcouples: false")
    txt = txt.replace("Components:", """\
Interaction:
  - halo: halo2
  - halo: halo2
Components:
  - name: halo2
    bodyfile: halo.bods
    force:
      id: noforce
""")
    (rundir / "config_iact.yml").write_text(txt)
    sim = Simulation.from_file(str(rundir / "config_iact.yml"))
    assert sim.couples["halo2"] == ["halo2", "halo"]   # feels halo, once
    assert sim.couples["halo"] == ["halo"]             # one-way


def test_multistep_checkpoint_restart(rundir):
    """Restart a MULTISTEP run from an OutChkpt file: levels/coefficients
    are derived state and rebuilt on resume (the reference restarts
    multistep runs via `infile:`; Component.cc:3253)."""
    txt = (rundir / "config.yml").read_text().replace(
        "runtag: trun",
        "runtag: msck\n  multistep: 2\n  dynfracV: 0.05\n  dynfracA: 0.05")
    (rundir / "config_msck.yml").write_text(txt)
    from exp_tpu.nbody.output import restore_checkpoint
    from exp_tpu.nbody.simulation import Simulation

    sim = Simulation.from_file(str(rundir / "config_msck.yml"))
    sim.run(10)
    x10 = np.asarray(sim._state["halo"].x)

    # restoring into an ALREADY-STEPPED sim must also drop the stale
    # multistep buckets so the restored flat state is what integrates
    assert sim._ms_state is not None
    restore_checkpoint(sim, str(rundir / "OUT.msck.chkpt"))
    assert sim._ms_state is None and sim._ms_regs is None

    sim2 = Simulation.from_file(str(rundir / "config_msck.yml"))
    restore_checkpoint(sim2, str(rundir / "OUT.msck.chkpt"))
    assert sim2.istep == 10 and sim2._ms_state is None
    np.testing.assert_allclose(np.asarray(sim2._state["halo"].x), x10,
                               rtol=1e-12)
    sim2.run(5)
    # levels repopulated and energy still conserved after the resume
    counts = sim2._ms_runner.level_counts(sim2._ms_state)["halo"]
    assert sum(counts) == 3000
    log = (rundir / "OUTLOG.msck").read_text().splitlines()
    rows = [r for r in log if not r.startswith("#") and "Time" not in r]
    E = [float(r.split("|")[15]) for r in rows]
    assert abs(E[-1] - E[0]) / abs(E[0]) < 5e-3


def test_wall_clock_stop_and_outmulti(rundir):
    """Wall-budget stop writes a checkpoint; OutMulti logs level counts."""
    txt = (rundir / "config.yml").read_text().replace(
        "runtag: trun", "runtag: wallrun\n  multistep: 2")
    txt += "  - id : outmulti\n    parameters : {nint: 1}\n"
    (rundir / "config_wall.yml").write_text(txt)
    from exp_tpu.nbody.simulation import Simulation

    sim = Simulation.from_file(str(rundir / "config_wall.yml"))
    sim.wall_limit = 0.0       # expire immediately after the first block
    sim.run(10)
    assert sim.istep < 10
    assert (rundir / "OUT.wallrun.chkpt").exists()

    # OutMulti: run a couple of steps without the wall limit
    sim2 = Simulation.from_file(str(rundir / "config_wall.yml"))
    sim2.run(3)
    levels = (rundir / "wallrun.levels").read_text().splitlines()
    assert len(levels) >= 3
    counts = [int(v) for v in levels[-1].split()[2:]]
    assert sum(counts) == 3000


def test_diag_outputs(rundir):
    """OrbTrace, OutDiag, OutFrac writers produce sane tables."""
    txt = (rundir / "config.yml").read_text().replace("runtag: trun",
                                                      "runtag: diag0")
    txt += ("  - id : orbtrace\n    parameters : {nint: 1, norb: 3}\n"
            "  - id : outdiag\n    parameters : {nint: 2}\n"
            "  - id : outfrac\n    parameters : {nint: 2}\n")
    (rundir / "config_diag.yml").write_text(txt)
    from exp_tpu.nbody.simulation import Simulation

    sim = Simulation.from_file(str(rundir / "config_diag.yml"))
    sim.prime()
    sim.run(4)
    tr = np.loadtxt(rundir / "ORBTRACE.diag0")
    assert tr.shape[1] == 1 + 3 * 6
    # traced orbits move
    assert np.abs(tr[-1, 1:4] - tr[0, 1:4]).max() > 0
    fr = np.loadtxt(rundir / "OUTFRAC.diag0")
    assert np.all(np.diff(fr[0, 1:]) > 0)      # Lagrangian radii increase
    dg = np.loadtxt(rundir / "OUTDIAG.diag0")
    assert dg.shape[1] == 6


def test_outcalbr_and_timers(rundir, capsys):
    """OutCalbr writes per-bin rms dE/dL; VERBOSE>3 prints phase timings."""
    txt = (rundir / "config.yml").read_text().replace(
        "runtag: trun", "runtag: calbr0\n  VERBOSE: 4")
    txt += "  - id : outcalbr\n    parameters : {nint: 2, num: 5}\n"
    (rundir / "config_calbr.yml").write_text(txt)
    from exp_tpu.nbody.simulation import Simulation

    sim = Simulation.from_file(str(rundir / "config_calbr.yml"))
    sim.prime()
    sim.run(4)
    lines = [ln for ln in (rundir / "OUTCALBR.calbr0").read_text()
             .splitlines() if not ln.startswith("#")]
    assert len(lines) >= 1
    vals = lines[-1].split()
    assert len(vals) == 1 + 5 * 5           # time + 5 bins x 5 columns
    rms_dE = np.array([float(vals[1 + 5 * b]) for b in range(5)])
    counts = np.array([int(vals[5 + 5 * b]) for b in range(5)])
    assert counts.sum() == 3000
    assert np.all(np.isfinite(rms_dE)) and rms_dE.max() < 1.0
    assert "timing:" in capsys.readouterr().out


def test_fpe_guard(rundir):
    """fpe: true aborts on non-finite state with a diagnostic dump."""
    txt = (rundir / "config.yml").read_text().replace(
        "runtag: trun", "runtag: fpe0\n  fpe: true")
    (rundir / "config_fpe.yml").write_text(txt)
    from exp_tpu.nbody.simulation import Simulation

    sim = Simulation.from_file(str(rundir / "config_fpe.yml"))
    sim.prime()
    sim.run(2)                               # healthy run passes the guard
    # poison the state
    import jax.numpy as jnp
    from dataclasses import replace as _rp
    ps = sim._state["halo"]
    sim._state["halo"] = _rp(ps, v=ps.v.at[0, 0].set(jnp.nan))
    with pytest.raises(FloatingPointError):
        sim.run(2)
    assert (rundir / "SPSCHK.fpe0.badvalues").exists()


def test_centerfile(rundir):
    """Component `centerfile`: expansion center follows the file trajectory."""
    np.savetxt(rundir / "ctr.dat",
               np.array([[0.0, 0.0, 0.0, 0.0],
                         [1.0, 0.5, -0.25, 0.1]]))
    txt = (rundir / "config.yml").read_text().replace(
        "runtag: trun", "runtag: ctr0")
    txt = txt.replace("bodyfile: halo.bods",
                      "bodyfile: halo.bods\n    parameters:\n"
                      "      centerfile: ctr.dat")
    (rundir / "config_ctr.yml").write_text(txt)
    from exp_tpu.nbody.simulation import Simulation

    sim = Simulation.from_file(str(rundir / "config_ctr.yml"))
    sim.prime()
    sim.run(4)
    t_block = sim.time - sim.dt * sim.steps_per_block
    np.testing.assert_allclose(
        sim._centers["halo"],
        [0.5 * t_block, -0.25 * t_block, 0.1 * t_block], atol=1e-12)
    assert np.isfinite(np.asarray(sim._state["halo"].x)).all()


def test_adaptive_basis_recompute(rundir):
    """sphereSL dtime>0: basis is rebuilt from the particles mid-run and the
    equilibrium halo stays in virial balance afterwards."""
    txt = (rundir / "config.yml").read_text().replace(
        "runtag: trun", "runtag: adap0")
    txt = txt.replace("rmapping: 1.0", "rmapping: 1.0\n        dtime: 0.08")
    (rundir / "config_adap.yml").write_text(txt)
    from exp_tpu.nbody.simulation import Simulation

    sim = Simulation.from_file(str(rundir / "config_adap.yml"))
    sim.prime()
    f0 = sim.components["halo"].force
    sim.run(10)          # dt=0.02 -> rebuild due at t=0.08
    f1 = sim.components["halo"].force
    assert f1 is not f0                       # basis actually swapped
    assert sim.components["halo"].basis_tnext > 0.08
    d = sim._diag["halo"]
    ratio = -2.0 * float(np.asarray(d["KE"])) / float(np.asarray(d["VC"]))
    assert 0.8 < ratio < 1.25
    assert np.isfinite(np.asarray(sim._state["halo"].x)).all()


def test_chkpt_bak_generations(rundir):
    """OutChkpt nbak>1 keeps a chain of rotated .bak generations, and the
    newest checkpoint restores."""
    txt = (rundir / "config.yml").read_text().replace(
        "runtag: trun", "runtag: bak0").replace(
        "  - id: outchkpt\n    parameters: {nint: 10}\n",
        "  - id: outchkpt\n    parameters: {nint: 2, nbak: 3}\n")
    (rundir / "config_bak.yml").write_text(txt)
    from exp_tpu.nbody.simulation import Simulation
    from exp_tpu.nbody.output import restore_checkpoint

    sim = Simulation.from_file(str(rundir / "config_bak.yml"))
    sim.prime()
    sim.run(6)
    base = str(rundir / "OUT.bak0.chkpt")
    import os
    assert all(os.path.exists(base + s) for s in ("", ".bak", ".bak1",
                                                  ".bak2"))
    sim2 = Simulation.from_file(str(rundir / "config_bak.yml"))
    restore_checkpoint(sim2, base)
    assert abs(sim2.time - sim.time) < 1e-12


def test_rtrunc(rundir):
    """rtrunc: particles beyond the truncation radius don't source the
    expansion — total expanded mass (monopole) drops accordingly."""
    txt = (rundir / "config.yml").read_text().replace(
        "runtag: trun", "runtag: rt0")
    txt = txt.replace("bodyfile: halo.bods",
                      "bodyfile: halo.bods\n    parameters:\n"
                      "      rtrunc: 1.0")
    (rundir / "config_rt.yml").write_text(txt)
    from exp_tpu.nbody.simulation import Simulation

    sim_t = Simulation.from_file(str(rundir / "config_rt.yml"))
    sim_t.prime()
    sim_t.run(2)
    sim_f = Simulation.from_file(str(rundir / "config.yml"))
    sim_f.prime()
    sim_f.run(2)
    # l=0,n-summed potential amplitude should shrink with rtrunc=1
    a_t = np.abs(np.asarray(sim_t._coefs["halo"])[0]).sum()
    a_f = np.abs(np.asarray(sim_f._coefs["halo"])[0]).sum()
    assert a_t < 0.9 * a_f
    assert np.isfinite(np.asarray(sim_t._state["halo"].x)).all()


def test_com_system(rundir, tmp_path):
    """com: true expands about the component COM — an equilibrium halo
    displaced from the origin stays in virial balance."""
    b = np.loadtxt(rundir / "halo.bods", skiprows=1)
    b[:, 1] += 2.0                     # shift x by 2 (columns m,x,y,z,...)
    hdr = open(rundir / "halo.bods").readline().strip()
    np.savetxt(tmp_path / "off.bods", b, header=hdr, comments="")
    txt = (rundir / "config.yml").read_text().replace(
        "runtag: trun", "runtag: com0").replace(
        "bodyfile: halo.bods",
        f"bodyfile: {tmp_path}/off.bods\n    parameters:\n      com: true")
    (rundir / "config_com.yml").write_text(txt)
    from exp_tpu.nbody.simulation import Simulation

    sim = Simulation.from_file(str(rundir / "config_com.yml"))
    sim.prime()
    sim.run(10)
    d = sim._diag["halo"]
    ratio = -2.0 * float(np.asarray(d["KE"])) / float(np.asarray(d["VC"]))
    assert abs(ratio - 1.0) < 0.15
    com = np.asarray(d["com"]) / float(np.asarray(d["mass"]))
    np.testing.assert_allclose(com[0], 2.0, atol=0.05)


def test_nbodmax(rundir):
    """nbodmax caps per-component particle counts (hard config error)."""
    txt = (rundir / "config.yml").read_text().replace(
        "runtag: trun", "runtag: nb0\n  nbodmax: 100")
    (rundir / "config_nb.yml").write_text(txt)
    from exp_tpu.nbody.simulation import Simulation

    with pytest.raises(ConfigError, match="nbodmax"):
        Simulation.from_file(str(rundir / "config_nb.yml"))


def test_outvel_writer(rundir):
    """OutVel writes velocity-field coefficient snapshots."""
    txt = (rundir / "config.yml").read_text().replace(
        "runtag: trun", "runtag: vel0")
    txt += "  - id : outvel\n    parameters : {nint: 2, name: halo}\n"
    (rundir / "config_vel.yml").write_text(txt)
    from exp_tpu.nbody.simulation import Simulation
    import h5py

    sim = Simulation.from_file(str(rundir / "config_vel.yml"))
    sim.prime()
    sim.run(4)
    with h5py.File(rundir / "outvel.halo.vel0.h5") as f:
        snaps = [k for k in f.keys() if k.startswith("snap")]
        assert len(snaps) >= 2
        g = f[snaps[-1]]
        for k in f.attrs["fields"]:
            assert np.isfinite(g[k][()]).all()


def test_adddisk_halo_response(tmp_path):
    """gensph --adddisk: halo sampled in the combined halo+disk potential
    stays virialized when run with a fixed disk field; the uncorrected
    halo is measurably colder."""
    from exp_tpu.cli.gensph import main as gensph
    from exp_tpu.nbody.simulation import Simulation

    gensph(["-N", "4000", "-i", "hernquist:a=1,M=1", "--rmax", "30",
            "--adddisk", "0.2,0.5", "-o", str(tmp_path / "h.bods"),
            "-s", "5"])
    (tmp_path / "c.yml").write_text("""\
Global:
  dtime: 0.02
  nsteps: 20
  runtag: resp0
Components:
  - name: halo
    bodyfile: h.bods
    force:
      id: sphereSL
      parameters: {numr: 800, Lmax: 2, nmax: 8,
                   modelname: "hernquist:a=1,M=1"}
Output:
  - id: outlog
    parameters: {nint: 10}
External:
  - id: userdisk
    parameters: {a: 0.5, mass: 0.2}
""")
    sim = Simulation.from_file(str(tmp_path / "c.yml"))
    sim.prime()
    sim.run()
    d = sim._diag["halo"]
    ratio = -2.0 * float(np.asarray(d["KE"])) / float(np.asarray(d["VC"]))
    assert abs(ratio - 1.0) < 0.12


# ---------------------------------------------------------------------------
# Multistep x component-feature composition (src/step.cc:128-213 parity):
# with every particle pinned at level 0 (huge dynfrac thresholds), a
# multistep=2 run must reproduce the flat run EXACTLY, feature by feature.
# ---------------------------------------------------------------------------

_FEATURE_PARAMS = {
    "plain": "",
    "adiabatic": "      adiabatic: true\n      ton: 0.04\n      twid: 0.02\n",
    "rtrunc": "      rtrunc: 1.5\n",
    "com": "      com: true\n",
}


def _feature_cfg(rundir, tag, feature, multistep):
    extra = _FEATURE_PARAMS[feature]
    params = f"    parameters:\n{extra}" if extra else ""
    glob = f"  multistep: {multistep}\n"
    if multistep:
        # pin every particle to level 0: all dt criteria >> dtime
        glob += ("  dynfracV: 1.0e30\n  dynfracA: 1.0e30\n"
                 "  dynfracP: 1.0e30\n")
    cfg = f"""\
Global:
  dtime: 0.02
  nsteps: 6
  runtag: {tag}
  compute_dtype: float64
{glob}Components:
  - name: halo
    bodyfile: halo.bods
{params}    force:
      id: sphereSL
      parameters:
        numr: 800
        Lmax: 2
        nmax: 8
        rmapping: 1.0
        modelname: halo.model
        cachename: halo.cache.h5
Output:
  - id: outlog
    parameters: {{nint: 6}}
"""
    p = rundir / f"config_{tag}.yml"
    p.write_text(cfg)
    return p


def _final_state(sim, name="halo"):
    ps = sim._state[name]
    live = np.asarray(ps.mass) > 0
    x = np.asarray(ps.x)[live]
    v = np.asarray(ps.v)[live]
    order = np.lexsort(x.T)
    return x[order], v[order]


@pytest.mark.parametrize("feature", list(_FEATURE_PARAMS))
def test_multistep_feature_equivalence(rundir, feature):
    """multistep(M=2, all level 0) + feature == flat stepping + feature."""
    from exp_tpu.nbody.simulation import Simulation

    sim_f = Simulation.from_file(
        str(_feature_cfg(rundir, f"fx_{feature}_flat", feature, 0)),
        steps_per_block=1)
    sim_f.prime()
    sim_f.run()

    sim_m = Simulation.from_file(
        str(_feature_cfg(rundir, f"fx_{feature}_ms", feature, 2)))
    sim_m.run()
    counts = sim_m._ms_runner.level_counts(sim_m._ms_state)["halo"]
    assert counts[0] == 3000, f"particles not pinned at level 0: {counts}"

    xf, vf = _final_state(sim_f)
    xm, vm = _final_state(sim_m)
    np.testing.assert_allclose(xm, xf, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(vm, vf, rtol=1e-6, atol=1e-10)


def test_multistep_playback_equivalence(rundir):
    """Playback-driven multistep == playback-driven flat stepping."""
    from exp_tpu.nbody.simulation import Simulation

    # generate a coefficient series with a flat run writing every step
    src = (rundir / "config.yml").read_text().replace(
        "runtag: trun", "runtag: pbsrc\n  compute_dtype: float64").replace(
        "parameters: {nint: 2, name: halo}",
        "parameters: {nint: 1, name: halo}")
    (rundir / "config_pbsrc.yml").write_text(src)
    sim0 = Simulation.from_file(str(rundir / "config_pbsrc.yml"))
    sim0.prime()
    sim0.run(10)
    coeffile = "outcoef.halo.pbsrc.h5"
    assert (rundir / coeffile).exists()

    def pb_cfg(tag, multistep):
        p = _feature_cfg(rundir, tag, "plain", multistep)
        txt = p.read_text().replace(
            "bodyfile: halo.bods",
            f"bodyfile: halo.bods\n    parameters:\n"
            f"      playback: {coeffile}")
        p.write_text(txt)
        return p

    sim_f = Simulation.from_file(str(pb_cfg("pb_flat", 0)))
    sim_f.prime()
    sim_f.run(5)
    sim_m = Simulation.from_file(str(pb_cfg("pb_ms", 2)))
    sim_m.run(5)
    xf, vf = _final_state(sim_f)
    xm, vm = _final_state(sim_m)
    np.testing.assert_allclose(xm, xf, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(vm, vf, rtol=1e-6, atol=1e-10)


def test_multistep_direct_force(rundir):
    """A direct-force component under multistep: runs with adaptive levels
    and conserves energy (needs_sources path through the substep loop)."""
    from exp_tpu.nbody.simulation import Simulation

    cfg = f"""\
Global:
  dtime: 0.02
  nsteps: 6
  runtag: dms
  compute_dtype: float64
  multistep: 2
Components:
  - name: halo
    bodyfile: halo.bods
    force:
      id: direct
      parameters: {{eps: 0.05}}
Output:
  - id: outlog
    parameters: {{nint: 1}}
"""
    (rundir / "config_dms.yml").write_text(cfg)
    sim = Simulation.from_file(str(rundir / "config_dms.yml"))
    sim.run()
    log = (rundir / "OUTLOG.dms").read_text().splitlines()
    rows = [r for r in log if not r.startswith("#") and "Time" not in r]
    E = [float(r.split("|")[15]) for r in rows]
    assert abs(E[-1] - E[0]) / abs(E[0]) < 2e-2


def test_multistep_sanity_stop(rundir):
    """Runaway level demand (dtime far too large for the finest level)
    force-stops the run with a checkpoint (multistep.cc:296-341)."""
    from exp_tpu.nbody.simulation import Simulation

    cfg = """\
Global:
  dtime: 5.0
  nsteps: 10
  runtag: runaway
  multistep: 1
  maxMindt: 0.05
Components:
  - name: halo
    bodyfile: halo.bods
    force:
      id: sphereSL
      parameters:
        numr: 800
        Lmax: 2
        nmax: 8
        rmapping: 1.0
        modelname: halo.model
        cachename: halo.cache.h5
Output:
  - id: outlog
    parameters: {nint: 1}
"""
    (rundir / "config_runaway.yml").write_text(cfg)
    sim = Simulation.from_file(str(rundir / "config_runaway.yml"))
    sim.run()
    assert sim.stop_requested, "sanity stop did not trigger"
    assert sim.istep < 10, f"ran to completion ({sim.istep} steps)"
    import glob as _g
    assert _g.glob(str(rundir / "*runaway*chkpt*")) or \
        _g.glob(str(rundir / "SPSCHK.runaway*")), "no checkpoint written"


def test_psp_bodyfile_ingestion(rundir, tmp_path):
    """bodyfile: may be a PSP binary snapshot (sniffed by magic) — the run
    matches the ascii-loaded run exactly (Component.H:202-204 parity)."""
    from exp_tpu.io.psp import PSPDump, PSPComponent, write_psp
    from exp_tpu.nbody.simulation import Simulation

    b = np.loadtxt(rundir / "halo.bods", skiprows=1)
    d = PSPDump(time=0.0)
    d.components.append(PSPComponent(
        name="halo", info="name: halo\n", mass=b[:, 0],
        x=b[:, 1:4], v=b[:, 4:7], pot=np.zeros(len(b))))
    write_psp(str(rundir / "halo.psp"), d)

    base = (rundir / "config.yml").read_text().replace(
        "runtag: trun", "runtag: pspa\n  compute_dtype: float64")
    (rundir / "config_pspa.yml").write_text(base)
    psp = base.replace("runtag: pspa", "runtag: pspb").replace(
        "bodyfile: halo.bods", "bodyfile: halo.psp")
    (rundir / "config_pspb.yml").write_text(psp)

    sa = Simulation.from_file(str(rundir / "config_pspa.yml"))
    sa.prime()
    sa.run(3)
    sb = Simulation.from_file(str(rundir / "config_pspb.yml"))
    sb.prime()
    sb.run(3)
    for k in ("KE", "PE"):
        va = float(np.asarray(sa._diag["halo"][k]))
        vb = float(np.asarray(sb._diag["halo"][k]))
        assert va == pytest.approx(vb, rel=1e-12), k


def test_outchkptq_quick_checkpoint(rundir):
    """outchkptq writes single-precision checkpoints that restart."""
    (rundir / "config_ckq.yml").write_text("""\
Global:
  dtime: 0.02
  nsteps: 4
  runtag: ckq0
Components:
  - name: halo
    bodyfile: halo.bods
    force:
      id: sphereSL
      parameters:
        numr: 800
        Lmax: 2
        nmax: 8
        rmapping: 1.0
        modelname: halo.model
        cachename: halo.cache.h5
Output:
  - id: outchkptq
    parameters: {nint: 2}
""")
    from exp_tpu.nbody.simulation import Simulation
    import h5py

    sim = Simulation.from_file(str(rundir / "config_ckq.yml"))
    sim.prime()
    sim.run(4)
    path = rundir / "OUT.ckq0.chkpt"
    assert path.exists()
    with h5py.File(path, "r") as f:
        comp = f[[k for k in f.keys()][0]]
        assert comp["x"].dtype == np.float32


def test_nrelevel_knob(rundir):
    """Global.nrelevel: re-leveling every N big steps still conserves
    energy and keeps all particles accounted for."""
    txt = (rundir / "config.yml").read_text().replace(
        "runtag: trun",
        "runtag: nrlrun\n  multistep: 2\n  nrelevel: 4\n"
        "  dynfracV: 0.05\n  dynfracA: 0.05")
    (rundir / "config_nrl.yml").write_text(txt)
    from exp_tpu.nbody.simulation import Simulation

    sim = Simulation.from_file(str(rundir / "config_nrl.yml"))
    assert sim.config.glob.nrelevel == 4
    sim.run(9)
    log = (rundir / "OUTLOG.nrlrun").read_text().splitlines()
    rows = [r for r in log if not r.startswith("#") and "Time" not in r]
    E = [float(r.split("|")[15]) for r in rows]
    assert abs(E[-1] - E[0]) / abs(E[0]) < 5e-3
    counts = sim._ms_runner.level_counts(sim._ms_state)["halo"]
    assert sum(counts) == 3000


def test_restart_continues_outputs(rundir):
    """infile: restarts APPEND to existing outputs (the reference appends
    on restart) instead of truncating them at writer construction."""
    from exp_tpu.nbody.simulation import Simulation

    txt = (rundir / "config.yml").read_text().replace(
        "runtag: trun", "runtag: cont").replace("nsteps: 20", "nsteps: 10")
    (rundir / "config_cont.yml").write_text(txt)
    sim = Simulation.from_file(str(rundir / "config_cont.yml"))
    sim.prime()
    sim.run()
    rows1 = [r for r in (rundir / "OUTLOG.cont").read_text().splitlines()
             if not r.startswith("#") and "Time" not in r]
    from exp_tpu.io.coefs import open_coefs

    with open_coefs(str(rundir / "outcoef.halo.cont.h5")) as f:
        n1 = len(f.times())

    txt2 = txt.replace("runtag: cont",
                       "runtag: cont\n  infile: OUT.cont.chkpt")
    (rundir / "config_cont2.yml").write_text(txt2)
    from exp_tpu.run import main as run_main

    run_main(["--cpu", str(rundir / "config_cont2.yml"), "-n", "6"])
    rows2 = [r for r in (rundir / "OUTLOG.cont").read_text().splitlines()
             if not r.startswith("#") and "Time" not in r]
    assert len(rows2) > len(rows1), "restart truncated OUTLOG"
    assert rows2[:len(rows1)] == rows1, "restart rewrote old OUTLOG rows"
    with open_coefs(str(rundir / "outcoef.halo.cont.h5")) as f:
        ts = f.times()
    assert len(ts) > n1, "restart truncated the coefficient series"
    assert ts[-1] > 0.2 - 1e-9   # continued past the first leg's end


def test_orbtrace_stable_under_multistep(rundir):
    """ORBTRACE follows the SAME physical particles across multistep
    rebucketing (persistent ParticleSystem.indx, the reference's
    Particle::indx) — positions evolve continuously instead of jumping
    between level-sorted rows."""
    txt = (rundir / "config.yml").read_text().replace(
        "runtag: trun",
        "runtag: otms\n  multistep: 2\n  dynfracV: 0.05\n  dynfracA: 0.05")
    txt += "  - id : orbtrace\n    parameters : {nint: 1, norb: 4}\n"
    (rundir / "config_otms.yml").write_text(txt)
    from exp_tpu.nbody.simulation import Simulation

    sim = Simulation.from_file(str(rundir / "config_otms.yml"))
    sim.run(12)
    tr = np.loadtxt(rundir / "ORBTRACE.otms")
    assert tr.shape[1] == 1 + 4 * 6
    xs = tr[:, 1:].reshape(len(tr), 4, 6)[:, :, :3]
    # continuity: per-step displacement stays a small multiple of dt*v
    steps = np.linalg.norm(np.diff(xs, axis=0), axis=2)
    assert steps.max() < 0.2, f"orbit trace jumped: {steps.max()}"
    # no padding rows traced (all traced rows have finite motion history)
    assert np.abs(xs).max() > 0

    # identity set preserved through rebucketing
    from exp_tpu.nbody.multistep import flatten_buckets, LevelBuckets

    ps = flatten_buckets(LevelBuckets(
        list(sim._ms_state["halo"]), None))
    ix = np.asarray(ps.indx)
    live = np.asarray(ps.mass) > 0
    assert sorted(ix[live].tolist()) == list(range(1, 3001))
    assert (ix[~live] == 0).all()


def test_reference_global_keys(rundir):
    """A Global stanza using the reference's full key vocabulary parses
    and the honored keys reach the Simulation (parse.cc:64-376); the
    MPI/CUDA/debug knobs are tolerated without error."""
    txt = (rundir / "config.yml").read_text().replace(
        "runtag: trun",
        "runtag: gkeys\n"
        "  nthrds: 4\n  cuda: off\n  use_cuda: false\n  ngpus: 0\n"
        "  barrier_check: true\n  barrier_quiet: true\n  mpi_wait: false\n"
        "  fpe_trap: false\n  fpe_trace: false\n  traceback: true\n"
        "  runtime: 0.5\n  restart_cmd: 'echo resub'\n  nreport: 5\n"
        "  random_seed: 42\n  eqmotion: true\n  restart_as_new: false\n"
        "  NICE: 0\n  rlimit: 0\n  use_cwd: false\n  centerlevl: 1")
    (rundir / "config_gkeys.yml").write_text(txt)
    from exp_tpu.nbody.simulation import Simulation

    sim = Simulation.from_file(str(rundir / "config_gkeys.yml"))
    assert sim.wall_limit == pytest.approx(0.5 * 3600.0)   # hours -> s
    assert sim.restart_cmd == "echo resub"
    assert sim.nreport == 5
    assert sim.eqmotion is True

    # fpe_trap -> fpe=True mapping (expand.cc:315-317)
    cfg = RunConfig.from_dict({
        "Global": {"fpe_trap": True},
        "Components": [{"name": "h", "bodyfile": "halo.bods",
                        "force": {"id": "noforce"}}]})
    assert cfg.glob.fpe is True


def test_eqmotion_freeze(rundir, capsys):
    """eqmotion: false freezes the phase space while forces and outputs
    still run every step (incpos.cc:75, incvel.cc:93)."""
    txt = (rundir / "config.yml").read_text().replace(
        "runtag: trun", "runtag: eqm\n  eqmotion: false\n  nreport: 2")
    (rundir / "config_eqm.yml").write_text(txt)
    from exp_tpu.nbody.simulation import Simulation

    sim = Simulation.from_file(str(rundir / "config_eqm.yml"))
    sim.prime()
    x0 = np.asarray(sim._state["halo"].x).copy()
    v0 = np.asarray(sim._state["halo"].v).copy()
    sim.run(6)
    assert sim.istep == 6 and sim.time == pytest.approx(6 * sim.dt)
    np.testing.assert_array_equal(np.asarray(sim._state["halo"].x), x0)
    np.testing.assert_array_equal(np.asarray(sim._state["halo"].v), v0)
    # fields still evaluated: accelerations are finite and nonzero
    acc = np.asarray(sim._state["halo"].acc)
    assert np.isfinite(acc).all() and np.abs(acc).max() > 0
    # nreport progress lines printed at the requested cadence
    out = capsys.readouterr().out
    assert "step 2" in out and "step 4" in out and "step 6" in out


def test_eqmotion_freeze_multistep(rundir):
    """eqmotion: false under the multistep hierarchy: buckets keep their
    phase space bit-exact across a big step."""
    txt = (rundir / "config.yml").read_text().replace(
        "runtag: trun", "runtag: eqmms\n  eqmotion: false\n  multistep: 2")
    (rundir / "config_eqmms.yml").write_text(txt)
    from exp_tpu.nbody.simulation import Simulation
    from exp_tpu.nbody.multistep import flatten_buckets, LevelBuckets

    sim = Simulation.from_file(str(rundir / "config_eqmms.yml"))
    sim.run(1)
    ps = flatten_buckets(LevelBuckets(list(sim._ms_state["halo"]), None))
    ix = np.argsort(np.asarray(ps.indx))
    x = np.asarray(ps.x)[ix]
    sim.run(2)
    ps2 = flatten_buckets(LevelBuckets(list(sim._ms_state["halo"]), None))
    ix2 = np.argsort(np.asarray(ps2.indx))
    np.testing.assert_array_equal(np.asarray(ps2.x)[ix2], x)


def test_restart_as_new(rundir):
    """restart_as_new: the checkpoint bodies seed a NEW run — time and
    step reset to zero and output files start fresh (parse.cc:243)."""
    from exp_tpu.nbody.simulation import Simulation
    from exp_tpu.nbody.output import restore_checkpoint

    # ensure a checkpoint exists at step 10
    sim = Simulation.from_file(str(rundir / "config.yml"))
    sim.prime()
    sim.run(10)
    x10 = np.asarray(sim._state["halo"].x)

    txt = (rundir / "config.yml").read_text().replace(
        "runtag: trun",
        "runtag: asnew\n  infile: OUT.trun.chkpt\n  restart_as_new: true")
    (rundir / "config_asnew.yml").write_text(txt)
    sim2 = Simulation.from_file(str(rundir / "config_asnew.yml"))
    assert sim2.is_restart is False          # fresh outputs
    restore_checkpoint(sim2, str(rundir / "OUT.trun.chkpt"), as_new=True)
    assert sim2.istep == 0 and sim2.time == 0.0
    np.testing.assert_allclose(np.asarray(sim2._state["halo"].x), x10,
                               rtol=1e-12)
    sim2.prime()
    sim2.run(2)
    assert sim2.istep == 2
