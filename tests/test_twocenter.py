"""TwoCenter gates (src/TwoCenter.H, EJcom.cc): the blended two-center
expansion beats a single-center expansion on force accuracy for a
host+satellite system, and the dynamic-center wiring runs through the
driver (flat and multistep)."""

import numpy as np
import pytest
import jax.numpy as jnp

from exp_tpu.basis.model import hernquist_model
from exp_tpu.basis.slgrid import build_sph_sl_tables
from exp_tpu.forces.spherical import SphereSL
from exp_tpu.forces.twocenter import TwoCenterForce
from exp_tpu.ic.eddington import sample_spherical_model
from exp_tpu.nbody.particles import write_ascii_bodies


def _host_satellite(seed=7):
    """Host halo at the origin + a satellite clump at (3, 0, 0)."""
    mh = hernquist_model(rmin=1e-4, rmax=20.0, numr=800)
    xh, vh, mass_h = sample_spherical_model(mh, 6000, seed=seed)
    ms = hernquist_model(a=0.3, M=0.3, rmin=1e-4, rmax=6.0, numr=600)
    xs, vs, mass_s = sample_spherical_model(ms, 2000, seed=seed + 1)
    off = np.array([3.0, 0.0, 0.0])
    x = np.concatenate([xh, xs + off])
    v = np.concatenate([vh, vs])
    mass = np.concatenate([mass_h, mass_s])
    com = (mass[:, None] * x).sum(0) / mass.sum()
    return x, v, mass, np.zeros(3), com


def _direct_acc(x, mass, pts, eps=1e-3):
    d = x[None, :, :] - pts[:, None, :]
    r2 = (d * d).sum(-1) + eps * eps
    rinv = 1.0 / np.sqrt(r2)
    return ((mass[None, :] * rinv / r2)[..., None] * d).sum(1)


def test_lopsided_system_force_accuracy():
    """TwoCenter (inner = tracked density center, outer = COM) beats a
    single COM-centered expansion against the direct sum for a lopsided
    system: a compact cusp offset inside an extended envelope — the
    sinking-satellite configuration the reference built TwoCenter for."""
    mc = hernquist_model(a=0.2, M=0.5, rmin=1e-4, rmax=4.0, numr=600)
    xc_, vc, mass_c = sample_spherical_model(mc, 4000, seed=7)
    me = hernquist_model(a=2.0, M=1.0, rmin=1e-3, rmax=40.0, numr=800)
    xe, ve, mass_e = sample_spherical_model(me, 6000, seed=8)
    off = np.array([1.5, 0.0, 0.0])
    x = np.concatenate([xc_ + off, xe])
    mass = np.concatenate([mass_c, mass_e])
    com = (mass[:, None] * x).sum(0) / mass.sum()

    m = hernquist_model(rmin=1e-4, rmax=50.0, numr=1000)
    t = build_sph_sl_tables(m, lmax=4, nmax=10, numr=1000, cmap=1, rmap=1.0)
    xj, mj = jnp.asarray(x), jnp.asarray(mass)

    single = SphereSL.from_tables(t, dtype=jnp.float64)
    cs = single.coefficients(xj - jnp.asarray(com), mj,
                             accum_dtype=jnp.float64)
    tc = TwoCenterForce(
        inner=SphereSL.from_tables(t, dtype=jnp.float64),
        outer=SphereSL.from_tables(t, dtype=jnp.float64),
        c1=jnp.asarray(off), c2=jnp.asarray(com), cfac=1.0, alpha=2.0)
    ct = tc.coefficients(xj, mj, accum_dtype=jnp.float64)

    rng = np.random.default_rng(2)
    regions = {"cusp": off + rng.normal(0, 0.3, (150, 3)),
               "env": rng.normal(0, 2.0, (150, 3))}
    errs = {}
    for name, pts in regions.items():
        a_ref = _direct_acc(x, mass, pts)
        scale = np.linalg.norm(a_ref, axis=1)
        a1, _ = single.acceleration(cs, jnp.asarray(pts) - jnp.asarray(com))
        a2, _ = tc.acceleration(ct, jnp.asarray(pts))
        errs[name] = (
            np.median(np.linalg.norm(np.asarray(a1) - a_ref, axis=1) / scale),
            np.median(np.linalg.norm(np.asarray(a2) - a_ref, axis=1) / scale))
    e1c, e2c = errs["cusp"]
    assert e2c < 0.3 * e1c, f"cusp: twocenter {e2c:.4f} vs single {e1c:.4f}"
    assert e2c < 0.1, f"cusp twocenter error too large: {e2c:.4f}"
    e1e, e2e = errs["env"]
    assert e2e < 1.2 * e1e, f"env: twocenter {e2e:.4f} vs single {e1e:.4f}"


@pytest.mark.parametrize("multistep", [0, 2])
def test_twocenter_in_driver(tmp_path, multistep):
    """Driver run with a twocenter force: EJ center drives the inner
    expansion, COM the outer; runs flat and under multistep."""
    from exp_tpu.nbody.simulation import Simulation

    x, v, mass, _, _ = _host_satellite(seed=17)
    write_ascii_bodies(tmp_path / "sys.bods", (x, v, mass))
    m = hernquist_model(rmin=1e-4, rmax=30.0, numr=800)
    m.to_file(tmp_path / "sys.model")
    (tmp_path / f"c{multistep}.yml").write_text(f"""\
Global:
  dtime: 0.02
  nsteps: 4
  runtag: tc{multistep}
  multistep: {multistep}
Components:
  - name: sys
    bodyfile: sys.bods
    parameters: {{EJ: 2, nEJkeep: 512, EJwindow: 4}}
    force:
      id: twocenter
      parameters:
        basis: sphereSL
        cfac: 1.0
        alpha: 1.0
        parameters: {{numr: 600, Lmax: 2, nmax: 6, rmapping: 1.0,
                      modelname: sys.model}}
Output:
  - id: outlog
    parameters: {{nint: 2}}
""")
    sim = Simulation.from_file(str(tmp_path / f"c{multistep}.yml"),
                               steps_per_block=2)
    sim.prime()
    sim.run()
    assert np.isfinite(np.asarray(sim._state["sys"].x)).all()
    d = sim._diag["sys"]
    ke = float(np.asarray(d["KE"]))
    assert np.isfinite(ke) and ke > 0


def test_twocenter_multistep_equals_flat(tmp_path):
    """multistep(M=2, all pinned level 0) + twocenter + com + rtrunc must
    reproduce flat stepping exactly: the register projection must apply
    the same rtrunc mask and COM-resolved inner center as the single-rate
    path (simulation.py _system_step_body)."""
    from exp_tpu.nbody.simulation import Simulation

    x, v, mass, _, _ = _host_satellite(seed=23)
    write_ascii_bodies(tmp_path / "sys.bods", (x, v, mass))
    m = hernquist_model(rmin=1e-4, rmax=30.0, numr=800)
    m.to_file(tmp_path / "sys.model")

    def cfg(tag, multistep):
        glob = f"  multistep: {multistep}\n"
        if multistep:
            glob += ("  dynfracV: 1.0e30\n  dynfracA: 1.0e30\n"
                     "  dynfracP: 1.0e30\n")
        (tmp_path / f"{tag}.yml").write_text(f"""\
Global:
  dtime: 0.02
  nsteps: 4
  runtag: {tag}
  compute_dtype: float64
{glob}Components:
  - name: sys
    bodyfile: sys.bods
    parameters: {{com: true, rtrunc: 8.0}}
    force:
      id: twocenter
      parameters:
        basis: sphereSL
        cfac: 1.0
        alpha: 1.0
        parameters: {{numr: 600, Lmax: 2, nmax: 6, rmapping: 1.0,
                      modelname: sys.model}}
Output:
  - id: outlog
    parameters: {{nint: 4}}
""")
        return str(tmp_path / f"{tag}.yml")

    sim_f = Simulation.from_file(cfg("tcf", 0), steps_per_block=1)
    sim_f.prime()
    sim_f.run()
    sim_m = Simulation.from_file(cfg("tcm", 2))
    sim_m.run()
    counts = sim_m._ms_runner.level_counts(sim_m._ms_state)["sys"]
    assert counts[0] == 8000, f"particles not pinned at level 0: {counts}"

    def final(sim):
        ps = sim._state["sys"]
        live = np.asarray(ps.mass) > 0
        xx = np.asarray(ps.x)[live]
        vv = np.asarray(ps.v)[live]
        order = np.lexsort(xx.T)
        return xx[order], vv[order]

    xf, vf = final(sim_f)
    xm, vm = final(sim_m)
    np.testing.assert_allclose(xm, xf, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(vm, vf, rtol=1e-6, atol=1e-9)
