"""Self-consistent disk+halo IC tests (ic/diskhalo.py — the DiskHalo path).

Physics gates mirroring utils/ICs/DiskHalo.cc's own diagnostics
(virial_ratio DiskHalo.cc:2734-2896, the test_vel velocity-structure dump
:1902-1920) plus the round-2 acceptance criterion: multistep level
populations must be stationary when the composite is integrated.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from exp_tpu.basis.model import hernquist_model, add_disk_to_model
from exp_tpu.basis.slgrid import build_sph_sl_tables
from exp_tpu.basis.empcyl import build_empcyl_tables
from exp_tpu.forces.spherical import SphereSL
from exp_tpu.forces.cylinder import CylinderForce
from exp_tpu.ic.diskhalo import (diskhalo_ics, virial_ratio,
                                 sample_multimass_halo)

ACYL, HCYL, MDISK = 0.01, 0.002, 0.05


@pytest.fixture(scope="module")
def bases():
    m = hernquist_model(rmin=1e-3, rmax=20.0)
    ts = build_sph_sl_tables(m, lmax=2, nmax=6, numr=800, cmap=1, rmap=1.0)
    halo = SphereSL.from_tables(ts, dtype=jnp.float32)
    tc = build_empcyl_tables(mmax=2, nmax=6, lmaxfid=16, nmaxfid=12,
                             acyl=ACYL, hcyl=HCYL)
    disk = CylinderForce.from_tables(tc, dtype=jnp.float32)
    return m, halo, disk


@pytest.fixture(scope="module")
def ics(bases):
    m, halo, disk = bases
    return diskhalo_ics(m, n_halo=8192, n_disk=4096, Mdisk=MDISK,
                        acyl=ACYL, hcyl=HCYL, halo_force=halo,
                        disk_force=disk, seed=5)


def test_virial_equilibrium(bases, ics):
    """Composite system starts within 5% of virial equilibrium as
    measured by the same truncated fields the run integrates."""
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
    vrd = virial_ratio([(ics.x_disk, ics.v_disk, ics.m_disk)],
                       [(halo, ch), (disk, cd)])
    assert abs(vrd - 1.0) < 0.10, vrd


def test_disk_velocity_structure(ics):
    """Cold rotating disk: mean streaming tracks the measured circular
    speed, dispersions subdominant, no Jeans-closure overrides."""
    # vp2 < 0 closures happen only at R << a where the sampled
    # expansion is noisy; the reference counts & tolerates them
    # (num_oob, DiskHalo.cc:2011-2015) — gate at <1%
    assert ics.diag["n_oob"] < 0.01 * len(ics.x_disk)
    x, v = ics.x_disk, ics.v_disk
    R = np.hypot(x[:, 0], x[:, 1])
    vphi = (-v[:, 0] * x[:, 1] + v[:, 1] * x[:, 0]) / np.maximum(R, 1e-12)
    sel = (R > 0.5 * ACYL) & (R < 3 * ACYL)
    tab = ics.tables
    vc_tab = tab.interp2(tab.vc, np.arctan2(x[sel, 1], x[sel, 0]),
                         np.log(R[sel]))
    # streaming within 15% of v_c (asymmetric drift is a small correction)
    assert abs(vphi[sel].mean() / vc_tab.mean() - 1.0) < 0.15
    # dispersions subdominant and the vertical one matches the sech^2
    # slab's self-gravity scale sigma_z^2 ~ pi G Sigma h / 2 within 2x
    sigz = v[sel, 2].std()
    Sig = MDISK / (2 * np.pi * ACYL**2) * np.exp(-R[sel] / ACYL)
    expect = np.sqrt(np.pi * Sig.mean() * HCYL / 2)
    assert 0.5 < sigz / expect < 2.0
    assert vphi[sel].std() < 0.7 * vphi[sel].mean()


def test_kappa_physical_range(ics):
    """kappa in [Omega, 2 Omega] everywhere (flat-to-Keplerian range)."""
    ratio = ics.tables.kappa2 / ics.tables.omega2
    assert (ratio >= 1.0 - 1e-9).all() and (ratio <= 4.0 + 1e-9).all()


def test_halo_df_responds_to_disk(bases):
    """The composite model's DF (halo rho in the TOTAL potential) must
    differ from the pure-halo DF: with the disk's mass deepening the
    well, equilibrium velocities at small radii are faster."""
    from exp_tpu.ic.eddington import sample_spherical_model
    m, _, _ = bases
    comp = add_disk_to_model(m, MDISK, ACYL)
    xh, vh, _ = sample_spherical_model(comp, 4096, seed=9,
                                       tracer_only=True, zero_com=False)
    xp, vp, _ = sample_spherical_model(m, 4096, seed=9, zero_com=False)
    r = np.linalg.norm(xh, axis=1)
    rp = np.linalg.norm(xp, axis=1)
    v2 = (vh**2).sum(1)
    v2p = (vp**2).sum(1)
    inner = np.median(v2[r < 0.05])
    inner_p = np.median(v2p[rp < 0.05])
    assert inner > 1.5 * inner_p    # disk-dominated core is much hotter


def test_multimass_halo(bases):
    """Importance-weighted multimass realization reproduces the REAL
    mass profile from FAKE number-density positions."""
    m, _, _ = bases
    # shallower number-density profile: Hernquist with a larger core
    fake = hernquist_model(a=3.0, rmin=1e-3, rmax=20.0)
    x, v, mass = sample_multimass_halo(m, fake, 20000, seed=2)
    assert np.isclose(mass.sum(), m.total_mass, rtol=1e-6)
    r = np.linalg.norm(x, axis=1)
    # cumulative mass profile matches the real model at probe radii
    for rq in (0.5, 1.0, 3.0):
        got = mass[r < rq].sum()
        want = float(m.get_mass(rq))
        assert abs(got / want - 1.0) < 0.15, (rq, got, want)
    # number counts follow the FAKE profile (more particles at large r
    # than an equal-number real-model sample would give)
    frac_outer = (r > 2.0).mean()
    assert frac_outer > 0.3


def test_composite_level_stability(bases, ics):
    """VERDICT r2 gate: per-level populations stationary over bigsteps
    (the old ad-hoc ICs collapsed level 1 by ~6000x in 5 bigsteps) and
    the capacity signature stable after the first relevel."""
    from jax.sharding import Mesh
    from exp_tpu.nbody.particles import ParticleSystem
    from exp_tpu.nbody.multistep import MultistepRunner

    m, halo, disk = bases
    mesh = Mesh(np.array(jax.devices()[:1]), ("p",))
    forces = {"halo": halo, "disk": disk}
    couples = {"halo": ["halo", "disk"], "disk": ["halo", "disk"]}
    runner = MultistepRunner(forces, couples, 2e-3, 2, mesh,
                             dynparams={"dynfracV": 0.01,
                                        "dynfracA": 0.03},
                             cap_headroom=2)
    flat = {"halo": ParticleSystem.from_arrays(
                ics.x_halo, ics.v_halo, np.maximum(ics.m_halo, 0),
                dtype=jnp.float32),
            "disk": ParticleSystem.from_arrays(
                ics.x_disk, ics.v_disk, ics.m_disk, dtype=jnp.float32)}
    st, regs, _, _ = runner.init_state(flat)
    first = runner.level_counts(st)
    sig = runner._caps_sig(st)
    for _ in range(4):
        st, regs, _, _ = runner.bigstep(st, regs)
        st, regs = runner.relevel(st, regs)
    assert runner._caps_sig(st) == sig        # no bucket growth
    # indx must stay i32 through the device rebucket (a weak-f32
    # promotion re-traced every substep graph each big step and
    # corrupts identities above 2^24)
    assert st["halo"][0].indx.dtype == jnp.int32
    last = runner.level_counts(st)
    for comp in ("halo", "disk"):
        a = np.array(first[comp], float)
        b = np.array(last[comp], float)
        n = a.sum()
        # no level's population moves by more than 2% of the component
        assert np.abs(b - a).max() < 0.02 * n, (comp, first, last)


def test_toomre_q_dispersion_bounded(bases):
    """Q > 0 path: the monopole dPhi/dR floor keeps the Toomre
    dispersion 3.36 Sigma Q / kappa finite where the sampled expansion
    is noisy (without it a near-zero measured kappa blew sigma_R up by
    ~1e10 and the CLI's virial diagnostic with it)."""
    from exp_tpu.basis.model import add_disk_to_model
    from exp_tpu.ic.diskhalo import build_disk_tables
    from exp_tpu.ic.disk import sample_exponential_disk
    from exp_tpu.ic.eddington import sample_spherical_model

    m, halo, disk = bases
    comp = add_disk_to_model(m, MDISK, ACYL)
    xh, vh, mh = sample_spherical_model(comp, 4096, seed=8,
                                        tracer_only=True, zero_com=False)
    xd, md = sample_exponential_disk(2048, acyl=ACYL, hcyl=HCYL,
                                     mass=MDISK, seed=9)
    ch = halo.coefficients(jnp.asarray(xh, jnp.float32),
                           jnp.asarray(mh, jnp.float32))
    cd = disk.coefficients(jnp.asarray(xd, jnp.float32),
                           jnp.asarray(md, jnp.float32))
    tab = build_disk_tables(halo, ch, disk, cd, Mdisk=MDISK, acyl=ACYL,
                            hcyl=HCYL, Q=1.2, ndp=4, ndr=24, ndz=32,
                            dphidr_floor=comp.get_dpot)
    vc2 = np.maximum(tab.vc, 1e-30) ** 2
    # dispersion stays within an order of magnitude of circular speed
    # everywhere on the grid (the un-floored build reached ~1e20 x)
    assert float((tab.sigR2 / vc2).max()) < 50.0
    assert np.isfinite(tab.sigR2).all()
