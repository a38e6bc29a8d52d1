"""Multistep integrator gates.

The CHK_STEP-style verification of the reference (step.cc:108-267): each
level must accumulate exactly dtime of drift/kick per big step; the tableau
must reduce to plain stepping in the degenerate cases."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from dataclasses import replace
from jax.sharding import Mesh

from exp_tpu.basis.model import hernquist_model
from exp_tpu.basis.slgrid import build_sph_sl_tables
from exp_tpu.forces.spherical import SphereSL
from exp_tpu.ic.eddington import sample_spherical_model
from exp_tpu.nbody.particles import ParticleSystem
from exp_tpu.nbody.step import make_kdk_step, init_force_state, energies
from exp_tpu.nbody.multistep import (MultistepRunner, bucketize,
                                     flatten_buckets, LevelBuckets,
                                     mfirst_of, assign_levels)


@pytest.fixture(scope="module")
def setup():
    m = hernquist_model(rmin=1e-4, rmax=20.0)
    t = build_sph_sl_tables(m, lmax=2, nmax=8, numr=800, cmap=1, rmap=1.0)
    force = SphereSL.from_tables(t, dtype=jnp.float64)
    x, v, mass = sample_spherical_model(m, 4000, seed=5)
    mesh = Mesh(np.array(jax.devices()), ("p",))
    return force, x, v, mass, mesh


def test_mfirst_table():
    # M=2: substeps 0..3 -> mfirst 0,2,1,2 (multistep.cc:635-660)
    assert [mfirst_of(ms, 2) for ms in range(4)] == [0, 2, 1, 2]
    assert [mfirst_of(ms, 3) for ms in range(8)] == [0, 3, 2, 3, 1, 3, 2, 3]


def test_assign_levels():
    dtreq = jnp.asarray([1.0, 0.5, 0.09, 0.024, 1e-6])
    lev = assign_levels(dtreq, jnp.zeros(5, jnp.int32), dtime=0.1, M=3)
    # dtime/dtreq = 0.1, 0.2, 1.11, 4.16, 1e5 -> floor(log2) = 0,0,0,2,clamp 3
    assert list(np.asarray(lev)) == [0, 0, 0, 2, 3]


def _flat_run(force, x, v, mass, mesh, dt, nsteps):
    ps = ParticleSystem.from_arrays(x, v, mass, dtype=jnp.float64,
                                    pad_to=mesh.devices.size).shard(mesh)
    ps, coef, d = init_force_state(force, ps, mesh=mesh,
                                   accum_dtype=jnp.float64)
    step = make_kdk_step(force, dt, mesh=mesh, accum_dtype=jnp.float64)
    for _ in range(nsteps):
        ps, coef, d = step(ps)
    return ps, d


def _ms_run(force, x, v, mass, mesh, dtime, M, nbig, levels=None,
            freeze=False):
    runner = MultistepRunner({"c": force}, {"c": ["c"]}, dtime, M, mesh,
                             accum_dtype=jnp.float64)
    ps = ParticleSystem.from_arrays(x, v, mass, dtype=jnp.float64)
    if levels is not None:
        ps = replace(ps, level=jnp.full(ps.n, levels, jnp.int32))
        # bypass adaptive init: bucket directly
        st = {"c": tuple(bucketize(ps, M, runner.quantum,
                                   mesh=mesh).buckets)}
        runner.caps = {"c": tuple(b.x.shape[0] for b in st["c"])}
        st, regs, coef, diag = runner._init(st)
    else:
        st, regs, coef, diag = runner.init_state({"c": ps})
    for _ in range(nbig):
        st, regs, coef, diag = runner.bigstep(st, regs)
        if not freeze and levels is None:
            st, regs = runner.relevel(st, regs)
    return runner, st, diag["c"]


def test_all_finest_equals_flat(setup):
    """All particles at level M == flat stepping at dtime/2^M."""
    force, x, v, mass, mesh = setup
    M, dtime, nbig = 2, 0.08, 3
    _, st, diag = _ms_run(force, x, v, mass, mesh, dtime, M, nbig, levels=M)
    ps_flat, d_flat = _flat_run(force, x, v, mass, mesh,
                                dtime / 2**M, nbig * 2**M)

    e_ms = energies(diag)
    e_fl = energies(d_flat)
    assert e_ms["Etot"] == pytest.approx(e_fl["Etot"], rel=1e-10)
    # positions identical up to reduction-order noise
    fl = flatten_buckets(LevelBuckets(list(st["c"]), None))
    live = np.asarray(fl.mass) > 0
    xs = np.asarray(fl.x)[live]
    xs_ref = np.asarray(ps_flat.x)[np.asarray(ps_flat.mass) > 0]
    # same particles, but bucket packing may reorder -> compare via sort
    a = xs[np.lexsort(xs.T)]
    b = xs_ref[np.lexsort(xs_ref.T)]
    np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-10)


def test_all_coarsest_equals_flat(setup):
    """All particles at level 0 == flat stepping at dtime."""
    force, x, v, mass, mesh = setup
    M, dtime, nbig = 2, 0.02, 5
    _, st, diag = _ms_run(force, x, v, mass, mesh, dtime, M, nbig, levels=0)
    ps_flat, d_flat = _flat_run(force, x, v, mass, mesh, dtime, nbig)
    assert energies(diag)["Etot"] == pytest.approx(
        energies(d_flat)["Etot"], rel=1e-10)


def test_adaptive_energy_conservation(setup):
    """Adaptive levels: energy conserved, levels actually spread."""
    force, x, v, mass, mesh = setup
    M, dtime, nbig = 3, 0.08, 8
    runner, st, diag = _ms_run(force, x, v, mass, mesh, dtime, M, nbig)
    counts = runner.level_counts(st)["c"]
    assert sum(counts) == 4000
    assert sum(1 for c in counts if c > 0) >= 2, f"levels unused: {counts}"

    e = energies(diag)
    # conservative gate: |dE/E| after 8 big steps
    ps0 = ParticleSystem.from_arrays(x, v, mass, dtype=jnp.float64,
                                     pad_to=mesh.devices.size).shard(mesh)
    _, _, d0 = init_force_state(force, ps0, mesh=mesh,
                                accum_dtype=jnp.float64)
    e0 = energies(d0)
    assert abs(e["Etot"] - e0["Etot"]) / abs(e0["Etot"]) < 5e-3


def test_fused_bigstep_equivalence(setup):
    """MultistepRunner(fused=True) chains the 2^M substeps into one jit;
    the result must match the per-substep dispatch path exactly (same
    bodies, same order)."""
    force, x, v, mass, mesh = setup
    M, dtime = 2, 0.01

    def run(fused):
        runner = MultistepRunner({"c": force}, {"c": ["c"]}, dtime, M,
                                 mesh, accum_dtype=jnp.float64,
                                 fused=fused)
        ps = ParticleSystem.from_arrays(x, v, mass, dtype=jnp.float64)
        st, regs, coef, diag = runner.init_state({"c": ps})
        for _ in range(2):
            st, regs, coef, diag = runner.bigstep(st, regs)
            st, regs = runner.relevel(st, regs)
        return st, coef

    st_a, coef_a = run(False)
    st_b, coef_b = run(True)
    # ulp-level tolerance: the fused graph compiles the same math with
    # different FMA/reassociation choices (measured maxdiff ~5e-17 on a
    # handful of kick updates), not a semantic difference
    for l in range(M + 1):
        np.testing.assert_allclose(np.asarray(st_a["c"][l].x),
                                   np.asarray(st_b["c"][l].x),
                                   rtol=0, atol=1e-13)
        np.testing.assert_allclose(np.asarray(st_a["c"][l].v),
                                   np.asarray(st_b["c"][l].v),
                                   rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(coef_a["c"]),
                               np.asarray(coef_b["c"]),
                               rtol=1e-12, atol=1e-15)


def test_rebucket_styles_bit_exact(setup):
    """The sortgather permutation engine (key+iota sort, one packed row
    gather) is bit-exact against the full-payload sort across bigstep +
    relevel cycles, including the i64 indx under x64."""
    force, x, v, mass, mesh = setup
    outs = {}
    for style in ("sortfull", "sortgather"):
        r = MultistepRunner({"h": force}, {"h": ["h"]}, 2e-3, 2, mesh,
                            dynparams={"dynfracV": 0.01,
                                       "dynfracA": 0.03},
                            cap_headroom=2, fused=True,
                            rebucket_style=style)
        flat = {"h": ParticleSystem.from_arrays(x, v, mass,
                                                dtype=jnp.float64)}
        st, regs, coef, diag = r.init_state(flat)
        for _ in range(2):
            st, regs, coef, diag = r.bigstep(st, regs)
            st, regs = r.relevel(st, regs)
        outs[style] = jax.device_get(st)
    a, b = outs["sortfull"], outs["sortgather"]
    for l in range(3):
        for f in ("x", "v", "acc", "mass", "pot", "indx", "level"):
            va = np.asarray(getattr(a["h"][l], f))
            vb = np.asarray(getattr(b["h"][l], f))
            assert va.shape == vb.shape and (va == vb).all(), (l, f)


def test_incremental_relevel_equivalence(setup):
    """The movers-only incremental relevel (in-place kills + tail
    appends + full-sort compaction fallback) carries EXACTLY the same
    live particle set and per-particle data as the full sort, bucket by
    bucket (order differs; holes are zero-mass)."""
    force, x, v, mass, mesh = setup

    def run(style, nbig=4):
        r = MultistepRunner({"h": force}, {"h": ["h"]}, 2e-3, 2, mesh,
                            dynparams={"dynfracV": 0.01,
                                       "dynfracA": 0.03},
                            cap_headroom=2, fused=True,
                            rebucket_style=style)
        flat = {"h": ParticleSystem.from_arrays(x, v, mass,
                                                dtype=jnp.float64)}
        st, regs, coef, diag = r.init_state(flat)
        for _ in range(nbig):
            st, regs, coef, diag = r.bigstep(st, regs)
            st, regs = r.relevel(st, regs)
        return r, jax.device_get(st)

    r_inc, a = run("incremental")
    r_ref, b = run("sortfull")
    for l in range(3):
        for sa, sb in ((a, b),):
            pa, pb = sa["h"][l], sb["h"][l]
            la = np.asarray(pa.mass) > 0
            lb = np.asarray(pb.mass) > 0
            assert la.sum() == lb.sum(), l
            ia = np.argsort(np.asarray(pa.indx)[la])
            ib = np.argsort(np.asarray(pb.indx)[lb])
            for f in ("x", "v", "acc", "mass", "pot", "indx"):
                va = np.asarray(getattr(pa, f))[la][ia]
                vb = np.asarray(getattr(pb, f))[lb][ib]
                # same particles; trajectories bit-identical because the
                # substep sums are order-independent per particle except
                # the coefficient reduction, which accumulates in f64
                np.testing.assert_allclose(va, vb, rtol=1e-12, atol=0,
                                           err_msg=f"level {l} {f}")


def test_incremental_relevel_fallback(setup):
    """Arrival-buffer bursts trigger the full-sort compaction and reset
    the fill pointers; the run continues correctly."""
    force, x, v, mass, mesh = setup
    r = MultistepRunner({"h": force}, {"h": ["h"]}, 2e-3, 2, mesh,
                        dynparams={"dynfracV": 0.01, "dynfracA": 0.03},
                        cap_headroom=2, fused=True,
                        rebucket_style="incremental")
    # tiny buffers: every relevel with movement overflows and compacts
    r._arrival_caps = lambda caps: {n: tuple(1 for _ in cs)
                                    for n, cs in caps.items()}
    flat = {"h": ParticleSystem.from_arrays(x, v, mass,
                                            dtype=jnp.float64)}
    st, regs, coef, diag = r.init_state(flat)
    n_live0 = sum(int((np.asarray(b.mass) > 0).sum()) for b in st["h"])
    for _ in range(3):
        st, regs, coef, diag = r.bigstep(st, regs)
        st, regs = r.relevel(st, regs)
    n_live = sum(int((np.asarray(b.mass) > 0).sum()) for b in st["h"])
    assert n_live == n_live0              # nobody lost in the fallback
    sig = r._caps_sig(st)
    counts = r.level_counts(st)
    assert r._fill[sig]["h"] == counts["h"]   # compaction reset fill


def test_dts_scale_criterion(tmp_path):
    """The dts timestep criterion (multistep.cc:110-118): dts =
    dynfracS*scale/|v| for particles with scale > 0; scale <= 0 (the
    reference's default of -1, Particle.H:60-61) leaves the particle on
    the minimum of the other criteria."""
    from exp_tpu.nbody.multistep import dtreq_fn
    from exp_tpu.nbody.particles import read_bodies

    n = 4
    ps = ParticleSystem.from_arrays(
        np.zeros((n, 3)), np.tile([2.0, 0.0, 0.0], (n, 1)), np.ones(n),
        dtype=jnp.float64, scale=[-1.0, 0.0, 0.1, 40.0])
    ps = replace(
        ps,
        acc=jnp.tile(jnp.asarray([0.1, 0.0, 0.0], jnp.float64), (n, 1)),
        pot=jnp.full(n, -1.0, jnp.float64))
    # vtot=4, atot=0.01, |v.a|=0.2, |pot|=1:
    #   dtv=0.01*20=0.2, dta=0.03*1/0.2=0.15, dtA=0.05*10=0.5 -> base 0.15
    dt = np.asarray(dtreq_fn(ps))
    np.testing.assert_allclose(dt[0], 0.15, rtol=1e-6)   # scale=-1 inactive
    np.testing.assert_allclose(dt[1], 0.15, rtol=1e-6)   # scale=0 inactive
    np.testing.assert_allclose(dt[2], 0.05, rtol=1e-6)   # 1.0*0.1/2
    np.testing.assert_allclose(dt[3], 0.15, rtol=1e-6)   # dts=20 not binding

    # dynfracS rescales the criterion
    dt2 = np.asarray(dtreq_fn(ps, dynfracS=0.5))
    np.testing.assert_allclose(dt2[2], 0.025, rtol=1e-6)

    # ascii ingest: scale from a dattr column (Component ascii bodyfile
    # layout: mass x y z u v w [iattr...] [dattr...])
    f = tmp_path / "bodies.txt"
    rows = []
    for i in range(3):
        rows.append(f"1.0 {i}.0 0.0 0.0 0.5 0.0 0.0 7 {0.25 * (i + 1)} 9.0")
    f.write_text("3 1 2\n" + "\n".join(rows) + "\n")
    ps2 = read_bodies(str(f), dtype=jnp.float64, scale_dattr=0)
    np.testing.assert_allclose(np.asarray(ps2.scale), [0.25, 0.5, 0.75])
    ps3 = read_bodies(str(f), dtype=jnp.float64)     # default: inactive
    np.testing.assert_allclose(np.asarray(ps3.scale), [-1.0, -1.0, -1.0])
