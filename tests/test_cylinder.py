"""EOF cylinder basis + force gates.

The strongest check is BFE acceleration vs direct O(N^2) summation over the
same particle set — it validates the whole chain (fiducial SL basis, EOF
conditioning, tabulation, bilinear force assembly) against ground truth.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from exp_tpu.basis.empcyl import (build_empcyl_tables, EmpCylTables,
                                  exp_disk_density)
from exp_tpu.forces.cylinder import CylinderForce


ACYL, HCYL = 0.01, 0.002


@pytest.fixture(scope="module")
def tables():
    return build_empcyl_tables(mmax=4, nmax=10, ncylodd=3, lmaxfid=24,
                               nmaxfid=16, acyl=ACYL, hcyl=HCYL,
                               rcylmax=20.0, numx=256, numy=128,
                               rnum=150, tnum=60)


def sample_disk(n, seed=0):
    rng = np.random.default_rng(seed)
    # R ~ Gamma(2, a) (surface density R exp(-R/a)), z ~ sech^2, phi uniform
    R = -ACYL * (np.log(rng.uniform(size=n)) + np.log(rng.uniform(size=n)))
    z = HCYL * np.arctanh(rng.uniform(-1, 1, n) * 0.999999)
    phi = rng.uniform(0, 2 * np.pi, n)
    x = np.stack([R * np.cos(phi), R * np.sin(phi), z], axis=-1)
    m = np.full(n, 1.0 / n)
    return x, m


def test_biorthogonality(tables):
    t = tables
    Rg = np.asarray(t.R_of_x(np.linspace(t.xmin, t.xmax, t.numx)))
    zg = t.z_of_y(np.linspace(t.ymin, t.ymax, t.numy))
    W2 = np.outer(np.gradient(Rg) * Rg, np.gradient(zg))
    for m in range(t.mmax + 1):
        fac = 2 * np.pi if m == 0 else np.pi
        B = fac * np.einsum("xyn,xym,xy->nm", t.pot[:, :, m, :],
                            t.dens[:, :, m, :], W2)
        assert np.abs(B + np.eye(t.nmax)).max() < 0.02, f"m={m}"


def test_cache_roundtrip(tables, tmp_path):
    p = tmp_path / "eof.cache.h5"
    tables.write_cache(str(p))
    t2 = EmpCylTables.read_cache(str(p))
    np.testing.assert_array_equal(t2.pot, tables.pot)
    assert t2.key == tables.key


def test_force_vs_direct_sum(tables):
    t = tables
    force = CylinderForce.from_tables(t, dtype=jnp.float64)
    x, m = sample_disk(30000, seed=1)
    coef = force.coefficients(jnp.asarray(x), jnp.asarray(m),
                              accum_dtype=jnp.float64)

    # test points: in-plane and off-plane, not too close to particles
    pts = np.array([
        [1.5 * ACYL, 0.5 * ACYL, 0.0],
        [-3.0 * ACYL, 1.0 * ACYL, 0.5 * HCYL],
        [0.8 * ACYL, -0.2 * ACYL, 2.0 * HCYL],
        [6.0 * ACYL, 0.0, -1.0 * HCYL],
    ])
    acc, pot = force.acceleration(coef, jnp.asarray(pts))

    # direct sum (f64, small softening)
    eps2 = (0.02 * ACYL) ** 2
    d = pts[:, None, :] - x[None, :, :]
    r2 = (d ** 2).sum(-1) + eps2
    rinv = 1.0 / np.sqrt(r2)
    pot_d = -(m[None, :] * rinv).sum(1)
    acc_d = -(m[None, :, None] * d * (rinv ** 3)[:, :, None]).sum(1)

    # residual error budget: mmax azimuthal truncation + 30k-particle
    # discreteness in the direct sum (both physical, not implementation)
    scale = np.abs(acc_d).max(axis=1)
    err = np.abs(np.asarray(acc) - acc_d).max(axis=1) / scale
    assert err.max() < 0.08, f"force errors {err}"
    perr = np.abs(np.asarray(pot) - pot_d) / np.abs(pot_d)
    assert perr.max() < 0.03, f"potential errors {perr}"


def test_rotation_curve_positive(tables):
    t = tables
    force = CylinderForce.from_tables(t, dtype=jnp.float64)
    x, m = sample_disk(20000, seed=2)
    coef = force.coefficients(jnp.asarray(x), jnp.asarray(m),
                              accum_dtype=jnp.float64)
    Rt = np.linspace(0.5, 8.0, 12) * ACYL
    pts = np.stack([Rt, np.zeros_like(Rt), np.zeros_like(Rt)], -1)
    acc, _ = force.acceleration(coef, jnp.asarray(pts))
    # inward radial force everywhere -> positive vc^2
    vc2 = -np.asarray(acc)[:, 0] * Rt
    assert np.all(vc2 > 0)


def test_outside_grid_monopole(tables):
    t = tables
    force = CylinderForce.from_tables(t, dtype=jnp.float64)
    x, m = sample_disk(20000, seed=3)
    coef = force.coefficients(jnp.asarray(x), jnp.asarray(m),
                              accum_dtype=jnp.float64)
    r_out = 1.5 * t.rcylmax * ACYL
    pts = jnp.asarray([[r_out, 0.0, 0.0]])
    acc, pot = force.acceleration(coef, pts)
    M = m.sum()
    assert float(pot[0]) == pytest.approx(-M / r_out, rel=0.05)
    assert float(acc[0, 0]) == pytest.approx(-M / r_out ** 2, rel=0.05)


def test_disk_halo_composite_run(tables, tmp_path):
    """Two-component disk+halo run through the driver (benchmark config #3
    shape): both forces active, cross-coupled, energy conserved."""
    import jax.numpy as jnp
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.ic.eddington import sample_spherical_model
    from exp_tpu.ic.disk import sample_exponential_disk, disk_velocities
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation

    # halo: Hernquist scaled to dominate (a=4 acyl, M=5)
    ah = 4 * ACYL
    halo = hernquist_model(a=ah, M=5.0, rmin=1e-4 * ah, rmax=50 * ah)
    halo.to_file(tmp_path / "halo.model")
    xh, vh, mh = sample_spherical_model(halo, 4000, seed=5)

    # disk in the combined potential: vc^2 = R dPhi/dR (halo) + disk self
    xd, md = sample_exponential_disk(4000, acyl=ACYL, hcyl=HCYL,
                                     mass=0.2, seed=6)
    force = CylinderForce.from_tables(tables, dtype=jnp.float64)
    coef = force.coefficients(jnp.asarray(xd), jnp.asarray(md),
                              accum_dtype=jnp.float64)

    def vc_of_R(R):
        pts = np.stack([R, np.zeros_like(R), np.zeros_like(R)], -1)
        accd, _ = force.acceleration(coef, jnp.asarray(pts))
        g_disk = -np.asarray(accd)[:, 0]
        g_halo = halo.get_dpot(R)
        return np.sqrt(np.maximum(R * (g_disk + g_halo), 0.0))

    vd = disk_velocities(xd, vc_of_R, acyl=ACYL, seed=6)

    write_ascii_bodies(tmp_path / "halo.bods", (xh, vh, mh))
    write_ascii_bodies(tmp_path / "disk.bods", (xd, vd, md))
    (tmp_path / "dh.yml").write_text(f"""\
Global:
  dtime: 0.0005
  nsteps: 10
  runtag: dh0
Components:
  - name: halo
    bodyfile: halo.bods
    force:
      id: sphereSL
      parameters: {{numr: 600, Lmax: 2, nmax: 6, rmapping: {ah},
                   modelname: halo.model}}
  - name: disk
    bodyfile: disk.bods
    force:
      id: cylinder
      parameters: {{mmax: 4, nmax: 10, ncylodd: 3, lmaxfid: 24, nmaxfid: 16,
                   acyl: {ACYL}, hcyl: {HCYL}, rcylmax: 20.0,
                   ncylnx: 128, ncylny: 64, rnum: 150, tnum: 60}}
Output:
  - id: outlog
    parameters: {{nint: 1}}
""")
    sim = Simulation.from_file(str(tmp_path / "dh.yml"))
    sim.prime()
    sim.run()
    log = (tmp_path / "OUTLOG.dh0").read_text().splitlines()
    rows = [r for r in log if not r.startswith("#") and "Time" not in r]
    E = [float(r.split("|")[15]) for r in rows]
    assert np.isfinite(E).all()
    assert abs(E[-1] - E[0]) / abs(E[0]) < 2e-2


def test_eof_from_particles(tmp_path):
    """EOF basis conditioned on a particle snapshot (accumulate_eof path):
    biorthogonal and force-accurate against the direct sum."""
    import jax.numpy as jnp
    from exp_tpu.basis.empcyl import (build_empcyl_tables,
                                      disk_density_from_particles)
    from exp_tpu.forces.cylinder import CylinderForce
    from exp_tpu.ic.disk import sample_exponential_disk
    from exp_tpu.analysis.crossval import cross_validate

    x, m = sample_exponential_disk(20000, acyl=1.0, hcyl=0.1, mass=1.0,
                                   seed=6)
    rho = disk_density_from_particles(x, m)
    # density estimate roughly matches the analytic profile at (a, 0)
    from exp_tpu.basis.empcyl import exp_disk_density
    ana = exp_disk_density(1.0, 0.1)
    assert 0.3 < float(np.squeeze(rho(1.0, 0.0))) \
        / float(np.squeeze(ana(1.0, 0.0))) < 3.0
    kw = dict(mmax=1, nmax=4, lmaxfid=10, nmaxfid=10,
              acyl=1.0, hcyl=0.1, rcylmin=1e-3, rcylmax=20.0,
              numx=64, numy=32, rnum=60, tnum=20)
    t_p = build_empcyl_tables(disk_density=rho,
                              density_key="test-particles", **kw)
    t_a = build_empcyl_tables(**kw)
    err = {}
    for tag, t in (("particles", t_p), ("analytic", t_a)):
        f = CylinderForce.from_tables(t, dtype=jnp.float64)
        err[tag] = cross_validate(f, x, m, ntest=128)["ferr_all_med"]
    assert np.isfinite(err["particles"])
    # conditioning on the snapshot should be about as good as conditioning
    # on the true analytic density (same truncation error budget)
    assert err["particles"] < 1.5 * err["analytic"]


def test_conditioning_particles_driver(tmp_path):
    """Driver: cylinder with `conditioning: particles` builds and runs."""
    from exp_tpu.ic.disk import sample_exponential_disk
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation

    x, m = sample_exponential_disk(4000, acyl=1.0, hcyl=0.1, mass=0.05,
                                   seed=8)
    write_ascii_bodies(tmp_path / "d.bods", (x, np.zeros_like(x), m))
    (tmp_path / "c.yml").write_text("""\
Global:
  dtime: 0.005
  nsteps: 2
  runtag: eofp0
Components:
  - name: disk
    bodyfile: d.bods
    force:
      id: cylinder
      parameters: {mmax: 1, nmax: 4, ncylodd: 1, lmaxfid: 10, nmaxfid: 10,
                   acyl: 1.0, hcyl: 0.1, rcylmax: 20.0, ncylnx: 64,
                   ncylny: 32, rnum: 60, tnum: 20,
                   conditioning: particles, cachename: eofp.h5}
Output:
  - id: outlog
    parameters: {nint: 1}
""")
    sim = Simulation.from_file(str(tmp_path / "c.yml"))
    sim.prime()
    sim.run()
    d = sim._diag["disk"]
    assert np.isfinite(float(np.asarray(d["KE"])))
    assert (tmp_path / "eofp.h5").exists()


def test_cylinder_sharded_psum_equivalence(tmp_path):
    """Cylinder coefficients from an 8-device shard_map == single device."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P
    import jax.numpy as jnp
    from exp_tpu.basis.empcyl import build_empcyl_tables
    from exp_tpu.forces.cylinder import CylinderForce
    from exp_tpu.ic.disk import sample_exponential_disk
    from exp_tpu.nbody.step import shard_map

    t = build_empcyl_tables(mmax=1, nmax=4, lmaxfid=8, nmaxfid=8,
                            acyl=1.0, hcyl=0.1, rcylmin=1e-3, rcylmax=20.0,
                            numx=64, numy=32, rnum=60, tnum=20,
                            cachename=str(tmp_path / "eof.h5"))
    f = CylinderForce.from_tables(t, dtype=jnp.float64)
    x, m = sample_exponential_disk(4096, acyl=1.0, hcyl=0.1, mass=1.0,
                                   seed=9)
    x = jnp.asarray(x)
    m = jnp.asarray(m)
    ref = f.coefficients(x, m, accum_dtype=jnp.float64)
    mesh = Mesh(np.array(jax.devices()), ("p",))
    fn = jax.jit(shard_map(
        lambda xs, ms: f.coefficients(xs, ms, axis_name="p",
                                      accum_dtype=jnp.float64),
        mesh, (P("p", None), P("p")), P()))
    np.testing.assert_allclose(np.asarray(fn(x, m)), np.asarray(ref),
                               rtol=1e-12, atol=1e-14)
