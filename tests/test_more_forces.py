"""Bessel basis, direct-summation force (incl. ppermute ring), external
fields (autodiff consistency + driver integration)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from exp_tpu.basis.bessel import make_bessel_force, sph_bessel_zeros
from exp_tpu.forces.direct import DirectForce
from exp_tpu.forces.external import (UserLogPot, UserMNdisk, UserBar,
                                     TidalField, build_external)


def test_bessel_zeros():
    from scipy.special import spherical_jn

    for l in (0, 1, 5):
        z = sph_bessel_zeros(l, 6)
        assert np.all(np.abs(spherical_jn(l, z)) < 1e-12)
        assert np.all(np.diff(z) > 0)
    # j_0 zeros are n pi
    np.testing.assert_allclose(sph_bessel_zeros(0, 3),
                               np.pi * np.arange(1, 4), rtol=1e-12)


def test_bessel_force_monopole():
    """Thin shell of particles: force outside is Keplerian, zero inside.

    Note the Bessel basis imposes Phi(rmax)=0 (Dirichlet zeros of j_l), so
    the potential carries a constant +M/rmax offset relative to the vacuum
    solution — the force and potential DIFFERENCES are physical (same
    behavior as the reference's bessel force; that offset is why sphereSL
    is the preferred spherical basis)."""
    from exp_tpu.basis.model import plummer_model
    from exp_tpu.ic.eddington import sample_spherical_model

    force = make_bessel_force(lmax=2, nmax=24, rmax=2.0, dtype=jnp.float64)
    pm = plummer_model(a=0.3, M=1.0, rmin=1e-3, rmax=1.9)
    xs, vs, ms = sample_spherical_model(pm, 30000, seed=4)
    coef = force.coefficients(jnp.asarray(xs), jnp.asarray(ms),
                              accum_dtype=jnp.float64)
    rt = np.array([0.3, 0.6, 1.2, 1.6])
    pts = jnp.asarray(np.stack([rt, 0 * rt, 0 * rt], -1))
    acc, pot = force.acceleration(coef, pts)
    g_expect = -pm.get_mass(rt) / rt ** 2
    np.testing.assert_allclose(np.asarray(acc)[:, 0], g_expect, rtol=0.04)
    # potential differences physical (the Dirichlet offset drops out)
    dphi = float(pot[0] - pot[3])
    expect = float(pm.get_pot(0.3) - pm.get_pot(1.6))
    assert dphi == pytest.approx(expect, rel=0.05)


def test_direct_force_exact():
    f = DirectForce(eps=0.0, chunk=1000)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (500, 3)))
    m = jnp.asarray(rng.uniform(0.5, 1.5, 500) / 500)
    coef = f.coefficients(x, m)
    pts = jnp.asarray([[3.0, 0.0, 0.0]])
    acc, pot = f.acceleration(coef, pts)
    d = np.asarray(pts)[:, None] - np.asarray(x)[None]
    r = np.linalg.norm(d, axis=-1)
    pot_ref = -(np.asarray(m) / r).sum()
    assert float(pot[0]) == pytest.approx(pot_ref, rel=1e-10)


def test_direct_ring_matches_single():
    """ppermute ring over 8 shards == single-device direct sum."""
    from jax.sharding import Mesh, PartitionSpec as P
    from exp_tpu.nbody.step import shard_map

    f = DirectForce(eps=1e-3)
    rng = np.random.default_rng(2)
    n = 1024
    x = jnp.asarray(rng.normal(0, 1, (n, 3)))
    m = jnp.full(n, 1.0 / n)
    acc1, pot1 = f.acceleration(f.coefficients(x, m), x)

    mesh = Mesh(np.array(jax.devices()), ("p",))

    def body(xs, ms):
        coef = f.coefficients(xs, ms, axis_name="p")
        return f.acceleration(coef, xs, axis_name="p")

    fn = jax.jit(shard_map(body, mesh, (P("p", None), P("p")),
                           (P("p", None), P("p"))))
    acc8, pot8 = fn(x, m)
    np.testing.assert_allclose(np.asarray(acc8), np.asarray(acc1),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pot8), np.asarray(pot1),
                               rtol=1e-10)


@pytest.mark.parametrize("ext", [
    UserLogPot(v0=1.2, q=0.8, rc=0.2),
    UserMNdisk(a=1.0, b=0.2, mass=2.0),
    UserBar(amplitude=0.05, length=0.5, omega=2.0, Ton=1.0),
    TidalField(txx=0.1, tyy=-0.05, tzz=0.2),
])
def test_external_autodiff(ext):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (16, 3)))
    t = 1.7
    acc, pot = ext.acceleration(x, t)
    assert np.isfinite(np.asarray(acc)).all()
    # finite-difference check of one component
    h = 1e-6
    dx = jnp.zeros((16, 3)).at[:, 0].set(h)
    num = -(ext.potential(x + dx, t) - ext.potential(x - dx, t)) / (2 * h)
    np.testing.assert_allclose(np.asarray(acc[:, 0]), np.asarray(num),
                               rtol=1e-4, atol=1e-7)


def test_mn_disk_circular_speed():
    """MN disk: vc^2(R) = M R^2/(R^2+(a+b)^2)^{3/2} in the plane."""
    ext = UserMNdisk(a=1.0, b=0.2, mass=1.0)
    R = np.array([0.5, 1.0, 3.0])
    x = jnp.asarray(np.stack([R, 0 * R, 0 * R], -1))
    acc, _ = ext.acceleration(x, 0.0)
    vc2 = -np.asarray(acc)[:, 0] * R
    expected = R ** 2 / (R ** 2 + 1.2 ** 2) ** 1.5
    np.testing.assert_allclose(vc2, expected, rtol=1e-5)


def test_external_in_driver(tmp_path):
    """Test particles orbiting in a fixed MN disk via External stanza."""
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation

    # circular orbit test particle at R=1 in MN(a=1,b=0.2,M=1)
    vc = np.sqrt(1.0 / (1 + 1.2 ** 2) ** 1.5)
    x = np.array([[1.0, 0, 0], [0, 1.0, 0]])
    v = np.array([[0, vc, 0], [-vc, 0, 0]])
    m = np.array([1e-10, 1e-10])
    write_ascii_bodies(tmp_path / "t.bods", (x, v, m))
    (tmp_path / "c.yml").write_text("""\
Global:
  dtime: 0.02
  nsteps: 100
  runtag: ext0
Components:
  - name: test
    bodyfile: t.bods
    force: {id: noforce, parameters: {}}
Output:
  - id: outlog
    parameters: {nint: 50}
External:
  - id: usermndisk
    parameters: {a: 1.0, b: 0.2, mass: 1.0}
""")
    sim = Simulation.from_file(str(tmp_path / "c.yml"))
    sim.prime()
    sim.run()
    xf = np.asarray(sim._state["test"].x)[:2]
    # circular orbit: radius preserved
    np.testing.assert_allclose(np.linalg.norm(xf[:, :2], axis=1), 1.0,
                               rtol=1e-3)


def test_flatdisk_kuzmin_analytic():
    """Razor-thin Kuzmin disk: BFE field matches the closed form
    Phi = -M/sqrt(R^2 + (a+|z|)^2) (the defining Kuzmin property)."""
    from exp_tpu.basis.flatdisk import build_flatdisk_tables
    from exp_tpu.forces.cylinder import CylinderForce

    t = build_flatdisk_tables(mmax=2, nmax=8, model="kuzmin", acyl=1.0,
                              rcylmax=20.0, numx=128, numy=64, knots=300,
                              numk=256)
    force = CylinderForce.from_tables(t, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    n = 50000
    u = rng.uniform(0, 1, n)
    R = np.sqrt(1.0 / (1 - u * 0.995) ** 2 - 1.0)      # inverse Kuzmin CDF
    ph = rng.uniform(0, 2 * np.pi, n)
    x = np.stack([R * np.cos(ph), R * np.sin(ph), np.zeros(n)], -1)
    m = np.full(n, 1.0 / n)
    coef = force.coefficients(jnp.asarray(x), jnp.asarray(m),
                              accum_dtype=jnp.float64)
    pts = np.array([[0.5, 0, 0.3], [1.5, 0.5, 0.0], [3.0, 0, 1.0],
                    [0.8, 0, 0.05]])
    acc, pot = force.acceleration(coef, jnp.asarray(pts))
    Rp = np.hypot(pts[:, 0], pts[:, 1])
    zp = np.abs(pts[:, 2])
    pot_k = -1.0 / np.sqrt(Rp ** 2 + (1 + zp) ** 2)
    np.testing.assert_allclose(np.asarray(pot), pot_k, rtol=0.01)
    az_k = -np.sign(pts[:, 2]) * (1 + zp) / (Rp ** 2 + (1 + zp) ** 2) ** 1.5
    np.testing.assert_allclose(np.asarray(acc)[:, 2], az_k,
                               rtol=0.05, atol=1e-4)
    aR_k = -Rp / (Rp ** 2 + (1 + zp) ** 2) ** 1.5
    np.testing.assert_allclose(np.asarray(acc)[:, 0],
                               aR_k * pts[:, 0] / np.maximum(Rp, 1e-12),
                               rtol=0.05, atol=1e-4)


def test_flatdisk_driver(tmp_path):
    """flatdisk force id through the YAML driver."""
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation

    rng = np.random.default_rng(1)
    n = 2000
    R = -0.5 * (np.log(rng.uniform(size=n)) + np.log(rng.uniform(size=n)))
    ph = rng.uniform(0, 2 * np.pi, n)
    x = np.stack([R * np.cos(ph), R * np.sin(ph), np.zeros(n)], -1)
    # rough rotation
    vc = np.sqrt(np.clip(R, 0.05, None)) * 0.5
    v = np.stack([-vc * np.sin(ph), vc * np.cos(ph), np.zeros(n)], -1)
    m = np.full(n, 1.0 / n)
    write_ascii_bodies(tmp_path / "d.bods", (x, v, m))
    (tmp_path / "fd.yml").write_text("""\
Global:
  dtime: 0.01
  nsteps: 5
  runtag: fd0
Components:
  - name: disk
    bodyfile: d.bods
    force:
      id: flatdisk
      parameters: {mmax: 2, nmax: 6, acyl: 0.5, rcylmax: 20.0,
                   numx: 128, numy: 64, knots: 200, numk: 128}
Output:
  - id: outlog
    parameters: {nint: 1}
""")
    sim = Simulation.from_file(str(tmp_path / "fd.yml"))
    sim.prime()
    sim.run()
    log = (tmp_path / "OUTLOG.fd0").read_text().splitlines()
    rows = [r for r in log if not r.startswith("#") and "Time" not in r]
    E = [float(r.split("|")[15]) for r in rows]
    assert np.isfinite(E).all()


def test_new_externals_autodiff():
    """UserMW / UserDisk / ExternalShock: finite, curl-free, sane."""
    from exp_tpu.forces.external import UserMW, UserDisk, ExternalShock

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1.0, (32, 3)))
    for ext in (UserMW(), ExternalShock(AMPL=0.3, PER=0.4, T0=1.0),
                UserDisk(a=1.0, mass=1.0, dtype=jnp.float64)):
        acc, pot = ext.acceleration(x, 0.9)
        assert np.isfinite(np.asarray(acc)).all()
        h = 1e-5
        dx = jnp.zeros((32, 3)).at[:, 1].set(h)
        num = -(ext.potential(x + dx, 0.9)
                - ext.potential(x - dx, 0.9)) / (2 * h)
        np.testing.assert_allclose(np.asarray(acc[:, 1]), np.asarray(num),
                                   rtol=2e-3, atol=1e-5)


def test_userdisk_vs_mn_far_field():
    """UserDisk table: far-field potential is Keplerian -M/r."""
    from exp_tpu.forces.external import UserDisk

    d = UserDisk(a=0.5, mass=2.0, dtype=jnp.float64)
    x = jnp.asarray([[20.0, 0.0, 3.0], [0.0, 15.0, -8.0]])
    pot = np.asarray(d.potential(x, 0.0))
    r = np.linalg.norm(np.asarray(x), axis=1)
    np.testing.assert_allclose(pot, -2.0 / r, rtol=5e-2)


def test_operators_in_driver(tmp_path):
    """scatterMFP preserves speeds; generateRelaxation writes .relx."""
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation

    rng = np.random.default_rng(7)
    n = 200
    x = rng.normal(0, 0.5, (n, 3))
    v = rng.normal(0, 0.3, (n, 3))
    m = np.full(n, 1.0 / n)
    write_ascii_bodies(tmp_path / "s.bods", (x, v, m))
    (tmp_path / "c.yml").write_text("""\
Global:
  dtime: 0.01
  nsteps: 6
  runtag: scat0
Components:
  - name: gas
    bodyfile: s.bods
    force: {id: noforce, parameters: {}}
Output:
  - id: outlog
    parameters: {nint: 3}
External:
  - id: scatterMFP
    parameters: {tau: 0.02, rmax: 4.0, seed: 2}
  - id: generateRelaxation
    parameters: {}
""")
    sim = Simulation.from_file(str(tmp_path / "c.yml"))
    sim.prime()
    speeds0 = np.sort(np.linalg.norm(np.asarray(
        sim._state["gas"].v), axis=1))
    sim.run()
    op = sim.operators[0]
    assert op.nscattered > 0
    # elastic isotropic scattering with noforce: speed set preserved
    speeds1 = np.sort(np.linalg.norm(np.asarray(
        sim._state["gas"].v), axis=1))
    np.testing.assert_allclose(speeds1, speeds0, rtol=1e-6)
    relx = (tmp_path / "scat0.relx").read_text().splitlines()
    assert len(relx) >= 2 and not relx[-1].startswith("#")


def test_analytic_bases():
    """CB and Hernquist-Ostriker analytic bases: exact discrete
    biorthogonality; each basis reproduces its own lowest-member halo
    (Plummer / Hernquist) to ~1%."""
    from exp_tpu.basis.analytic import (build_cb_tables, build_hq_tables,
                                        make_analytic_force)
    from exp_tpu.basis.model import hernquist_model, plummer_model
    from exp_tpu.ic.eddington import sample_spherical_model

    for build in (build_cb_tables, build_hq_tables):
        pot, dens, r = build(2, 6, rmin=1e-3, rmax=100.0, numr=1200)
        w = np.gradient(r)
        w[0] *= 0.5
        w[-1] *= 0.5
        for l in range(3):
            B = np.einsum("rn,rm,r->nm", pot[:, l, :], dens[:, l, :],
                          r ** 2 * w)
            np.testing.assert_allclose(B, -np.eye(6), atol=1e-10)

    for kind, model in (("hernq", hernquist_model(rmin=1e-3, rmax=50.0)),
                        ("CBsphere", plummer_model(rmin=1e-3, rmax=50.0))):
        x, v, mass = sample_spherical_model(model, 40000, seed=4)
        f = make_analytic_force(kind, lmax=2, nmax=8, rmin=1e-3, rmax=60.0,
                                dtype=jnp.float64)
        coef = f.coefficients(jnp.asarray(x), jnp.asarray(mass),
                              accum_dtype=jnp.float64)
        pts = np.stack([np.geomspace(0.1, 10, 12),
                        np.zeros(12), np.zeros(12)], -1)
        acc, _ = f.acceleration(coef, jnp.asarray(pts))
        aR = -np.asarray(acc)[:, 0]
        exact = model.get_mass(pts[:, 0]) / pts[:, 0] ** 2
        assert np.median(np.abs(aR / exact - 1.0)) < 0.03


def test_analytic_force_driver(tmp_path):
    """hernq force id runs through the YAML driver in virial balance."""
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.ic.eddington import sample_spherical_model
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation

    m = hernquist_model(rmin=1e-3, rmax=50.0)
    x, v, mass = sample_spherical_model(m, 3000, seed=6)
    write_ascii_bodies(tmp_path / "h.bods", (x, v, mass))
    (tmp_path / "c.yml").write_text("""\
Global:
  dtime: 0.02
  nsteps: 10
  runtag: hq0
Components:
  - name: halo
    bodyfile: h.bods
    force:
      id: hernq
      parameters: {Lmax: 2, nmax: 8, rmax: 60.0}
Output:
  - id: outlog
    parameters: {nint: 5}
""")
    sim = Simulation.from_file(str(tmp_path / "c.yml"))
    sim.prime()
    sim.run()
    d = sim._diag["halo"]
    ratio = -2.0 * float(np.asarray(d["KE"])) / float(np.asarray(d["VC"]))
    assert abs(ratio - 1.0) < 0.12


def test_direct_spline_kernel():
    """SplineSoft (GravKernel.cc:14-31): exact point-mass field outside
    r = eps (compact support — Plummer never reaches exact), smooth and
    finite inside, enclosed-mass monotone."""
    eps = 0.5
    fs = DirectForce(eps=eps, kernel="spline")
    src = jnp.zeros((1, 3))
    msrc = jnp.ones(1)
    coef = fs.coefficients(src, msrc)
    # outside the kernel: exact -1/r and -1/r^2
    pts = jnp.asarray([[0.6, 0.0, 0.0], [2.0, 0.0, 0.0]])
    acc, pot = fs.acceleration(coef, pts)
    np.testing.assert_allclose(np.asarray(pot), [-1 / 0.6, -1 / 2.0],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(acc)[:, 0],
                               [-1 / 0.36, -1 / 4.0], rtol=1e-6)
    # inside: finite, attractive, weaker than the point mass
    pts_in = jnp.asarray([[0.1, 0, 0], [0.3, 0, 0], [0.45, 0, 0]])
    acc_i, pot_i = fs.acceleration(coef, pts_in)
    a = -np.asarray(acc_i)[:, 0]
    assert (a > 0).all() and (a < 1.0 / np.asarray([.1, .3, .45])**2).all()
    assert np.all(np.diff(-np.asarray(pot_i)) < 0)  # |pot| decreasing
    # potential continuous at the kernel edge
    p_edge = fs.acceleration(coef, jnp.asarray([[0.4999, 0, 0],
                                                [0.5001, 0, 0]]))[1]
    assert abs(float(p_edge[0] - p_edge[1])) < 1e-3


def test_direct_mn_sources():
    """mn_model: each source is a Miyamoto-Nagai disk
    (Direct.cc:264-300) — compare to the analytic MN field."""
    a, b = 0.8, 0.2
    f = DirectForce(mn_model=True, a=a, b=b)
    src = jnp.asarray([[0.2, -0.1, 0.05]])
    msrc = jnp.asarray([2.0])
    coef = f.coefficients(src, msrc)
    pts = jnp.asarray([[1.5, 0.7, 0.4]])
    acc, pot = f.acceleration(coef, pts)
    xx = np.asarray(pts[0] - src[0], float)
    R = np.hypot(xx[0], xx[1])
    zb = np.sqrt(xx[2]**2 + b*b)
    dn = np.sqrt(R*R + (a + zb)**2)
    assert float(pot[0]) == pytest.approx(-2.0 / dn, rel=1e-6)
    fr = -2.0 * R / dn**3
    fz = -2.0 * xx[2] * (a + zb) / (zb * dn**3)
    np.testing.assert_allclose(
        np.asarray(acc[0]), [fr * xx[0] / R, fr * xx[1] / R, fz],
        rtol=1e-5)


def test_direct_pm_model():
    """pm_model: normalized extended profile replaces the kernel inside
    its rmax (Direct.cc:310-318) — force follows M(<r)/M(rmax)."""
    from exp_tpu.basis.model import plummer_model

    mod = plummer_model(a=0.5, M=1.0, rmin=1e-3, rmax=5.0)
    f = DirectForce.with_pm_model(mod, eps=1e-6, kernel="plummer")
    src = jnp.zeros((1, 3))
    msrc = jnp.asarray([3.0])
    coef = f.coefficients(src, msrc)
    Mmax = float(mod.mass[-1])
    for r in (0.3, 1.0, 3.0):
        acc, pot = f.acceleration(coef, jnp.asarray([[r, 0.0, 0.0]]))
        want = -3.0 * float(mod.get_mass(r)) / Mmax / r**2
        assert float(acc[0, 0]) == pytest.approx(want, rel=1e-3)
    # beyond rmax: plain point mass
    acc, pot = f.acceleration(coef, jnp.asarray([[8.0, 0.0, 0.0]]))
    assert float(acc[0, 0]) == pytest.approx(-3.0 / 64.0, rel=1e-4)


def test_direct_yaml_kernel_options():
    """YAML factory maps the reference's Direct keys (type/soft/
    mn_model/a/b); default kernel is Spline like src/Direct.cc:88-93."""
    from exp_tpu.nbody.simulation import build_force
    from exp_tpu.config import ForceConfig

    f = build_force(ForceConfig(id="direct", parameters={}), jnp.float32)
    assert f.kernel == "spline"
    f2 = build_force(ForceConfig(id="direct",
                                 parameters={"type": "Plummer",
                                             "soft": 0.01}), jnp.float32)
    assert f2.kernel == "plummer" and f2.eps == 0.01
    f3 = build_force(ForceConfig(id="direct",
                                 parameters={"mn_model": True, "a": 2.0,
                                             "b": 0.3}), jnp.float32)
    assert f3.mn_model and f3.a == 2.0
