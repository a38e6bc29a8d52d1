"""Cube (plane-wave) force physics tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from exp_tpu.forces.cube import Cube


@pytest.fixture(scope="module")
def cube():
    return Cube.create(nmaxx=6, nmaxy=6, nmaxz=6, dtype=jnp.float64)


def test_coefficients_hermitian(cube):
    """a_{-k} = conj(a_k) for a real mass distribution."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (500, 3)))
    m = jnp.asarray(rng.uniform(0, 1, 500)) / 500
    c = np.asarray(cube.coefficients(x, m, accum_dtype=jnp.float64))
    flipped = c[::-1, ::-1, ::-1]
    np.testing.assert_allclose(flipped, np.conj(c), rtol=1e-10, atol=1e-12)


def test_acceleration_matches_autodiff(cube):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2000, 3)))
    m = jnp.full(2000, 1.0 / 2000)
    coef = cube.coefficients(x, m, accum_dtype=jnp.float64)

    pts = jnp.asarray(rng.uniform(0.1, 0.9, (6, 3)))
    acc, pot = cube.acceleration(coef, pts)

    def pot_at(p):
        _, ph = cube.acceleration(coef, p[None])
        return ph[0]

    g = jax.vmap(jax.grad(pot_at))(pts)
    np.testing.assert_allclose(np.asarray(acc), -np.asarray(g),
                               rtol=1e-8, atol=1e-10)


def test_poisson_consistency_sine_perturbation(cube):
    """A k=(1,0,0) cosine density perturbation must produce the analytic
    periodic potential Phi = -delta/( pi) cos(2 pi x) / ... (G=1):
    rho = A cos(2 pi x)  =>  Phi = -A cos(2 pi x) / (pi k^2) with k=2pi:
    Phi = -4 pi A cos(2 pi x)/(2 pi)^2 = -A cos(2 pi x)/pi."""
    n = 200_000
    rng = np.random.default_rng(2)
    # sample rho(x) ~ 1 + eps cos(2 pi x) by rejection
    eps = 0.5
    xs = rng.uniform(0, 1, (2 * n, 3))
    keep = rng.uniform(0, 1 + eps, 2 * n) <= 1 + eps * np.cos(2 * np.pi * xs[:, 0])
    xs = xs[keep][:n]
    m = jnp.full(len(xs), 1.0 / len(xs))
    coef = cube.coefficients(jnp.asarray(xs), m, accum_dtype=jnp.float64)

    xt = np.linspace(0.05, 0.95, 10)
    pts = jnp.asarray(np.stack([xt, 0.5 * np.ones_like(xt),
                                0.5 * np.ones_like(xt)], -1))
    _, pot = cube.acceleration(coef, pts)
    # mean density is 1 (total mass 1 in unit box); A = eps
    expected = -eps * np.cos(2 * np.pi * xt) / np.pi
    pot_np = np.asarray(pot)
    # subtract means (k=0 swindle drops the constant)
    np.testing.assert_allclose(pot_np - pot_np.mean(),
                               expected - expected.mean(),
                               atol=6e-3)


def test_wrap_periodicity(cube):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (1000, 3)))
    m = jnp.full(1000, 1e-3)
    coef = cube.coefficients(x, m, accum_dtype=jnp.float64)
    p1 = jnp.asarray([[0.25, 0.5, 0.5]])
    p2 = jnp.asarray([[1.25, -0.5, 2.5]])
    a1, ph1 = cube.acceleration(coef, p1)
    a2, ph2 = cube.acceleration(coef, p2)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(ph1), np.asarray(ph2), rtol=1e-10)

    # coefficients from wrapped vs unwrapped positions agree
    c2 = cube.coefficients(x + 3.0, m, accum_dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(coef),
                               rtol=1e-8, atol=1e-12)


def test_cube_nbody_run(tmp_path):
    """expCubeTest analogue: periodic cube run; mean position stays put and
    energy is conserved (tests/CMakeLists.txt:120-141, tests/Cube/check.py)."""
    from exp_tpu.ic.cubeics import sample_cube
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation
    from exp_tpu.io.coefs import open_coefs, CubeCoefsFile

    x, v, m = sample_cube(4000, sigma=1.2, seed=4)
    write_ascii_bodies(tmp_path / "cube.bods", (x, v, m))
    (tmp_path / "cube.yml").write_text("""\
Global:
  dtime: 0.005
  nsteps: 20
  runtag: cube0
Components:
  - name: gas
    bodyfile: cube.bods
    force:
      id: cube
      parameters: {nmaxx: 4, nmaxy: 4, nmaxz: 4}
Output:
  - id: outlog
    parameters: {nint: 1}
  - id: outcoef
    parameters: {nint: 5, name: gas}
""")
    sim = Simulation.from_file(str(tmp_path / "cube.yml"))
    sim.prime()
    sim.run()

    log = (tmp_path / "OUTLOG.cube0").read_text().splitlines()
    rows = [r for r in log if not r.startswith("#") and "Time" not in r]
    E = [float(r.split("|")[15]) for r in rows]
    # kinetic-dominated box: energy drift small
    assert abs(E[-1] - E[0]) / abs(E[0]) < 2e-2

    # center of mass drifts less than a box length (check.py analogue);
    # note x coordinates are NOT wrapped (field is periodic, orbits free)
    com0 = np.array([float(rows[0].split("|")[k]) for k in (3, 4, 5)])
    com1 = np.array([float(rows[-1].split("|")[k]) for k in (3, 4, 5)])
    assert np.all(np.abs(com1 - com0) < 0.5)

    cf = open_coefs(str(tmp_path / "outcoef.gas.cube0.h5"))
    assert isinstance(cf, CubeCoefsFile)
    times, coefs = cf.read_all()
    assert coefs.shape[1:] == (9, 9, 9)
    assert np.isfinite(coefs).all()
    cf.close()


def test_pallas_backend_matches_einsum():
    """Fused Pallas kernels (interpret mode on CPU) reproduce the XLA
    einsum path for both coefficient and force passes."""
    nm = 3
    cube_e = Cube.create(nmaxx=nm, nmaxy=nm, nmaxz=nm, dtype=jnp.float32)
    cube_p = Cube.create(nmaxx=nm, nmaxy=nm, nmaxz=nm, dtype=jnp.float32,
                         backend="pallas")
    rng = np.random.default_rng(7)
    n = 1500  # not a block multiple: exercises the zero-padding path
    x = jnp.asarray(rng.uniform(-0.2, 1.2, (n, 3)), jnp.float32)
    m = jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32) / n

    ce = cube_e.coefficients_local(x, m)
    cp = cube_p.coefficients_local(x, m)
    np.testing.assert_allclose(np.asarray(cp), np.asarray(ce),
                               rtol=2e-4, atol=2e-7)

    ae, pe = cube_e.acceleration(ce, x)
    ap, pp = cube_p.acceleration(ce, x)
    scale = float(jnp.abs(ae).max())
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ae),
                               rtol=2e-4, atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(pe),
                               rtol=2e-4, atol=2e-6)
