"""Fused Pallas slab kernels (ops/pallas_slab.py) vs the XLA einsum path.

Runs in interpret mode on CPU; the pallas path interpolates the z-tables
on a coarse (nzc) hat grid, so tolerances reflect that truncation (the
slab profiles are smooth — error well below the BFE truncation)."""

import numpy as np
import jax.numpy as jnp
import pytest

from exp_tpu.basis.slab import build_slab_tables
from exp_tpu.forces.slab import SlabForce


@pytest.fixture(scope="module")
def tables():
    return build_slab_tables(nmaxx=2, nmaxy=2, nmax=4, zmax=0.1, h=0.01,
                             numz=201, cachename=None)


@pytest.fixture(scope="module")
def particles():
    rng = np.random.default_rng(8)
    n = 1500   # not a 1024 multiple: exercises the padding path
    x = np.stack([rng.uniform(0, 1, n), rng.uniform(0, 1, n),
                  rng.normal(0, 0.02, n)], -1)
    m = rng.uniform(0.5, 1.5, n) / n
    return jnp.asarray(x, jnp.float32), jnp.asarray(m, jnp.float32)


def test_slab_pallas_matches_einsum(tables, particles):
    fx = SlabForce.from_tables(tables, backend="einsum")
    fp = SlabForce.from_tables(tables, backend="pallas", nzc=126)
    x, m = particles

    cx = fx.coefficients_local(x, m)
    cp = fp.coefficients_local(x, m)
    cs = float(jnp.abs(cx).max())
    assert float(jnp.abs(cp - cx).max()) / cs < 2e-3

    ax, px = fx.acceleration(cx, x)
    ap, pp = fp.acceleration(cx, x)
    asc = float(jnp.abs(ax).max())
    assert float(jnp.abs(ap - ax).max()) / asc < 5e-3
    assert float(jnp.abs(pp - px).max()) / float(jnp.abs(px).max()) < 5e-3


def test_slab_pallas_zero_mass(tables, particles):
    fp = SlabForce.from_tables(tables, backend="pallas", nzc=126)
    x, m = particles
    c0 = fp.coefficients_local(x, jnp.zeros_like(m))
    assert float(jnp.abs(c0).max()) == 0.0


def test_slab_pallas_driver(tmp_path):
    """'backend: pallas' on the slabSL stanza runs end-to-end through the
    YAML driver."""
    import numpy as np
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation

    rng = np.random.default_rng(3)
    n = 3000
    x = np.stack([rng.uniform(0, 1, n), rng.uniform(0, 1, n),
                  rng.normal(0, 0.02, n)], -1)
    v = rng.normal(0, 0.05, (n, 3))
    m = np.full(n, 1.0 / n)
    write_ascii_bodies(tmp_path / "s.bods", (x, v, m))
    (tmp_path / "c.yml").write_text("""\
Global: {dtime: 0.005, nsteps: 4, runtag: slp0}
Components:
  - name: slab
    bodyfile: s.bods
    force:
      id: slabSL
      parameters: {nmaxx: 2, nmaxy: 2, nmax: 4, zmax: 0.1, h: 0.01,
                   numz: 201, backend: pallas}
Output: []
""")
    sim = Simulation.from_file(str(tmp_path / "c.yml"), steps_per_block=2)
    sim.prime()
    sim.run()
    assert np.isfinite(np.asarray(sim._state["slab"].x)).all()


def test_slab_pallas_outside_continuation(tables):
    """Particles beyond |z| = zmax take the in-kernel vacuum continuation;
    must match the XLA _outside_continuation path of the einsum backend."""
    rng = np.random.default_rng(11)
    n = 600
    # half inside, half outside (up to 3x zmax), mixed signs
    z_in = rng.normal(0, 0.02, n // 2)
    z_out = rng.uniform(0.1, 0.3, n - n // 2) * rng.choice([-1, 1],
                                                           n - n // 2)
    x = np.stack([rng.uniform(0, 1, n), rng.uniform(0, 1, n),
                  np.concatenate([z_in, z_out])], -1)
    m = rng.uniform(0.5, 1.5, n) / n
    x = jnp.asarray(x, jnp.float32)
    m = jnp.asarray(m, jnp.float32)

    fx = SlabForce.from_tables(tables, backend="einsum")
    fp = SlabForce.from_tables(tables, backend="pallas", nzc=126)
    cx = fx.coefficients_local(x, m)
    ax, px = fx.acceleration(cx, x)
    ap, pp = fp.acceleration(cx, x)
    asc = float(jnp.abs(ax).max())
    assert float(jnp.abs(ap - ax).max()) / asc < 5e-3
    assert float(jnp.abs(pp - px).max()) / float(jnp.abs(px).max()) < 5e-3
    # the far exterior decays: no blowups past the boundary
    far = np.abs(np.asarray(x[:, 2])) > 0.25
    assert np.isfinite(np.asarray(ap)[far]).all()
