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
