"""Fused Pallas cylinder kernels (ops/pallas_cylinder.py) vs the XLA path.

The pallas backend trades a 4x-coarser radial (x) interpolation grid for
matmul-only table lookups (no gathers), so it is NOT bit-identical to the
fine-grid XLA path: tolerances here are calibrated to the coarse-grid
truncation measured at build time (coef ~4e-4, force ~1e-2 of the field
scale at ncx = numx/4), which is the same order as the f32 BFE truncation
error itself.  Runs in interpret mode on CPU (conftest forces the CPU
platform); the real-TPU numbers live in doc/benchmarks.md.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from exp_tpu.basis.empcyl import build_empcyl_tables
from exp_tpu.forces.cylinder import CylinderForce


@pytest.fixture(scope="module")
def tables():
    return build_empcyl_tables(mmax=4, nmax=8, lmaxfid=24, nmaxfid=16,
                               acyl=0.01, hcyl=0.002, numx=128, numy=64,
                               rnum=100, tnum=40, cachename=None)


@pytest.fixture(scope="module")
def particles():
    rng = np.random.default_rng(3)
    n = 1500   # not a 1024 multiple: exercises the zero-padding path
    R = rng.exponential(0.01, n)
    z = rng.normal(0, 0.002, n)
    ph = rng.uniform(0, 2 * np.pi, n)
    x = jnp.asarray(np.stack([R * np.cos(ph), R * np.sin(ph), z], -1),
                    jnp.float32)
    m = jnp.asarray(rng.uniform(0.5, 1.5, n) / n, jnp.float32)
    return x, m


def test_pallas_matches_xla(tables, particles):
    fx = CylinderForce.from_tables(tables, backend="xla")
    fp = CylinderForce.from_tables(tables, backend="pallas", ncx=32)
    x, m = particles

    cx = fx.coefficients_local(x, m)
    cp = fp.coefficients_local(x, m)
    cscale = float(jnp.abs(cx).max())
    assert float(jnp.abs(cp - cx).max()) / cscale < 2e-3

    ax, px = fx.acceleration(cx, x)
    ap, pp = fp.acceleration(cx, x)
    ascale = float(jnp.abs(ax).max())
    assert float(jnp.abs(ap - ax).max()) / ascale < 2e-2
    assert float(jnp.abs(pp - px).max()) / float(jnp.abs(px).max()) < 5e-3
    # interior bulk (R > 2 a_cyl): away from the under-resolved inner
    # oscillations the coarse grid is much tighter
    R = np.sqrt(np.asarray(x[:, 0]) ** 2 + np.asarray(x[:, 1]) ** 2)
    sel = R > 0.02
    err = np.abs(np.asarray(ap - ax))[sel].max() / ascale
    assert err < 5e-3


def test_pallas_outside_continuation(tables, particles):
    """Monopole continuation beyond the table sphere agrees with the XLA
    branch (same formula, so tight tolerance)."""
    fx = CylinderForce.from_tables(tables, backend="xla")
    fp = CylinderForce.from_tables(tables, backend="pallas", ncx=32)
    x, m = particles
    cx = fx.coefficients_local(x, m)
    far = jnp.asarray([[0.5, 0.1, 0.2], [0.0, 0.0, 0.9]], jnp.float32)
    ax, px = fx.acceleration(cx, far)
    ap, pp = fp.acceleration(cx, far)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(px), rtol=5e-3)
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ax), rtol=5e-3,
                               atol=1e-8)


def test_pallas_zero_mass_padding(tables, particles):
    fp = CylinderForce.from_tables(tables, backend="pallas", ncx=32)
    x, m = particles
    c0 = fp.coefficients_local(x, jnp.zeros_like(m))
    assert float(jnp.abs(c0).max()) == 0.0


def test_pallas_flatdisk_tables():
    """The pallas backend also serves razor-thin (flatdisk) tables (they
    share the CylinderForce evaluator)."""
    from exp_tpu.basis.flatdisk import build_flatdisk_tables

    t = build_flatdisk_tables(mmax=2, nmax=6, model="kuzmin", acyl=1.0,
                              numx=96, numy=48, knots=200, numk=128,
                              cachename=None)
    fx = CylinderForce.from_tables(t, backend="xla")
    fp = CylinderForce.from_tables(t, backend="pallas", ncx=32)
    rng = np.random.default_rng(5)
    n = 1200
    R = rng.exponential(1.0, n)
    ph = rng.uniform(0, 2 * np.pi, n)
    x = jnp.asarray(np.stack([R * np.cos(ph), R * np.sin(ph),
                              rng.normal(0, 0.05, n)], -1), jnp.float32)
    m = jnp.asarray(np.full(n, 1.0 / n), jnp.float32)
    cx = fx.coefficients_local(x, m)
    cp = fp.coefficients_local(x, m)
    assert float(jnp.abs(cp - cx).max() / jnp.abs(cx).max()) < 1e-3
    ax, px = fx.acceleration(cx, x)
    ap, pp = fp.acceleration(cx, x)
    assert float(jnp.abs(ap - ax).max() / jnp.abs(ax).max()) < 5e-3
