"""Time + accuracy of sphere accel kernel variants: numr_cs x precision.

Accuracy is max relative force error vs the f64 gather backend on 4096
equilibrium points.  Usage: python scripts/probe_accel_variants.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.basis.slgrid import build_sph_sl_tables
    from exp_tpu.forces.spherical import SphereSL

    m = hernquist_model(rmin=1e-3, rmax=20.0)
    t = build_sph_sl_tables(m, lmax=4, nmax=10, numr=2000, cmap=1, rmap=1.0)

    rng = np.random.default_rng(0)
    u = rng.uniform(0.02, 0.98, n)
    r = u / (1 - u)
    ct = rng.uniform(-1, 1, n)
    st = np.sqrt(1 - ct * ct)
    ph = rng.uniform(0, 2 * np.pi, n)
    x = jnp.asarray(np.stack([r * st * np.cos(ph), r * st * np.sin(ph),
                              r * ct], -1), jnp.float32)
    mass = jnp.asarray(np.full(n, 1.0 / n), jnp.float32)

    ref = SphereSL.from_tables(t, dtype=jnp.float32, backend="matmul")
    coef = jax.jit(ref.coefficients)(x, mass)
    pts = x[:4096]
    a_ref, p_ref = jax.jit(ref.acceleration)(coef, pts)
    a_ref = np.asarray(a_ref)
    anorm = np.linalg.norm(a_ref, axis=1)

    print(f"N = {n}, ref = matmul f32 fine-grid")
    for ncs in (256, 128, 64):
        for prec in ("mixed", "mixed3", "default"):
            f = SphereSL.from_tables(t, dtype=jnp.float32, backend="pallas",
                                     numr_cs=ncs, pallas_precision=prec)
            afn = jax.jit(f.acceleration)
            av, pv = afn(coef, pts)
            err = np.abs(np.asarray(av) - a_ref).max(1) / np.maximum(
                anorm, 1e-8)
            ta = timeit(afn, coef, x)
            print(f"ncs={ncs:4d} prec={prec:8s}: accel {ta:7.3f} ms   "
                  f"maxrel {err.max():.2e}  p99 {np.percentile(err, 99):.2e}")


if __name__ == "__main__":
    main()
