"""Micro-probe: slab Pallas coef/accel pass times @1M on the real chip.

Times the production kernels (backend='pallas', default geometry
nmaxx=nmaxy=4, nmax=6, SlabForce's default nzc=126 vertical grid).

Usage:  python scripts/probe_slab_kernel.py  [N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    from exp_tpu.basis.slab import build_slab_tables
    from exp_tpu.forces.slab import SlabForce

    t0 = time.perf_counter()
    t = build_slab_tables(nmaxx=4, nmaxy=4, nmax=6, zmax=0.1)
    print(f"tables built in {time.perf_counter() - t0:.1f} s", flush=True)
    force = SlabForce.from_tables(t, backend="pallas")

    rng = np.random.default_rng(0)
    x = np.empty((n, 3), np.float32)
    x[:, 0] = rng.uniform(0, 1, n)
    x[:, 1] = rng.uniform(0, 1, n)
    x[:, 2] = rng.normal(0, 0.02, n)
    x = jnp.asarray(x)
    mass = jnp.asarray(np.full(n, 1.0 / n), np.float32)

    coef_fn = jax.jit(force.coefficients)
    coef = jax.block_until_ready(coef_fn(x, mass))
    print(f"coef compiled at {time.perf_counter() - t0:.1f} s", flush=True)
    acc_fn = jax.jit(force.acceleration)
    jax.block_until_ready(acc_fn(coef, x))
    print(f"accel compiled at {time.perf_counter() - t0:.1f} s", flush=True)

    print(f"N = {n}")
    tc = timeit(coef_fn, x, mass)
    ta = timeit(acc_fn, coef, x)
    print(f"coef  : {tc:7.3f} ms   ({tc / n * 1e6:.2f} ns/particle)")
    print(f"accel : {ta:7.3f} ms   ({ta / n * 1e6:.2f} ns/particle)")


if __name__ == "__main__":
    main()
