"""Micro-probe: decompose the sphere accel/coef Pallas kernel time @1M.

Times, on the real TPU chip, the production kernels plus ablated variants
that isolate the three VPU cost centers:
  - weight build   (the (nc+2, B) spline-weight evaluation)
  - angular rows   (Legendre/dP/trig recurrences)
  - assembly loop  (25-row potl/potr/pott/potp accumulation)

Ablations keep all matmuls and memory traffic identical (they replace the
ablated quantity with a cheap constant of the same shape), so
  t(baseline) - t(ablated)  ~=  cost of that block.

Usage:  python scripts/probe_sphere_kernel.py  [N]
"""

import sys
import time

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
    force = SphereSL.from_tables(t, dtype=jnp.float32, backend="pallas")

    rng = np.random.default_rng(0)
    u = rng.uniform(0.02, 0.98, n)
    r = u / (1 - u)
    ct = rng.uniform(-1, 1, n)
    st = np.sqrt(1 - ct * ct)
    ph = rng.uniform(0, 2 * np.pi, n)
    x = jnp.asarray(np.stack([r * st * np.cos(ph), r * st * np.sin(ph),
                              r * ct], -1), jnp.float32)
    mass = jnp.asarray(np.full(n, 1.0 / n), jnp.float32)

    coef_fn = jax.jit(force.coefficients)
    coef = coef_fn(x, mass)
    acc_fn = jax.jit(force.acceleration)

    print(f"N = {n}")
    print(f"coef  baseline : {timeit(coef_fn, x, mass):7.3f} ms")
    print(f"accel baseline : {timeit(acc_fn, coef, x):7.3f} ms")

    # ---- ablated variants --------------------------------------------
    import exp_tpu.ops.pallas_sphere as ps

    orig_spline = ps._spline_rows
    orig_leg = ps._legendre_rows

    def const_spline(xi, xmin, dxc, nc, B):
        # same shape/dtype, no per-entry b2 evaluation
        return jnp.broadcast_to(xi * 0.0 + 1.0 / 3.0, (nc + 2, B))

    def const_leg(lmax, xx):
        return {(l, mm): xx for l in range(lmax + 1) for mm in range(l + 1)}

    def rebuild():
        # the kernel cache is keyed by shape params only — clear it so the
        # ablated module functions are actually picked up
        import exp_tpu.forces.spherical as sph
        sph._PALLAS_CACHE.clear()
        return SphereSL.from_tables(t, dtype=jnp.float32, backend="pallas")

    ps._spline_rows = const_spline
    f2 = rebuild()
    print(f"coef  no-wbuild: {timeit(jax.jit(f2.coefficients), x, mass):7.3f}"
          " ms")
    print(f"accel no-wbuild: {timeit(jax.jit(f2.acceleration), coef, x):7.3f}"
          " ms")
    ps._spline_rows = orig_spline

    ps._legendre_rows = const_leg
    f3 = rebuild()
    print(f"coef  no-leg   : {timeit(jax.jit(f3.coefficients), x, mass):7.3f}"
          " ms")
    print(f"accel no-leg   : {timeit(jax.jit(f3.acceleration), coef, x):7.3f}"
          " ms")
    ps._legendre_rows = orig_leg

    ps._spline_rows = const_spline
    ps._legendre_rows = const_leg
    f4 = rebuild()
    print(f"coef  no-both  : {timeit(jax.jit(f4.coefficients), x, mass):7.3f}"
          " ms")
    print(f"accel no-both  : {timeit(jax.jit(f4.acceleration), coef, x):7.3f}"
          " ms")
    ps._spline_rows = orig_spline
    ps._legendre_rows = orig_leg


if __name__ == "__main__":
    main()
