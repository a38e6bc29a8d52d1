"""Time the sphere pallas kernels: poly vs recurrence harmonics @1M (TPU)."""

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
    lmax = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.basis.slgrid import build_sph_sl_tables
    from exp_tpu.forces.spherical import SphereSL

    m = hernquist_model(rmin=1e-3, rmax=20.0)
    t = build_sph_sl_tables(m, lmax=lmax, nmax=10, numr=2000, cmap=1,
                            rmap=1.0)

    rng = np.random.default_rng(0)
    u = rng.uniform(0.02, 0.98, n)
    r = u / (1 - u)
    ct = rng.uniform(-1, 1, n)
    st = np.sqrt(1 - ct * ct)
    ph = rng.uniform(0, 2 * np.pi, n)
    x = jnp.asarray(np.stack([r * st * np.cos(ph), r * st * np.sin(ph),
                              r * ct], -1), jnp.float32)
    mass = jnp.asarray(np.full(n, 1.0 / n), jnp.float32)

    print(f"N = {n}, lmax = {lmax}, platform = {jax.devices()[0].platform}")
    for harm in ("recurrence", "poly"):
        f = SphereSL.from_tables(t, dtype=jnp.float32, backend="pallas",
                                 pallas_harmonics=harm)
        coef_fn = jax.jit(f.coefficients)
        coef = coef_fn(x, mass)
        acc_fn = jax.jit(f.acceleration)
        tc = timeit(coef_fn, x, mass)
        ta = timeit(acc_fn, coef, x)
        print(f"{harm:11s}: coef {tc:7.3f} ms   accel {ta:7.3f} ms")


if __name__ == "__main__":
    main()
