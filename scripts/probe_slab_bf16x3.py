"""Time the slab passes with the bf16x3 z-profile matmul (the new
default) vs HIGHEST on the real chip, and report the force error.

Usage: python -u scripts/probe_slab_bf16x3.py [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    from exp_tpu.basis.slab import build_slab_tables
    from exp_tpu.forces.slab import SlabForce
    from exp_tpu.ops import pallas_slab as pk

    t0 = time.time()
    t = build_slab_tables(nmaxx=4, nmaxy=4, nmax=6, zmax=0.1,
                          cachename="/tmp/slab_probe_x4y4n6.h5")
    print(f"tables in {time.time() - t0:.0f}s", flush=True)
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
    print("coef compiled", flush=True)
    acc_fn = jax.jit(force.acceleration)
    jax.block_until_ready(acc_fn(coef, x))
    print("accel compiled", flush=True)
    print(f"coef  pass: {timeit(coef_fn, x, mass):7.3f} ms", flush=True)
    print(f"accel pass: {timeit(acc_fn, coef, x):7.3f} ms", flush=True)

    xp, mp, _ = force._pad1024(x, mass)
    xyzm = jax.block_until_ready(jax.jit(pk.pack_xyzm)(xp, mp))
    cd = jnp.complex64
    Ct = jax.block_until_ready(jax.jit(
        lambda c: pk.contract_slab_tables(
            c.astype(cd), force.phi_s, force.dphi_s,
            force.nmaxx, force.nmaxy))(coef))
    Aux = jax.block_until_ready(jax.jit(
        lambda c: pk.slab_accel_aux(
            c.astype(cd), force.phi_t[-1], force.phi_t[0],
            force.dphi_t[-1], force.dphi_t[0],
            force.nmaxx, force.nmaxy))(coef))
    outs = {}
    for name, zp in (("bf16x3", None),
                     ("HIGHEST", jax.lax.Precision.HIGHEST)):
        ak = pk.make_slab_accel_kernel(
            force.nmaxx, force.nmaxy, force.nzc, force.zmax,
            interp=force.pallas_interp, zprec=zp)
        akj = jax.jit(ak)
        o = jax.block_until_ready(akj(xyzm, Ct, Aux))
        outs[name] = np.asarray(o[:4])
        print(f"accel kernel zprec={name:8s}: "
              f"{timeit(akj, xyzm, Ct, Aux):7.3f} ms", flush=True)
    asc = np.abs(outs["HIGHEST"][:3]).max()
    d = np.abs(outs["bf16x3"][:3] - outs["HIGHEST"][:3]).max() / asc
    print(f"rel err bf16x3 vs HIGHEST: {d:.2e}", flush=True)


if __name__ == "__main__":
    main()
