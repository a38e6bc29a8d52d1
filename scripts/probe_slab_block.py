"""Slab accel/coef kernel block-size x precision sweep @1M (real chip).

Separates the per-block/dispatch floor from the MXU matmul cost:
  - dispatch floor: trivial jitted elementwise op on the same arrays
  - block in {1024, 2048, 4096}
  - zprec in {HIGHEST (6-pass), DEFAULT (bf16 1-pass)}
and reports force error of DEFAULT vs HIGHEST.

Usage: python scripts/probe_slab_block.py [N]
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
    from exp_tpu.ops import pallas_slab as pk

    t = build_slab_tables(nmaxx=4, nmaxy=4, nmax=6, zmax=0.1)
    force = SlabForce.from_tables(t, backend="pallas")

    rng = np.random.default_rng(0)
    x = np.empty((n, 3), np.float32)
    x[:, 0] = rng.uniform(0, 1, n)
    x[:, 1] = rng.uniform(0, 1, n)
    x[:, 2] = rng.normal(0, 0.02, n)
    x = jnp.asarray(x)
    mass = jnp.asarray(np.full(n, 1.0 / n), np.float32)

    coef = jax.jit(force.coefficients)(x, mass)
    xp, mp, _ = force._pad1024(x, mass)
    xyzm = jax.block_until_ready(jax.jit(pk.pack_xyzm)(xp, mp))
    cd = jnp.complex64
    Ct = jax.block_until_ready(jax.jit(lambda c: pk.contract_slab_tables(
        c.astype(cd), force.phi_s, force.dphi_s,
        force.nmaxx, force.nmaxy))(coef))
    Aux = jax.block_until_ready(jax.jit(lambda c: pk.slab_accel_aux(
        c.astype(cd), force.phi_t[-1], force.phi_t[0],
        force.dphi_t[-1], force.dphi_t[0],
        force.nmaxx, force.nmaxy))(coef))

    # dispatch/bandwidth floor: one elementwise op over the same input
    triv = jax.jit(lambda a: a * 2.0 + 1.0)
    jax.block_until_ready(triv(xyzm))
    print(f"trivial elementwise on (8,{n}): {timeit(triv, xyzm):7.3f} ms",
          flush=True)

    outs = {}
    for block in (1024, 2048, 4096):
        for pname, prec in (("HIGHEST", jax.lax.Precision.HIGHEST),
                            ("DEFAULT", jax.lax.Precision.DEFAULT)):
            try:
                ak = pk.make_slab_accel_kernel(
                    force.nmaxx, force.nmaxy, force.nzc, force.zmax,
                    block=block, interp=force.pallas_interp, zprec=prec)
                akj = jax.jit(ak)
                o = jax.block_until_ready(akj(xyzm, Ct, Aux))
                outs[(block, pname)] = np.asarray(o[:4])
                print(f"accel block={block} zprec={pname:8s}: "
                      f"{timeit(akj, xyzm, Ct, Aux):7.3f} ms", flush=True)
            except Exception as e:
                print(f"accel block={block} zprec={pname}: "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)
        try:
            ck = pk.make_slab_coef_kernel(
                force.nmaxx, force.nmaxy, force.nzc, force.zmax,
                block=block, interp=force.pallas_interp)
            ckj = jax.jit(ck)
            jax.block_until_ready(ckj(xyzm))
            print(f"coef  block={block}: {timeit(ckj, xyzm):7.3f} ms",
                  flush=True)
        except Exception as e:
            print(f"coef  block={block}: {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)

    ref = outs.get((1024, "HIGHEST"))
    if ref is not None:
        asc = np.abs(ref[:3]).max()
        for k, o in outs.items():
            if k[1] == "DEFAULT":
                d = np.abs(o[:3] - ref[:3]).max() / asc
                print(f"rel err {k} vs (1024,HIGHEST): {d:.2e}", flush=True)


if __name__ == "__main__":
    main()
