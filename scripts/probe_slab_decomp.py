"""Decompose slab Pallas pass times @1M on the real chip.

Times each piece of the coef/accel pipelines separately plus accel-kernel
precision variants (zprec = HIGHEST 6-pass / HIGH 3-pass / DEFAULT bf16)
and reports the max force deviation of the cheaper variants vs HIGHEST.

Usage:  python scripts/probe_slab_decomp.py  [N]
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
    print(f"geometry: C={(2*force.nmaxx+1)*(2*force.nmaxy+1)} "
          f"nmax={force.nmax} nzc={force.nzc}", flush=True)

    rng = np.random.default_rng(0)
    x = np.empty((n, 3), np.float32)
    x[:, 0] = rng.uniform(0, 1, n)
    x[:, 1] = rng.uniform(0, 1, n)
    x[:, 2] = rng.normal(0, 0.02, n)
    x = jnp.asarray(x)
    mass = jnp.asarray(np.full(n, 1.0 / n), np.float32)

    # full passes
    coef_fn = jax.jit(force.coefficients)
    coef = jax.block_until_ready(coef_fn(x, mass))
    acc_fn = jax.jit(force.acceleration)
    jax.block_until_ready(acc_fn(coef, x))
    print(f"coef  pass: {timeit(coef_fn, x, mass):7.3f} ms", flush=True)
    print(f"accel pass: {timeit(acc_fn, coef, x):7.3f} ms", flush=True)

    # pieces
    ck, ak = force._pallas_kernels()
    xp, mp, _ = force._pad1024(x, mass)
    pack = jax.jit(pk.pack_xyzm)
    xyzm = jax.block_until_ready(pack(xp, mp))
    print(f"  pack        : {timeit(pack, xp, mp):7.3f} ms", flush=True)
    ckj = jax.jit(ck)
    G = jax.block_until_ready(ckj(xyzm))
    print(f"  coef kernel : {timeit(ckj, xyzm):7.3f} ms", flush=True)
    conc = jax.jit(lambda G: pk.contract_coef_output(G, force.phi_s,
                                                     force.sgn))
    jax.block_until_ready(conc(G))
    print(f"  coef contr  : {timeit(conc, G):7.3f} ms", flush=True)

    cd = jnp.complex64
    ctf = jax.jit(lambda c: pk.contract_slab_tables(
        c.astype(cd), force.phi_s, force.dphi_s, force.nmaxx, force.nmaxy))
    Ct = jax.block_until_ready(ctf(coef))
    print(f"  accel contr : {timeit(ctf, coef):7.3f} ms", flush=True)
    auxf = jax.jit(lambda c: pk.slab_accel_aux(
        c.astype(cd), force.phi_t[-1], force.phi_t[0],
        force.dphi_t[-1], force.dphi_t[0], force.nmaxx, force.nmaxy))
    Aux = jax.block_until_ready(auxf(coef))
    print(f"  accel aux   : {timeit(auxf, coef):7.3f} ms", flush=True)

    outs = {}
    # Precision.HIGH is not lowered by Mosaic on TPU — the 3-pass slot
    # is the hand-rolled bf16x3 compensation (the production default)
    for name, prec in (("HIGHEST", jax.lax.Precision.HIGHEST),
                       ("bf16x3", "bf16x3"),
                       ("DEFAULT", jax.lax.Precision.DEFAULT)):
        akv = pk.make_slab_accel_kernel(
            force.nmaxx, force.nmaxy, force.nzc, force.zmax,
            interp=force.pallas_interp, zprec=prec)
        akj = jax.jit(akv)
        o = jax.block_until_ready(akj(xyzm, Ct, Aux))
        outs[name] = np.asarray(o[:4])
        print(f"  accel kernel zprec={name:8s}: {timeit(akj, xyzm, Ct, Aux):7.3f} ms",
              flush=True)
    ref = outs["HIGHEST"]
    asc = np.abs(ref[:3]).max()
    for name in ("bf16x3", "DEFAULT"):
        d = np.abs(outs[name][:3] - ref[:3]).max() / asc
        print(f"  accel rel err {name:8s} vs HIGHEST: {d:.2e}", flush=True)


if __name__ == "__main__":
    main()
