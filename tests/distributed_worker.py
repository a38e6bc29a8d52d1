"""Multi-process worker for tests/test_distributed.py — NOT a test module.

Launched N times (one OS process per simulated host) with
EXP_COORDINATOR/EXP_NPROCS/EXP_PROCID set; each process exposes
WORKER_NDEV virtual CPU devices, joins the jax.distributed world, reads
its block of the shared bodyfile, runs WORKER_NSTEPS sharded KDK steps
over the GLOBAL mesh, and process 0 writes the coefficient trajectory +
gathered final state for the equality check against a single-process run.
"""

import json
import os
import sys

ndev = int(os.environ.get("WORKER_NDEV", 4))
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from exp_tpu.parallel.distributed import (
        init_distributed, read_bodies_distributed, allgather_ps, is_primary)
    from exp_tpu.parallel import particle_mesh
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.basis.slgrid import build_sph_sl_tables
    from exp_tpu.forces.spherical import SphereSL
    from exp_tpu.nbody.step import make_kdk_step, init_force_state

    pid, nproc = init_distributed()
    assert len(jax.local_devices()) == ndev
    mesh = particle_mesh()          # ALL global devices
    assert mesh.devices.size == ndev * nproc

    bodyfile = os.environ["WORKER_BODYFILE"]
    outfile = os.environ["WORKER_OUT"]
    nsteps = int(os.environ.get("WORKER_NSTEPS", 5))

    m = hernquist_model(rmin=1e-3, rmax=20.0)
    # ONE shared cache path: the primary builds it (atomic publish), the
    # other processes wait for it then read — the multi-process cache
    # coordination in basis/slgrid.py + parallel/distributed.py
    t = build_sph_sl_tables(
        m, lmax=2, nmax=6, numr=400, cmap=1, rmap=1.0,
        cachename=os.path.join(os.path.dirname(outfile), "sltab.h5"))
    force = SphereSL.from_tables(t, dtype=jnp.float64)

    ps = read_bodies_distributed(bodyfile, mesh, dtype=jnp.float64)
    ps, coef0, _ = init_force_state(force, ps, mesh=mesh,
                                    accum_dtype=jnp.float64)
    step = make_kdk_step(force, 1e-3, mesh=mesh, accum_dtype=jnp.float64)
    coefs = [np.asarray(coef0)]
    for _ in range(nsteps):
        ps, coef, diag = step(ps)
        coefs.append(np.asarray(coef))
    final = allgather_ps(ps)
    if is_primary():
        np.savez(outfile, coefs=np.stack(coefs), x=final.x, v=final.v,
                 mass=final.mass, indx=final.indx,
                 ke=float(np.asarray(diag["KE"])),
                 pe=float(np.asarray(diag["PE"])))
        print(json.dumps({"ok": True, "nproc": nproc,
                          "ndev_global": int(mesh.devices.size)}))


if __name__ == "__main__":
    main()
