"""CLI runner: `python -m exp_tpu.run config.yml` (the `exp` executable).

Equivalent of the reference's `mpirun exp config.yml` entry point
(src/expand.cc:169-188) — parses the YAML config, builds the simulation,
echoes the parsed parameters to config.<runtag>.yml, runs nsteps.
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="exp_tpu.run",
        description="TPU-native BFE N-body run from a YAML config")
    ap.add_argument("config", help="YAML run configuration")
    ap.add_argument("-n", "--nsteps", type=int, default=None,
                    help="override Global.nsteps")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU backend (virtual device mesh)")
    ap.add_argument("--ndev", type=int, default=None,
                    help="with --cpu: number of virtual devices")
    ap.add_argument("--wall", type=float, default=None,
                    help="wall-clock budget in seconds (checkpoint + stop)")
    ap.add_argument("--restart-cmd", default=None,
                    help="command launched after a wall-clock stop")
    ap.add_argument("--distributed", action="store_true",
                    help="join a multi-process world via "
                         "jax.distributed.initialize (the mpirun exp "
                         "analogue, expand.cc:184-187).  Topology from "
                         "TPU/SLURM autodetection or EXP_COORDINATOR / "
                         "EXP_NPROCS / EXP_PROCID; body reads become "
                         "process-sharded, output process-0-gated")
    ap.add_argument("-v", "--version", action="version",
                    version=_version_string())
    args = ap.parse_args(argv)

    if args.cpu:
        nd = args.ndev or 1
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={nd}")
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.distributed:
        from exp_tpu.parallel.distributed import init_distributed

        init_distributed()

    from exp_tpu.nbody.simulation import Simulation
    from exp_tpu.nbody.output import restore_checkpoint

    sim = Simulation.from_file(args.config)
    g = sim.config.glob
    # process niceness / address-space limit (reference NICE + rlimit,
    # parse.cc:100-102, expand.cc:132-142)
    if getattr(g, "NICE", 0) > 0:
        try:
            os.nice(g.NICE)
        except OSError as e:
            print(f"[exp_tpu] NICE={g.NICE} failed: {e}")
    if getattr(g, "rlimit", 0):
        import resource

        lim = (resource.RLIM_INFINITY if g.rlimit < 0
               else int(g.rlimit) * 1024 ** 3)
        try:
            resource.setrlimit(resource.RLIMIT_AS, (lim, lim))
        except (ValueError, OSError) as e:
            print(f"[exp_tpu] rlimit={g.rlimit} failed: {e}")
    if sim.is_primary:      # parameter echo writes on process 0 only
        sim.config.dump(os.path.join(sim.outdir,
                                     f"config.{sim.runtag}.yml"))
    # CLI overrides take precedence over the Global runtime/restart_cmd keys
    if args.wall is not None:
        sim.wall_limit = args.wall
    if args.restart_cmd is not None:
        sim.restart_cmd = args.restart_cmd
    sim.install_signal_handlers()

    if sim.config.glob.infile:
        # checkpoints are written to outdir; accept a workdir-relative
        # path too (absolute paths pass through os.path.join unchanged)
        chk = os.path.join(sim.outdir, sim.config.glob.infile)
        if not os.path.exists(chk):
            alt = os.path.join(sim.workdir, sim.config.glob.infile)
            chk = alt if os.path.exists(alt) else chk
        if not os.path.exists(chk):
            raise FileNotFoundError(
                f"infile restart checkpoint not found: {chk} — refusing "
                f"to silently start a fresh run over the old outputs")
        as_new = bool(getattr(g, "restart_as_new", False))
        print(f"[exp_tpu] restoring from {chk}"
              + (" (restart_as_new: t=0, fresh outputs)" if as_new else ""))
        restore_checkpoint(sim, chk, as_new=as_new)

    t0 = time.time()
    sim.prime()
    print(f"[exp_tpu] primed in {time.time()-t0:.1f}s; "
          f"{sum(c.ps.n for c in sim.components.values())} particles, "
          f"{sim.n_shards} shard(s)")

    t0 = time.time()
    sim.run(args.nsteps)
    dtw = time.time() - t0
    n = sum(c.ps.n for c in sim.components.values())
    nst = sim.nsteps if args.nsteps is None else args.nsteps
    print(f"[exp_tpu] {nst} steps in {dtw:.2f}s "
          f"({n*nst/max(dtw,1e-9):.3g} particle-steps/s)")


def _version_string():
    from exp_tpu import __version__
    return f"exp_tpu {__version__}"


if __name__ == "__main__":
    main()
