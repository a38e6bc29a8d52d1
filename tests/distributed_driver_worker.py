"""Multi-process FULL-DRIVER worker for tests/test_distributed.py — NOT a
test module.

Unlike distributed_worker.py (which drives the raw KDK step), this worker
runs the real YAML driver end-to-end through `exp_tpu.run.main` with
`--distributed` — config parse, process-sharded ingest, multistep bigsteps,
relevel, and the full output-writer set — the analogue of the reference's
CI running the whole `exp` binary under mpirun (tests/CMakeLists.txt:57-66).
"""

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


def main():
    from exp_tpu.run import main as run_main

    cfg = os.environ["WORKER_CONFIG"]
    os.chdir(os.path.dirname(cfg))
    run_main([cfg, "--distributed"])
    print(f"[driver-worker] process {jax.process_index()} done")


if __name__ == "__main__":
    main()
