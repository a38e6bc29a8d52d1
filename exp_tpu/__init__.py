"""exp_tpu — a TPU-native basis-function-expansion (BFE) N-body framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of EXP
(https://github.com/EXP-code/EXP): collisionless N-body dynamics where the
gravitational field is represented by a truncated biorthogonal basis-function
expansion.  Each step projects the particle distribution onto the basis
(one `psum`-reduced coefficient vector), then evaluates forces back from the
coefficients — O(N * n_basis), no tree, no mesh.

Design (TPU-first, not a port):
  * SoA particle arrays sharded over a `jax.sharding.Mesh` particle axis.
  * Bases are precomputed tables (host-built, NumPy/SciPy) evaluated on-device
    with gather + interpolation; the whole KDK step is one jitted function.
  * Coefficient reduction is `jax.lax.psum` over the particle mesh axis
    (the TPU-native replacement for the reference's MPI_Allreduce,
    cf. /root/reference/src/SphericalBasis.cc:871-896).
  * Units: G = 1 throughout (same as the reference).
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache (first TPU compile in a process has a
    large fixed cost; the cache removes it for every later process).  Opt out
    with EXP_TPU_NO_CACHE=1 or redirect with EXP_TPU_CACHE_DIR."""
    if _os.environ.get("EXP_TPU_NO_CACHE"):
        return
    import jax

    path = _os.environ.get(
        "EXP_TPU_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "exp_tpu_xla"))
    try:
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()


def _set_matmul_precision():
    """Default all matmuls to full f32 MXU passes.  TPU's default matmul
    precision is bf16 (~3 decimal digits) — fine for neural nets, wrong for
    force computations (coefficient sums would carry ~1e-3 relative error).
    Override with EXP_TPU_MATMUL_PRECISION=default|high|highest."""
    import jax

    prec = _os.environ.get("EXP_TPU_MATMUL_PRECISION", "highest")
    try:
        jax.config.update("jax_default_matmul_precision", prec)
    except Exception:
        pass


_set_matmul_precision()

from exp_tpu import ops, basis, forces, nbody, ic  # noqa: F401
