"""Device-mesh and SPMD helpers — the distribution layer.

The TPU-native replacement for the reference's MPI machinery (SURVEY
§2.7/§2.8): one mesh axis ("p") over which particle arrays are sharded;
coefficients and diagnostics are psum-replicated.  Collectives used by the
framework: `psum` (coefficient reduction — MPI_Allreduce,
SphericalBasis.cc:871-896), `ppermute` (direct-force ring, Direct.H:7-9).

These helpers are the canonical home for mesh construction; nbody.step
re-exports `shard_map` for its own use.
"""

from __future__ import annotations

import numpy as np
import jax

from exp_tpu.nbody.step import shard_map, _ps_specs, _diag_specs  # noqa: F401


def particle_mesh(n_devices: int | None = None, axis: str = "p",
                  devices=None):
    """1-D device mesh over the particle axis.

    `n_devices`: take the first n devices (default: all).  Multi-host runs
    get the process-local devices in jax's standard order, so the same call
    works under jax.distributed initialization.
    """
    from jax.sharding import Mesh

    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def particle_sharding(mesh, axis: str = "p", ndim: int = 2):
    """NamedSharding for an (N, ...) particle array sharded on `axis`."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(axis) if ndim == 1 else P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh):
    """NamedSharding for replicated (coefficient-sized) arrays."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P())


def pad_to_shards(n: int, mesh) -> int:
    """Smallest multiple of the shard count >= n."""
    k = int(mesh.devices.size)
    return ((n + k - 1) // k) * k
