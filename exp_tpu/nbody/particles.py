"""SoA particle state (sharded device arrays) + body-file I/O.

The TPU-native replacement for the reference's AoS Particle + Component
particle storage (include/Particle.H:31-67, src/Component.cc): a pytree of
struct-of-arrays `jax.Array`s, sharded along the particle axis of a device
mesh.  Padding rows (mass == 0) are used to round N up to a multiple of the
shard count — they contribute nothing to coefficients or diagnostics.

Body-file format matches the reference ascii convention
(Component::read_bodies_and_distribute_ascii, src/Component.cc:1480-1520):
    line 1: <nbodies> <niattrib> <ndattrib>
    then  : mass x y z u v w [iattr...] [dattr...]
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass
class ParticleSystem:
    """Struct-of-arrays particle state.

    x, v, acc: (N, 3); mass, pot: (N,).  level: (N,) int32 multistep
    level; indx: (N,) int32 persistent 1-based particle identity (the
    reference's Particle::indx — stable across multistep rebucketing;
    0 marks zero-mass padding rows).  scale: (N,) per-particle internal
    size scale for the `dts` timestep criterion (Particle.H:60-61;
    <= 0 means ignore, the reference's default of -1).  N may include
    padding rows.
    """

    x: jax.Array
    v: jax.Array
    mass: jax.Array
    acc: jax.Array
    pot: jax.Array
    level: jax.Array
    indx: jax.Array
    scale: jax.Array

    @property
    def n(self) -> int:
        return self.x.shape[0]

    @classmethod
    def from_arrays(cls, x, v, mass, dtype=jnp.float32,
                    pad_to: int | None = None,
                    indx=None, scale=None) -> "ParticleSystem":
        x = np.asarray(x, dtype=np.float64)
        v = np.asarray(v, dtype=np.float64)
        mass = np.asarray(mass, dtype=np.float64)
        n = x.shape[0]
        ix = (np.arange(1, n + 1, dtype=np.int32) if indx is None
              else np.asarray(indx, dtype=np.int32))
        sc = (np.full(n, -1.0) if scale is None
              else np.asarray(scale, dtype=np.float64))
        if pad_to is not None and n % pad_to:
            npad = pad_to - n % pad_to
            x = np.concatenate([x, np.ones((npad, 3)) * 0.0])
            v = np.concatenate([v, np.zeros((npad, 3))])
            mass = np.concatenate([mass, np.zeros(npad)])
            ix = np.concatenate([ix, np.zeros(npad, np.int32)])
            sc = np.concatenate([sc, np.full(npad, -1.0)])
        m = x.shape[0]
        return cls(
            x=jnp.asarray(x, dtype=dtype),
            v=jnp.asarray(v, dtype=dtype),
            mass=jnp.asarray(mass, dtype=dtype),
            acc=jnp.zeros((m, 3), dtype=dtype),
            pot=jnp.zeros((m,), dtype=dtype),
            level=jnp.zeros((m,), dtype=jnp.int32),
            indx=jnp.asarray(ix),
            scale=jnp.asarray(sc, dtype=dtype),
        )

    def shard(self, mesh, axis: str = "p") -> "ParticleSystem":
        """Place particle arrays sharded along `axis` of `mesh`.

        Multi-process (jax.process_count() > 1): the host arrays must be
        identical on every process (e.g. a checkpoint each process read);
        each process contributes its contiguous row block of the global
        sharding (device_put cannot target non-addressable devices)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        if jax.process_count() > 1:
            from exp_tpu.parallel.distributed import put_global

            def put(a):
                return put_global(np.asarray(a), mesh, axis=axis)
        else:
            def put(a):
                spec = P(axis) if a.ndim == 1 else P(axis, None)
                return jax.device_put(a, NamedSharding(mesh, spec))

        return ParticleSystem(
            x=put(self.x), v=put(self.v), mass=put(self.mass),
            acc=put(self.acc), pot=put(self.pot), level=put(self.level),
            indx=put(self.indx), scale=put(self.scale),
        )


def read_ascii_arrays(path):
    """Host-side ascii body read: (x (n,3), v (n,3), mass (n,)) NumPy."""
    with open(path) as f:
        header = f.readline().split()
        n = int(header[0])
    try:
        # native strtod parser (exp_tpu/native); comparable to numpy 2's C
        # loadtxt on clean tables, tolerant of trailing attribute columns
        from exp_tpu import native

        data = native.read_ascii_table(path, max_rows=n, ncols=7,
                                       skip_lines=1)
        if len(data) != n:
            raise ValueError(f"{path}: expected {n} rows, parsed {len(data)}")
    except RuntimeError:
        with open(path) as f:
            f.readline()
            data = np.loadtxt(f, max_rows=n)
    if data.ndim == 1:
        data = data[None]
    return data[:, 1:4], data[:, 4:7], data[:, 0]


def read_ascii_dattr(path, k: int):
    """Host-side read of dattr column `k` (0-based) of an ascii bodyfile:
    columns are `mass x y z u v w [iattr...] [dattr...]` with the counts in
    the header (Component::read_bodies_and_distribute_ascii)."""
    with open(path) as f:
        header = f.readline().split()
        n, niattrib, ndattrib = (int(header[0]), int(header[1]),
                                 int(header[2]))
        if k < 0 or k >= ndattrib:
            raise ValueError(f"{path}: dattr index {k} out of range "
                             f"(ndattrib={ndattrib})")
        data = np.loadtxt(f, max_rows=n, usecols=(7 + niattrib + k,))
    return np.atleast_1d(data)


def read_ascii_bodies(path, dtype=jnp.float32, pad_to=None,
                      scale_dattr: int | None = None) -> ParticleSystem:
    x, v, mass = read_ascii_arrays(path)
    scale = (read_ascii_dattr(path, scale_dattr)
             if scale_dattr is not None else None)
    return ParticleSystem.from_arrays(x, v, mass, dtype=dtype, pad_to=pad_to,
                                      scale=scale)


def is_psp_file(path) -> bool:
    """Sniff the PSP binary magic: MasterHeader is 16 bytes (f64 time,
    i32 ntot, i32 ncomp) followed by the first component's cmagic
    0xadbfabc0|rsize (include/header.H; ParticleReader.H:338-340)."""
    from exp_tpu.io.psp import PSP_MAGIC, MMASK

    try:
        with open(path, "rb") as f:
            head = f.read(24)
        if len(head) < 24:
            return False
        cmagic = int(np.frombuffer(head, np.uint64, 1, 16)[0])
        return (cmagic & ~MMASK) == PSP_MAGIC
    except OSError:
        return False


def read_bodies(path, dtype=jnp.float32, pad_to=None,
                component: str | None = None,
                scale_dattr: int | None = None) -> ParticleSystem:
    """Read a body file, sniffing the format: reference ascii bodyfiles and
    PSP binary phase-space files both work (Component.H:202-204 reads
    ascii, PSP and split binary — this is the PSP ingestion path, enabling
    init/restart from reference-produced snapshots).

    `component`: for multi-component PSP files, select the named component
    (default: single component required).
    `scale_dattr`: 0-based dattr column holding the per-particle `scale`
    for the dts timestep criterion (Particle.H:60-61)."""
    if not is_psp_file(path):
        return read_ascii_bodies(path, dtype=dtype, pad_to=pad_to,
                                 scale_dattr=scale_dattr)

    from exp_tpu.io.psp import read_psp

    dump = read_psp(path)
    if isinstance(dump, list):              # OUT. multi-dump: use the last
        dump = dump[-1]
    comps = dump.components
    match = [c for c in comps if component is not None
             and c.name == component]
    if match:
        c = match[0]
    elif len(comps) == 1:
        c = comps[0]
    else:
        raise ValueError(
            f"{path}: {len(comps)} components "
            f"({[c.name for c in comps]}) and none named {component!r}")
    scale = (c.dattr[:, scale_dattr]
             if scale_dattr is not None and c.dattr is not None else None)
    return ParticleSystem.from_arrays(c.x, c.v, c.mass, dtype=dtype,
                                      pad_to=pad_to, indx=c.indx,
                                      scale=scale)


def write_ascii_bodies(path, ps_or_arrays, niattrib=0, ndattrib=0):
    if isinstance(ps_or_arrays, ParticleSystem):
        mass = np.asarray(ps_or_arrays.mass)
        live = mass > 0
        x = np.asarray(ps_or_arrays.x)[live]
        v = np.asarray(ps_or_arrays.v)[live]
        mass = mass[live]
    else:
        x, v, mass = ps_or_arrays
    table = np.column_stack([np.asarray(mass), np.asarray(x),
                             np.asarray(v)])
    with open(path, "w") as f:
        f.write(f"{len(mass)} {niattrib} {ndattrib}\n")
        np.savetxt(f, table, fmt="%.16e")
