"""Multi-process (multi-host) execution — the DCN half of the reference's
MPI mapping (SURVEY §2.8: "ICI within pod, DCN across slices via standard
jax multi-host").

The reference runs ONE binary over arbitrary MPI ranks (src/expand.cc:184-187
MPI_Init; particle distribution Component.H:202-204; rank-0-gated output).
The jax equivalent is one Python process per host, joined through
`jax.distributed.initialize`: every process runs the SAME program, jit
operates on global arrays spanning all processes' devices, and collectives
(the coefficient psum) ride whatever fabric connects them (ICI in-slice,
DCN across slices, gloo on CPU test meshes).

Process-sharded ingest: each process reads ONLY its contiguous row block of
the body file (the analogue of read_bodies_and_distribute_*'s MPI scatter)
and assembles a global jax.Array with
`jax.make_array_from_process_local_data`.  Output is process-0-gated;
full-phase-space writers gather the sharded state first (allgather_ps).

Tested with N processes x K virtual CPU devices each (gloo collectives) in
tests/test_distributed.py; the same entry points are the TPU multi-slice
path (jax autodetects the coordinator from the TPU environment).
"""

from __future__ import annotations

import os

import numpy as np

from exp_tpu.nbody.particles import ParticleSystem


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None):
    """Join the multi-process world (expand.cc:184-187 MPI_Init analogue).

    All arguments default to autodetection: on TPU pods/SLURM jax discovers
    the topology itself; otherwise the EXP_COORDINATOR / EXP_NPROCS /
    EXP_PROCID environment variables are used.  On the CPU backend the
    cross-process collective implementation is set to gloo first (required
    before the backend client is created).
    """
    import jax

    coordinator = coordinator or os.environ.get("EXP_COORDINATOR")
    if num_processes is None and os.environ.get("EXP_NPROCS"):
        num_processes = int(os.environ["EXP_NPROCS"])
    if process_id is None and os.environ.get("EXP_PROCID"):
        process_id = int(os.environ["EXP_PROCID"])
    try:
        # must happen before the CPU client exists; harmless elsewhere
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    """True on the output-writing process (reference myid==0 gating)."""
    import jax

    return jax.process_index() == 0


def row_block(n_global: int, mesh) -> tuple[int, int]:
    """Contiguous [lo, hi) global row range whose shards live on THIS
    process's devices, for a 1-D particle sharding over `mesh`.

    jax orders `jax.devices()` by process index, so a block-sharded axis
    gives each process one contiguous row range; this is asserted rather
    than assumed (a permuted mesh would silently scramble particles).
    """
    import jax
    from exp_tpu.parallel import particle_sharding

    sh = particle_sharding(mesh, ndim=1)
    imap = sh.addressable_devices_indices_map((n_global,))
    spans = sorted((idx[0].start or 0,
                    n_global if idx[0].stop is None else idx[0].stop)
                   for idx in imap.values())
    lo, hi = spans[0][0], spans[-1][1]
    covered = sum(b - a for a, b in spans)
    if covered != hi - lo:
        raise AssertionError(
            f"process {jax.process_index()}: non-contiguous device row "
            f"spans {spans} — mesh device order does not block by process")
    return lo, hi


def ps_from_local(x, v, mass, mesh, n_global: int, lo: int, scale=None,
                  dtype=None, indx=None) -> ParticleSystem:
    """Global sharded ParticleSystem from THIS process's row block.

    `x, v, mass` (and optional `indx`) are host arrays for global rows
    [lo, lo+len). `n_global` must already be a multiple of the global
    device count (pad with zero-mass rows first: pad_global_count).
    Identities default to the 1-based global row number.
    """
    import jax
    import jax.numpy as jnp
    from exp_tpu.parallel import particle_sharding

    if dtype is None:
        dtype = jnp.float32
    x = np.asarray(x, np.float64)
    v = np.asarray(v, np.float64)
    mass = np.asarray(mass, np.float64)
    n_loc = x.shape[0]
    ix = (np.arange(lo + 1, lo + n_loc + 1, dtype=np.int32)
          if indx is None else np.asarray(indx, np.int32))
    # padding rows carry indx 0 (the repo-wide dead-row convention)
    ix = np.where(mass > 0, ix, 0).astype(np.int32)

    def put(a, ndim):
        sh = particle_sharding(mesh, ndim=ndim)
        return jax.make_array_from_process_local_data(
            sh, np.ascontiguousarray(a),
            (n_global,) + a.shape[1:])

    z3 = np.zeros((n_loc, 3))
    z1 = np.zeros(n_loc)
    sc = (np.full(n_loc, -1.0) if scale is None
          else np.asarray(scale, np.float64))
    return ParticleSystem(
        x=put(x.astype(np.dtype(dtype)), 2),
        v=put(v.astype(np.dtype(dtype)), 2),
        mass=put(mass.astype(np.dtype(dtype)), 1),
        acc=put(z3.astype(np.dtype(dtype)), 2),
        pot=put(z1.astype(np.dtype(dtype)), 1),
        level=put(np.zeros(n_loc, np.int32), 1),
        indx=put(ix, 1),
        scale=put(sc.astype(np.dtype(dtype)), 1))


def pad_global_count(n: int, mesh) -> int:
    """Smallest multiple of the GLOBAL device count >= n."""
    k = int(mesh.devices.size)
    return ((n + k - 1) // k) * k


def read_bodies_distributed(path, mesh, dtype=None,
                            component: str | None = None,
                            scale_dattr: int | None = None
                            ) -> ParticleSystem:
    """Process-sharded body read: each process parses ONLY its contiguous
    row block (Component.H:202-204 read_bodies_and_distribute_ascii's MPI
    scatter, without the scatter — every process seeks to its own rows).

    ascii: the header gives N; this process parses its [lo, hi) lines only.
    PSP binary: each process reads the file but keeps only its row block
    (PSP rows are fixed-stride, a seeking reader can land here later).
    """
    from exp_tpu.nbody.particles import is_psp_file, read_ascii_arrays

    if is_psp_file(path):
        from exp_tpu.io.psp import read_psp

        dump = read_psp(path)
        if isinstance(dump, list):
            dump = dump[-1]
        comps = dump.components
        match = [c for c in comps if component is not None
                 and c.name == component]
        if match:
            c = match[0]
        elif len(comps) == 1:
            c = comps[0]
        else:
            raise ValueError(f"{path}: no component named {component!r}")
        xg, vg, mg, ixg = c.x, c.v, c.mass, c.indx
        sg = (c.dattr[:, scale_dattr]
              if scale_dattr is not None and c.dattr is not None else None)
        n = len(mg)
    else:
        with open(path) as f:
            hdr = f.readline().split()
            n, niattrib = int(hdr[0]), int(hdr[1])
        xg = vg = mg = ixg = sg = None

    n_global = pad_global_count(n, mesh)
    lo, hi = row_block(n_global, mesh)
    lo_live, hi_live = min(lo, n), min(hi, n)

    if xg is None:
        # parse only this block's lines
        if hi_live > lo_live:
            try:
                from exp_tpu import native

                data = native.read_ascii_table(
                    path, max_rows=hi_live - lo_live, ncols=7,
                    skip_lines=1 + lo_live)
            except RuntimeError:
                with open(path) as f:
                    f.readline()
                    for _ in range(lo_live):
                        f.readline()
                    data = np.loadtxt(f, max_rows=hi_live - lo_live)
            if data.ndim == 1:
                data = data[None]
            xl, vl, ml = data[:, 1:4], data[:, 4:7], data[:, 0]
            if scale_dattr is not None:
                with open(path) as f:
                    for _ in range(1 + lo_live):
                        f.readline()
                    sl = np.atleast_1d(np.loadtxt(
                        f, max_rows=hi_live - lo_live,
                        usecols=(7 + niattrib + scale_dattr,)))
            else:
                sl = None
        else:
            xl = np.zeros((0, 3)); vl = np.zeros((0, 3)); ml = np.zeros(0)
            sl = np.zeros(0) if scale_dattr is not None else None
        ixl = None
    else:
        xl, vl, ml = xg[lo_live:hi_live], vg[lo_live:hi_live], \
            mg[lo_live:hi_live]
        ixl = (None if ixg is None
               else np.asarray(ixg[lo_live:hi_live], np.int64))
        sl = None if sg is None else sg[lo_live:hi_live]

    npad = (hi - lo) - (hi_live - lo_live)
    if npad:
        xl = np.concatenate([xl, np.zeros((npad, 3))])
        vl = np.concatenate([vl, np.zeros((npad, 3))])
        ml = np.concatenate([ml, np.zeros(npad)])
        if ixl is not None:
            ixl = np.concatenate([ixl, np.zeros(npad, np.int64)])
        if sl is not None:
            sl = np.concatenate([sl, np.full(npad, -1.0)])
    return ps_from_local(xl, vl, ml, mesh, n_global, lo, dtype=dtype,
                         indx=ixl, scale=sl)


def put_global(a, mesh, axis: str = "p"):
    """Shard a host array (identical on every process) over `mesh`'s
    particle axis in a multi-process world: each process contributes its
    own contiguous row block via jax.make_array_from_process_local_data
    (device_put cannot target non-addressable devices).  Single-process
    falls back to a plain sharded device_put."""
    import jax
    from exp_tpu.parallel import particle_sharding

    a = np.asarray(a)
    sh = particle_sharding(mesh, ndim=a.ndim)
    if jax.process_count() == 1:
        return jax.device_put(a, sh)
    lo, hi = row_block(a.shape[0], mesh)
    return jax.make_array_from_process_local_data(
        sh, np.ascontiguousarray(a[lo:hi]), a.shape)


def shared_cache_build(path, build_fn, timeout: float = 900.0):
    """Build-once coordination for basis cache files in a multi-process
    world (the reference builds SL/EOF tables on subsets of ranks and
    broadcasts, SLGridMP2.cc:280-382; here the primary process builds the
    HDF5 cache and the others wait for it — the 'broadcast' is the shared
    filesystem read).

    `build_fn(tmp_path)` must write the cache to tmp_path; the rename to
    `path` is atomic, so waiters never observe a half-written file.
    Returns once `path` exists.  Single-process: build directly."""
    import time

    import jax

    if jax.process_count() == 1 or jax.process_index() == 0:
        tmp = f"{path}.tmp.{os.getpid()}"
        build_fn(tmp)
        os.replace(tmp, path)
        return
    t0 = time.time()
    while not os.path.exists(path):
        if time.time() - t0 > timeout:
            raise TimeoutError(
                f"process {jax.process_index()}: cache {path} not "
                f"produced by the primary process within {timeout:.0f}s")
        time.sleep(0.25)


def await_primary_cache(path, timeout: float = 900.0) -> bool:
    """Cache-build coordination for builders that write their own cache
    file: returns False when THIS process should build (primary process,
    or single-process world, or no cache path); otherwise blocks until
    the primary's atomic cache rename lands and returns True (caller then
    reads the cache instead of building)."""
    import time

    import jax

    if path is None or jax.process_count() == 1 or jax.process_index() == 0:
        return False
    t0 = time.time()
    while not os.path.exists(path):
        if time.time() - t0 > timeout:
            raise TimeoutError(
                f"process {jax.process_index()}: cache {path} not "
                f"produced by the primary process within {timeout:.0f}s")
        time.sleep(0.25)
    return True


def allgather_ps(ps: ParticleSystem) -> ParticleSystem:
    """Gather a (possibly multi-process) sharded ParticleSystem to host
    NumPy arrays, identically on every process — the pre-write gather for
    full-phase-space output (the reference's OutPSN rank gather /
    OutPSP MPI-IO aggregation, OutCHKPT.H:17-20)."""
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return ParticleSystem(
            **{k: np.asarray(getattr(ps, k)) for k in
               ("x", "v", "mass", "acc", "pot", "level", "indx", "scale")})
    out = multihost_utils.process_allgather(ps, tiled=True)
    return ParticleSystem(
        **{k: np.asarray(getattr(out, k)) for k in
           ("x", "v", "mass", "acc", "pot", "level", "indx", "scale")})
