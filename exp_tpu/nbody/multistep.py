"""Binary multistep (block-timestep) KDK integrator — TPU-native design.

Re-expresses the reference's multistep machinery (src/multistep.cc,
src/step.cc:98-269, coefficient tableau doc/multistep.doc) with static
shapes and no scatter:

* Levels 0..M; level l steps with dt_l = dtime/2^l; one big step =
  Mstep = 2^M fine substeps; level l is "active" (hits a step boundary) at
  substeps ms with ms % 2^(M-l) == 0 — the active set is always the suffix
  [mfirst(ms), M] (multistep.cc:630-679).

* Particles live in per-level BUCKETS padded to static capacities, so each
  substep compiles to work proportional to the ACTIVE buckets only — the
  TPU replacement for the reference's levlist + per-level thread fans
  (Component levlist, PotAccel::exp_thread_fork).  Buckets are re-packed on
  the host at big-step boundaries when levels change.

* Coefficient tableau: per-level registers (coefL, coefN).  When level l
  activates it drifts a full dt_l and its register pair advances
  (L <- N, N <- new); the full coefficient set at substep position mdrft is
  sum_l lerp(L_l, N_l, w_l) with w_l = ((ms mod 2^(M-l)) + 1)/2^(M-l) —
  linear interpolation identical to the reference's
  compute_multistep_coefficients (SphericalBasis.cc:1231-1330), but with
  STATIC weights because the substep loop is unrolled at trace time.

* Level assignment uses the reference's timestep criteria
  (multistep.cc:94-130: dtd/dtv/dta/dtA with dynfrac* factors,
  nlev = floor(log2(dtime/dtreq)), shiftlevl clamp) evaluated at big-step
  boundaries where all levels are synchronized — the reference's `NoSwitch`
  discipline (multistep.cc:146-155), which avoids the mid-step +/-
  coefficient patching (SphericalBasis.cc:1013-1228) entirely.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np
import jax
import jax.numpy as jnp

from exp_tpu.nbody.particles import ParticleSystem
from exp_tpu.nbody.step import shard_map, _diagnostics, _ps_specs, _diag_specs


def mintvl_table(M: int) -> list[int]:
    return [2 ** (M - l) for l in range(M + 1)]


def mfirst_of(ms: int, M: int) -> int:
    """Smallest active level at substep ms (multistep.cc mfirst)."""
    for l in range(M + 1):
        if ms % (2 ** (M - l)) == 0:
            return l
    return M


# ---------------------------------------------------------------------------
# Per-component feature spec (static; shared with the single-rate path)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class CompFeats:
    """Static per-component options the substep path must honor — the same
    set the single-rate `_system_step_body` applies (Component.H:136-163,
    src/step.cc:128-213): adiabatic mass ramp, rtrunc expansion cutoff,
    instantaneous-COM expansion frame, coefficient playback, and
    source-based (direct) forces."""

    adiabatic: bool = False
    ton: float = 0.0
    twid: float = 1.0
    rtrunc: float = 1.0e20
    com_system: bool = False
    needs_sources: bool = False

    def adb(self, t):
        """Adiabatic mass factor in [0, 1] (Component::Adiabatic)."""
        if not self.adiabatic:
            return 1.0
        return 0.5 * (1.0 + jnp.tanh((t - self.ton) / self.twid))


def _project(force, feat: CompFeats, x, mass, t, center, axis_name,
             accum_dtype, rot=None):
    """Coefficients of one component bucket with all features applied —
    the shared projection used by registers and the init prime."""
    xc = x - center[None, :]
    if rot is not None:
        xc = xc @ rot.T
    mw = mass * feat.adb(t)
    if feat.rtrunc < 1.0e19:    # Component.H:136: no contribution outside
        mw = mw * (jnp.sum(xc * xc, axis=-1)
                   < feat.rtrunc ** 2).astype(mw.dtype)
    return force.coefficients(xc, mw, axis_name=axis_name,
                              accum_dtype=accum_dtype)


def _project_tc(force, feat: CompFeats, x, mass, t, center, axis_name,
                accum_dtype):
    """Two-center projection: positions stay raw (the force subtracts its
    own centers internally), adiabatic ramp and the rtrunc cutoff about
    the resolved inner center — matching the single-rate path
    (simulation.py _system_step_body)."""
    mw = mass * feat.adb(t)
    if feat.rtrunc < 1.0e19:
        xr = x - center[None, :]
        mw = mw * (jnp.sum(xr * xr, axis=-1)
                   < feat.rtrunc ** 2).astype(mw.dtype)
    return force.coefficients(x, mw, axis_name=axis_name,
                              accum_dtype=accum_dtype)


def _accel_at(x, t, comp_couples, eff, tc, feats, coef_full, ctr, rots,
              state, externals, axis_name):
    """Acceleration/potential on positions `x` from the coupled
    components' coefficient sets (or sources), plus external fields —
    the shared assembly used by the substep closing kick and the init
    prime."""
    acc = jnp.zeros_like(x)
    pot = jnp.zeros((x.shape[0],), x.dtype)
    for a in comp_couples:
        if feats[a].needs_sources:
            aa, pp = eff[a].acceleration(_sources_of(state[a]), x,
                                         axis_name=axis_name)
        elif a in tc:
            aa, pp = eff[a].acceleration(
                _tmap(lambda v: v.astype(x.dtype), coef_full[a]), x)
        else:
            aa, pp = eff[a].acceleration(
                _tmap(lambda v: v.astype(x.dtype), coef_full[a]),
                (x - ctr[a][None, :]) @ rots[a].T)
            aa = aa @ rots[a]
        acc = acc + aa
        pot = pot + pp
    for ext in externals:
        aa, pp = ext.acceleration(x, t)
        acc = acc + aa
        pot = pot + pp
    return acc, pot


def _pseudo_accel(pa, x, v, center):
    """Per-particle fictitious acceleration of the non-inertial expansion
    frame (Component::getPseudoAccel, Component.cc:4407-4425): frame
    acceleration + Coriolis + Euler + centrifugal terms from the tracked
    center/axis history.  `pa` = traced (accel, omega, domdt) 3-vectors.
    Positions enter relative to the expansion center (the rotation axis
    passes through it); velocities are the current particle velocities."""
    acc3, om, dom = pa
    out = jnp.broadcast_to(acc3[None, :], x.shape)
    rel = x - center[None, :]
    out = out + (2.0 * jnp.cross(om[None, :], v)
                 + jnp.cross(dom[None, :], rel)
                 + jnp.cross(om[None, :], jnp.cross(om[None, :], rel)))
    return out


def _com_centers(state, feats, centers, axis_name):
    """Effective expansion center per component: instantaneous COM over all
    buckets for `com: true` components, else the prescribed center."""
    ctr = {}
    for n, bs in state.items():
        if feats[n].com_system:
            msum = sum(jnp.sum(b.mass) for b in bs)
            xsum = sum(jnp.sum(b.mass[:, None] * b.x, axis=0) for b in bs)
            tot = jax.lax.psum(jnp.concatenate([xsum, msum[None]]), axis_name)
            ctr[n] = tot[:3] / tot[3]
        else:
            ctr[n] = centers[n]
    return ctr


def _eff_forces(forces, state, centers, axis_name):
    """Rebuild two-center (needs_centers) forces with traced centers:
    inner = the prescribed/tracked center, outer = the component's
    instantaneous COM over all buckets (TwoCenter.cc:106-155)."""
    eff = dict(forces)
    tc = set()
    for n, f in forces.items():
        if getattr(f, "needs_centers", False):
            tc.add(n)
            bs = state[n]
            msum = sum(jnp.sum(b.mass) for b in bs)
            xsum = sum(jnp.sum(b.mass[:, None] * b.x, axis=0) for b in bs)
            tot = jax.lax.psum(jnp.concatenate([xsum, msum[None]]),
                               axis_name)
            eff[n] = f.with_centers(centers[n].astype(bs[0].x.dtype),
                                    tot[:3] / tot[3])
    return eff, tc


def _tmap(fn, *trees):
    return jax.tree_util.tree_map(fn, *trees)


def _sources_of(bs):
    """Concatenate a component's buckets into (x, mass) source arrays for
    `needs_sources` (direct) forces; inactive buckets contribute their
    frozen positions, exactly as the reference's per-level force pass."""
    return (jnp.concatenate([b.x for b in bs]),
            jnp.concatenate([b.mass for b in bs]))


# ---------------------------------------------------------------------------
# Timestep criteria / level selection (host-callable, jitted)
# ---------------------------------------------------------------------------

def dtreq_fn(ps: ParticleSystem, dynfracV=0.01, dynfracA=0.03, dynfracP=0.05,
             dynfracD=1.0e32, dynfracS=1.0):
    """Per-particle requested timestep (multistep.cc:94-130).

    dts = dynfracS * scale / |v| uses the per-particle internal size
    scale (Particle.H:60-61); scale <= 0 disables the criterion for that
    particle (multistep.cc:110-112)."""
    eps = 1.0e-10
    vtot = jnp.sum(ps.v * ps.v, axis=-1)
    atot = jnp.sum(ps.acc * ps.acc, axis=-1)
    dtr = jnp.abs(jnp.sum(ps.v * ps.acc, axis=-1))
    ptot = jnp.abs(ps.pot)

    dtd = dynfracD / jnp.sqrt(vtot + eps)
    dtv = dynfracV * jnp.sqrt(vtot / (atot + eps))
    dta = dynfracA * ptot / (dtr + eps)
    dtA = dynfracP * jnp.sqrt(ptot / (atot + eps))
    dts = jnp.where(ps.scale > 0,
                    dynfracS * ps.scale / (jnp.sqrt(vtot) + eps),
                    1.0 / eps)

    dt = jnp.minimum(jnp.minimum(jnp.minimum(dtd, dtv),
                                 jnp.minimum(dta, dtA)), dts)
    return jnp.maximum(dt, eps)


def assign_levels(dtreq, level, dtime: float, M: int, shiftlevl: int = 0):
    """dtreq -> level, with optional max-shift clamp (multistep.cc:169-190)."""
    nlev = jnp.where(
        dtreq > dtime, 0,
        jnp.floor(jnp.log2(jnp.maximum(dtime / dtreq, 1.0))).astype(jnp.int32))
    nlev = jnp.clip(nlev, 0, M)
    if shiftlevl:
        lo = level - shiftlevl
        hi = level + shiftlevl
        nlev = jnp.clip(nlev, lo, hi)
        nlev = jnp.clip(nlev, 0, M)
    return nlev.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Bucketed state
# ---------------------------------------------------------------------------

@dataclass
class LevelBuckets:
    """Per-level padded particle buckets for one component (host container)."""

    buckets: list[ParticleSystem]       # length M+1, bucket l padded to caps[l]
    caps: tuple[int, ...]

    @property
    def n_live(self):
        return sum(int((np.asarray(b.mass) > 0).sum()) for b in self.buckets)


def _pad_cap(n: int, quantum: int, headroom: int = 1) -> int:
    """Capacity: round up to the quantum (mesh shards), sticky growth;
    every overflow means recompiling all substep graphs for the new
    capacity signature, so capacities carry slack.

    headroom <= 1: next power of two (the legacy policy — up to 2x
    hidden slack from the rounding alone).

    headroom >= 2: (1 + 0.15 headroom) multiplicative slack rounded up
    on a pow2/8 grid.  The old policy multiplied the POW2 by headroom —
    at the 10.5M composite that padded 10.5M live particles to 21.2M
    bucket rows, and every per-particle pass (substeps AND the relevel
    sort) pays linearly for padding: measured per big step (probe,
    v5e) 767 -> 528 ms — substeps 349 -> 272 ms, relevel 408 -> 256 ms
    — from this change alone.  The pow2/8 grid keeps the signature
    sticky under sqrt-N population noise; equilibrium DiskHalo ICs
    drift well under one grid step."""
    n = max(n, 1)
    headroom = max(1, int(headroom))
    if headroom <= 1:
        c = ((n + quantum - 1) // quantum) * quantum
        p = quantum
        while p < c:
            p *= 2
        return p
    target = int(np.ceil(n * (1.0 + 0.15 * headroom)))
    p = 1
    while p < target:
        p *= 2
    # grid step must stay a multiple of the shard quantum or the
    # resulting capacity won't divide across a non-pow2 device mesh
    step = max(p // 8, quantum)
    step = ((step + quantum - 1) // quantum) * quantum
    return ((target + step - 1) // step) * step


def bucketize(ps: ParticleSystem, M: int, quantum: int,
              caps: tuple[int, ...] | None = None,
              mesh=None, headroom: int = 1) -> LevelBuckets:
    """Split a flat ParticleSystem into per-level padded buckets (host)."""
    import jax as _jax

    if _jax.process_count() > 1 and not isinstance(ps.x, np.ndarray):
        # multi-process: the flat system's shards span processes; gather
        # it (collective — every process calls bucketize with the same
        # state) so each process builds identical host buckets, which
        # b.shard(mesh) below re-shards by process row block
        from exp_tpu.parallel.distributed import allgather_ps

        ps = allgather_ps(ps)
    level = np.asarray(ps.level)
    mass = np.asarray(ps.mass)
    live = mass > 0
    x = np.asarray(ps.x); v = np.asarray(ps.v)
    acc = np.asarray(ps.acc); pot = np.asarray(ps.pot)
    indx = np.asarray(ps.indx); scale = np.asarray(ps.scale)

    new_caps = []
    buckets = []
    for l in range(M + 1):
        sel = live & (level == l)
        n = int(sel.sum())
        cap = _pad_cap(n, quantum, headroom)
        if caps is not None and caps[l] >= cap:
            cap = caps[l]
        new_caps.append(cap)
        xb = np.zeros((cap, 3)); vb = np.zeros((cap, 3))
        ab = np.zeros((cap, 3)); pb = np.zeros(cap); mb = np.zeros(cap)
        ib = np.zeros(cap, np.int32); sb = np.full(cap, -1.0)
        xb[:n] = x[sel]; vb[:n] = v[sel]; ab[:n] = acc[sel]; pb[:n] = pot[sel]
        mb[:n] = mass[sel]; ib[:n] = indx[sel]; sb[:n] = scale[sel]
        b = ParticleSystem(
            x=jnp.asarray(xb, ps.x.dtype), v=jnp.asarray(vb, ps.v.dtype),
            mass=jnp.asarray(mb, ps.mass.dtype),
            acc=jnp.asarray(ab, ps.acc.dtype),
            pot=jnp.asarray(pb, ps.pot.dtype),
            level=jnp.full(cap, l, jnp.int32),
            indx=jnp.asarray(ib),
            scale=jnp.asarray(sb, ps.scale.dtype))
        if mesh is not None:
            b = b.shard(mesh)
        buckets.append(b)
    return LevelBuckets(buckets=buckets, caps=tuple(new_caps))


def flatten_buckets(lb: LevelBuckets) -> ParticleSystem:
    """Concatenate buckets back to a flat system (keeps padding rows)."""
    return ParticleSystem(
        x=jnp.concatenate([b.x for b in lb.buckets]),
        v=jnp.concatenate([b.v for b in lb.buckets]),
        mass=jnp.concatenate([b.mass for b in lb.buckets]),
        acc=jnp.concatenate([b.acc for b in lb.buckets]),
        pot=jnp.concatenate([b.pot for b in lb.buckets]),
        level=jnp.concatenate([b.level for b in lb.buckets]),
        indx=jnp.concatenate([b.indx for b in lb.buckets]),
        scale=jnp.concatenate([b.scale for b in lb.buckets]),
    )


# ---------------------------------------------------------------------------
# The jitted big step
# ---------------------------------------------------------------------------

def make_substep_fn(forces: dict, couples: dict, dtime: float, M: int,
                    ms: int, mesh, accum_dtype=jnp.float32,
                    axis_name: str = "p", externals=(), feats=None,
                    wrappers=(), extras_sig=((), (), ()), fuse_all=False,
                    eqmotion: bool = True):
    """One compiled SUBSTEP (fine step `ms` of the hierarchy) — or, with
    fuse_all=True, the whole 2^M-substep BIG step chained into one jit.

    Compiling substeps separately (the default) keeps each XLA graph
    small — the fully-unrolled 2^M-substep graph takes several times
    longer to compile for composite multi-force runs, and re-leveling
    (new bucket capacities) would recompile all of it.  The fused variant
    trades that one-time compile for 2^M-1 fewer dispatch round-trips per
    big step — a large win through a remote runtime (Global
    `fused_bigstep`, MultistepRunner(fused=True)); `extras` is then a
    tuple of per-substep extras (playback interpolated at each substep's
    drift time).

    `feats` maps component name -> CompFeats; `wrappers` are position
    wrappers (PeriodicBC); `extras_sig` = (playback names, hall names)
    fixes the traced extras pytree structure.  Traced inputs are
    (state, regs, t0, centers, extras) where `centers` are the prescribed
    (EJ / centerfile) expansion centers and `extras` carries playback
    coefficients interpolated at this substep's time plus Hall factors —
    the same per-component treatment as the single-rate step
    (src/step.cc:128-213 over levlist[M])."""
    from jax.sharding import PartitionSpec as P

    Mstep = 2 ** M
    mint = mintvl_table(M)
    names = list(forces)
    feats = feats or {n: CompFeats() for n in names}
    sig4 = tuple(extras_sig) + ((),) * (4 - len(extras_sig))
    pb_names, hall_names, rst_names, psd_names = sig4
    ms_list = tuple(range(Mstep)) if fuse_all else (ms,)

    def substep(state, regs, t0, centers, rots, extras):
        state = {n: list(bs) for n, bs in state.items()}
        regs = {n: [list(r[0]), list(r[1])] for n, r in regs.items()}
        dt = dtime / Mstep

        for ms_ in ms_list:
            ex = extras[ms_] if fuse_all else extras
            mfirst = mfirst_of(ms_, M)
            mdrft = ms_ + 1
            t_sub = t0 + dt * mdrft

            # -- opening half-kick + full drift for active levels ---------
            # (skipped entirely when eqmotion is off: incpos.cc:75,
            # incvel.cc:93 return early; field evaluation below still runs)
            if eqmotion:
                for n in names:
                    for l in range(mfirst, M + 1):
                        b = state[n][l]
                        DT = dt * mint[l]
                        v_half = b.v + b.acc * (0.5 * DT)
                        x_new = b.x + v_half * DT
                        for wrp in wrappers:
                            x_new = wrp.wrap(x_new)
                        state[n][l] = replace(b, v=v_half, x=x_new)

            # -- effective expansion centers (instantaneous COM or given) -
            ctr = _com_centers(state, feats, centers, axis_name)
            # two-center inner = the COM-RESOLVED center (single-rate path
            # overwrites centers[n] with the COM before the rebuild)
            eff, tc = _eff_forces(forces, state, ctr, axis_name)

            # -- recompute coefficient registers for active levels --------
            for n in names:
                if feats[n].needs_sources or n in pb_names:
                    continue                          # registers unused
                f = eff[n]
                for l in range(mfirst, M + 1):
                    b = state[n][l]
                    # level l just drifted DT_l = dt*mint[l]: its positions
                    # (and hence time-dependent features like the adiabatic
                    # ramp) correspond to the END of ITS step, not of this
                    # fine substep
                    t_lvl = t0 + dt * (ms_ + mint[l])
                    if n in tc:     # two-center: centers applied internally
                        cnew = _project_tc(f, feats[n], b.x, b.mass, t_lvl,
                                           ctr[n], axis_name, accum_dtype)
                    else:
                        cnew = _project(f, feats[n], b.x, b.mass, t_lvl,
                                        ctr[n], axis_name, accum_dtype,
                                        rot=rots[n])
                    regs[n][0][l] = regs[n][1][l]     # L <- N
                    regs[n][1][l] = cnew              # N <- new

            # -- assemble full coefficients at mdrft (static weights) -----
            coef_full = {}
            for n in names:
                if feats[n].needs_sources:
                    coef_full[n] = jnp.zeros((1,), state[n][0].x.dtype)
                    continue
                if n in pb_names:
                    tot = ex["playback"][n]
                else:
                    tot = None
                    for l in range(M + 1):
                        w = ((ms_ % mint[l]) + 1) / mint[l]
                        c = _tmap(lambda L, N: L * (1.0 - w) + N * w,
                                  regs[n][0][l], regs[n][1][l])
                        tot = c if tot is None else _tmap(jnp.add, tot, c)
                    if n in hall_names:
                        from exp_tpu.nbody.pca import apply_hall

                        tot = _tmap(lambda v: apply_hall(v, ex["hall"][n]),
                                    tot)
                if n in rst_names:
                    # harmonic restriction / FIX_L0 over the assembled set
                    # (SphericalBasis.cc:1568-1600, 1689-1694)
                    mk, off = ex["restrict"][n]
                    tot = tot * mk + off
                coef_full[n] = tot

            # -- closing half-kick for levels at their end boundary -------
            for n in names:
                for l in range(M + 1):
                    if mdrft % mint[l] != 0:
                        continue
                    b = state[n][l]
                    DT = dt * mint[l]
                    acc, pot = _accel_at(b.x, t_sub, couples[n], eff, tc,
                                         feats, coef_full, ctr, rots,
                                         state, externals, axis_name)
                    # non-inertial frame correction, ONCE per kick
                    # (Component.H:913-921 AddAcc; see _pseudo_accel)
                    if n in psd_names:
                        acc = acc - _pseudo_accel(ex["pseudo"][n], b.x,
                                                  b.v, ctr[n])
                    v_new = b.v + acc * (0.5 * DT) if eqmotion else b.v
                    state[n][l] = replace(b, v=v_new, acc=acc, pot=pot)

        out_state = {n: tuple(bs) for n, bs in state.items()}
        out_regs = {n: (tuple(r[0]), tuple(r[1])) for n, r in regs.items()}
        diag = {}
        for n in names:
            parts = [_diagnostics(b, axis_name=axis_name)
                     for b in state[n]]
            diag[n] = jax.tree_util.tree_map(
                lambda *xs: sum(xs), *parts)
        return out_state, out_regs, coef_full, diag

    state_specs = {n: tuple(_ps_specs(axis_name) for _ in range(M + 1))
                   for n in names}
    reg_specs = {n: (tuple(P() for _ in range(M + 1)),
                     tuple(P() for _ in range(M + 1))) for n in names}
    coef_specs = {n: P() for n in names}
    diag_specs = {n: _diag_specs() for n in names}
    center_specs = {n: P() for n in names}
    rot_specs = {n: P() for n in names}
    extras_specs = {"playback": {n: P() for n in pb_names},
                    "hall": {n: P() for n in hall_names},
                    "restrict": {n: (P(), P())
                                 for n in rst_names},
                    "pseudo": {n: (P(), P(), P()) for n in psd_names}}
    if fuse_all:
        extras_specs = tuple(extras_specs for _ in range(Mstep))

    return jax.jit(shard_map(
        substep, mesh,
        (state_specs, reg_specs, P(), center_specs, rot_specs,
         extras_specs),
        (state_specs, reg_specs, coef_specs, diag_specs)))


class MultistepRunner:
    """Host orchestration: big steps + boundary re-leveling/re-bucketing.

    Compiled big-step functions are cached per capacity signature, so
    recompiles only happen when a level population outgrows its padded
    bucket (sticky power-of-two capacities).
    """

    def __init__(self, forces: dict, couples: dict, dtime: float, M: int,
                 mesh, accum_dtype=jnp.float32, dynparams=None,
                 shiftlevl: int = 0, externals=(), feats=None, wrappers=(),
                 cap_headroom: int = 1, fused: bool = False,
                 eqmotion: bool = True, rebucket_style: str = "sortfull"):
        self.externals = tuple(externals)
        self.forces = forces
        self.couples = couples
        self.dtime = dtime
        self.M = M
        self.mesh = mesh
        self.accum_dtype = accum_dtype
        self.dyn = dynparams or {}
        self.shiftlevl = shiftlevl
        self.feats = feats or {n: CompFeats() for n in forces}
        self.wrappers = tuple(wrappers)
        self.quantum = int(mesh.devices.size)
        self.cap_headroom = int(cap_headroom)
        #: chain all 2^M substeps into ONE jit (fewer dispatch round-trips
        #: per big step at the cost of a longer one-time compile)
        self.fused = bool(fused)
        #: eqmotion: false freezes x/v (Global eqmotion, incpos.cc:75)
        self.eqmotion = bool(eqmotion)
        #: permutation engine: 'sortfull' (default; measured fastest at
        #: every size), 'sortgather' / 'incremental' opt-ins — see
        #: _make_rebucket / _make_relevel_incremental for the numbers
        self.rebucket_style = str(rebucket_style)
        self._fns = {}
        self._init_fns = {}
        self._assess_fns = {}
        self._rebucket_fns = {}
        self._relevel_fns = {}
        #: per-caps-signature bucket fill pointers (occupancy high-water
        #: marks) for the incremental relevel; live rows are contiguous
        #: (fill == live counts) only right after a compaction
        self._fill = {}
        self._dt_fn = jax.jit(lambda ps: dtreq_fn(ps, **self.dyn))
        # per-component (offlo, offhi) counts from the last relevel: live
        # particles requesting finer-than-finest / coarser-than-dtime steps
        # (reference multistep.cc:160-195, sanity stop :296-341)
        self.overrun: dict = {}

    def _caps_sig(self, state):
        return tuple((n, tuple(b.x.shape[0] for b in bs))
                     for n, bs in state.items())

    def _zero_centers(self):
        return {n: jnp.zeros(3) for n in self.forces}

    def _eye_rots(self):
        return {n: jnp.eye(3) for n in self.forces}

    @staticmethod
    def _default_extras(t):
        return {"playback": {}, "hall": {}, "restrict": {}, "pseudo": {}}

    @staticmethod
    def _extras_sig(extras):
        return (tuple(sorted(extras["playback"])),
                tuple(sorted(extras["hall"])),
                tuple(sorted(extras.get("restrict", {}))),
                tuple(sorted(extras.get("pseudo", {}))))

    def init_state(self, flat: dict[str, ParticleSystem], t0=0.0,
                   centers=None, extras_fn=None, rots=None):
        """Initial leveling + bucketing from flat per-component systems.

        Mirrors begin_run's multistep prime (begin.cc:86-127): evaluate
        forces at level 0, assign levels from the dt criteria, repeat.
        """
        centers = centers or self._zero_centers()
        rots = rots or self._eye_rots()
        extras = (extras_fn or self._default_extras)(t0)
        # fill pointers describe the PREVIOUS trajectory's bucket
        # occupancy: a fresh particle set can reuse a capacity signature,
        # and stale pointers would let the incremental relevel append
        # arrivals over live rows — silent particle loss
        self._fill = {}
        # first pass: everything at level 0 to get accelerations
        state = {n: bucketize(ps, self.M, self.quantum, mesh=self.mesh,
                              headroom=self.cap_headroom)
                 for n, ps in flat.items()}
        caps = {n: lb.caps for n, lb in state.items()}
        st = {n: tuple(lb.buckets) for n, lb in state.items()}
        st, regs, coef, diag = self._init(st, t0, centers, extras, rots)
        # assign levels from the primed accelerations, rebucket, re-prime
        flat2 = {n: flatten_buckets(LevelBuckets(list(bs), caps[n]))
                 for n, bs in st.items()}
        for n, ps in flat2.items():
            dtr = self._dt_fn(ps)
            # first assignment is UNclamped: shiftlevl limits step-to-step
            # level changes, and there is no meaningful previous level yet
            # (clamping to level 0 +- shiftlevl would start fast particles
            # on far-too-coarse steps)
            lev = assign_levels(dtr, ps.level, self.dtime, self.M, 0)
            flat2[n] = replace(ps, level=jnp.where(ps.mass > 0, lev, 0))
        state = {n: bucketize(ps, self.M, self.quantum, mesh=self.mesh,
                              headroom=self.cap_headroom)
                 for n, ps in flat2.items()}
        self.caps = {n: lb.caps for n, lb in state.items()}
        st = {n: tuple(lb.buckets) for n, lb in state.items()}
        st, regs, coef, diag = self._init(st, t0, centers, extras, rots)
        return st, regs, coef, diag

    def _init(self, st, t0=0.0, centers=None, extras=None, rots=None,
              prime_accel=True):
        centers = centers or self._zero_centers()
        rots = rots or self._eye_rots()
        extras = extras or self._default_extras(t0)
        sig = (self._caps_sig(st), self._extras_sig(extras), prime_accel)
        if sig not in self._init_fns:
            self._init_fns[sig] = init_regs_fn(
                self.forces, self.couples, self.M, self.mesh,
                accum_dtype=self.accum_dtype, feats=self.feats,
                externals=self.externals,
                extras_sig=self._extras_sig(extras),
                prime_accel=prime_accel)
        return self._init_fns[sig](st, jnp.float32(t0), centers, rots,
                                   extras)

    def bigstep(self, st, regs, t0=0.0, centers=None, extras_fn=None,
                rots=None):
        """One big step = host loop over 2^M separately-compiled substeps
        (small graphs; re-leveling recompiles only what changed).

        `extras_fn(t)` supplies playback coefficients interpolated at each
        substep's drift time (the reference interpolates playback per
        substep) and the current Hall factors."""
        centers = centers or self._zero_centers()
        rots = rots or self._eye_rots()
        extras_fn = extras_fn or self._default_extras
        sig = self._caps_sig(st)
        Mstep = 2 ** self.M
        dt = self.dtime / Mstep
        if self.fused:
            extras = tuple(extras_fn(t0 + dt * (ms + 1))
                           for ms in range(Mstep))
            esig = self._extras_sig(extras[0])
            key = (sig, "fused", esig)
            if key not in self._fns:
                self._fns[key] = make_substep_fn(
                    self.forces, self.couples, self.dtime, self.M, 0,
                    self.mesh, accum_dtype=self.accum_dtype,
                    externals=self.externals, feats=self.feats,
                    wrappers=self.wrappers, extras_sig=esig,
                    fuse_all=True, eqmotion=self.eqmotion)
            return self._fns[key](st, regs, jnp.float32(t0), centers,
                                  rots, extras)
        for ms in range(Mstep):
            extras = extras_fn(t0 + dt * (ms + 1))
            esig = self._extras_sig(extras)
            key = (sig, ms, esig)
            if key not in self._fns:
                self._fns[key] = make_substep_fn(
                    self.forces, self.couples, self.dtime, self.M, ms,
                    self.mesh, accum_dtype=self.accum_dtype,
                    externals=self.externals, feats=self.feats,
                    wrappers=self.wrappers, extras_sig=esig,
                    eqmotion=self.eqmotion)
            st, regs, coef, diag = self._fns[key](st, regs, jnp.float32(t0),
                                                  centers, rots, extras)
        return st, regs, coef, diag

    def _make_assess(self):
        """One jitted pass: flatten buckets, timestep criteria, level
        assignment, per-level live counts, number of LIVE rows that moved
        (padding rows always report level 0 and must not count)."""
        M, dtime, shiftlevl, dyn = self.M, self.dtime, self.shiftlevl, \
            self.dyn

        def assess(st):
            flat, levs, counts, over = {}, {}, {}, {}
            nchanged = jnp.zeros((), jnp.int32)
            for n, bs in st.items():
                ps = flatten_buckets(LevelBuckets(list(bs), None))
                dtr = dtreq_fn(ps, **dyn)
                lev = assign_levels(dtr, ps.level, dtime, M, shiftlevl)
                live = ps.mass > 0
                lev = jnp.where(live, lev, 0)
                flat[n] = ps
                levs[n] = lev
                counts[n] = jnp.stack(
                    [jnp.sum((lev == l) & live) for l in range(M + 1)])
                nchanged = nchanged + jnp.sum((lev != ps.level) & live)
                # overrun diagnostics (multistep.cc:160-195): offlo = wants
                # finer than the finest level, offhi = wants coarser than
                # dtime.  Computed from the UNCLAMPED level request.
                nraw = jnp.where(
                    dtr > dtime, 0,
                    jnp.floor(jnp.log2(jnp.maximum(dtime / dtr, 1.0))
                              ).astype(jnp.int32))
                offlo = jnp.sum(live & (nraw > M))
                offhi = jnp.sum(live & (dtr > dtime))
                nlive = jnp.sum(live)
                over[n] = jnp.stack([offlo, offhi, nlive])
            return flat, levs, counts, nchanged, over

        return assess

    def _make_rebucket(self, caps):
        """Device-side rebucketing at FIXED capacities, then a contiguous
        `dynamic_slice` per bucket.  Two equivalent permutation engines:

        'sortfull' — ONE stable `lax.sort` carrying the 12 per-particle
        field columns as value operands (dead rows keyed last).  Sort
        networks move the payload in full vector lanes; measured at 1M
        particles on a v5e (assess+rebucket jit): sort+slice 28 ms vs
        106 ms for stable-argsort + PER-BUCKET PER-COLUMN gathers (22+
        scalar-column gathers whose index count scales with the PADDED
        capacities) and 278 ms for a counting-sort row scatter.

        'sortgather' — sort only (key, iota) and realize the permutation
        with ONE row-gather of the 12 float columns packed (Npad, 12)
        plus a 1-D indx gather.  MEASURED WORSE at scale and kept only
        as the equivalence cross-check: TPU gathers of sub-tile rows
        lower to per-ELEMENT loads (~4 ns each), so the 10.5M composite
        relevel went 408 -> 1005 ms — the bitonic network's full-vector
        payload lanes beat gather/scatter for whole-array permutations
        at every size probed (scripts/probe_relevel_cost.py; the r2 1M
        measurements said the same).  Bit-exact equivalent (tested)."""
        M = self.M
        style = self.rebucket_style

        def rebucket(flat, levs):
            st = {}
            for n, ps in flat.items():
                key = jnp.where(ps.mass > 0, levs[n], M + 1).astype(
                    jnp.int32)
                cols = [ps.x[:, 0], ps.x[:, 1], ps.x[:, 2],
                        ps.v[:, 0], ps.v[:, 1], ps.v[:, 2],
                        ps.acc[:, 0], ps.acc[:, 1], ps.acc[:, 2],
                        ps.mass, ps.pot, ps.scale, ps.indx]
                if style == "sortgather":
                    npad = key.shape[0]
                    iota = jax.lax.iota(jnp.int32, npad)
                    _, sidx = jax.lax.sort([key, iota], num_keys=1,
                                           is_stable=True)
                    # the 12 float columns share the compute dtype and
                    # ride ONE row-gather; indx keeps its integer dtype
                    # via its own 1-D gather (packing it into the float
                    # matrix would round the identity bits)
                    packed = jnp.stack(cols[:12], axis=1)
                    sp = jnp.take(packed, sidx, axis=0)
                    scols = [sp[:, j] for j in range(12)] + [
                        jnp.take(cols[12], sidx)]
                else:
                    sorted_ops = jax.lax.sort([key] + cols, num_keys=1,
                                              is_stable=True)
                    scols = sorted_ops[1:]
                # pad so a bucket's slice never runs off the end (starts
                # are clamped by dynamic_slice; the valid mask zeroes any
                # rows past the bucket's live count either way)
                scols = [jnp.concatenate(
                    [c, jnp.zeros(max(caps[n]), c.dtype)]) for c in scols]
                counts = jnp.stack([jnp.sum(key == l) for l in range(M + 1)])
                starts = jnp.concatenate(
                    [jnp.zeros(1, jnp.int32),
                     jnp.cumsum(counts).astype(jnp.int32)])
                bs = []
                for l in range(M + 1):
                    cap = caps[n][l]
                    valid = jnp.arange(cap) < counts[l]
                    # dtype-matched zero: a bare 0.0 promotes the i32
                    # indx column to weak f32, which (a) flips the
                    # substep jit signature every relevel (re-tracing
                    # all 2^M graphs each big step) and (b) corrupts
                    # particle identities above 2^24 at 10M+ particles
                    G = [jnp.where(valid,
                                   jax.lax.dynamic_slice_in_dim(
                                       c, starts[l], cap),
                                   jnp.zeros((), c.dtype))
                         for c in scols]
                    bs.append(ParticleSystem(
                        x=jnp.stack(G[0:3], axis=1),
                        v=jnp.stack(G[3:6], axis=1),
                        acc=jnp.stack(G[6:9], axis=1),
                        mass=G[9], pot=G[10],
                        level=jnp.full(cap, l, jnp.int32),
                        indx=G[12], scale=G[11]))
                st[n] = tuple(bs)
            return st

        return rebucket

    def _make_relevel_fused(self, caps, esig):
        """ONE jitted pass for the whole boundary relevel: assess +
        device-side rebucket at the current capacities + register rebuild
        (prime_accel=False).  Replaces the 3 dispatches + interleaved
        device_get of the split path — through a remote runtime those
        round-trips cost more than the relevel's compute (measured: ~300 ms
        -> the compute's ~80 ms at 1M)."""
        assess = self._make_assess()
        rebucket = self._make_rebucket(caps)
        init_sm = init_regs_sm(
            self.forces, self.couples, self.M, self.mesh,
            accum_dtype=self.accum_dtype, feats=self.feats,
            externals=self.externals, extras_sig=esig, prime_accel=False)

        def fused(st, t0, centers, rots, extras):
            flat, levs, counts, nchanged, over = assess(st)
            st2 = rebucket(flat, levs)
            st3, regs3, _, _ = init_sm(st2, t0, centers, rots, extras)
            return st3, regs3, counts, nchanged, over

        return jax.jit(fused)

    def _arrival_caps(self, caps):
        """Static arrival-buffer sizes for the incremental relevel,
        DERIVED from the bucket capacities (no new signature dimension):
        pow2(cap/32), floored at the shard quantum — ~10x the movement
        per relevel of an equilibrium composite."""
        out = {}
        for n, cs in caps.items():
            ks = []
            for cap in cs:
                k = max(self.quantum, 1)
                while k < max(cap // 32, 1):
                    k *= 2
                ks.append(min(k, cap))
            out[n] = tuple(ks)
        return out

    def _make_relevel_incremental(self, caps, esig):
        """Movers-only boundary relevel (the freelist alternative to the
        full-payload sort): the stable (key, iota) sort runs over the
        2-operand mover key alone, arrivals are realized with K-row
        gathers + one dynamic_update_slice append per destination
        bucket at its fill pointer, and leavers are killed IN PLACE by
        an elementwise mass mask (holes stay as zero-mass padding —
        every consumer already masks by mass > 0).  The full-sort path
        remains the compaction fallback: the host falls back whenever a
        destination's arrivals exceed its static buffer or a bucket's
        fill pointer would overflow, which also resets the fill
        pointers to the compacted live counts.

        MEASURED ~parity with the full sort (10.5M composite, v5e:
        bigstep+relevel ~500 vs 528 ms steady-state, and the occasional
        compaction gives the margin back) — the bitonic network's cost
        is dominated by its O(log^2 n) stage overhead, not by the
        payload operands, so shrinking the sort from 13 operands to 2
        saves little.  Kept as a tested opt-in; 'sortfull' stays the
        default."""
        assess = self._make_assess()
        init_sm = init_regs_sm(
            self.forces, self.couples, self.M, self.mesh,
            accum_dtype=self.accum_dtype, feats=self.feats,
            externals=self.externals, extras_sig=esig, prime_accel=False)
        M = self.M
        Ks = self._arrival_caps(caps)

        def fused(st, fill, t0, centers, rots, extras):
            flat, levs, counts, nchanged, over = assess(st)
            st2, arrivals = {}, {}
            for n, ps in flat.items():
                lev = levs[n]
                live = ps.mass > 0
                mover = live & (lev != ps.level)
                key2 = jnp.where(mover, lev, M + 2).astype(jnp.int32)
                iota = jax.lax.iota(jnp.int32, key2.shape[0])
                _, sidx = jax.lax.sort([key2, iota], num_keys=1,
                                       is_stable=True)
                a = jnp.stack([jnp.sum(mover & (lev == l))
                               for l in range(M + 1)]).astype(jnp.int32)
                starts = jnp.concatenate(
                    [jnp.zeros(1, jnp.int32), jnp.cumsum(a)])
                cols = [ps.x[:, 0], ps.x[:, 1], ps.x[:, 2],
                        ps.v[:, 0], ps.v[:, 1], ps.v[:, 2],
                        ps.acc[:, 0], ps.acc[:, 1], ps.acc[:, 2],
                        ps.mass, ps.pot, ps.scale, ps.indx]
                offs = np.concatenate(
                    [[0], np.cumsum([caps[n][l]
                                     for l in range(M + 1)])]).astype(int)
                bs = []
                for l in range(M + 1):
                    cap, K, off = caps[n][l], Ks[n][l], int(offs[l])
                    blev = jax.lax.slice_in_dim(lev, off, off + cap)
                    idx = jax.lax.dynamic_slice_in_dim(sidx, starts[l], K)
                    validK = jnp.arange(K) < a[l]
                    fptr = fill[n][l]
                    newcols = []
                    for j, c in enumerate(cols):
                        bc = jax.lax.slice_in_dim(c, off, off + cap)
                        if j == 9:
                            # kill leavers in place (dtype-matched zero)
                            bc = jnp.where(blev == l, bc,
                                           jnp.zeros((), bc.dtype))
                        g = jnp.where(validK, c[idx],
                                      jnp.zeros((), c.dtype))
                        newcols.append(
                            jax.lax.dynamic_update_slice_in_dim(
                                bc, g, fptr, 0))
                    bs.append(ParticleSystem(
                        x=jnp.stack(newcols[0:3], axis=1),
                        v=jnp.stack(newcols[3:6], axis=1),
                        acc=jnp.stack(newcols[6:9], axis=1),
                        mass=newcols[9], pot=newcols[10],
                        level=jnp.full(cap, l, jnp.int32),
                        indx=newcols[12], scale=newcols[11]))
                st2[n] = tuple(bs)
                arrivals[n] = a
            st3, regs3, _, _ = init_sm(st2, t0, centers, rots, extras)
            return st3, regs3, counts, nchanged, over, arrivals

        return jax.jit(fused)

    def relevel(self, st, regs, t0=0.0, centers=None, extras_fn=None,
                rots=None):
        """Boundary re-leveling (NoSwitch discipline); returns new (st, regs).

        Registers are rebuilt by the init pass at the synchronized time —
        every level's L and N coincide there, so no tableau state is lost
        (acc/pot were computed at this boundary by the closing kick and are
        carried through the rebucketing).  Fast path: assess + rebucket +
        register rebuild run as ONE device dispatch; the only transfer is
        the per-level counts (with the overrun diagnostics for the sanity
        stop).  When a level outgrew its padded capacity the optimistic
        result is discarded and a host rebucketing grows the sticky pow2
        capacities (downstream functions recompile for the new signature).
        """
        centers = centers or self._zero_centers()
        rots = rots or self._eye_rots()
        extras = (extras_fn or self._default_extras)(t0)
        sig = self._caps_sig(st)
        esig = self._extras_sig(extras)

        # movers-only fast path (opt-in; falls back to the full sort on
        # arrival-buffer or fill-pointer overflow, which re-compacts)
        if self.rebucket_style == "incremental":
            fill = self._fill.get(sig)
            Ks = self._arrival_caps(self.caps)
            if fill is not None and all(
                    fill[n][l] + Ks[n][l] <= self.caps[n][l]
                    for n in fill for l in range(self.M + 1)):
                ikey = (sig, esig, "incr")
                ifn = self._relevel_fns.get(ikey)
                if ifn is None:
                    ifn = self._relevel_fns[ikey] = \
                        self._make_relevel_incremental(self.caps, esig)
                fill_dev = {n: tuple(jnp.int32(v) for v in fill[n])
                            for n in fill}
                st2, regs2, counts, nchanged, over, arr = ifn(
                    st, fill_dev, jnp.float32(t0), centers, rots, extras)
                counts_h, nchanged_h, over_h, arr_h = jax.device_get(
                    (counts, nchanged, over, arr))
                self.overrun = {n: tuple(int(v) for v in o)
                                for n, o in over_h.items()}
                if int(nchanged_h) == 0:
                    return st, regs
                ok = all(int(arr_h[n][l]) <= Ks[n][l]
                         for n in arr_h for l in range(self.M + 1))
                if not ok:
                    self.n_compactions = getattr(self, "n_compactions",
                                                 0) + 1
                if ok:
                    self._fill[sig] = {
                        n: [fill[n][l] + int(arr_h[n][l])
                            for l in range(self.M + 1)] for n in fill}
                    return st2, regs2
                # burst exceeded a buffer: discard and fall through to
                # the full-sort compaction below

        key = (sig, esig)
        fn = self._relevel_fns.get(key)
        if fn is None:
            fn = self._relevel_fns[key] = self._make_relevel_fused(
                self.caps, esig)
        st2, regs2, counts, nchanged, over = fn(st, jnp.float32(t0),
                                                centers, rots, extras)
        counts_h, nchanged_h, over_h = jax.device_get(
            (counts, nchanged, over))
        self.overrun = {n: tuple(int(v) for v in o)
                        for n, o in over_h.items()}
        if int(nchanged_h) == 0:
            # the ORIGINAL st is returned: keep its existing fill
            # pointers (it may carry holes from prior incremental
            # relevels); only seed them when unknown, in which case st
            # came compacted from init_state/bucketize
            if sig not in self._fill:
                self._fill[sig] = {n: [int(c) for c in cs]
                                   for n, cs in counts_h.items()}
            return st, regs
        fits = all(int(c) <= self.caps[n][l]
                   for n, cs in counts_h.items() for l, c in enumerate(cs))
        if fits:
            self._fill[sig] = {n: [int(c) for c in cs]
                               for n, cs in counts_h.items()}
            return st2, regs2
        # a level outgrew its bucket: redo on the host with grown caps
        assess = self._assess_fns.get(sig)
        if assess is None:
            assess = self._assess_fns[sig] = jax.jit(self._make_assess())
        flat, levs, _, _, _ = assess(st)
        state = {n: bucketize(replace(ps, level=levs[n]), self.M,
                              self.quantum, caps=self.caps.get(n),
                              mesh=self.mesh,
                              headroom=self.cap_headroom)
                 for n, ps in flat.items()}
        self.caps = {n: lb.caps for n, lb in state.items()}
        st = {n: tuple(lb.buckets) for n, lb in state.items()}
        st, regs, _, _ = self._init(st, t0, centers, extras, rots,
                                    prime_accel=False)
        return st, regs

    def level_counts(self, st):
        # single transfer of small per-bucket counts
        cts = jax.device_get({n: [jnp.sum(b.mass > 0) for b in bs]
                              for n, bs in st.items()})
        return {n: [int(c) for c in cs] for n, cs in cts.items()}


def init_regs_sm(forces: dict, couples: dict, M: int, mesh,
                 accum_dtype=jnp.float32, axis_name: str = "p",
                 feats=None, externals=(), extras_sig=((), ()),
                 prime_accel=True):
    """Initial per-level registers + acceleration at t0 (begin_run prime),
    honoring the same per-component features as the substeps.

    prime_accel=False skips the acceleration pass — the relevel path uses
    it: rebucketing carries each particle's acc/pot (computed in the last
    substep's closing kick at the same synchronized time), so only the
    per-NEW-level coefficient registers need rebuilding.  At 1M particles
    the acceleration pass costs more than the coefficient pass, so this
    nearly halves the per-bigstep relevel overhead."""
    from jax.sharding import PartitionSpec as P

    names = list(forces)
    feats = feats or {n: CompFeats() for n in names}
    sig4 = tuple(extras_sig) + ((),) * (4 - len(extras_sig))
    pb_names, hall_names, rst_names, psd_names = sig4

    def init(state, t0, centers, rots, extras):
        ctr = _com_centers(state, feats, centers, axis_name)
        eff, tc = _eff_forces(forces, state, ctr, axis_name)
        regs = {}
        coef_full = {}
        for n in names:
            f = eff[n]
            if n in pb_names or feats[n].needs_sources:
                z = jnp.zeros((1,), state[n][0].x.dtype)
                regs[n] = (tuple(z for _ in range(M + 1)),
                           tuple(z for _ in range(M + 1)))
                cf = (extras["playback"][n] if n in pb_names else z)
                if n in pb_names and n in rst_names:
                    mk, off = extras["restrict"][n]
                    cf = cf * mk + off
                coef_full[n] = cf
                continue
            if n in tc:
                cs = [_project_tc(f, feats[n], b.x, b.mass, t0, ctr[n],
                                  axis_name, accum_dtype)
                      for b in state[n]]
            else:
                cs = [_project(f, feats[n], b.x, b.mass, t0, ctr[n],
                               axis_name, accum_dtype, rot=rots[n])
                      for b in state[n]]
            regs[n] = (tuple(cs), tuple(cs))
            tot = cs[0]
            for c in cs[1:]:
                tot = _tmap(jnp.add, tot, c)
            if n in hall_names:
                from exp_tpu.nbody.pca import apply_hall

                tot = _tmap(lambda v: apply_hall(v, extras["hall"][n]), tot)
            if n in rst_names:
                mk, off = extras["restrict"][n]
                tot = tot * mk + off
            coef_full[n] = tot
        out = {}
        diag = {}
        for n in names:
            if not prime_accel:
                bs = list(state[n])
                out[n] = tuple(bs)
                parts = [_diagnostics(b, axis_name=axis_name) for b in bs]
                diag[n] = jax.tree_util.tree_map(lambda *xs: sum(xs), *parts)
                continue
            bs = []
            for b in state[n]:
                acc, pot = _accel_at(b.x, t0, couples[n], eff, tc, feats,
                                     coef_full, ctr, rots, state,
                                     externals, axis_name)
                if n in psd_names:
                    acc = acc - _pseudo_accel(extras["pseudo"][n], b.x,
                                              b.v, ctr[n])
                bs.append(replace(b, acc=acc, pot=pot))
            out[n] = tuple(bs)
            parts = [_diagnostics(b, axis_name=axis_name) for b in bs]
            diag[n] = jax.tree_util.tree_map(lambda *xs: sum(xs), *parts)
        return out, regs, coef_full, diag

    state_specs = {n: tuple(_ps_specs(axis_name) for _ in range(M + 1))
                   for n in names}
    reg_specs = {n: (tuple(P() for _ in range(M + 1)),
                     tuple(P() for _ in range(M + 1))) for n in names}
    center_specs = {n: P() for n in names}
    rot_specs = {n: P() for n in names}
    extras_specs = {"playback": {n: P() for n in pb_names},
                    "hall": {n: P() for n in hall_names},
                    "restrict": {n: (P(), P())
                                 for n in rst_names},
                    "pseudo": {n: (P(), P(), P()) for n in psd_names}}
    return shard_map(
        init, mesh,
        (state_specs, P(), center_specs, rot_specs, extras_specs),
        (state_specs, reg_specs, {n: P() for n in names},
         {n: _diag_specs() for n in names}))


def init_regs_fn(*args, **kwargs):
    """Jitted wrapper of init_regs_sm (the shard-mapped body is exposed
    separately so the fused relevel can inline it in its own jit)."""
    return jax.jit(init_regs_sm(*args, **kwargs))
