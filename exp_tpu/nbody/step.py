"""KDK leapfrog step (jitted, sharded).

The TPU-native equivalent of the reference's do_step hot path
(src/step.cc:67-374): one jitted function per step =
  half-kick -> drift -> coefficients (psum over particle shards) ->
  acceleration -> half-kick,
with conserved-quantity diagnostics computed in the same pass (the OutLog
quantities, src/OutLog.cc:24-52: KE, PE, virial of Clausius VC, 2T/VC).

Multi-chip: the step is wrapped in `jax.shard_map` over a particle mesh axis;
the only cross-chip communication is the `psum` of the small coefficient
tensor and of the scalar diagnostics (replacing MPI_Allreduce,
SphericalBasis.cc:871-896; OutLog.cc:534).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

try:  # jax >= 0.6
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        # check_vma=False: pallas_call outputs don't carry varying-mesh-axes
        # metadata, which the strict checker requires
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)


def _diagnostics(ps, axis_name=None):
    """KE, PE, VC (Clausius virial), momentum, angular momentum, mass."""
    m = ps.mass
    ke = 0.5 * jnp.sum(m * jnp.sum(ps.v * ps.v, axis=-1))
    pe = 0.5 * jnp.sum(m * ps.pot)           # self-energy: 1/2 sum m phi
    vc = jnp.sum(m * jnp.sum(ps.x * ps.acc, axis=-1))
    mom = jnp.sum(m[:, None] * ps.v, axis=0)
    com = jnp.sum(m[:, None] * ps.x, axis=0)
    ang = jnp.sum(m[:, None] * jnp.cross(ps.x, ps.v), axis=0)
    mtot = jnp.sum(m)
    d = {"KE": ke, "PE": pe, "VC": vc, "mass": mtot,
         "mom": mom, "com": com, "L": ang}
    if axis_name is not None:
        d = jax.lax.psum(d, axis_name)
    return d


def _step_body(force, dt, ps, axis_name=None, accum_dtype=jnp.float32):
    from dataclasses import replace

    # half kick (with acceleration already stored in state)
    v_half = ps.v + ps.acc * dt * 0.5
    # drift
    x_new = ps.x + v_half * dt
    # coefficients at the new positions (global psum)
    coef = force.coefficients(x_new, ps.mass, axis_name=axis_name,
                              accum_dtype=accum_dtype)
    # acceleration + potential from coefficients
    acc, pot = force.acceleration(coef, x_new)
    # half kick
    v_new = v_half + acc * dt * 0.5

    ps = replace(ps, x=x_new, v=v_new, acc=acc, pot=pot)
    diag = _diagnostics(ps, axis_name=axis_name)
    return ps, coef, diag


def make_kdk_step(force, dt, mesh=None, axis_name: str = "p",
                  accum_dtype=jnp.float32):
    """Build a jitted KDK step: step(ps) -> (ps, coef, diag).

    With `mesh`, the step runs under shard_map with particle arrays sharded
    along `axis_name`; coefficients and diagnostics are psum-replicated.
    """
    if mesh is None:
        @jax.jit
        def step(ps):
            return _step_body(force, dt, ps, axis_name=None,
                              accum_dtype=accum_dtype)
        return step

    from jax.sharding import PartitionSpec as P

    def body(ps):
        return _step_body(force, dt, ps, axis_name=axis_name,
                          accum_dtype=accum_dtype)

    in_specs = (_ps_specs(axis_name),)
    out_specs = (_ps_specs(axis_name), P(), _diag_specs())
    return jax.jit(shard_map(body, mesh, in_specs, out_specs))


def _ps_specs(axis_name):
    from jax.sharding import PartitionSpec as P
    from exp_tpu.nbody.particles import ParticleSystem

    return ParticleSystem(
        x=P(axis_name, None), v=P(axis_name, None), mass=P(axis_name),
        acc=P(axis_name, None), pot=P(axis_name), level=P(axis_name),
        indx=P(axis_name), scale=P(axis_name),
    )


def _diag_specs():
    from jax.sharding import PartitionSpec as P

    return {"KE": P(), "PE": P(), "VC": P(), "mass": P(),
            "mom": P(), "com": P(), "L": P()}


def init_force_state(force, ps, mesh=None, axis_name: str = "p",
                     accum_dtype=jnp.float32):
    """Compute initial coefficients/acceleration/potential (begin_run prime,
    reference src/begin.cc:86-127)."""
    from dataclasses import replace

    def body(ps):
        an = axis_name if mesh is not None else None
        coef = force.coefficients(ps.x, ps.mass, axis_name=an,
                                  accum_dtype=accum_dtype)
        acc, pot = force.acceleration(coef, ps.x)
        ps2 = replace(ps, acc=acc, pot=pot)
        return ps2, coef, _diagnostics(ps2, axis_name=an)

    if mesh is None:
        return jax.jit(body)(ps)

    from jax.sharding import PartitionSpec as P

    fn = shard_map(body, mesh, (_ps_specs(axis_name),),
                   (_ps_specs(axis_name), P(), _diag_specs()))
    return jax.jit(fn)(ps)


def energies(diag):
    """Scalar summary from a diag dict (host side).

    "E" = KE + VC is the reference OUTLOG's total-energy column
    (ektot + clausius, OutLog.cc:596) — a virial proxy that differs
    from the true total whenever VC != PE; "Etot" = KE + PE is the
    conserved total."""
    ke = float(diag["KE"]); pe = float(diag["PE"]); vc = float(diag["VC"])
    return {
        "KE": ke, "PE": pe, "VC": vc, "E": ke + vc,
        "Etot": ke + pe,
        "2T/VC": -2.0 * ke / vc if vc != 0 else float("nan"),
    }
