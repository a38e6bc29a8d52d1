"""Coefficient-trajectory cross-validation against the independent f64
reference-equations comparator (exp_tpu/validate.py) — the BASELINE.md gate
(<1e-6 relative coefficient drift) run against the closest achievable proxy
for reference EXP (see validate.py's docstring for why the actual CPU
reference cannot be built in this image)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from exp_tpu.basis.model import hernquist_model
from exp_tpu.basis.slgrid import build_sph_sl_tables
from exp_tpu.forces.spherical import SphereSL
from exp_tpu.ic.eddington import sample_spherical_model
from exp_tpu.validate import ReferenceSphereStep


@pytest.fixture(scope="module")
def problem():
    m = hernquist_model(rmin=1e-4, rmax=20.0)
    t = build_sph_sl_tables(m, lmax=2, nmax=8, numr=1000, cmap=1, rmap=1.0)
    x, v, mass = sample_spherical_model(m, 2000, seed=21)
    return t, x, v, mass


def test_single_step_equations_match(problem):
    """One KDK step: coefficients and accelerations agree to fp precision
    (isolates any transcription defect between the production JAX path and
    the plain-NumPy reference equations)."""
    t, x, v, mass = problem
    force = SphereSL.from_tables(t, dtype=jnp.float64, backend="gather")
    ref = ReferenceSphereStep(t)

    c_jax = np.asarray(force.coefficients(jnp.asarray(x), jnp.asarray(mass),
                                          accum_dtype=jnp.float64))
    c_ref = ref.coefficients(x, mass)
    scale = np.abs(c_ref).max()
    assert np.abs(c_jax - c_ref).max() / scale < 1e-12

    a_jax, p_jax = force.acceleration(jnp.asarray(c_ref), jnp.asarray(x),
                                      deriv="lerp")
    a_ref, p_ref = ref.acceleration(c_ref, x)
    np.testing.assert_allclose(np.asarray(a_jax), a_ref, rtol=1e-10,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(p_jax), p_ref, rtol=1e-10,
                               atol=1e-12)


def test_coefficient_trajectory_drift(problem):
    """KDK integration in both implementations from identical ICs,
    with the force in its reference-parity mode (deriv='lerp' — the
    hat-difference radial derivative the reference itself uses,
    SLGridMP2.cc:767-1100).

    Gates (from scripts/drift_gate_f64.py, which runs the full
    1000-step horizon: parity mode holds 7e-12 there):
      * <1e-6 relative coefficient drift at 25 steps (BASELINE gate);
      * <1e-9 over 300 steps.
    The production-default deriv='stencil3' (smoother 3-point stencil)
    is a deliberately different scheme and drifts to ~1e-5 over the
    same horizon — scheme difference, not error; the 1e-12 single-step
    gate above pins the shared equations.
    """
    t, x, v, mass = problem
    dt, nsteps = 0.005, 300
    force = SphereSL.from_tables(t, dtype=jnp.float64, backend="gather",
                                 deriv="lerp")
    ref = ReferenceSphereStep(t)

    traj_ref, (x_ref, v_ref) = ref.run(x, v, mass, dt, nsteps,
                                       record_every=25)

    # production path: plain jitted KDK, single device, f64
    from exp_tpu.nbody.particles import ParticleSystem
    from exp_tpu.nbody.step import make_kdk_step, init_force_state

    ps = ParticleSystem.from_arrays(x, v, mass, dtype=jnp.float64)
    ps, coef, _ = init_force_state(force, ps, accum_dtype=jnp.float64)
    step = jax.jit(make_kdk_step(force, dt, accum_dtype=jnp.float64))
    recorded = {}
    for k in range(1, nsteps + 1):
        ps, coef, _ = step(ps)
        if k % 25 == 0:
            recorded[k] = np.asarray(coef)

    scale = max(np.abs(c).max() for _, c in traj_ref)
    drift = {k: np.abs(recorded[k] - c_ref).max() / scale
             for k, c_ref in traj_ref}
    assert drift[25] < 1e-6, f"25-step drift {drift[25]:.3e} exceeds 1e-6"
    worst = max(drift.values())
    assert worst < 1e-9, f"300-step drift {worst:.3e} exceeds 1e-9"
