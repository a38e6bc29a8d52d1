"""Hall smoothing, subsample covariance, coefficient playback, FieldBasis."""

import numpy as np
import pytest
import jax.numpy as jnp

from exp_tpu.basis.model import hernquist_model
from exp_tpu.basis.slgrid import build_sph_sl_tables
from exp_tpu.forces.spherical import SphereSL
from exp_tpu.ic.eddington import sample_spherical_model
from exp_tpu.nbody.pca import (subsample_coefficients, hall_factors,
                               smooth_coefficients)


@pytest.fixture(scope="module")
def setup():
    m = hernquist_model(rmin=1e-4, rmax=20.0, numr=800)
    t = build_sph_sl_tables(m, lmax=2, nmax=8, numr=800, cmap=1, rmap=1.0)
    force = SphereSL.from_tables(t, dtype=jnp.float64)
    x, v, mass = sample_spherical_model(m, 5000, seed=21)
    return m, force, jnp.asarray(x), jnp.asarray(v), jnp.asarray(mass)


def test_hall_smoothing(setup):
    """Monopole (high S/N) keeps b~1; noise-dominated channels get b<<1."""
    m, force, x, v, mass = setup
    cs = subsample_coefficients(force, x, mass, nsamples=8,
                                accum_dtype=jnp.float64)
    assert cs.shape[0] == 8
    # mean of subsamples == full coefficients
    full = force.coefficients(x, mass, accum_dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(cs.mean(axis=0)), np.asarray(full),
                               rtol=1e-10, atol=1e-12)
    b, mean, var = hall_factors(cs)
    b = np.asarray(b)
    assert b[0, 0, 0, 0] > 0.99                 # monopole: pure signal
    # noise channels (l>0 of an isotropic halo) strongly suppressed
    noise_b = b[0, 2, 1, 5]
    assert noise_b < 0.9
    assert np.median(b[:, 1:, :, :][b[:, 1:, :, :] > 0]) < 0.9

    sm = smooth_coefficients(full, jnp.asarray(b), "Hall")
    assert float(jnp.abs(sm[0, 0, 0, 0])) > 0.99 * float(
        jnp.abs(full[0, 0, 0, 0]))
    cut = smooth_coefficients(full, jnp.asarray(b), "VarianceCut")
    assert float(jnp.abs(cut).sum()) < float(jnp.abs(full).sum())


def test_field_basis_rotation(setup):
    """Solid-body rotation recovered by the velocity-field expansion.

    rho*v carries one more harmonic than rho, so this needs a higher-order
    basis than the force fixture (truncation bias otherwise)."""
    from exp_tpu.analysis.field_basis import FieldBasis
    from exp_tpu.basis.slgrid import build_sph_sl_tables
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.forces.spherical import SphereSL
    from exp_tpu.ic.eddington import sample_spherical_model

    m2 = hernquist_model(rmin=1e-4, rmax=20.0, numr=800)
    t2 = build_sph_sl_tables(m2, lmax=6, nmax=12, numr=800, cmap=1, rmap=1.0)
    f2 = SphereSL.from_tables(t2, dtype=jnp.float64)
    xv, _, mv = sample_spherical_model(m2, 40000, seed=22)
    om = 0.5
    vrot = np.stack([-om * xv[:, 1], om * xv[:, 0], np.zeros(len(xv))], -1)
    fb = FieldBasis(f2)
    coefs = fb.coefficients(xv, vrot, mv)
    pts = np.array([[0.8, 0, 0], [0, 1.2, 0.1], [-0.5, 0.5, 0]])
    out = fb.evaluate(coefs, pts)
    expect_vy = om * pts[:, 0]
    expect_vx = -om * pts[:, 1]
    np.testing.assert_allclose(out["vy"], expect_vy, atol=0.12 * om)
    np.testing.assert_allclose(out["vx"], expect_vx, atol=0.12 * om)


def test_playback_driver(tmp_path, setup):
    """Playback component: forces driven by a stored coefficient series —
    particles orbit in the frozen field; coefficients match the file."""
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation
    from exp_tpu.analysis.coefs import Coefs

    m, force, x, v, mass = setup
    m.to_file(tmp_path / "h.model")
    # store a constant coefficient series
    full = force.coefficients(x, mass, accum_dtype=jnp.float64)
    c = Coefs(geometry="sphere", name="halo", meta={"lmax": 2, "nmax": 8})
    for tt in np.linspace(0, 10, 5):
        c.add(tt, np.asarray(full))
    c.to_file(str(tmp_path / "pb.h5"))

    write_ascii_bodies(tmp_path / "h.bods",
                       (np.asarray(x), np.asarray(v), np.asarray(mass)))
    (tmp_path / "c.yml").write_text("""\
Global:
  dtime: 0.02
  nsteps: 5
  runtag: pb0
Components:
  - name: halo
    bodyfile: h.bods
    parameters: {playback: pb.h5}
    force:
      id: sphereSL
      parameters: {numr: 800, Lmax: 2, nmax: 8, rmapping: 1.0,
                   modelname: h.model}
Output: []
""")
    sim = Simulation.from_file(str(tmp_path / "c.yml"))
    sim.prime()
    sim.run()
    np.testing.assert_allclose(np.asarray(sim._coefs["halo"]),
                               np.asarray(full), rtol=1e-5)


def test_hall_in_driver(tmp_path, setup):
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation

    m, force, x, v, mass = setup
    m.to_file(tmp_path / "h.model")
    write_ascii_bodies(tmp_path / "h.bods",
                       (np.asarray(x), np.asarray(v), np.asarray(mass)))
    (tmp_path / "c.yml").write_text("""\
Global:
  dtime: 0.02
  nsteps: 4
  runtag: hall0
Components:
  - name: halo
    bodyfile: h.bods
    parameters: {npca: 2, nsamples: 8}
    force:
      id: sphereSL
      parameters: {numr: 800, Lmax: 2, nmax: 8, rmapping: 1.0,
                   modelname: h.model}
Output:
  - id: outsamp
    parameters: {nint: 2, nsamples: 8}
""")
    sim = Simulation.from_file(str(tmp_path / "c.yml"))
    sim.prime()
    sim.run()
    assert "halo" in sim._hall
    b = sim._hall["halo"]
    assert b[0, 0, 0, 0] > 0.95
    import h5py

    with h5py.File(tmp_path / "outsamp.halo.hall0.h5") as f:
        assert len([k for k in f.keys()]) >= 1


def test_smoothing_weight_variants():
    """tk_type policies (AxisymmetricBasis.cc:482-503): Hall shrinks noisy
    channels, VarianceCut zeros them, CumulativeCut keeps the leading
    radial channels, VarianceWeighted downweights by noise fraction."""
    import jax.numpy as jnp
    from exp_tpu.nbody.pca import smoothing_weights

    mean = jnp.asarray([[10.0, 1.0, 0.01, 0.001]])
    var = jnp.asarray([[0.01, 0.01, 0.01, 0.01]])

    b = np.asarray(smoothing_weights(mean, var, "Hall"))
    assert b[0, 0] > 0.999 and b[0, 2] < 0.01

    vc = np.asarray(smoothing_weights(mean, var, "VarianceCut",
                                      tksmooth=3.0))
    np.testing.assert_array_equal(vc[0], [1, 1, 0, 0])

    cc = np.asarray(smoothing_weights(mean, var, "CumulativeCut",
                                      tkcum=0.95))
    assert cc[0, 0] == 1 and cc[0, 3] == 0      # leading kept, tail cut

    vw = np.asarray(smoothing_weights(mean, var, "VarianceWeighted"))
    assert vw[0, 0] > 0.999 and vw[0, 2] < 0.01
    assert np.all(vw >= 0) and np.all(vw <= 1)

    one = np.asarray(smoothing_weights(mean, var, "None"))
    np.testing.assert_array_equal(one, np.ones_like(one))


def test_tk_type_in_driver(tmp_path):
    """Driver honors tk_type: VarianceCut zeroes noisy channels in the
    applied smoothing weights."""
    from exp_tpu.basis.model import hernquist_model
    from exp_tpu.ic.eddington import sample_spherical_model
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation

    m = hernquist_model(rmin=1e-4, rmax=20.0, numr=600)
    m.to_file(tmp_path / "h.model")
    x, v, mass = sample_spherical_model(m, 2000, seed=12)
    write_ascii_bodies(tmp_path / "h.bods", (x, v, mass))
    (tmp_path / "c.yml").write_text("""\
Global: {dtime: 0.02, nsteps: 4, runtag: tk0}
Components:
  - name: halo
    bodyfile: h.bods
    parameters: {npca: 2, nsamples: 4, tk_type: VarianceCut, tksmooth: 3.0}
    force:
      id: sphereSL
      parameters: {numr: 400, Lmax: 2, nmax: 6, rmapping: 1.0,
                   modelname: h.model}
Output: []
""")
    sim = Simulation.from_file(str(tmp_path / "c.yml"), steps_per_block=2)
    sim.prime()
    sim.run()
    w = sim._hall["halo"]
    assert set(np.unique(w)).issubset({0.0, 1.0})   # a cut, not a shrink
    assert w.max() == 1.0 and w.min() == 0.0        # some channels zeroed


def test_pcaeof_matrix(setup):
    """pcaeof: smoothing in the covariance eigenbasis (a) reduces to the
    elementwise Hall weights for a diagonal covariance, and (b) shrinks
    noise-dominated power at least as well as channel-wise Hall on the
    sampled halo."""
    from exp_tpu.nbody.pca import (eof_smoothing_matrix, apply_hall,
                                   smoothing_weights)

    m, force, x, v, mass = setup
    cs = np.asarray(subsample_coefficients(force, x, mass, nsamples=8,
                                           accum_dtype=jnp.float64))
    S = eof_smoothing_matrix(cs)            # (..., n, n)
    mean = cs.mean(axis=0)
    assert S.shape == mean.shape + (mean.shape[-1],)
    sm = np.einsum("...nm,...m->...n", S, mean)
    # monopole (dominant) barely touched
    assert abs(sm[0, 0, 0, 0] / mean[0, 0, 0, 0] - 1) < 0.05
    # high-l noise power shrunk
    raw_hi = np.sum(mean[:, 2] ** 2)
    smo_hi = np.sum(sm[:, 2] ** 2)
    assert smo_hi < raw_hi

    # diagonal-covariance limit: independent synthetic channels
    rng = np.random.default_rng(0)
    sig = np.array([10.0, 1.0, 0.1, 0.01])
    sub = sig[None, :] + rng.normal(0, 0.05, (64, 4))
    Sd = eof_smoothing_matrix(sub)
    md = sub.mean(axis=0)
    vd = sub.var(axis=0, ddof=1) / sub.shape[0]
    wd = np.asarray(smoothing_weights(md, vd))
    np.testing.assert_allclose(np.einsum("nm,m->n", Sd, md), wd * md,
                               rtol=0.3, atol=1e-4)
    # apply_hall dispatches on shape
    np.testing.assert_allclose(np.asarray(apply_hall(jnp.asarray(md), Sd)),
                               np.einsum("nm,m->n", Sd, md), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(apply_hall(jnp.asarray(md), wd)),
                               wd * md, rtol=1e-12)


def test_pcaeof_in_driver(tmp_path):
    """pcaeof: true threads the matrix weights through the jitted step."""
    from exp_tpu.nbody.particles import write_ascii_bodies
    from exp_tpu.nbody.simulation import Simulation
    from exp_tpu.basis.model import hernquist_model

    m = hernquist_model(rmin=1e-3, rmax=20.0)
    m.to_file(tmp_path / "h.model")
    x, v, mass = sample_spherical_model(m, 2000, seed=12)
    write_ascii_bodies(tmp_path / "h.bods", (x, v, mass))
    (tmp_path / "c.yml").write_text("""\
Global: {dtime: 0.02, nsteps: 4, runtag: pe0}
Components:
  - name: halo
    bodyfile: h.bods
    parameters: {npca: 2, nsamples: 4, pcaeof: true}
    force:
      id: sphereSL
      parameters: {numr: 400, Lmax: 2, nmax: 6, rmapping: 1.0,
                   modelname: h.model}
Output: []
""")
    sim = Simulation.from_file(str(tmp_path / "c.yml"), steps_per_block=2)
    sim.prime()
    sim.run()
    W = sim._hall["halo"]
    assert W.ndim == 5 and W.shape[-1] == W.shape[-2] == 6
    assert np.isfinite(np.asarray(sim._coefs["halo"])).all()
