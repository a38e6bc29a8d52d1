"""Basis factory + coefficient creation (pyEXP `basis` submodule).

The analogue of expui BasisFactory/BiorthBasis (expui/BasisFactory.H:247
Basis::factory; BiorthBasis.cc:4517 createFromReader;
BiorthBasis.H:258-275 initFromArray/addFromArray/makeFromArray): build a
basis from a YAML stanza and project particle snapshots onto it.

The same device-side force objects used by the N-body driver do the math, so
analysis and simulation share one kernel path (unlike the reference, which
duplicates the bases between src/ and expui/).
"""

from __future__ import annotations

import numpy as np
import yaml
import jax.numpy as jnp

from exp_tpu.config import ForceConfig


class Basis:
    """User-facing basis wrapper: force object + metadata."""

    def __init__(self, force, name="", config=None):
        self.force = force
        self.name = name
        self.config = config or {}

    # -- factory ------------------------------------------------------------

    @staticmethod
    def factory(conf, workdir=".", dtype=jnp.float64) -> "Basis":
        """Build from a YAML string/dict: {id: ..., parameters: {...}}
        (Basis::factory, BasisFactory.H:247)."""
        if isinstance(conf, str):
            conf = yaml.safe_load(conf)
        fid = conf.get("id")
        params = conf.get("parameters") or {}
        from exp_tpu.nbody.simulation import build_force

        force = build_force(ForceConfig(id=fid, parameters=dict(params)),
                            dtype, workdir=workdir)
        return Basis(force, name=conf.get("name", fid), config=conf)

    # -- coefficient creation ----------------------------------------------

    def create_coefficients(self, x, mass, time=0.0, center=None,
                            accum_dtype=jnp.float64):
        """Project one snapshot; returns the raw coefficient array
        (createFromArray, BiorthBasis.H:258-275)."""
        x = jnp.asarray(np.asarray(x))
        if center is not None:
            x = x - jnp.asarray(np.asarray(center))
        m = jnp.asarray(np.asarray(mass))
        if m.ndim == 0:
            m = jnp.full(x.shape[0], m)
        return np.asarray(self.force.coefficients(x, m,
                                                  accum_dtype=accum_dtype))

    def create_from_snapshots(self, snaps, times=None, centers=None,
                              accum_dtype=jnp.float64):
        """Project a sequence of (x, mass) snapshots -> analysis.coefs.Coefs
        (createFromReader, BiorthBasis.cc:4517-4582)."""
        from exp_tpu.analysis.coefs import Coefs

        out = Coefs(geometry=self.geometry, name=self.name,
                    meta=self._meta())
        for i, (x, mass) in enumerate(snaps):
            t = float(times[i]) if times is not None else float(i)
            c = self.create_coefficients(
                x, mass, time=t,
                center=None if centers is None else centers[i],
                accum_dtype=accum_dtype)
            out.add(t, c)
        return out

    # -- field evaluation ---------------------------------------------------

    def get_fields(self, coef, points):
        """Evaluate (dens, pot, acc) at points (getFields analogue)."""
        pts = jnp.asarray(np.asarray(points))
        coef = jnp.asarray(coef)
        acc, pot = self.force.acceleration(coef, pts)
        dens = self.force.density(coef, pts)
        return (np.asarray(dens), np.asarray(pot), np.asarray(acc))

    @property
    def geometry(self):
        from exp_tpu.forces.cube import Cube
        from exp_tpu.forces.cylinder import CylinderForce
        from exp_tpu.forces.slab import SlabForce

        if isinstance(self.force, Cube):
            return "cube"
        if isinstance(self.force, CylinderForce):
            return "cylinder"
        if isinstance(self.force, SlabForce):
            return "slab"
        return "sphere"

    def _meta(self):
        f = self.force
        g = self.geometry
        if g == "sphere":
            return {"lmax": f.lmax, "nmax": f.nmax,
                    "scale": getattr(f, "scale", 1.0)}
        if g == "cylinder":
            return {"mmax": f.mmax, "nmax": f.nmax}
        if g == "slab":
            return {"nmaxx": f.nmaxx, "nmaxy": f.nmaxy, "nmaxz": f.nmax}
        return {"nmaxx": f.nmaxx, "nmaxy": f.nmaxy, "nmaxz": f.nmaxz}
