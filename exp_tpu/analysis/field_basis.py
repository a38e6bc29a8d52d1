"""Field expansions over particle attributes (the reference's FieldBasis /
VelocityBasis, expui/FieldBasis.H:23-186 — powers OutVel).

Any per-particle quantity f (velocity components by default) is projected
with the same biorthogonal machinery as the mass density:

    d^f_k = -4 pi sum_i m_i f_i Phi_k(x_i)

The pointwise field estimate is the density-weighted ratio

    f(x) ~ sum_k d^f_k D_k(x) / sum_k d^1_k D_k(x)

(i.e. the BFE representation of rho*f divided by the BFE representation of
rho) — the mass-weighted mean of f in the smooth-field sense.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class FieldBasis:
    """Expand per-particle fields over a force basis."""

    def __init__(self, force, fields=("vx", "vy", "vz")):
        self.force = force
        self.fields = tuple(fields)

    def coefficients(self, x, v, mass, accum_dtype=jnp.float64):
        """Returns dict: 'dens' + each field name -> coefficient array."""
        x = jnp.asarray(np.asarray(x))
        v = jnp.asarray(np.asarray(v))
        m = jnp.asarray(np.asarray(mass))
        out = {"dens": self.force.coefficients(x, m,
                                               accum_dtype=accum_dtype)}
        comp = {"vx": 0, "vy": 1, "vz": 2}
        for f in self.fields:
            if f in comp:
                w = m * v[:, comp[f]]
            elif f == "v2":
                w = m * jnp.sum(v * v, axis=1)
            else:
                raise ValueError(f"unknown field {f!r}")
            out[f] = self.force.coefficients(x, w, accum_dtype=accum_dtype)
        return out

    def evaluate(self, coefs: dict, points):
        """Field estimates at points: dict field -> (N,) array."""
        pts = jnp.asarray(np.asarray(points))
        dens = self.force.density(coefs["dens"], pts)
        dens = jnp.where(jnp.abs(dens) > 1e-30, dens, 1e-30)
        out = {"dens": np.asarray(dens)}
        for f in self.fields:
            num = self.force.density(coefs[f], pts)
            out[f] = np.asarray(num / dens)
        return out
