"""Spherical-shell monopole force (the reference's Shells, src/Shells.H:11-19)
and the fixed halo+bulge profile force (src/HaloBulge.cc).

Shells: the monopole field of the component's own mass distribution,
M(<r) r^-2.  The reference ranks particles by radius across MPI ranks;
the TPU-native version bins mass onto a static radial grid with a one-hot
matmul (gather/scatter-free), prefix-sums, and interpolates M(<r) back —
resolution set by nbins instead of exact ranks.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class ShellsForce:
    rmax: float = 10.0
    nbins: int = 256
    lmax: int = 0
    nmax: int = 1
    scale: float = 1.0

    def tree_flatten(self):
        return (), (self.rmax, self.nbins, self.lmax, self.nmax, self.scale)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux)

    @property
    def coef_shape(self):
        return (self.nbins,)

    def _radial_bin(self, r):
        # log-spaced bins from rmax*1e-4 to rmax
        lo = np.log(self.rmax * 1e-4)
        hi = np.log(self.rmax)
        t = (jnp.log(jnp.maximum(r, self.rmax * 1e-4)) - lo) / (hi - lo)
        return jnp.clip(t * self.nbins, 0.0, self.nbins - 1.0)

    def _bin_edges_r(self):
        lo = np.log(self.rmax * 1e-4)
        hi = np.log(self.rmax)
        return jnp.exp(lo + (hi - lo) * (jnp.arange(self.nbins) + 1.0)
                       / self.nbins)

    def coefficients_local(self, x, mass, accum_dtype=jnp.float32):
        r = jnp.sqrt(jnp.sum(x * x, axis=-1)) + 1e-12
        tb = self._radial_bin(r)
        j = jnp.arange(self.nbins, dtype=x.dtype)
        onehot = (jnp.floor(tb)[:, None] == j[None, :]).astype(x.dtype)
        bins = jnp.einsum("ib,i->b", onehot, mass,
                          preferred_element_type=accum_dtype)
        return jnp.cumsum(bins)

    def coefficients(self, x, mass, axis_name=None, accum_dtype=jnp.float32):
        c = self.coefficients_local(x, mass, accum_dtype=accum_dtype)
        if axis_name is not None:
            # psum and cumsum are both linear: psum(cumsum) == cumsum(psum)
            c = jax.lax.psum(c, axis_name)
        return c

    def acceleration(self, coef, x):
        """M(<r)/r^2 inward; potential by outside-in integration."""
        r = jnp.sqrt(jnp.sum(x * x, axis=-1)) + 1e-12
        edges = self._bin_edges_r().astype(x.dtype)
        cum = coef.astype(x.dtype)
        Mr = jnp.interp(r, edges, cum, left=0.0, right=cum[-1])
        g = -Mr / (r * r)
        acc = (g / r)[:, None] * x
        # potential: Phi(r) = Phi(rmax) - int_r^rmax M(<s)/s^2 ds,
        # Phi(rmax) = -M_tot/rmax (dPhi/dr = M/r^2 integrated inward)
        invs = cum / (edges * edges)
        dr = jnp.diff(jnp.concatenate([edges[:1] * 0.0, edges]))
        tail_full = jnp.cumsum((invs * dr)[::-1])[::-1]
        tail = jnp.interp(r, edges, tail_full, left=tail_full[0], right=0.0)
        pot = -cum[-1] / edges[-1] - tail
        # outside the bin range: Keplerian
        pot = jnp.where(r > edges[-1], -cum[-1] / r, pot)
        return acc, pot

    def density(self, coef, x):
        return jnp.zeros(x.shape[:-1], x.dtype)


@jax.tree_util.register_pytree_node_class
@dataclass
class HaloBulgeForce:
    """Fixed spherical profile force from a model file (HaloBulge.cc):
    particles move in the static field; no self-gravity."""

    logr_t: jax.Array = None
    pot_tab: jax.Array = None
    mass_tab: jax.Array = None
    lmax: int = 0
    nmax: int = 1
    scale: float = 1.0

    @classmethod
    def from_model(cls, model, dtype=jnp.float32):
        return cls(logr_t=jnp.asarray(np.log(model.r), dtype=dtype),
                   pot_tab=jnp.asarray(model.pot, dtype=dtype),
                   mass_tab=jnp.asarray(model.mass, dtype=dtype))

    def tree_flatten(self):
        return ((self.logr_t, self.pot_tab, self.mass_tab),
                (self.lmax, self.nmax, self.scale))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def coef_shape(self):
        return (1,)

    def coefficients_local(self, x, mass, accum_dtype=jnp.float32):
        return jnp.zeros((1,), dtype=accum_dtype)

    def coefficients(self, x, mass, axis_name=None, accum_dtype=jnp.float32):
        return jnp.zeros((1,), dtype=accum_dtype)

    def acceleration(self, coef, x):
        r = jnp.sqrt(jnp.sum(x * x, axis=-1)) + 1e-12
        lr = jnp.clip(jnp.log(r), self.logr_t[0], self.logr_t[-1])
        M = jnp.interp(lr, self.logr_t, self.mass_tab)
        pot = jnp.interp(lr, self.logr_t, self.pot_tab)
        pot = jnp.where(jnp.log(r) > self.logr_t[-1],
                        -self.mass_tab[-1] / r, pot)
        acc = -(M / r ** 3)[:, None] * x
        return acc, pot

    def density(self, coef, x):
        return jnp.zeros(x.shape[:-1], x.dtype)
