"""No-op force (the reference's NoForce, src/NoForce.cc): a component whose
particles generate no field — they move only in other components' fields."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class NoForce:
    lmax: int = 0
    nmax: int = 1
    scale: float = 1.0

    def tree_flatten(self):
        return (), (self.lmax, self.nmax, self.scale)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux)

    @property
    def coef_shape(self):
        return (2, 1, 1, 1)

    def coefficients_local(self, x, mass, accum_dtype=jnp.float32):
        return jnp.zeros(self.coef_shape, dtype=accum_dtype)

    def coefficients(self, x, mass, axis_name=None, accum_dtype=jnp.float32):
        return self.coefficients_local(x, mass, accum_dtype)

    def acceleration(self, coef, x):
        return jnp.zeros_like(x), jnp.zeros(x.shape[:-1], x.dtype)

    def density(self, coef, x):
        return jnp.zeros(x.shape[:-1], x.dtype)
