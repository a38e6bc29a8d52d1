"""Two-center expansion (the reference's TwoCenter + MixtureBasis,
src/TwoCenter.H:15-86, src/MixtureBasis.H): two sub-expansions about
different centers, blended by a per-particle mixture weight
w = d2^2/(d1^2 + d2^2) (unity near center 1).  Each sub-basis accumulates
its weighted coefficients; forces are the sum of both fields.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class TwoCenterForce:
    inner: object           # any coefficient-based force (e.g. SphereSL)
    outer: object
    c1: jax.Array           # (3,) inner center
    c2: jax.Array           # (3,) outer center

    @property
    def lmax(self):
        return self.inner.lmax

    @property
    def nmax(self):
        return self.inner.nmax

    scale: float = 1.0

    def tree_flatten(self):
        return (self.inner, self.outer, self.c1, self.c2), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def coef_shape(self):
        return (self.inner.coef_shape, self.outer.coef_shape)

    def _weights(self, x):
        d1 = jnp.sum((x - self.c1) ** 2, axis=-1)
        d2 = jnp.sum((x - self.c2) ** 2, axis=-1)
        return d2 / jnp.maximum(d1 + d2, 1e-30)

    def coefficients_local(self, x, mass, accum_dtype=jnp.float32):
        w = self._weights(x)
        return (self.inner.coefficients_local(x - self.c1, mass * w,
                                              accum_dtype),
                self.outer.coefficients_local(x - self.c2, mass * (1 - w),
                                              accum_dtype))

    def coefficients(self, x, mass, axis_name=None, accum_dtype=jnp.float32):
        w = self._weights(x)
        return (self.inner.coefficients(x - self.c1, mass * w, axis_name,
                                        accum_dtype),
                self.outer.coefficients(x - self.c2, mass * (1 - w),
                                        axis_name, accum_dtype))

    def acceleration(self, coef, x):
        a1, p1 = self.inner.acceleration(coef[0], x - self.c1)
        a2, p2 = self.outer.acceleration(coef[1], x - self.c2)
        return a1 + a2, p1 + p2

    def density(self, coef, x):
        return (self.inner.density(coef[0], x - self.c1)
                + self.outer.density(coef[1], x - self.c2))
