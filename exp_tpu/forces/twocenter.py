"""Two-center expansion (the reference's TwoCenter + MixtureBasis + EJcom,
src/TwoCenter.H:15-140, src/MixtureBasis.H, src/EJcom.cc): two sub-
expansions about different centers — the INNER center is the component's
tracked (EJ/centerfile) center, the OUTER is its instantaneous COM
(TwoCenter.cc:106-155) — blended by the EJcom erf mixture

    m(x) = erf( cfac * (|x - c1|^2 / (|c2 - c1|^2 + eps))^(alpha/2) )

(EJcom.cc:42-56): the inner basis accumulates with weight 1-m (unity near
the inner center), the outer with weight m; forces are the sum of both
fields.  The sub-bases may be different force types/resolutions (distinct
`inner:`/`outer:` stanzas).

The centers are DYNAMIC: the simulation rebuilds the force pytree with
traced c1/c2 inside the jitted step (dataclasses.replace), so a moving EJ
center or COM never triggers recompilation.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class TwoCenterForce:
    inner: object           # any coefficient-based force (e.g. SphereSL)
    outer: object
    c1: jax.Array           # (3,) inner (EJ/tracked) center
    c2: jax.Array           # (3,) outer (COM) center
    cfac: float = 1.0
    alpha: float = 1.0

    #: simulation drives c1/c2 from the tracked center and the COM
    needs_centers = True

    @property
    def lmax(self):
        return self.inner.lmax

    @property
    def nmax(self):
        return self.inner.nmax

    scale: float = 1.0

    def tree_flatten(self):
        return ((self.inner, self.outer, self.c1, self.c2),
                (self.cfac, self.alpha))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def with_centers(self, c1, c2):
        return replace(self, c1=c1, c2=c2)

    @property
    def coef_shape(self):
        return (self.inner.coef_shape, self.outer.coef_shape)

    def mixture(self, x):
        """EJcom erf ramp, in [0, 1): ~0 near the inner center."""
        d1 = jnp.sum((x - self.c1) ** 2, axis=-1)
        d12 = jnp.sum((self.c2 - self.c1) ** 2)
        arg = self.cfac * jnp.power(d1 / (d12 + 1e-10), 0.5 * self.alpha)
        return jax.scipy.special.erf(arg)

    def coefficients_local(self, x, mass, accum_dtype=jnp.float32):
        m = self.mixture(x)
        return (self.inner.coefficients_local(x - self.c1, mass * (1 - m),
                                              accum_dtype),
                self.outer.coefficients_local(x - self.c2, mass * m,
                                              accum_dtype))

    def coefficients(self, x, mass, axis_name=None, accum_dtype=jnp.float32):
        m = self.mixture(x)
        return (self.inner.coefficients(x - self.c1, mass * (1 - m),
                                        axis_name, accum_dtype),
                self.outer.coefficients(x - self.c2, mass * m,
                                        axis_name, accum_dtype))

    def acceleration(self, coef, x):
        a1, p1 = self.inner.acceleration(coef[0], x - self.c1)
        a2, p2 = self.outer.acceleration(coef[1], x - self.c2)
        return a1 + a2, p1 + p2

    def density(self, coef, x):
        return (self.inner.density(coef[0], x - self.c1)
                + self.outer.density(coef[1], x - self.c2))
