"""Direct O(N^2) softened summation (the reference's `direct` force,
src/Direct.H/.cc, src/GravKernel.H/.cc).

TPU-native: instead of the reference's MPI node-to-node ring of position
buffers (Direct.H:7-9), the sharded path circulates each shard's source
block around the mesh with `jax.lax.ppermute` — same ring, ICI-native.
The `coefficients` protocol returns the shard-local source block
(positions+masses) so the force object plugs into the same step
machinery as the basis forces.

Source models (src/Direct.cc:250-340):
  * kernel='plummer' — Plummer softening (GravKernel.cc PlummerSoft);
  * kernel='spline'  — compact-support cubic-spline softening
    (GravKernel.cc SplineSoft; the reference's default), exact 1/r
    outside r = eps;
  * mn_model         — every source is a Miyamoto-Nagai disk of scale
    (a, b) (Direct.cc:264-300);
  * pm_model         — every source carries a normalized extended
    spherical profile (SphericalModelTable; Direct.cc:310-318): inside
    the model's rmax the enclosed-mass fraction replaces the kernel.
    (The reference adds the model potential UNSCALED by the source
    mass — a bug kept out of this implementation: here pot is
    mass * model_pot / M(rmax).)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


def _spline_mfrac_pot(r, rinv, eps):
    """SplineSoft (GravKernel.cc:14-31): enclosed mass fraction and
    potential-per-unit-mass for the cubic-spline density kernel.
    Branchless over the three x = r/eps regimes."""
    def m1(x):
        return 32. * x**3 * (1. / 3. - 6. / 5. * x * x + x**3)

    def m2(x):
        return 16. / 15. * x**3 * (20. - 45. * x + 36. * x * x
                                   - 10. * x**3)

    def p1(x):
        return 32. * x * x * (0.5 - 1.5 * x * x + 6. / 5. * x**3)

    def p2(x):
        return 32. * x * x * (1. - 2. * x + 1.5 * x * x - 2. / 5. * x**3)

    fac0 = m1(0.5) - m2(0.5)
    fac1 = p2(1.0) - p2(0.5) + p1(0.5)
    fac2 = p2(1.0)
    x = r / eps
    xc = jnp.minimum(x, 1.0)
    mfrac = jnp.where(x < 0.5, m1(xc),
                      jnp.where(x < 1.0, fac0 + m2(xc), 1.0))
    # pot/unit mass: inner = -(fac1 - p1)/eps - mfrac/r;
    # mid = -mfrac/r - (fac2 - p2)/eps; outer = -1/r
    pot = jnp.where(
        x < 0.5, -(fac1 - p1(xc)) / eps - mfrac * rinv,
        jnp.where(x < 1.0, -mfrac * rinv - (fac2 - p2(xc)) / eps,
                  -rinv))
    return mfrac, pot


@jax.tree_util.register_pytree_node_class
@dataclass
class DirectForce:
    eps: float = 1e-4        # softening length
    chunk: int = 16384
    kernel: str = "plummer"  # 'plummer' | 'spline'
    #: Miyamoto-Nagai disk-shaped sources (a=radial, b=vertical scale)
    mn_model: bool = False
    a: float = 1.0
    b: float = 0.1
    #: normalized extended-profile sources: (r, mass, pot) table arrays
    #: from a SphericalModelTable (pm_model path)
    pm_r: jax.Array = None
    pm_mass: jax.Array = None
    pm_pot: jax.Array = None

    # protocol metadata
    lmax: int = 0
    nmax: int = 1
    scale: float = 1.0

    def tree_flatten(self):
        return (self.pm_r, self.pm_mass, self.pm_pot), (
            self.eps, self.chunk, self.kernel, self.mn_model, self.a,
            self.b, self.lmax, self.nmax, self.scale)

    @classmethod
    def tree_unflatten(cls, aux, children):
        pm_r, pm_mass, pm_pot = children
        (eps, chunk, kernel, mn_model, a, b, lmax, nmax, scale) = aux
        return cls(eps=eps, chunk=chunk, kernel=kernel, mn_model=mn_model,
                   a=a, b=b, pm_r=pm_r, pm_mass=pm_mass, pm_pot=pm_pot,
                   lmax=lmax, nmax=nmax, scale=scale)

    @classmethod
    def with_pm_model(cls, model, **kw):
        """Extended point-mass profile from a SphericalModelTable."""
        import numpy as np

        return cls(pm_r=jnp.asarray(np.asarray(model.r), jnp.float32),
                   pm_mass=jnp.asarray(np.asarray(model.mass),
                                       jnp.float32),
                   pm_pot=jnp.asarray(np.asarray(model.pot), jnp.float32),
                   **kw)

    @property
    def coef_shape(self):
        return None

    # ------------------------------------------------------------------

    def coefficients_local(self, x, mass, accum_dtype=jnp.float32):
        return (x, mass)

    needs_sources = True

    def coefficients(self, x, mass, axis_name=None, accum_dtype=jnp.float32):
        """The 'coefficients' of the direct force are the (shard-local)
        sources themselves; `acceleration` runs the ppermute ring."""
        return (x, mass)

    def _pair_mn(self, d, ms):
        """Miyamoto-Nagai source profile (Direct.cc:264-300); `d` is
        the target-minus-source displacement."""
        R2 = d[..., 0] ** 2 + d[..., 1] ** 2
        zb = jnp.sqrt(d[..., 2] ** 2 + self.b * self.b)
        ab = self.a + zb
        dn2 = R2 + ab * ab
        dninv = jax.lax.rsqrt(dn2)
        live = (ms > 0.0) & (R2 + d[..., 2] ** 2 > 0.0)  # skip self-pairs
        m_eff = jnp.where(live, ms, 0.0)
        pot = -m_eff * dninv
        fr_over_R = -m_eff * dninv * dninv * dninv       # f_R / R
        fz = fr_over_R * d[..., 2] * ab / zb             # -m z ab/(zb dn^3)
        acc = jnp.stack([fr_over_R * d[..., 0],
                         fr_over_R * d[..., 1], fz], axis=-1)
        return acc, pot

    def _pair_spherical(self, d, ms, dtype):
        """Softened spherical sources: plummer/spline kernel, optionally
        replaced by the normalized extended profile inside its rmax."""
        eps = jnp.asarray(self.eps, dtype)
        r2raw = jnp.sum(d * d, axis=-1)
        live = (ms > 0.0) & (r2raw > 0.0)    # skip self-pairs (i == j)
        m_eff = jnp.where(live, ms, 0.0)
        if self.kernel == "spline":
            r = jnp.sqrt(jnp.maximum(r2raw, 1e-30))
            rinv = 1.0 / r
            mfrac, potk = _spline_mfrac_pot(r, rinv, eps)
            mr3 = m_eff * mfrac * rinv * rinv * rinv
            pot = m_eff * potk
        else:
            r2 = r2raw + eps * eps
            rinv = jax.lax.rsqrt(r2)
            r = jnp.sqrt(jnp.maximum(r2raw, 1e-30))
            mr = m_eff * rinv
            mr3 = mr * rinv * rinv
            pot = -mr
        if self.pm_r is not None:
            rmax = self.pm_r[-1]
            Mmax = self.pm_mass[-1]
            inside = r < rmax
            mfrac_pm = jnp.interp(r, self.pm_r, self.pm_mass) / Mmax
            pot_pm = m_eff * jnp.interp(r, self.pm_r, self.pm_pot) / Mmax
            mr3 = jnp.where(inside, m_eff * mfrac_pm / (r * r * r), mr3)
            pot = jnp.where(inside, pot_pm, pot)
        acc = (mr3)[..., None] * d
        return acc, pot

    def _partial(self, xs, ms, x):
        """Force of sources (xs, ms) on targets x (chunked over sources)."""

        def one_chunk(carry, src):
            acc, pot = carry
            xs_c, ms_c = src
            d = xs_c[None, :, :] - x[:, None, :]           # (Nt, C, 3)
            if self.mn_model:
                # MN fields take the target-minus-source displacement
                a_c, p_c = self._pair_mn(-d, ms_c[None, :])
                acc = acc + jnp.sum(a_c, axis=1)
                pot = pot + jnp.sum(p_c, axis=1)
            else:
                a_c, p_c = self._pair_spherical(d, ms_c[None, :], x.dtype)
                acc = acc + jnp.sum(a_c, axis=1)
                pot = pot + jnp.sum(p_c, axis=1)
            return (acc, pot), None

        n = xs.shape[0]
        ch = min(self.chunk, n)
        acc0 = jnp.zeros_like(x)
        pot0 = jnp.zeros(x.shape[0], x.dtype)
        if n % ch == 0 and n > ch:
            srcs = (xs.reshape(n // ch, ch, 3), ms.reshape(n // ch, ch))
            (acc, pot), _ = jax.lax.scan(one_chunk, (acc0, pot0), srcs)
        else:
            (acc, pot), _ = one_chunk((acc0, pot0), (xs, ms))
        return acc, pot

    def acceleration(self, coef, x, axis_name=None):
        xs, ms = coef
        if axis_name is None:
            return self._partial(xs, ms, x)

        # ppermute ring: each step, compute the force of the resident source
        # block, then pass the block to the next shard (Direct.H ring).
        nshards = jax.lax.axis_size(axis_name)
        perm = [(i, (i + 1) % nshards) for i in range(nshards)]

        def body(i, state):
            acc, pot, xs_c, ms_c = state
            a, p = self._partial(xs_c, ms_c, x)
            xs_n = jax.lax.ppermute(xs_c, axis_name, perm)
            ms_n = jax.lax.ppermute(ms_c, axis_name, perm)
            return (acc + a, pot + p, xs_n, ms_n)

        acc0 = jnp.zeros_like(x)
        # derive from x so the carry is 'varying' over the mesh axis
        # (shard_map vma typing requires matched carry types)
        pot0 = jnp.sum(x * 0.0, axis=-1)
        acc, pot, _, _ = jax.lax.fori_loop(
            0, nshards, body, (acc0, pot0, xs, ms))
        return acc, pot

    def density(self, coef, x):
        return jnp.zeros(x.shape[0], x.dtype)
