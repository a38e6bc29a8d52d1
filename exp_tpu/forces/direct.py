"""Direct O(N^2) softened summation (the reference's `direct` force,
src/Direct.H/.cc, GravKernel.cc).

TPU-native: instead of the reference's MPI node-to-node ring of position
buffers (Direct.H:7-9), the sharded path circulates each shard's source
block around the mesh with `jax.lax.ppermute` — same ring, ICI-native.
Plummer softening (GravKernel Plummer kernel); the `coefficients` protocol
returns the shard-local source block (positions+masses) so the force object
plugs into the same step machinery as the basis forces.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class DirectForce:
    eps: float = 1e-4        # Plummer softening length
    chunk: int = 16384

    # protocol metadata
    lmax: int = 0
    nmax: int = 1
    scale: float = 1.0

    def tree_flatten(self):
        return (), (self.eps, self.chunk, self.lmax, self.nmax, self.scale)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux)

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

    def _partial(self, xs, ms, x):
        """Force of sources (xs, ms) on targets x (chunked over sources)."""
        eps2 = self.eps * self.eps

        def one_chunk(carry, src):
            acc, pot = carry
            xs_c, ms_c = src
            d = xs_c[None, :, :] - x[:, None, :]           # (Nt, C, 3)
            r2raw = jnp.sum(d * d, axis=-1)
            r2 = r2raw + eps2
            rinv = jax.lax.rsqrt(r2)
            # skip self-pairs (d == 0 exactly): the reference's Direct
            # skips i == j — without this every particle's potential is
            # biased by -m_i/eps (acceleration is unaffected, d = 0)
            mr = jnp.where(r2raw > 0.0, ms_c[None, :] * rinv, 0.0)
            pot = pot - jnp.sum(mr, axis=1)
            acc = acc + jnp.sum((mr * rinv * rinv)[..., None] * d, axis=1)
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
