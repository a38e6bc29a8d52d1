"""Slab force runtime (periodic x,y plane waves x tabulated z functions).

Companion of basis/slab.py — the reference's SlabSL force path
(src/SlabSL.cc coefficient/force loops, cudaSlabSL.cu):

  a_{kx ky n} = -4 pi sum_i m_i e^{-2 pi i (kx x + ky y)} phi^{|k|}_n(z_i)
  Phi(x)      = Re sum a e^{+2 pi i k.x} phi_n(z)

Horizontal accelerations via the 2 pi i k factors (like the cube force),
vertical via the tabulated dphi/dz.  Tables depend on |kx|,|ky| only; the
full signed-k coefficient tensor keeps the cube's layout conventions.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from exp_tpu.basis.slab import SlabTables

#: compiled pallas kernels keyed by static basis geometry
_PALLAS_CACHE: dict = {}


@jax.tree_util.register_pytree_node_class
@dataclass
class SlabForce:
    phi_t: jax.Array      # (numz, nmaxx+1, nmaxy+1, nmax)
    dphi_t: jax.Array
    dens_t: jax.Array
    sgn: jax.Array        # (2nmaxx+1, 2nmaxy+1, nmax) pairing signs
    phi_s: jax.Array      # coarse-z SIGNED tables (nzc, 2nx+1, 2ny+1, nmax)
    dphi_s: jax.Array
    nmaxx: int
    nmaxy: int
    nmax: int
    numz: int
    zmax: float

    scale: float = 1.0
    nzc: int = 126   # +2 spline ghosts = 128: exactly one lane tile
    backend: str = "einsum"   # 'einsum' (XLA) | 'pallas' (fused kernels)
    #: z interpolation for the pallas kernels: prefiltered quadratic
    #: B-spline (default; same matmul cost, ~10x the accuracy of hats)
    pallas_interp: str = "spline"

    @property
    def lmax(self):
        return max(self.nmaxx, self.nmaxy)

    @classmethod
    def from_tables(cls, t: SlabTables, dtype=jnp.float32,
                    backend: str = "einsum", nzc: int = 126,
                    pallas_interp: str = "spline") -> "SlabForce":
        from exp_tpu.ops import pallas_slab as pk
        from exp_tpu.ops.pallas_cylinder import prefilter_x

        sg = np.asarray(t.sgn)
        sg = np.concatenate([sg[:0:-1], sg], axis=0)
        sg = np.concatenate([sg[:, :0:-1], sg], axis=1)
        nzc = min(nzc, t.numz)
        phi_c = pk.resample_z(t.phi, t.numz, nzc)
        dphi_c = pk.resample_z(t.dphi, t.numz, nzc)
        if pallas_interp == "spline":
            phi_c = prefilter_x(phi_c)
            dphi_c = prefilter_x(dphi_c)
        return cls(phi_t=jnp.asarray(t.phi, dtype=dtype),
                   dphi_t=jnp.asarray(t.dphi, dtype=dtype),
                   dens_t=jnp.asarray(t.dens, dtype=dtype),
                   sgn=jnp.asarray(sg, dtype=dtype),
                   phi_s=jnp.asarray(pk.expand_signed(phi_c)),
                   dphi_s=jnp.asarray(pk.expand_signed(dphi_c)),
                   nmaxx=t.nmaxx, nmaxy=t.nmaxy, nmax=t.nmax, numz=t.numz,
                   zmax=t.zmax, nzc=nzc, backend=backend,
                   pallas_interp=pallas_interp)

    def tree_flatten(self):
        return ((self.phi_t, self.dphi_t, self.dens_t, self.sgn,
                 self.phi_s, self.dphi_s),
                (self.nmaxx, self.nmaxy, self.nmax, self.numz, self.zmax,
                 self.scale, self.nzc, self.backend, self.pallas_interp))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def _pallas_kernels(self):
        from exp_tpu.ops import pallas_slab as pk

        key = (self.nmaxx, self.nmaxy, self.nzc, self.zmax,
               self.pallas_interp)
        ck = _PALLAS_CACHE.get(("coef",) + key)
        ak = _PALLAS_CACHE.get(("accel",) + key)
        if ck is None or ak is None:
            interp = jax.default_backend() == "cpu"
            ck = pk.make_slab_coef_kernel(*key[:4], interpret=interp,
                                          interp=self.pallas_interp)
            ak = pk.make_slab_accel_kernel(*key[:4], interpret=interp,
                                           interp=self.pallas_interp)
            _PALLAS_CACHE[("coef",) + key] = ck
            _PALLAS_CACHE[("accel",) + key] = ak
        return ck, ak

    def _pad1024(self, x, mass=None):
        from exp_tpu.ops.padding import pad_particles

        return pad_particles(x, mass)

    @property
    def coef_shape(self):
        return (2 * self.nmaxx + 1, 2 * self.nmaxy + 1, self.nmax)

    def _cdtype(self, dtype):
        return jnp.complex128 if jnp.dtype(dtype) == jnp.float64 \
            else jnp.complex64

    def _phases(self, x, sign):
        cd = self._cdtype(x.dtype)
        out = []
        for c, nmax in ((0, self.nmaxx), (1, self.nmaxy)):
            n = jnp.arange(-nmax, nmax + 1, dtype=x.dtype)
            ang = sign * 2.0 * math.pi * x[:, c:c + 1] * n[None, :]
            out.append(jax.lax.complex(jnp.cos(ang), jnp.sin(ang)).astype(cd))
        return out

    def _ztab(self, table, z):
        """Interp (numz, nx+1, ny+1, nmax) tables at z; expand to signed-k
        layout (N, 2nx+1, 2ny+1, nmax) by |k| symmetry."""
        dz = 2.0 * self.zmax / (self.numz - 1)
        tt = jnp.clip((z + self.zmax) / dz, 0.0, self.numz - 1.001)
        iz = tt.astype(jnp.int32)
        fz = (tt - iz)[:, None, None, None]
        v = table[iz] * (1 - fz) + table[iz + 1] * fz   # (N, nx+1, ny+1, n)
        ax = jnp.concatenate([v[:, :0:-1], v], axis=1)  # signed kx
        return jnp.concatenate([ax[:, :, :0:-1], ax[:, :, :]], axis=2)

    # ------------------------------------------------------------------

    def coefficients_local(self, x, mass, accum_dtype=jnp.float32):
        if self.backend == "pallas":
            from exp_tpu.ops import pallas_slab as pk

            ck, _ = self._pallas_kernels()
            xp, mp, _ = self._pad1024(x, mass)
            G = ck(pk.pack_xyzm(xp, mp))
            return pk.contract_coef_output(G, self.phi_s, self.sgn)
        xw = jnp.mod(x[:, :2], 1.0)
        z = x[:, 2]
        w = jnp.where(jnp.abs(z) <= self.zmax, mass, 0.0).astype(x.dtype)
        ex, ey = self._phases(jnp.pad(xw, ((0, 0), (0, 1))), sign=-1.0)
        cd = self._cdtype(accum_dtype)
        phi = self._ztab(self.phi_t, z)                 # (N, A, B, n) real
        t1 = jnp.einsum("ia,ib->iab", ex * w[:, None], ey)
        coef = jnp.einsum("iab,iabn->abn", t1, phi.astype(cd),
                          preferred_element_type=cd)
        # per-function pairing signs (see basis/slab.py eigen-normalization)
        return -4.0 * math.pi * coef * self.sgn.astype(cd)

    def coefficients(self, x, mass, axis_name=None, accum_dtype=jnp.float32):
        c = self.coefficients_local(x, mass, accum_dtype=accum_dtype)
        if axis_name is not None:
            c = jax.lax.psum(c, axis_name)
        return c

    def _outside_continuation(self, coef, x, acc, pot):
        """Replace the clamped boundary evaluation for |z| > zmax with the
        vacuum solution: each (kx, ky != 0) mode decays as
        e^{-2 pi |k| (|z| - zmax)} off its boundary value (Laplace in the
        charge-free exterior) and the k = 0 plane-sheet column continues
        linearly (constant Fz).  Cost O(N * modes): the boundary z-interp
        collapses to TWO fixed table rows contracted with the
        coefficients once."""
        dtype = x.dtype
        cd = self._cdtype(dtype)
        z = x[:, 2]
        outside = jnp.abs(z) > self.zmax
        dz = jnp.maximum(jnp.abs(z) - self.zmax, 0.0)

        def expand(v):          # (nx+1, ny+1, n) -> signed-k layout
            a = jnp.concatenate([v[:0:-1], v], axis=0)
            return jnp.concatenate([a[:, :0:-1], a], axis=1)

        cf = coef.astype(cd)
        # (2, A, B): z = +zmax (top) and z = -zmax (bottom) boundary rows
        Tb = jnp.stack([jnp.einsum("abn,abn->ab", cf,
                                   expand(t).astype(cd))
                        for t in (self.phi_t[-1], self.phi_t[0])])
        Td = jnp.stack([jnp.einsum("abn,abn->ab", cf,
                                   expand(t).astype(cd))
                        for t in (self.dphi_t[-1], self.dphi_t[0])])
        top = (z >= 0).astype(jnp.int32)
        Ti = jnp.where(top[:, None, None] > 0, Tb[0][None], Tb[1][None])
        Tdi = jnp.where(top[:, None, None] > 0, Td[0][None], Td[1][None])

        kx = jnp.arange(-self.nmaxx, self.nmaxx + 1, dtype=dtype)
        ky = jnp.arange(-self.nmaxy, self.nmaxy + 1, dtype=dtype)
        tpi = 2.0 * math.pi
        kmag = jnp.sqrt(kx[:, None] ** 2 + ky[None, :] ** 2)
        att = jnp.exp(-tpi * kmag[None] * dz[:, None, None])
        ex, ey = self._phases(x, sign=+1.0)
        E = (ex[:, :, None] * ey[:, None, :] * att.astype(cd))

        TiE = Ti * E
        pot_o = jnp.real(jnp.sum(TiE, axis=(1, 2)))
        k0 = (kmag == 0.0)
        # k = 0: linear potential continuation off the boundary value
        pot_o = pot_o + jnp.real(jnp.sum(jnp.where(k0[None], Tdi * E, 0),
                                         axis=(1, 2))
                                 ) * (jnp.abs(z) - self.zmax) * jnp.sign(z)
        ax_o = jnp.imag(jnp.sum(TiE * (tpi * kx)[None, :, None], (1, 2)))
        ay_o = jnp.imag(jnp.sum(TiE * (tpi * ky)[None, None, :], (1, 2)))
        # k > 0: dPhi/dz = -sign(z) 2 pi |k| Phi; k = 0: boundary Fz
        azT = jnp.where(k0[None],
                        -Tdi * E,
                        jnp.sign(z)[:, None, None]
                        * (tpi * kmag)[None] * TiE)
        az_o = jnp.real(jnp.sum(azT, axis=(1, 2)))
        acc_o = jnp.stack([ax_o, ay_o, az_o], axis=-1).astype(dtype)
        acc = jnp.where(outside[:, None], acc_o, acc)
        pot = jnp.where(outside, pot_o.astype(dtype), pot)
        return acc, pot

    def acceleration(self, coef, x):
        dtype = x.dtype
        if self.backend == "pallas":
            from exp_tpu.ops import pallas_slab as pk

            _, ak = self._pallas_kernels()
            cf = coef.astype(self._cdtype(dtype))
            Ct = pk.contract_slab_tables(cf, self.phi_s, self.dphi_s,
                                         self.nmaxx, self.nmaxy)
            # outside-|z|>zmax vacuum continuation runs IN-kernel from
            # the boundary rows of the full-resolution tables
            Aux = pk.slab_accel_aux(cf, self.phi_t[-1], self.phi_t[0],
                                    self.dphi_t[-1], self.dphi_t[0],
                                    self.nmaxx, self.nmaxy)
            xp, _, n = self._pad1024(x)
            out = ak(pk.pack_xyzm(xp, jnp.zeros(xp.shape[0], dtype)),
                     Ct, Aux)
            return out[0:3, :n].T.astype(dtype), out[3, :n].astype(dtype)
        cd = self._cdtype(dtype)
        coef = coef.astype(cd)
        z = jnp.clip(x[:, 2], -self.zmax, self.zmax)
        ex, ey = self._phases(x, sign=+1.0)

        phi = self._ztab(self.phi_t, z).astype(cd)
        dphi = self._ztab(self.dphi_t, z).astype(cd)

        # hoist the dominant n-contraction: T/Tz (N, A, B) feed pot,
        # ax, ay, az — the per-axis 2 pi k weights are applied AFTER the
        # n-sum instead of re-running the full 4-operand einsum 3x
        T = jnp.einsum("abn,iabn->iab", coef, phi)
        Tz = jnp.einsum("abn,iabn->iab", coef, dphi)
        E = ex[:, :, None] * ey[:, None, :]
        TE = T * E
        pot = jnp.sum(TE, axis=(1, 2)).real.astype(dtype)

        kx = jnp.arange(-self.nmaxx, self.nmaxx + 1, dtype=dtype)
        ky = jnp.arange(-self.nmaxy, self.nmaxy + 1, dtype=dtype)
        tpi = 2.0 * math.pi
        ax = jnp.imag(jnp.sum(TE * (tpi * kx).astype(cd)[None, :, None],
                              axis=(1, 2)))
        ay = jnp.imag(jnp.sum(TE * (tpi * ky).astype(cd)[None, None, :],
                              axis=(1, 2)))
        az = -jnp.real(jnp.sum(Tz * E, axis=(1, 2)))
        acc = jnp.stack([ax.astype(dtype), ay.astype(dtype),
                         az.astype(dtype)], axis=-1)
        return self._outside_continuation(coef, x, acc, pot)

    def density(self, coef, x):
        cd = self._cdtype(x.dtype)
        coef = coef.astype(cd)
        z = jnp.clip(x[:, 2], -self.zmax, self.zmax)
        ex, ey = self._phases(x, sign=+1.0)
        dens = self._ztab(self.dens_t, z).astype(cd)
        out = jnp.einsum("abn,ia,ib,iabn->i", coef, ex, ey, dens)
        return out.real.astype(x.dtype) / (4.0 * math.pi)
