"""Triply-periodic plane-wave (cube) BFE force.

TPU-native re-design of the reference's Cube force (src/Cube.cc,
cudaCube.cu): gravitational field on the unit box [0,1]^3 expanded in
plane waves exp(2 pi i k.x), k = (ii,jj,kk), |k_c| <= nmax_c per axis.

Basis pair (G=1):  Phi_k = norm_k e^{2 pi i k.x},
                   4 pi rho_k = -|2 pi k|^2 Phi_k,
norm_k = 1/sqrt(pi |k|^2) (Cube.cc:316), k=0 excluded (the uniform-background
"swindle", Cube.cc:689), optional minimum wavenumber nmin per axis
(Cube.cc:693).

Coefficients (Cube.cc:287-320):
    a_k = - sum_i m_i norm_k e^{-2 pi i k.x_i}
Potential/force (Cube.cc:640-710):
    Phi(x)  = Re sum_k a_k norm_k e^{+2 pi i k.x}
    acc(x)  = -Re sum_k (2 pi i k) a_k norm_k e^{+2 pi i k.x}

Instead of the reference's per-particle complex recurrences (serial in the
wavenumber), the phase factors are built as batched outer products and the
k-sums are complex einsums (MXU batched matmuls).  Positions are wrapped
mod 1 inside the evaluation, which subsumes the reference's PeriodicBC
external module for the force path (src/user PeriodicBC.cc).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

#: compiled pallas kernels keyed by static basis geometry
_PALLAS_CACHE: dict = {}


@jax.tree_util.register_pytree_node_class
@dataclass
class Cube:
    """Plane-wave cube force; coefficients are a complex (imx, imy, imz)
    tensor with axis layout -nmax..nmax (Cube.H:74-80)."""

    norm: jax.Array          # (imx, imy, imz) real: norm_k with k-masks folded
    lap: jax.Array           # (imx, imy, imz) real: |2 pi k|^2 (for density)
    nmaxx: int
    nmaxy: int
    nmaxz: int
    nminx: int = 0
    nminy: int = 0
    nminz: int = 0
    backend: str = "einsum"  # 'einsum' (XLA) | 'pallas' (fused TPU kernels)
    #: pallas matmul precision: 'mixed' (default; bf16 coefficient matmuls
    #: — the per-particle rounding averages out in the k-sums — + exact
    #: force matmuls), 'highest', or 'default' (bf16 everywhere,
    #: ~0.3%% per-particle force error)
    pallas_precision: str = "mixed"
    #: pallas kernel layout: 2 (default) = MXU-shaped contractions (the
    #: padded-lattice outer product built on the VPU + one fused complex
    #: matmul per pass), 1 = the round-2 selection-matmul layout
    pallas_version: int = 2

    # mirrors the SphereSL coef-file metadata protocol
    @property
    def lmax(self):
        return max(self.nmaxx, self.nmaxy, self.nmaxz)

    @property
    def nmax(self):
        return 2 * self.nmaxz + 1

    scale: float = 1.0

    @classmethod
    def create(cls, nmaxx=6, nmaxy=6, nmaxz=6, nminx=0, nminy=0, nminz=0,
               dtype=jnp.float32, backend: str = "einsum",
               pallas_precision: str = "mixed",
               pallas_version: int = 2) -> "Cube":
        kx = np.arange(-nmaxx, nmaxx + 1)
        ky = np.arange(-nmaxy, nmaxy + 1)
        kz = np.arange(-nmaxz, nmaxz + 1)
        KX, KY, KZ = np.meshgrid(kx, ky, kz, indexing="ij")
        k2 = KX**2 + KY**2 + KZ**2
        norm = np.zeros_like(k2, dtype=np.float64)
        mask = k2 > 0
        mask &= (np.abs(KX) >= nminx) & (np.abs(KY) >= nminy) \
            & (np.abs(KZ) >= nminz)
        norm[mask] = 1.0 / np.sqrt(np.pi * k2[mask])
        lap = (2.0 * np.pi) ** 2 * k2
        return cls(norm=jnp.asarray(norm, dtype=dtype),
                   lap=jnp.asarray(lap, dtype=dtype),
                   nmaxx=nmaxx, nmaxy=nmaxy, nmaxz=nmaxz,
                   nminx=nminx, nminy=nminy, nminz=nminz, backend=backend,
                   pallas_precision=pallas_precision,
                   pallas_version=pallas_version)

    def tree_flatten(self):
        return (self.norm, self.lap), (self.nmaxx, self.nmaxy, self.nmaxz,
                                       self.nminx, self.nminy, self.nminz,
                                       self.backend, self.pallas_precision,
                                       self.pallas_version)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)

    @property
    def coef_shape(self):
        return (2 * self.nmaxx + 1, 2 * self.nmaxy + 1, 2 * self.nmaxz + 1)

    def _cdtype(self, dtype):
        return jnp.complex128 if jnp.dtype(dtype) == jnp.float64 \
            else jnp.complex64

    def _phases(self, x, sign):
        """exp(sign * 2 pi i n x_c) for each axis; n = -nmax..nmax."""
        cd = self._cdtype(x.dtype)
        out = []
        for c, nmax in ((0, self.nmaxx), (1, self.nmaxy), (2, self.nmaxz)):
            n = jnp.arange(-nmax, nmax + 1, dtype=x.dtype)
            ang = sign * 2.0 * math.pi * x[:, c:c + 1] * n[None, :]
            out.append(jax.lax.complex(jnp.cos(ang), jnp.sin(ang)).astype(cd))
        return out

    # ------------------------------------------------------------------

    def _pallas_kernels(self):
        from exp_tpu.ops import pallas_cube as pk

        import jax as _jax

        key = (self.nmaxx, self.nmaxy, self.nmaxz, self.pallas_precision,
               self.pallas_version)
        ck = _PALLAS_CACHE.get(("coef",) + key)
        ak = _PALLAS_CACHE.get(("accel",) + key)
        if ck is None or ak is None:
            interp = jax.default_backend() == "cpu"
            hi = _jax.lax.Precision.HIGHEST
            lo = _jax.lax.Precision.DEFAULT
            pp = self.pallas_precision
            coef_prec = lo if pp in ("default", "mixed") else hi
            accel_prec = lo if pp == "default" else hi
            mk_c = (pk.make_cube_coef_kernel_v2 if self.pallas_version == 2
                    else pk.make_cube_coef_kernel)
            mk_a = (pk.make_cube_accel_kernel_v2 if self.pallas_version == 2
                    else pk.make_cube_accel_kernel)
            ck = mk_c(*key[:3], interpret=interp, precision=coef_prec)
            ak = mk_a(*key[:3], interpret=interp, precision=accel_prec)
            _PALLAS_CACHE[("coef",) + key] = ck
            _PALLAS_CACHE[("accel",) + key] = ak
        return ck, ak

    def coefficients_local(self, x, mass, accum_dtype=jnp.float32):
        """a_k partial sums; positions wrapped into the unit box."""
        if self.backend == "pallas":
            from exp_tpu.ops import pallas_cube as pk

            ck, _ = self._pallas_kernels()
            from exp_tpu.ops.padding import pad_particles

            x, mass, _ = pad_particles(x, mass)
            raw = ck(pk.pack_xyzm(x, mass))
            cd = self._cdtype(accum_dtype)
            return -raw.astype(cd) * self.norm.astype(cd)
        xw = jnp.mod(x, 1.0)
        ex, ey, ez = self._phases(xw, sign=-1.0)
        cd = self._cdtype(accum_dtype)
        m = mass.astype(x.dtype)
        exm = ex * m[:, None]
        t = jnp.einsum("ia,ib->iab", exm, ey)
        coef = jnp.einsum("iab,ic->abc", t, ez,
                          preferred_element_type=cd)
        return -coef * self.norm.astype(cd)

    def coefficients(self, x, mass, axis_name=None, accum_dtype=jnp.float32):
        c = self.coefficients_local(x, mass, accum_dtype=accum_dtype)
        if axis_name is not None:
            c = jax.lax.psum(c, axis_name)
        return c

    def acceleration(self, coef, x):
        """acc, pot from the coefficient tensor."""
        cd = self._cdtype(x.dtype)
        if self.backend == "pallas":
            from exp_tpu.ops import pallas_cube as pk

            _, ak = self._pallas_kernels()
            b = coef.astype(cd) * self.norm.astype(cd)
            from exp_tpu.ops.padding import pad_particles

            xp, _, n = pad_particles(x)
            x8 = pk.pack_xyzm(xp, jnp.zeros(xp.shape[0], x.dtype))
            if self.pallas_version == 2:
                M2 = pk.pack_force_matrix_v2(b, self.nmaxx, self.nmaxy,
                                             self.nmaxz)
                out = ak(x8, M2)
            else:
                Rr, Ri = pk.pack_force_matrix(b, self.nmaxx, self.nmaxy,
                                              self.nmaxz)
                out = ak(x8, Rr, Ri)
            return (out[0:3, :n].T.astype(x.dtype),
                    out[3, :n].astype(x.dtype))
        xw = jnp.mod(x, 1.0)
        ex, ey, ez = self._phases(xw, sign=+1.0)
        b = coef.astype(cd) * self.norm.astype(cd)      # a_k norm_k

        dtype = x.dtype
        kxv = jnp.arange(-self.nmaxx, self.nmaxx + 1, dtype=dtype)
        kyv = jnp.arange(-self.nmaxy, self.nmaxy + 1, dtype=dtype)
        kzv = jnp.arange(-self.nmaxz, self.nmaxz + 1, dtype=dtype)
        tpi = 2.0 * math.pi

        # contract axes one at a time, applying each 2 pi k_c weight at
        # axis c's OWN contraction stage so pot/ay/az share the big
        # leading intermediates (pot, ay, az share t1; pot, az share t2)
        # instead of re-running the full 3-stage chain four times
        t1 = jnp.einsum("abc,ia->ibc", b, ex)
        t1x = jnp.einsum("abc,a,ia->ibc", b, (tpi * kxv).astype(cd), ex)
        t2 = jnp.einsum("ibc,ib->ic", t1, ey)
        t2y = jnp.einsum("ibc,b,ib->ic", t1, (tpi * kyv).astype(cd), ey)
        pot = jnp.einsum("ic,ic->i", t2, ez).real.astype(dtype)
        # acc_c = -Re[ i 2 pi k_c * sum ] = +Im[2 pi k_c * sum]
        ax = jnp.imag(jnp.einsum("ibc,ib,ic->i",
                                 t1x, ey, ez))
        ay = jnp.imag(jnp.einsum("ic,ic->i", t2y, ez))
        az = jnp.imag(jnp.einsum("ic,c,ic->i", t2,
                                 (tpi * kzv).astype(cd), ez))
        acc = jnp.stack([ax, ay, az], axis=-1).astype(dtype)
        return acc, pot

    def density(self, coef, x):
        """BFE density: rho = -|2 pi k|^2 Phi_k a_k / (4 pi)."""
        cd = self._cdtype(x.dtype)
        xw = jnp.mod(x, 1.0)
        ex, ey, ez = self._phases(xw, sign=+1.0)
        b = coef.astype(cd) * (self.norm * self.lap).astype(cd) \
            / (-4.0 * math.pi)
        t1 = jnp.einsum("abc,ia->ibc", b, ex)
        t2 = jnp.einsum("ibc,ib->ic", t1, ey)
        return jnp.einsum("ic,ic->i", t2, ez).real.astype(x.dtype)
