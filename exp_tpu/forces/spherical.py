"""Spherical BFE force (pure JAX, TPU-first).

The device-side equivalent of the reference's SphericalBasis/Sphere force
pipeline (src/SphericalBasis.cc, src/Sphere.cc, cudaSphericalBasis.cu),
re-designed as two batched tensor contractions over sharded SoA particle
arrays:

  coefficients (HOT LOOP #1, reference SphericalBasis.cc:429-599):
      c[l,m,n] = -4 pi sum_i m_i fac[l,m] P_lm(cos th_i) trig(m phi_i)
                 * pot_ln(r_i/scale)
    -> per-particle Legendre/trig blocks + a radial table gather, contracted
       with one einsum (MXU) and reduced across the particle mesh axis with
       `jax.lax.psum` (replacing MPI_Allreduce, SphericalBasis.cc:871-896).

  acceleration (HOT LOOP #2, reference SphericalBasis.cc:1476-1700):
      Phi   = sum fac P_lm (c cos + s sin) pot_ln
      dPhi/dr, (1/sin th) dPhi/dth, dPhi/dphi  ->  Cartesian acceleration
    with the vacuum multipole continuation (rmax/r)^(l+1) outside the table
    range (SphericalBasis.cc:1570-1633).

Real coefficient layout: cos/sin stacked, shape (2, lmax+1, lmax+1, nmax)
indexed [cs, l, m, n]; entries with m > l are zero.  Normalization matches
the reference: fac[l,m] = sqrt((2l+1)/4pi (l-m)!/(l+m)!) (* sqrt2 for m>0),
unnormalized Condon–Shortley P_lm (src/SphericalBasis.cc:328-335).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from exp_tpu.basis.slgrid import SLGridSph, SphSLTables
from exp_tpu.ops import coords
from exp_tpu.ops.special import legendre_lm, dlegendre_lm, sincos_m, real_ylm_norm

DSMALL = 1.0e-16

#: compiled pallas kernels keyed by static basis geometry
_PALLAS_CACHE: dict = {}


def _dsmall(dtype):
    """Radius floor guarding r -> 0 divisions; dtype-aware so that r^3 does
    not underflow in float32 (the reference's DSMALL=1e-16 is f64-only)."""
    return 1.0e-16 if jnp.dtype(dtype) == jnp.float64 else 1.0e-10


def spline_radial_tables(pot_flat, xi_fine, ncs):
    """Spline tables for the pallas 'spline' interp: resample the fine
    (numr, F) pot table and its d/dxi (2nd-order stencil on the fine f64
    grid, so the tabulated derivative carries fine-grid accuracy) onto ncs
    uniform xi nodes and prefilter both into ghost-extended quadratic
    B-spline coefficients (ncs + 2, F) f32."""
    from exp_tpu.ops.pallas_cylinder import prefilter_x

    xi_s = np.linspace(xi_fine[0], xi_fine[-1], ncs)
    dxi_fine = float(xi_fine[1] - xi_fine[0])
    dpt = np.gradient(pot_flat, dxi_fine, axis=0, edge_order=2)
    tabs = np.empty((ncs, pot_flat.shape[1]))
    tabd = np.empty((ncs, pot_flat.shape[1]))
    for k in range(pot_flat.shape[1]):
        tabs[:, k] = np.interp(xi_s, xi_fine, pot_flat[:, k])
        tabd[:, k] = np.interp(xi_s, xi_fine, dpt[:, k])
    return jnp.asarray(prefilter_x(tabs)), jnp.asarray(prefilter_x(tabd))


@jax.tree_util.register_pytree_node_class
@dataclass
class SphereSL:
    """sphereSL force: SL basis grid + harmonics metadata.

    A pytree so it can be passed through jit/shard_map.  `fac` is the real-Ylm
    normalization matrix (lmax+1, lmax+1).

    Two evaluation backends:
      'gather' — per-particle row gather from the full-resolution table
                 (reference-equivalent; good on CPU, slow XLA gathers on TPU)
      'matmul' — TPU-first: linear interpolation expressed as a hat-function
                 two-hot weight matrix W[i,j] = relu(1 - |t_i - j|) against a
                 coarse resampled table, so the radial evaluation and the
                 coefficient reduction are MXU matmuls with NO gather.
                 Processed in particle chunks (lax.map) to bound memory.
      'pallas' — fully fused TPU kernels (ops/pallas_sphere.py): one HBM
                 pass per kernel; ~30x faster than the XLA paths at equal
                 (full f32) precision.  Falls back to interpret mode on CPU.
    """

    grid: SLGridSph
    fac: jax.Array
    tabc: jax.Array          # coarse table (numr_c, (L+1)*nmax) for 'matmul'
    lmax: int
    nmax: int
    scale: float = 1.0
    backend: str = "matmul"
    numr_c: int = 512
    chunk: int = 65536
    #: pallas spline tables (pallas_interp='spline'): ghost-extended
    #: prefiltered quadratic-B-spline coefficients of pot and d(pot)/dxi,
    #: each (numr_cs + 2, (L+1)*nmax).  O(h^3) interpolation lets the
    #: spline grid run at half the hat resolution — half the weight-build
    #: VPU work and half the interpolation matmul in both kernels — while
    #: staying MORE accurate, and the tabulated derivative removes the
    #: hat-difference dWt build entirely.
    tabc_s: jax.Array = None
    tabd_s: jax.Array = None
    numr_cs: int = 256
    #: pallas backend matmul precision.  With the spline tables (tabulated
    #: derivative — no hat-difference cancellation) measured v5e @1M
    #: lmax=4/nmax=10:
    #:   'highest': coef 3.45 ms / accel 4.36 ms; baseline accuracy.
    #:   'default': coef 2.68 / accel 3.53; coefficient error UNCHANGED
    #:     (2.3e-5 — per-particle bf16 rounding averages out in the global
    #:     sum) but per-particle force error p50 1.2e-3, p99 3.6e-3.
    #:   'mixed' (the default): coef at bf16 'default' (free — sum error
    #:     unchanged), accel at 'highest' (exact per-particle forces).
    #:   'mixed3': accel interpolation matmul via the 3-pass
    #:     bf16-compensated _dotNT_c3 (force err 1.3e-5) — measured only
    #:     7% faster than 'mixed' (the pass is VPU-dominated) at 1.3x
    #:     the 1000-step drift; kept as an opt-in, not the default
    #:     (doc/benchmarks.md round-4 variants table).
    #: 1000-step |dE/E| @262k: highest 1.2e-6, mixed 6.1e-6,
    #: default 5.0e-5.
    #: With the legacy 'hat' interp, 'default' additionally breaks the
    #: hat-difference radial derivative — only 'highest' is safe there.
    pallas_precision: str = "mixed"
    #: pallas radial interpolation: 'spline' (default; prefiltered
    #: quadratic B-spline at numr_cs nodes + tabulated d(pot)/dxi) or
    #: 'hat' (legacy: hats at numr_c nodes, hat-difference derivative)
    pallas_interp: str = "spline"
    #: pallas angular evaluation: 'poly' — solid-harmonic monomial
    #: matmuls on the MXU (ops/solidharm.py; no Legendre/dP recurrences,
    #: no (1, B) per-harmonic assembly loop, pole-regular gradients),
    #: 'recurrence' — the legacy recurrence kernels, 'auto' — fastest
    #: measured mix (poly coefficient pass at lmax <= 6, recurrence
    #: force pass; see _harmonics_eff)
    pallas_harmonics: str = "auto"
    #: default radial-derivative mode for the XLA acceleration paths
    #: (SLGridSph.get_pot_dpot): 'stencil3' (3-point stencil — smoother,
    #: the production default) or 'lerp' (hat-difference — the
    #: reference's exact scheme, SLGridMP2.cc:767-1100; use for
    #: bit-parity runs against reference trajectories: the f64 drift
    #: gate holds 1e-15 over 1000 steps with it, scripts/
    #: drift_gate_f64.py).  The pallas backend tabulates d(pot)/dxi
    #: directly and ignores this.
    deriv: str = "stencil3"

    @classmethod
    def from_tables(cls, t: SphSLTables, scale: float = 1.0,
                    dtype=jnp.float32, backend: str = "matmul",
                    numr_c: int = 512, chunk: int = 65536,
                    pallas_precision: str = "mixed",
                    pallas_interp: str = "spline",
                    numr_cs: int = 256,
                    pallas_harmonics: str = "auto",
                    deriv: str = "stencil3") -> "SphereSL":
        if pallas_precision not in ("default", "mixed", "mixed3",
                                    "highest"):
            # a typo would otherwise silently fall through to HIGHEST in
            # the kernel-precision resolution below
            raise ValueError(
                f"pallas_precision={pallas_precision!r}: expected one of "
                "'default', 'mixed', 'mixed3', 'highest'")
        if pallas_precision == "mixed3" and pallas_harmonics == "poly":
            # the bf16x3 compensated path inside the POLY-harmonics accel
            # kernel has no real-TPU coverage (CI runs interpret mode on
            # CPU; the benchmarked default resolves to the recurrence
            # kernel) — keep the validated combination only
            raise ValueError(
                "pallas_precision='mixed3' is validated with the "
                "recurrence accel kernel only; use pallas_harmonics="
                "'auto'/'recurrence' with mixed3")
        grid = SLGridSph.from_tables(t, dtype=dtype)
        # resample the (numr, L+1, nmax) table onto a coarse uniform xi grid
        import numpy as np

        nc = min(numr_c, t.numr)
        xi_c = np.linspace(t.xmin, t.xmax, nc)
        pt = t.pot_table.reshape(t.numr, -1)
        tabc = np.empty((nc, pt.shape[1]))
        for k in range(pt.shape[1]):
            tabc[:, k] = np.interp(xi_c, t.xi, pt[:, k])
        ncs = min(numr_cs, t.numr)
        tabc_s, tabd_s = spline_radial_tables(pt, np.asarray(t.xi), ncs)
        return cls(grid=grid, fac=real_ylm_norm(t.lmax, dtype=dtype),
                   tabc=jnp.asarray(tabc, dtype=dtype),
                   lmax=t.lmax, nmax=t.nmax, scale=scale, backend=backend,
                   numr_c=nc, chunk=chunk,
                   tabc_s=tabc_s, tabd_s=tabd_s,
                   numr_cs=ncs, pallas_precision=pallas_precision,
                   pallas_interp=pallas_interp,
                   pallas_harmonics=pallas_harmonics, deriv=deriv)

    def tree_flatten(self):
        return (self.grid, self.fac, self.tabc, self.tabc_s, self.tabd_s), (
            self.lmax, self.nmax, self.scale, self.backend, self.numr_c,
            self.chunk, self.numr_cs, self.pallas_precision,
            self.pallas_interp, self.pallas_harmonics, self.deriv)

    @classmethod
    def tree_unflatten(cls, aux, children):
        grid, fac, tabc, tabc_s, tabd_s = children
        (lmax, nmax, scale, backend, numr_c, chunk, numr_cs,
         pallas_precision, pallas_interp, pallas_harmonics, deriv) = aux
        return cls(grid=grid, fac=fac, tabc=tabc, tabc_s=tabc_s,
                   tabd_s=tabd_s, lmax=lmax, nmax=nmax, scale=scale,
                   backend=backend, numr_c=numr_c, chunk=chunk,
                   numr_cs=numr_cs, pallas_precision=pallas_precision,
                   pallas_interp=pallas_interp,
                   pallas_harmonics=pallas_harmonics, deriv=deriv)

    @property
    def _interp_eff(self):
        """'spline' only when the spline tables exist (directly-constructed
        forces — bessel/analytic — may carry only the hat table)."""
        return (self.pallas_interp
                if self.tabc_s is not None else "hat")

    def _harmonics_eff(self, kind="coef"):
        """Angular evaluation per kernel.  'auto' picks what measured
        fastest on v5e @1M: poly for the coefficient pass (the M @ mono
        matmul beats the per-harmonic row loop by ~8% at lmax=4-6),
        recurrence for the force pass (the 4x taller gradient-matrix
        matmul gives the win back); poly only while the f32 monomial
        representation holds (~lmax <= 6, losing ~a digit per extra l)."""
        if self.pallas_harmonics == "auto":
            if kind == "coef":
                return "poly" if self.lmax <= 6 else "recurrence"
            return "recurrence"
        return self.pallas_harmonics

    # -- coarse-grid helpers (matmul backend) ---------------------------

    @property
    def _dxc(self):
        g = self.grid
        # coarse grid spans the same [xmin, xmax]
        return (g.xmin + g.dxi * (g.numr - 1) - g.xmin) / (self.numr_c - 1)

    def _hat_weights(self, rs, deriv=False):
        """Two-hot interpolation weight matrix (N, numr_c) and optionally its
        xi-derivative counterpart."""
        g = self.grid
        xi = g.xi_of_r(rs)
        dxc = self._dxc
        t = jnp.clip((xi - g.xmin) / dxc, 0.0, self.numr_c - 1.0)
        j = jnp.arange(self.numr_c, dtype=rs.dtype)
        d = j[None, :] - t[:, None]
        W = jnp.maximum(0.0, 1.0 - jnp.abs(d))
        if not deriv:
            return W, None
        # cell-based derivative: +-1/dx at the cell endpoints.  (sign(d) with
        # |d|<1 has a hole when t lands exactly on a grid node.)
        fl = jnp.clip(jnp.floor(t), 0.0, self.numr_c - 2.0)
        e = j[None, :] - fl[:, None]
        dW = ((e == 1.0).astype(rs.dtype)
              - (e == 0.0).astype(rs.dtype)) / dxc
        fac = coords.dxi_dr(xi, g.cmap, g.rmap)
        return W, dW * fac[:, None]

    @property
    def coef_shape(self):
        return (2, self.lmax + 1, self.lmax + 1, self.nmax)

    # ------------------------------------------------------------------
    # Coefficients
    # ------------------------------------------------------------------

    def coefficients_local(self, x: jax.Array, mass: jax.Array,
                           accum_dtype=jnp.float32) -> jax.Array:
        """Shard-local coefficient contribution.

        Args:
          x: positions (N, 3) (already centered).
          mass: (N,); zero-mass rows are padding and contribute nothing.

        Returns: (2, lmax+1, lmax+1, nmax) coefficient partial sums.
        """
        if self.backend == "pallas":
            from exp_tpu.ops import pallas_sphere as pk

            ck, _ = self._pallas_kernels()
            from exp_tpu.ops.padding import pad_particles

            x, mass, _ = pad_particles(x, mass, block=pk.SPHERE_BLOCK)
            tab = (self.tabc_s if self._interp_eff == "spline"
                   else self.tabc)
            return ck(pk.pack_xyzm(x, mass), pk.pad_table(
                tab, self.lmax, self.nmax)
            ).astype(accum_dtype)
        if self.backend == "matmul":
            return self._chunked_sum(self._coef_chunk_matmul, x, mass,
                                     accum_dtype)
        return self._coef_chunk_gather(x, mass, accum_dtype)

    def _pallas_kernels(self):
        from exp_tpu.ops import pallas_sphere as pk
        import jax as _jax

        g = self.grid
        spline = self._interp_eff == "spline"
        nc = self.numr_cs if spline else self.numr_c
        dxc = (g.dxi * (g.numr - 1)) / (nc - 1)
        harm_c = self._harmonics_eff("coef")
        harm_a = self._harmonics_eff("accel")
        fac_np = np.asarray(self.fac, np.float32)
        key = (self.lmax, self.nmax, nc, float(g.xmin),
               float(dxc), float(g.rmin), float(g.rmax),
               g.cmap, float(g.rmap), float(self.scale),
               self.pallas_precision, self._interp_eff, harm_c, harm_a,
               fac_np.tobytes())     # fac is baked into the kernels
        ck = _PALLAS_CACHE.get(("coef",) + key)
        ak = _PALLAS_CACHE.get(("accel",) + key)
        if ck is None or ak is None:
            interpret = _jax.default_backend() == "cpu"
            hi = _jax.lax.Precision.HIGHEST
            lo = _jax.lax.Precision.DEFAULT
            pp = self.pallas_precision
            if self._interp_eff == "hat" and pp != "default":
                # hat-difference derivative requires exact matmuls
                coef_prec = accel_prec = hi
            else:
                coef_prec = lo if pp in ("default", "mixed",
                                         "mixed3") else hi
                # 'mixed3': accel interpolation matmul via the 3-pass
                # bf16-compensated _dotNT_c3 (~1e-5 per-particle force
                # error at half HIGHEST's MXU cost); probed by
                # scripts/probe_accel_variants.py + probe_sphere_drift.py
                accel_prec = ("bf16x3" if pp == "mixed3"
                              else lo if pp == "default" else hi)
            mk_coef = (pk.make_coef_kernel_poly if harm_c == "poly"
                       else pk.make_coef_kernel)
            mk_accel = (pk.make_accel_kernel_poly if harm_a == "poly"
                        else pk.make_accel_kernel)
            ck = mk_coef(self.lmax, self.nmax, nc,
                         key[3], key[4], key[5], key[6],
                         g.cmap, key[8], key[9], fac_np,
                         interpret=interpret,
                         precision=coef_prec,
                         interp=self._interp_eff)
            ak = mk_accel(self.lmax, self.nmax, nc,
                          key[3], key[4], key[5], key[6],
                          g.cmap, key[8], key[9], fac_np,
                          interpret=interpret,
                          precision=accel_prec,
                          interp=self._interp_eff)
            _PALLAS_CACHE[("coef",) + key] = ck
            _PALLAS_CACHE[("accel",) + key] = ak
        return ck, ak

    def _angular(self, x, mass):
        """Common per-particle geometry + masked weight."""
        g = self.grid
        r = jnp.sqrt(jnp.sum(x * x, axis=-1)) + _dsmall(x.dtype)
        costh = x[:, 2] / r
        phi = jnp.arctan2(x[:, 1], x[:, 0])
        rs = r / self.scale
        # mask to the table's radial support (reference: r in [rmin, rmax],
        # SphericalBasis.cc:488)
        w = jnp.where((rs >= g.rmin) & (rs <= g.rmax), mass, 0.0)
        return r, rs, costh, phi, w

    def _coef_chunk_gather(self, x, mass, accum_dtype):
        lmax = self.lmax
        r, rs, costh, phi, w = self._angular(x, mass)
        P = legendre_lm(lmax, costh)                 # (N, L+1, L+1)
        cosm, sinm = sincos_m(lmax, phi)             # (N, L+1)
        potd = self.grid.get_pot(rs)                 # (N, L+1, nmax)

        wyc = self.fac[None] * P * cosm[:, None, :] * w[:, None, None]
        wys = self.fac[None] * P * sinm[:, None, :] * w[:, None, None]
        cc = jnp.einsum("ilm,iln->lmn", wyc, potd,
                        preferred_element_type=accum_dtype)
        cs = jnp.einsum("ilm,iln->lmn", wys, potd,
                        preferred_element_type=accum_dtype)
        return -4.0 * math.pi * jnp.stack([cc, cs])

    def _coef_chunk_matmul(self, x, mass, accum_dtype):
        """Gather-free chunk: hat-weight matmul + one big MXU contraction.

        The (lm) x (l', n) cross terms with l' != l are wasted FLOPs (factor
        ~(L+1)/2) but the contraction is one dense matmul — far faster on the
        MXU than gathers + batched skinny einsums."""
        lmax, nmax = self.lmax, self.nmax
        nlm = (lmax + 1) * (lmax + 1)
        r, rs, costh, phi, w = self._angular(x, mass)
        P = legendre_lm(lmax, costh)
        cosm, sinm = sincos_m(lmax, phi)
        yc = (self.fac[None] * P * cosm[:, None, :]).reshape(-1, nlm)
        ys = (self.fac[None] * P * sinm[:, None, :]).reshape(-1, nlm)
        Y2 = jnp.concatenate([yc * w[:, None], ys * w[:, None]], axis=1)

        W, _ = self._hat_weights(rs)
        G = jnp.dot(W, self.tabc, preferred_element_type=x.dtype)
        big = jnp.dot(Y2.T, G, preferred_element_type=accum_dtype)
        big = big.reshape(2, lmax + 1, lmax + 1, lmax + 1, nmax)
        lsel = jnp.arange(lmax + 1)
        out = jnp.moveaxis(big[:, lsel, :, lsel, :], 0, 1)
        return -4.0 * math.pi * out

    def _chunked_sum(self, fn, x, mass, accum_dtype):
        """Apply a per-chunk reducer over particle chunks and sum."""
        n = x.shape[0]
        ch = self.chunk
        if n <= ch or n % ch != 0:
            return fn(x, mass, accum_dtype)
        xc = x.reshape(n // ch, ch, 3)
        mc = mass.reshape(n // ch, ch)
        parts = jax.lax.map(lambda ab: fn(ab[0], ab[1], accum_dtype),
                            (xc, mc))
        return jnp.sum(parts, axis=0)

    def coefficients(self, x, mass, axis_name=None, accum_dtype=jnp.float32):
        """Full coefficients; psum across `axis_name` if inside shard_map."""
        c = self.coefficients_local(x, mass, accum_dtype=accum_dtype)
        if axis_name is not None:
            c = jax.lax.psum(c, axis_name)
        return c

    # ------------------------------------------------------------------
    # Acceleration / potential
    # ------------------------------------------------------------------

    def acceleration(self, coef: jax.Array, x: jax.Array,
                     deriv: str | None = None):
        """Acceleration and potential from coefficients.

        Args:
          coef: (2, lmax+1, lmax+1, nmax).
          x: positions (N, 3).
          deriv: radial-derivative mode, see SLGridSph.get_pot_dpot;
            None uses the force's configured `self.deriv`.

        Returns (acc (N, 3), pot (N,)).
        """
        deriv = deriv if deriv is not None else self.deriv
        coef = coef.astype(x.dtype)
        n = x.shape[0]
        ch = self.chunk
        if self.backend == "pallas":
            from exp_tpu.ops import pallas_sphere as pk

            _, ak = self._pallas_kernels()
            if self._interp_eff == "spline":
                twT = pk.contract_coef_table2_jit(coef, self.tabc_s,
                                                  self.tabd_s, self.lmax,
                                                  self.nmax)
            else:
                twT = pk.contract_coef_table_jit(coef, self.tabc,
                                                 self.lmax, self.nmax)
            from exp_tpu.ops.padding import pad_particles

            xp, _, _ = pad_particles(x, fill=1.0,
                                     block=pk.SPHERE_BLOCK)
            out = ak(pk.pack_xyzm(xp, jnp.zeros(xp.shape[0], x.dtype)),
                     twT)
            return (out[0:3, :n].T.astype(x.dtype),
                    out[3, :n].astype(x.dtype))
        if self.backend == "matmul" and n > ch and n % ch == 0:
            xc = x.reshape(n // ch, ch, 3)
            acc, pot = jax.lax.map(
                lambda xx: self._accel_chunk(coef, xx, deriv), xc)
            return acc.reshape(n, 3), pot.reshape(n)
        return self._accel_chunk(coef, x, deriv)

    def _accel_chunk(self, coef, x, deriv="stencil3"):
        lmax = self.lmax
        g = self.grid
        dtype = x.dtype

        r = jnp.sqrt(jnp.sum(x * x, axis=-1)) + _dsmall(x.dtype)
        costh = x[:, 2] / r
        phi = jnp.arctan2(x[:, 1], x[:, 0])

        # clamp to table range; outside rmax apply multipole continuation
        outside = r > g.rmax * self.scale
        r_eval = jnp.minimum(r, g.rmax * self.scale)
        # clamp below rmin too: the gather path's lerp would otherwise
        # EXTRAPOLATE the radial tables off the inner edge (the matmul
        # path's hat weights already clip, and the reference holds the
        # boundary value, SLGridMP2.cc get_pot xi clamping)
        rs = jnp.maximum(r_eval / self.scale, g.rmin)

        P, dP = dlegendre_lm(lmax, costh)            # (N, L+1, L+1)
        cosm, sinm = sincos_m(lmax, phi)             # (N, L+1)
        if self.backend == "matmul":
            W, dW = self._hat_weights(rs, deriv=True)
            sh = (x.shape[0], lmax + 1, self.nmax)
            potd = jnp.dot(W, self.tabc,
                           preferred_element_type=dtype).reshape(sh)
            dpot = jnp.dot(dW, self.tabc,
                           preferred_element_type=dtype).reshape(sh)
        else:
            potd, dpot = g.get_pot_dpot(rs, deriv=deriv)  # (N, L+1, nmax)

        cc, ss = coef[0], coef[1]
        # radial series: contract n  ->  (N, L+1(l), L+1(m))
        pc = jnp.einsum("lmn,iln->ilm", cc, potd)
        ps = jnp.einsum("lmn,iln->ilm", ss, potd)
        dpc = jnp.einsum("lmn,iln->ilm", cc, dpot)
        dps = jnp.einsum("lmn,iln->ilm", ss, dpot)

        # vacuum continuation for r > rmax: p *= (rmax/r)^(l+1),
        # dp = -(l+1) p / r (SphericalBasis.cc:1570-1633)
        lvals = jnp.arange(lmax + 1, dtype=dtype)
        att = jnp.power((g.rmax * self.scale / r)[:, None], lvals + 1.0)
        att = jnp.where(outside[:, None], att, 1.0)      # (N, L+1)
        pc = pc * att[:, :, None]
        ps = ps * att[:, :, None]
        # NB: the outside derivative must be taken wrt the SCALED radius
        # (r/scale, unclamped) because potr is divided by scale^2 below just
        # like the inside-table derivative d/d(rs); using physical r here
        # double-counts one 1/scale (wrong force for scale != 1 at r > rmax).
        dfac_out = (-(lvals + 1.0)[None, :, None]
                    / (r / self.scale)[:, None, None])
        dpc = jnp.where(outside[:, None, None], pc * dfac_out, dpc * att[:, :, None])
        dps = jnp.where(outside[:, None, None], ps * dfac_out, dps * att[:, :, None])

        facL = self.fac[None] * P                    # (N, L+1, L+1)
        facD = self.fac[None] * dP
        mvals = jnp.arange(lmax + 1, dtype=dtype)

        cosm_b = cosm[:, None, :]
        sinm_b = sinm[:, None, :]

        potl = jnp.sum(facL * (pc * cosm_b + ps * sinm_b), axis=(1, 2))
        potr = jnp.sum(facL * (dpc * cosm_b + dps * sinm_b), axis=(1, 2))
        pott = jnp.sum(facD * (pc * cosm_b + ps * sinm_b), axis=(1, 2))
        potp = jnp.sum(facL * (ps * cosm_b - pc * sinm_b) * mvals[None, None, :],
                       axis=(1, 2))

        s = self.scale
        potr = potr / (s * s)
        potl = potl / s
        pott = pott / s
        potp = potp / s

        xx, yy, zz = x[:, 0], x[:, 1], x[:, 2]
        r3 = r * r * r
        rho2 = xx * xx + yy * yy

        ax = -(potr * xx / r - pott * xx * zz / r3)
        ay = -(potr * yy / r - pott * yy * zz / r3)
        az = -(potr * zz / r + pott * rho2 / r3)
        safe = rho2 > _dsmall(x.dtype)
        ax = ax + jnp.where(safe, potp * yy / rho2, 0.0)
        ay = ay - jnp.where(safe, potp * xx / rho2, 0.0)

        return jnp.stack([ax, ay, az], axis=-1), potl

    # ------------------------------------------------------------------
    # Field evaluation (density) — used by analysis
    # ------------------------------------------------------------------

    def density(self, coef: jax.Array, x: jax.Array):
        """BFE density (of 4 pi rho / 4 pi, i.e. physical rho) at points x."""
        lmax = self.lmax
        g = self.grid
        coef = coef.astype(x.dtype)

        r = jnp.sqrt(jnp.sum(x * x, axis=-1)) + _dsmall(x.dtype)
        costh = x[:, 2] / r
        phi = jnp.arctan2(x[:, 1], x[:, 0])
        rs = jnp.clip(r / self.scale, g.rmin, g.rmax)

        P = legendre_lm(lmax, costh)
        cosm, sinm = sincos_m(lmax, phi)
        densd = g.get_dens(rs)                       # (N, L+1, nmax)

        dc = jnp.einsum("lmn,iln->ilm", coef[0], densd)
        dsn = jnp.einsum("lmn,iln->ilm", coef[1], densd)
        facL = self.fac[None] * P
        dens = jnp.sum(facL * (dc * cosm[:, None, :] + dsn * sinm[:, None, :]),
                       axis=(1, 2))
        # dens tables carry 4 pi rho; return physical density / scale^3
        return dens / (4.0 * math.pi) / self.scale**3
