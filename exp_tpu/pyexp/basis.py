"""pyEXP.basis compatibility (reference pyEXP/BasisWrappers.cc).

Reference-named surface over exp_tpu.analysis.basis.Basis: factory,
createFromReader/createFromArray, the incremental accumulate API
(initFromArray/addFromArray/makeFromArray, BiorthBasis.H:258-275),
getFields with the reference's label set (BiorthBasis.cc:71-96),
getBasis / orthoCheck / cacheInfo, the (l,m,n) <-> flat index helpers
I/invI, and IntegrateOrbits with the AccelFunc family
(BiorthBasis.H:1588, BasisWrappers.cc:3040-3160).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from exp_tpu.analysis.basis import Basis as _NativeBasis
from .coefs import CoefStruct, Coefs


class Basis:
    """Reference-shaped basis: camelCase methods, stateful accumulation."""

    def __init__(self, native: _NativeBasis):
        self._b = native
        self._accum = None          # (xs, ms) lists during accumulation
        self._coefs = None          # last made coefficient array
        self._time = 0.0
        self._center = np.zeros(3)
        self._field_type = ("cylindrical"
                            if native.geometry == "cylinder" else
                            "cartesian" if native.geometry in
                            ("cube", "slab") else "spherical")

    # -- factory ------------------------------------------------------------

    @staticmethod
    def factory(conf, workdir=".") -> "Basis":
        """Build from the same YAML stanza as the reference
        (BasisFactory.H:247)."""
        return Basis(_NativeBasis.factory(conf, workdir=workdir))

    # reference alias
    factory_string = factory

    @property
    def native(self) -> _NativeBasis:
        return self._b

    def getName(self):
        return self._b.name

    def basisIDname(self):
        return self._b.config.get("id", self._b.name)

    # -- coordinate/field-type selection ------------------------------------

    def setFieldType(self, coord: str):
        """'spherical' | 'cylindrical' | 'cartesian' | 'none'
        (coordinate system of the force columns in getFields)."""
        c = coord.lower()
        for full in ("spherical", "cylindrical", "cartesian", "none"):
            if full.startswith(c):
                self._field_type = full
                return
        raise ValueError(f"unknown field type {coord!r}")

    def getFieldType(self):
        return self._field_type

    def getFieldLabels(self):
        """Reference label set (BiorthBasis.cc:71-96)."""
        labels = ["dens m=0", "dens m>0", "dens",
                  "potl m=0", "potl m>0", "potl"]
        if self._field_type == "cylindrical":
            labels += ["rad force", "ver force", "azi force"]
        elif self._field_type == "cartesian":
            labels += ["x force", "y force", "z force"]
        elif self._field_type == "spherical":
            labels += ["rad force", "mer force", "azi force"]
        return labels

    # -- one-shot coefficient creation ---------------------------------------

    def createFromReader(self, reader, center=None, time=None) -> Coefs:
        """Project the reader's selected component
        (BiorthBasis.cc:4517-4582)."""
        mass, x, v = reader.Particles()
        t = reader.CurrentTime() if time is None else float(time)
        c = self._b.create_coefficients(x, mass, time=t, center=center)
        struct = CoefStruct(self._b.geometry, c, time=t,
                            center=center, name=self._b.name,
                            meta=self._b._meta())
        out = Coefs.makecoefs(struct, self._b.name)
        out.add(struct)
        return out

    def createFromArray(self, mass, pos, time=0.0, center=None,
                        roundrobin=True, posvelrows=False) -> CoefStruct:
        """One snapshot -> CoefStruct (reference returns the struct; wrap
        with Coefs.makecoefs/add to build a series)."""
        pos = np.asarray(pos)
        if posvelrows or (pos.ndim == 2 and pos.shape[0] == 3
                          and pos.shape[1] != 3):
            pos = pos.T
        c = self._b.create_coefficients(pos, mass, time=time, center=center)
        return CoefStruct(self._b.geometry, c, time=float(time),
                          center=center, name=self._b.name,
                          meta=self._b._meta())

    # -- incremental accumulation API (initFromArray/addFromArray/make) -----

    def initFromArray(self, center=None):
        self._accum = ([], [])
        self._center = (np.zeros(3) if center is None
                        else np.asarray(center, float))

    def addFromArray(self, mass, pos, posvelrows=False):
        if self._accum is None:
            raise RuntimeError("call initFromArray first")
        pos = np.asarray(pos, float)
        if posvelrows or (pos.ndim == 2 and pos.shape[0] == 3
                          and pos.shape[1] != 3):
            pos = pos.T
        self._accum[0].append(pos)
        self._accum[1].append(np.broadcast_to(
            np.asarray(mass, float), (pos.shape[0],)))

    def makeFromArray(self, time=0.0) -> CoefStruct:
        if self._accum is None:
            raise RuntimeError("call initFromArray first")
        xs = np.concatenate(self._accum[0])
        ms = np.concatenate(self._accum[1])
        self._accum = None
        return self.createFromArray(ms, xs, time=time, center=self._center)

    # per-particle accumulate (BasisWrappers.cc:1704); vector-friendly
    def accumulate(self, x, y, z, mass, indx=0):
        if self._accum is None:
            self.initFromArray()
        pos = np.stack([np.atleast_1d(np.asarray(x, float)),
                        np.atleast_1d(np.asarray(y, float)),
                        np.atleast_1d(np.asarray(z, float))], axis=-1)
        self._accum[0].append(pos)
        self._accum[1].append(np.broadcast_to(
            np.asarray(mass, float), (pos.shape[0],)))

    def reset_coefs(self):
        self._accum = ([], [])
        self._coefs = None

    def make_coefs(self):
        struct = self.makeFromArray(time=self._time)
        self._coefs = struct.coefs
        return struct

    def set_coefs(self, coefstruct):
        """Install coefficients for getFields (BiorthBasis set_coefs)."""
        if isinstance(coefstruct, CoefStruct):
            self._coefs = np.asarray(coefstruct.coefs)
            self._time = float(coefstruct.time)
        else:
            self._coefs = np.asarray(coefstruct)

    # -- field evaluation ----------------------------------------------------

    def _m_zeroed(self, coef):
        """Coefficient array with all m>0 (angular) channels zeroed."""
        c = np.array(coef)
        g = self._b.geometry
        if g == "sphere":
            c[:, :, 1:, :] = 0.0          # (cs, l, m, n)
            c[1] = 0.0                    # sin block is m>=1 only
        elif g == "cylinder":
            c[:, 1:, :] = 0.0             # (cs, m, n)
            c[1] = 0.0
        else:
            c[:] = 0.0                    # cube/slab: no azimuthal split
        return c

    def getFields(self, x, y, z):
        """Fields at one point or arrays of points; columns ordered by
        getFieldLabels()."""
        if self._coefs is None:
            raise RuntimeError("no coefficients: set_coefs/make_coefs first")
        pts = np.stack([np.atleast_1d(np.asarray(x, float)),
                        np.atleast_1d(np.asarray(y, float)),
                        np.atleast_1d(np.asarray(z, float))], axis=-1)
        dens, pot, acc = self._b.get_fields(self._coefs, pts)
        if self._b.geometry in ("cube", "slab"):
            # no azimuthal split for plane-wave bases: the m=0 columns
            # are identically zero — skip the second field evaluation
            d0 = np.zeros_like(dens)
            p0 = np.zeros_like(pot)
        else:
            d0, p0, _ = self._b.get_fields(self._m_zeroed(self._coefs), pts)
        cols = [d0, dens - d0, dens, p0, pot - p0, pot]
        ax, ay, az = acc[:, 0], acc[:, 1], acc[:, 2]
        if self._field_type == "cartesian":
            cols += [ax, ay, az]
        elif self._field_type == "cylindrical":
            R = np.hypot(pts[:, 0], pts[:, 1]) + 1e-30
            cp, sp = pts[:, 0] / R, pts[:, 1] / R
            cols += [ax * cp + ay * sp, az, -ax * sp + ay * cp]
        elif self._field_type == "spherical":
            R = np.hypot(pts[:, 0], pts[:, 1]) + 1e-30
            r = np.sqrt(R * R + pts[:, 2] ** 2) + 1e-30
            cp, sp = pts[:, 0] / R, pts[:, 1] / R
            ct, st = pts[:, 2] / r, R / r
            aR = ax * cp + ay * sp
            cols += [aR * st + az * ct, aR * ct - az * st,
                     -ax * sp + ay * cp]
        out = np.stack(cols, axis=-1)
        return out[0] if out.shape[0] == 1 else out

    def getFieldsCoefs(self, x, y, z, coefs: "Coefs"):
        """Fields at each stored time of a Coefs series ->
        dict time -> columns."""
        out = {}
        saved = self._coefs
        for t in coefs.Times():
            self.set_coefs(coefs.getCoefStruct(t))
            out[t] = self.getFields(x, y, z)
        self._coefs = saved
        return out

    # -- basis introspection -------------------------------------------------

    def getBasis(self, logxmin=-3.0, logxmax=0.5, numgrid=2000,
                 logzmin=-3.0, logzmax=0.5, numz=0,
                 zmin=None, zmax=None):
        """Tabulate the basis functions.

        Spherical: list over l of dict n -> {'potential', 'density',
        'rforce'} on a log radius grid (BasisWrappers.cc:1995).
        Cylindrical: dict m -> n -> {'potential', ...} on an (R, z)
        grid (BasisWrappers.cc:1811).
        Slab: nested list [kx][ky] of dict n -> {'potential', 'density',
        'zforce'} on a linear z grid zmin..zmax (BasisWrappers.cc:2574,
        BiorthBasis.cc:3892 Slab::getBasis)."""
        f = self._b.force
        g = self._b.geometry
        if g == "sphere":
            r = np.logspace(logxmin, logxmax, numgrid)
            grid = f.grid
            pot = np.asarray(grid.get_pot(jnp.asarray(r)))
            dens = np.asarray(grid.get_dens(jnp.asarray(r)))
            _, dpot = grid.get_pot_dpot(jnp.asarray(r))
            frc = -np.asarray(dpot)
            out = []
            for l in range(f.lmax + 1):
                out.append({n: {"potential": pot[:, l, n],
                                "density": dens[:, l, n],
                                "rforce": frc[:, l, n]}
                            for n in range(f.nmax)})
            return out
        if g == "cylinder":
            nz = numz or numgrid // 4
            R = np.logspace(logxmin, logxmax, numgrid)
            z = np.linspace(-(10 ** logzmax), 10 ** logzmax, nz)
            Rg, zg = np.meshgrid(R, z, indexing="ij")
            pts = np.stack([Rg.ravel(), np.zeros(Rg.size), zg.ravel()], -1)
            out = {}
            for m in range(f.mmax + 1):
                out[m] = {}
                for n in range(f.nmax):
                    c = np.zeros((2, f.mmax + 1, f.nmax), np.float32)
                    c[0, m, n] = 1.0
                    acc, pot = f.acceleration(jnp.asarray(c),
                                              jnp.asarray(pts, jnp.float32))
                    out[m][n] = {
                        "potential": np.asarray(pot).reshape(numgrid, nz),
                        "density": np.asarray(
                            f.density(jnp.asarray(c),
                                      jnp.asarray(pts, jnp.float32))
                        ).reshape(numgrid, nz)}
            return out
        if g == "slab":
            # vertical SL functions per non-negative (kx, ky) wavenumber
            # pair on a linear z grid (BiorthBasis.cc:3892-3950)
            zlo = -f.zmax if zmin is None else float(zmin)
            zhi = f.zmax if zmax is None else float(zmax)
            zq = np.linspace(zlo, zhi, numgrid)
            ztab = np.linspace(-f.zmax, f.zmax, f.numz)
            phi = np.asarray(self._b.force.phi_t, np.float64)
            dphi = np.asarray(self._b.force.dphi_t, np.float64)
            dens = np.asarray(self._b.force.dens_t, np.float64)
            out = []
            for ix in range(f.nmaxx + 1):
                row = []
                for iy in range(f.nmaxy + 1):
                    row.append({n: {
                        "potential": np.interp(zq, ztab, phi[:, ix, iy, n]),
                        "density": np.interp(zq, ztab, dens[:, ix, iy, n]),
                        "zforce": -np.interp(zq, ztab, dphi[:, ix, iy, n]),
                    } for n in range(f.nmax)})
                out.append(row)
            return out
        raise NotImplementedError(f"getBasis for geometry {g}")

    def orthoCheck(self, knots=40):
        """Biorthogonality Gram matrices: list over l (sphere) / m
        (cylinder) / (kx, ky) pairs (slab) of (nmax, nmax) inner products
        — ~ -identity for the sphere/cylinder potential/density pair,
        ~ +identity for slab (sign-folded) and cube (|Gram| of the plane
        waves, BiorthBasis.cc:4411) — exputil/orthoTest.cc."""
        f = self._b.force
        g = self._b.geometry
        if g == "sphere":
            from exp_tpu.ops import coords

            grid = f.grid
            xi = grid.xmin + grid.dxi * np.arange(grid.numr)
            r = np.asarray(coords.xi_to_r(xi, grid.cmap, grid.rmap))
            rp = 1.0 / np.asarray(coords.dxi_dr(xi, grid.cmap, grid.rmap))
            wq = np.full(grid.numr, grid.dxi)
            wq[0] = wq[-1] = 0.5 * grid.dxi
            pot = np.asarray(grid.pot_t)        # (numr, L+1, nmax)
            dens = np.asarray(grid.dens_t)
            return [np.einsum("jn,jm,j->nm", pot[:, l], dens[:, l],
                              r ** 2 * rp * wq)
                    for l in range(f.lmax + 1)]
        if g == "cylinder":
            # EOF tables carry the biorthogonal pair (U, D=4 pi rho):
            # int U^m_n D^m_n' R dR dz dphi = -delta_nn'
            # (EmpCylSL ortho check; azimuthal factor 2 pi for m=0, pi else)
            from exp_tpu.ops import coords

            xg = f.xmin + f.dx * np.arange(f.numx)
            Rg = np.asarray(coords.xi_to_r(xg, 1, f.acyl))
            zg = f.hcyl * np.sinh(f.ymin + f.dy * np.arange(f.numy))
            W2 = np.outer(np.gradient(Rg) * Rg, np.gradient(zg))
            sh = (f.numx, f.numy, f.mmax + 1, f.nmax)
            pot = np.asarray(f.pot_t, np.float64).reshape(sh)
            dens = np.asarray(f.dens_t, np.float64).reshape(sh)
            return [(2 * np.pi if m == 0 else np.pi)
                    * np.einsum("xyn,xym,xy->nm", pot[:, :, m],
                                dens[:, :, m], W2)
                    for m in range(f.mmax + 1)]
        if g == "slab":
            # per (kx, ky) pair: -int phi_n dens_n' dz = sgn_n delta_nn'
            # (SLGridSlab orthoCheck; sgn folded in so the result ~ +I,
            # matching the reference's convention of near-identity output)
            phi = np.asarray(f.phi_t, np.float64)
            dens = np.asarray(f.dens_t, np.float64)
            sgn = np.asarray(f.sgn, np.float64)[f.nmaxx:, f.nmaxy:]
            zg = np.linspace(-f.zmax, f.zmax, f.numz)
            w = np.gradient(zg)
            return [-np.einsum("zn,zm,z->nm", phi[:, ix, iy],
                               dens[:, ix, iy], w) * sgn[ix, iy][None, :]
                    for ix in range(f.nmaxx + 1)
                    for iy in range(f.nmaxy + 1)]
        if g == "cube":
            # plane waves on the unit torus: the Gram matrix factorizes
            # per axis, G = Gx kron Gy kron Gz with
            # Gx[k,k'] = int_0^1 e^{2 pi i (k'-k) x} dx = delta (exact at
            # any midpoint-rule resolution > the bandwidth); reference
            # returns a single |Gram| (BiorthBasis.cc:4411 Cube::orthoCheck)
            def axis_gram(nmax):
                nq = max(knots, 2 * nmax + 1)   # beyond the k' - k bandwidth
                k = np.arange(-nmax, nmax + 1)
                xq = (np.arange(nq) + 0.5) / nq
                e = np.exp(2j * np.pi * np.outer(k, xq))
                return (np.conj(e) @ e.T).real / nq
            G = np.kron(axis_gram(f.nmaxx),
                        np.kron(axis_gram(f.nmaxy), axis_gram(f.nmaxz)))
            return [np.abs(G)]
        raise NotImplementedError(f"orthoCheck for geometry {g}")

    def cacheInfo(self, cachefile: str):
        """Attributes of a basis cache file as a dict
        (EmpCylSL::cacheInfo / SLGridSph cache header)."""
        import h5py

        out = {}
        with h5py.File(cachefile, "r") as h5:
            def walk(name, obj):
                for k, v in obj.attrs.items():
                    out[f"{name}/{k}" if name else str(k)] = (
                        v.item() if hasattr(v, "item") else v)
            walk("", h5)
            h5.visititems(walk)
        return out

    # -- (l, m, n) index helpers (Spherical only) ----------------------------

    def I(self, l, m, n=0):
        """Flat row index of (l, m) in the packed coefficient matrix
        (BasisWrappers.cc:2065)."""
        if m > l:
            raise ValueError("m > l")
        return l * (l + 1) // 2 + m

    def invI(self, I):
        """Inverse of I(): flat index -> (l, m)."""
        l = int((np.sqrt(8 * I + 1) - 1) // 2)
        return l, I - l * (l + 1) // 2

    # total gravitating mass inside radius r (Spherical getMass analogue)
    def getMass(self, r):
        if self._b.geometry != "sphere":
            raise NotImplementedError("getMass is spherical-only")
        if self._coefs is None:
            raise RuntimeError("set_coefs first")
        # M(<r) = -r^2 dPhi/dr |_monopole = r^2 * (radial acceleration
        # magnitude of the l=0 channel)
        c_mono = np.zeros_like(np.asarray(self._coefs))
        c_mono[0, 0, 0, :] = np.asarray(self._coefs)[0, 0, 0, :]
        pts = np.array([[float(r), 0.0, 0.0]])
        _, _, acc = self._b.get_fields(c_mono, pts)
        return float(-acc[0, 0] * r ** 2)


# ---------------------------------------------------------------------------
# Orbit integration (BasisWrappers.cc:3040-3160; BiorthBasis.cc:5056)

class AccelFunc:
    """Base acceleration functor: F(time, ps, accel, mod) adds the
    acceleration of model `mod` = (Basis, Coefs) to `accel`."""

    def F(self, time, ps, accel, mod):
        raise NotImplementedError


class AllTimeAccel(AccelFunc):
    """Interpolates coefficients from the Coefs series at every time."""

    def F(self, time, ps, accel, mod):
        basis, coefs = mod
        nat = coefs._c if hasattr(coefs, "_c") else coefs
        c = nat.interpolate(time)
        b = basis.native if hasattr(basis, "native") else basis
        _, _, acc3 = b.get_fields(c, ps[:, :3])
        accel[:, :3] += acc3
        return accel


class SingleTimeAccel(AccelFunc):
    """Uses the coefficient set at one fixed time."""

    def __init__(self, time, mods=None):
        self.time = float(time)
        self._cache = {}

    def F(self, time, ps, accel, mod):
        basis, coefs = mod
        nat = coefs._c if hasattr(coefs, "_c") else coefs
        key = id(coefs)
        if key not in self._cache:
            self._cache[key] = nat.interpolate(self.time)
        b = basis.native if hasattr(basis, "native") else basis
        _, _, acc3 = b.get_fields(self._cache[key], ps[:, :3])
        accel[:, :3] += acc3
        return accel


def IntegrateOrbits(tinit, tfinal, h, ps, bfe, func, nout=0):
    """Leapfrog orbit integration in the field of `bfe` = list of
    (Basis, Coefs) pairs (BiorthBasis.cc:5056 IntegrateOrbits).

    ps: (n, 6) phase space [x, y, z, u, v, w].
    Returns (times (T,), orbits (T, n, 6) float32)."""
    ps = np.array(ps, float)
    nsteps = max(1, int(round((tfinal - tinit) / h)))
    h = (tfinal - tinit) / nsteps
    stride = max(1, nsteps // nout) if nout > 0 else 1

    def accel_at(t, ps):
        a = np.zeros((ps.shape[0], 6))
        for mod in bfe:
            a = func.F(t, ps, a, mod)
        return a[:, :3]

    times = [tinit]
    out = [ps.copy()]
    a = accel_at(tinit, ps)
    t = tinit
    for i in range(nsteps):
        ps[:, 3:6] += 0.5 * h * a
        ps[:, 0:3] += h * ps[:, 3:6]
        t += h
        a = accel_at(t, ps)
        ps[:, 3:6] += 0.5 * h * a
        if (i + 1) % stride == 0 or i == nsteps - 1:
            times.append(t)
            out.append(ps.copy())
    return np.asarray(times), np.asarray(out, np.float32)
