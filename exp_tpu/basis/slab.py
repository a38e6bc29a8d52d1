"""Slab basis: periodic in (x, y), conditioned vertical functions in z.

The capability of the reference's SlabSL force (src/SlabSL.cc,
SLGridSlab in exputil/SLGridMP2.cc:2760-2833): gravitational field of a
plane-parallel slab on the unit box [0,1]^2 x [-zmax, zmax],

    Phi(x) = sum_{kx,ky,n} a_{k n} e^{2 pi i (kx x + ky y)} phi^k_n(z)

Construction (replaces the sledge slab solve with Green's functions): for
each horizontal wavenumber kappa = 2 pi |k| and vertical seed densities
d_j(z) = rho0(z) P_j(z/zmax) (the slab profile times Legendre polynomials),
the exact potential partner solves (d2/dz2 - kappa^2) phi = d with decaying
boundary conditions, i.e.

    phi(z) = -1/(2 kappa) int e^{-kappa |z - z'|} d(z') dz'     (kappa > 0)
    phi(z) =  1/2 int |z - z'| d(z') dz'                        (kappa = 0)

The pairs are then Cholesky-biorthonormalized against
int phi_j [4 pi d_k] dz = -delta (leading function = the slab profile, the
same conditioning discipline as the disk bases).  Default profile:
isothermal sech^2(z/h) (the reference's slab model).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass

import numpy as np


@dataclass
class SlabTables:
    """Vertical function tables per (kx, ky, n).

    phi/dphi: (numz, nkx, nky, nmax) on a uniform z grid; kappa table
    (nkx, nky).  Wavenumbers kx in 0..nmaxx (cos/sin handled by complex
    coefficients with hermitian symmetry at runtime: table depends only on
    |k|, so only non-negative kx, ky are stored)."""

    nmaxx: int
    nmaxy: int
    nmax: int
    numz: int
    zmax: float
    h: float
    phi: np.ndarray
    dphi: np.ndarray
    dens: np.ndarray
    zgrid: np.ndarray
    sgn: np.ndarray = None   # (nmaxx+1, nmaxy+1, nmax) pairing signs
    key: str = ""

    def write_cache(self, path):
        import os

        import h5py

        # atomic publish: multi-process waiters poll for `path` and must
        # never observe a half-written file
        tmp = f"{path}.tmp.{os.getpid()}"
        with h5py.File(tmp, "w") as f:
            f.attrs["type"] = "SlabSL"
            f.attrs["version"] = 1
            for k in ("nmaxx", "nmaxy", "nmax", "numz"):
                f.attrs[k] = getattr(self, k)
            for k in ("zmax", "h"):
                f.attrs[k] = getattr(self, k)
            f.attrs["key"] = self.key
            for k in ("phi", "dphi", "dens", "zgrid", "sgn"):
                f.create_dataset(k, data=getattr(self, k))
        os.replace(tmp, path)

    @classmethod
    def read_cache(cls, path):
        import h5py

        with h5py.File(path, "r") as f:
            if f.attrs.get("type") != "SlabSL":
                raise ValueError("not a SlabSL cache")
            kw = {k: int(f.attrs[k]) for k in ("nmaxx", "nmaxy", "nmax",
                                               "numz")}
            kw.update({k: float(f.attrs[k]) for k in ("zmax", "h")})
            kw["key"] = str(f.attrs["key"])
            for k in ("phi", "dphi", "dens", "zgrid", "sgn"):
                kw[k] = f[k][...]
        return cls(**kw)


def slab_density(type: str, h: float):
    """Background vertical density rho0(z) (unit surface density) of the
    reference's SlabModel family (SLGridMP2.cc:1841-1925): 'iso'
    (isothermal sech^2), 'const' (uniform within |z| < h), 'para'
    (parabolic within |z| < h)."""
    t = type.lower()
    if "para" in t:
        return lambda z: np.where(np.abs(z) < h,
                                  3.0 * (1.0 - (z / h) ** 2) / (4.0 * h),
                                  0.0)
    if "const" in t:
        return lambda z: np.where(np.abs(z) < h, 1.0 / (2.0 * h), 0.0)
    return lambda z: (1.0 / (2.0 * h)) / np.cosh(z / h) ** 2


def build_slab_tables(nmaxx: int = 4, nmaxy: int = 4, nmax: int = 6,
                      zmax: float = 0.1, h: float = 0.01, numz: int = 401,
                      knots: int = 800, type: str = "iso",
                      method: str = "greens",
                      cachename: str | None = None) -> SlabTables:
    """Vertical basis tables.

    method='greens' (default): Green's-function pairs from conditioned
    seed densities (round-1 design; exact Poisson partners).
    method='sl': the reference's Sturm-Liouville construction
    (SLGridSlab, SLGridMP2.cc:1952-2070 + coeff_ :3637-3644): for each
    kappa solve  phi'' - kappa^2 phi = -lambda rhobar(z) phi  with
    decaying Robin BCs phi' -+ kappa phi = 0 at +-zmax, rhobar = 4 pi
    rho0; eigenpairs give phi_n and the density partner
    d_n = -lambda_n rhobar phi_n / (4 pi), normalized to
    int phi_n (4 pi d_m) dz = -delta_nm (sledge replaced by a dense
    symmetric finite-difference generalized eigensolver, as slgrid.py
    does for the sphere).
    type: background model 'iso' | 'const' | 'para' (both methods).
    """
    if method == "sl":
        return _build_slab_tables_sl(nmaxx=nmaxx, nmaxy=nmaxy, nmax=nmax,
                                     zmax=zmax, h=h, numz=numz,
                                     type=type, cachename=cachename)
    params = dict(nmaxx=nmaxx, nmaxy=nmaxy, nmax=nmax, zmax=zmax, h=h,
                  numz=numz, knots=knots, type=type, version=1)
    key = hashlib.sha256(json.dumps(params, sort_keys=True).encode()
                         ).hexdigest()[:16]
    if cachename is not None:
        try:
            t = SlabTables.read_cache(cachename)
            if t.key == key:
                return t
        except (OSError, KeyError, ValueError):
            pass
        from exp_tpu.parallel.distributed import await_primary_cache

        if await_primary_cache(cachename):
            # multi-process: the primary built + atomically published it
            return SlabTables.read_cache(cachename)

    # quadrature grid in z and the sech^2 profile (unit surface density)
    zq = np.linspace(-zmax, zmax, knots)
    wq = np.full(knots, zq[1] - zq[0])
    wq[0] *= 0.5
    wq[-1] *= 0.5
    rho0 = slab_density(type, h)(zq)

    # seeds: rho0 * P_j(u) with u = tanh(z/(2h)) — the mapped coordinate
    # resolves the profile scale, keeping the eigen-normalization well
    # conditioned at high n (plain z/zmax polynomials leave near-null
    # modes whose |lambda|^(-1/2) normalization amplifies quadrature noise)
    uq = np.tanh(zq / (2.0 * h)) / np.tanh(zmax / (2.0 * h))
    seeds = np.stack([rho0 * np.polynomial.legendre.legval(
        uq, [0] * j + [1]) for j in range(nmax)], axis=0)  # (n, knots)

    zg = np.linspace(-zmax, zmax, numz)

    phi_t = np.zeros((numz, nmaxx + 1, nmaxy + 1, nmax))
    dphi_t = np.zeros_like(phi_t)
    dens_t = np.zeros_like(phi_t)
    sgn_t = np.ones((nmaxx + 1, nmaxy + 1, nmax))

    # cache per distinct kappa (tables depend on |k| only)
    done = {}
    for ix in range(nmaxx + 1):
        for iy in range(nmaxy + 1):
            kap2 = (2 * np.pi) ** 2 * (ix * ix + iy * iy)
            kap = float(np.sqrt(kap2))
            if kap not in done:
                # Green's function on the quadrature grid
                D = np.abs(zq[:, None] - zq[None, :])
                if kap > 0:
                    G = -np.exp(-kap * D) / (2.0 * kap)
                else:
                    G = 0.5 * D
                phi_q = (G * wq[None, :]) @ seeds.T * 4.0 * np.pi  # (knots, n)
                # E_jk = -int phi_j [4 pi d_k] dz  (area integral over the
                # unit periodic box contributes 1)
                E = -np.einsum("qj,kq,q->jk", phi_q, 4.0 * np.pi * seeds, wq)
                E = 0.5 * (E + E.T)
                # Eigen-normalization with per-function pairing signs: the
                # kappa=0 (mean-field) block is indefinite (the boundary
                # term of int phi phi'' flips signs), so Cholesky is not
                # applicable.  E = V L V^T, C = V |L|^{-1/2} gives
                # int phi_n [4 pi d_m] dz = -s_n delta_nm with
                # s_n = sign(lambda_n); the runtime folds s into the
                # coefficient projection.
                lam, V = np.linalg.eigh(E)
                order = np.argsort(-np.abs(lam))
                lam, V = lam[order], V[:, order]
                sg = np.sign(lam)
                C = V / np.sqrt(np.abs(lam))[None, :]
                seeds_b = C.T @ seeds                   # (n, knots)
                # tabulate on zg via the Green's integral (exact, incl.
                # derivative)
                Dg = zg[:, None] - zq[None, :]
                A = np.abs(Dg)
                if kap > 0:
                    Gg = -np.exp(-kap * A) / (2.0 * kap)
                    dGg = np.sign(Dg) * np.exp(-kap * A) / 2.0
                else:
                    Gg = 0.5 * A
                    dGg = 0.5 * np.sign(Dg)
                pg = 4.0 * np.pi * (Gg * wq[None, :]) @ seeds_b.T
                dpg = 4.0 * np.pi * (dGg * wq[None, :]) @ seeds_b.T
                # density partner on zg (4 pi rho convention)
                dg = 4.0 * np.pi * np.stack([np.interp(zg, zq, s)
                                             for s in seeds_b], axis=1)
                done[kap] = (pg, dpg, dg, sg)
            pg, dpg, dg, sg = done[kap]
            phi_t[:, ix, iy, :] = pg
            dphi_t[:, ix, iy, :] = dpg
            dens_t[:, ix, iy, :] = dg
            sgn_t[ix, iy, :] = sg

    t = SlabTables(nmaxx=nmaxx, nmaxy=nmaxy, nmax=nmax, numz=numz,
                   zmax=zmax, h=h, phi=phi_t, dphi=dphi_t, dens=dens_t,
                   zgrid=zg, sgn=sgn_t, key=key)
    if cachename is not None:
        t.write_cache(cachename)
    return t


def _build_slab_tables_sl(nmaxx, nmaxy, nmax, zmax, h, numz, type,
                          cachename=None, nsolve=1601):
    """Sturm-Liouville slab construction (see build_slab_tables docs).

    Finite-volume discretization of  -phi'' + kappa^2 phi = lambda
    rhobar phi  on [-zmax, zmax] with Robin rows phi' -+ kappa phi = 0
    absorbed symmetrically (half-volume boundary cells); generalized
    eigensolve as eigh(B, A) so the singular-weight 'const'/'para'
    models work (B = diag(rhobar w) is only PSD; A is SPD for
    kappa > 0, Tikhonov-shifted for the kappa = 0 Neumann block).
    A-orthonormal eigenvectors satisfy int phi_n (4 pi d_m) dz =
    -delta_nm EXACTLY for d_m = -lambda_m rhobar phi_m / (4 pi)."""
    from scipy.linalg import eigh

    params = dict(nmaxx=nmaxx, nmaxy=nmaxy, nmax=nmax, zmax=zmax, h=h,
                  numz=numz, nsolve=nsolve, type=type, method="sl",
                  version=1)
    key = hashlib.sha256(json.dumps(params, sort_keys=True).encode()
                         ).hexdigest()[:16]
    if cachename is not None:
        try:
            t = SlabTables.read_cache(cachename)
            if t.key == key:
                return t
        except (OSError, KeyError, ValueError):
            pass
        from exp_tpu.parallel.distributed import await_primary_cache

        if await_primary_cache(cachename):
            # multi-process: the primary built + atomically published it
            return SlabTables.read_cache(cachename)

    zq = np.linspace(-zmax, zmax, nsolve)
    dz = zq[1] - zq[0]
    rhobar = 4.0 * np.pi * slab_density(type, h)(zq)
    w = np.full(nsolve, dz)
    w[0] = w[-1] = 0.5 * dz

    zg = np.linspace(-zmax, zmax, numz)
    phi_t = np.zeros((numz, nmaxx + 1, nmaxy + 1, nmax))
    dphi_t = np.zeros_like(phi_t)
    dens_t = np.zeros_like(phi_t)
    sgn_t = np.ones((nmaxx + 1, nmaxy + 1, nmax))

    done = {}
    for ix in range(nmaxx + 1):
        for iy in range(nmaxy + 1):
            kap = 2.0 * np.pi * np.sqrt(float(ix * ix + iy * iy))
            if kap not in done:
                # flux-form FV rows of (-phi'' + kappa^2 phi) * cell:
                # interior diag 2/dz + kappa^2 dz, offdiag -1/dz;
                # half-volume boundary cells get the Robin flux
                # -phi'(+-zmax) = kappa phi folded in
                main = np.full(nsolve, 2.0 / dz) + kap**2 * w
                main[0] = 1.0 / dz + kap + kap**2 * w[0]
                main[-1] = 1.0 / dz + kap + kap**2 * w[-1]
                A = (np.diag(main)
                     + np.diag(np.full(nsolve - 1, -1.0 / dz), 1)
                     + np.diag(np.full(nsolve - 1, -1.0 / dz), -1))
                B = np.diag(rhobar * w)
                if kap == 0.0:
                    # kappa = 0: Dirichlet phi(+-zmax) = 0 — the
                    # reference's poffset convention zeroes the
                    # conditioning potential at the edge
                    # (SLGridMP2.cc:1972, f(zmax) = 0), which keeps the
                    # EVEN mean field exact (1D Poisson: the even
                    # Dirichlet solution differs from the true one by a
                    # constant).  A Neumann block would project out the
                    # net-mass mode entirely (measured: the sech^2
                    # slab's far field lost 60%).
                    A = A[1:-1, 1:-1]
                    B = B[1:-1, 1:-1]
                # B phi = mu A phi, phi^T A phi = I; lambda = 1/mu
                mu, V = eigh(B, A)
                order = np.argsort(-mu)[:nmax]
                mu_n = mu[order]
                lam = 1.0 / np.maximum(mu_n, 1e-300)
                phi_q = V[:, order]                     # (nsolve, nmax)
                if kap == 0.0:                          # restore the
                    phi_q = np.pad(phi_q, ((1, 1), (0, 0)))  # edge zeros
                dens_q = -(lam[None, :] * rhobar[:, None] * phi_q
                           / (4.0 * np.pi))
                dphi_q = np.gradient(phi_q, dz, axis=0, edge_order=2)
                pg = np.stack([np.interp(zg, zq, phi_q[:, n])
                               for n in range(nmax)], axis=1)
                dpg = np.stack([np.interp(zg, zq, dphi_q[:, n])
                                for n in range(nmax)], axis=1)
                dg = 4.0 * np.pi * np.stack(
                    [np.interp(zg, zq, dens_q[:, n])
                     for n in range(nmax)], axis=1)
                done[kap] = (pg, dpg, dg)
            pg, dpg, dg = done[kap]
            phi_t[:, ix, iy, :] = pg
            dphi_t[:, ix, iy, :] = dpg
            dens_t[:, ix, iy, :] = dg

    t = SlabTables(nmaxx=nmaxx, nmaxy=nmaxy, nmax=nmax, numz=numz,
                   zmax=zmax, h=h, phi=phi_t, dphi=dphi_t, dens=dens_t,
                   zgrid=zg, sgn=sgn_t, key=key)
    if cachename is not None:
        t.write_cache(cachename)
    return t
