"""External force fields + user-module registry.

The analogue of the reference's ExternalForce framework + user plugins
(src/ExternalCollection.cc:67-113 built-ins; src/user/ UserBar, UserDisk,
UserHalo, UserLogPot, UserMNdisk, UserMW...): global analytic fields added
to every component's acceleration.  Each field is a pure potential function
Phi(x, t); accelerations come from jax.grad, so every field is exactly
curl-free and autodiff-consistent — no hand-coded force expressions to get
wrong.

Python entry points replace the reference's dlopen plugin registry
(ExternalCollection.cc:194-256): registering a new field is
`register_external("myfield", MyFieldClass)`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


class ExternalField:
    """Base: subclasses implement potential(x, t) -> (N,)."""

    def potential(self, x, t):
        raise NotImplementedError

    def acceleration(self, x, t):
        def phi_single(p):
            return self.potential(p[None], t)[0]

        acc = -jax.vmap(jax.grad(phi_single))(x)
        return acc, self.potential(x, t)


@dataclass
class UserLogPot(ExternalField):
    """Logarithmic halo: Phi = 1/2 v0^2 ln(rc^2 + R^2 + (z/q)^2)
    (src/user/UserLogPot.cc)."""

    v0: float = 1.0
    q: float = 0.9
    rc: float = 0.1

    def potential(self, x, t):
        R2 = x[:, 0] ** 2 + x[:, 1] ** 2
        return 0.5 * self.v0 ** 2 * jnp.log(
            self.rc ** 2 + R2 + (x[:, 2] / self.q) ** 2)


@dataclass
class UserMNdisk(ExternalField):
    """Miyamoto–Nagai disk: Phi = -M / sqrt(R^2 + (a + sqrt(z^2+b^2))^2)
    (src/user/UserMNdisk.cc)."""

    a: float = 1.0
    b: float = 0.1
    mass: float = 1.0

    def potential(self, x, t):
        R2 = x[:, 0] ** 2 + x[:, 1] ** 2
        zb = jnp.sqrt(x[:, 2] ** 2 + self.b ** 2)
        return -self.mass / jnp.sqrt(R2 + (self.a + zb) ** 2)


@dataclass
class UserHalo(ExternalField):
    """Fixed spherical halo from a model file (src/user/UserHalo.cc):
    interpolates Phi(r) and M(r) from a SphericalModelTable."""

    r_t: jax.Array = None
    pot_tab: jax.Array = None
    mass_tab: jax.Array = None

    @classmethod
    def from_model(cls, model, dtype=jnp.float32):
        return cls(r_t=jnp.asarray(np.log(model.r), dtype=dtype),
                   pot_tab=jnp.asarray(model.pot, dtype=dtype),
                   mass_tab=jnp.asarray(model.mass, dtype=dtype))

    def potential(self, x, t):
        r = jnp.sqrt(jnp.sum(x * x, axis=-1)) + 1e-12
        lr = jnp.clip(jnp.log(r), self.r_t[0], self.r_t[-1])
        pot = jnp.interp(lr, self.r_t, self.pot_tab)
        # Keplerian continuation beyond the table edge so that the force
        # (M(rmax)/r^2) stays -grad(potential) for escaping particles
        rmax = jnp.exp(self.r_t[-1])
        return jnp.where(r > rmax, -self.mass_tab[-1] / r, pot)

    def acceleration(self, x, t):
        # exact spherical force M(r)/r^2 (smoother than autodiff of interp)
        r = jnp.sqrt(jnp.sum(x * x, axis=-1)) + 1e-12
        lr = jnp.clip(jnp.log(r), self.r_t[0], self.r_t[-1])
        M = jnp.interp(lr, self.r_t, self.mass_tab)
        a = -(M / r ** 3)[:, None] * x
        return a, self.potential(x, t)


@dataclass
class UserBar(ExternalField):
    """Rotating quadrupole bar with adiabatic amplitude ramp
    (src/user/UserBar.cc): Phi = -amp(t) (R/(R+b))^5-style quadrupole
    cos(2(phi - Omega t)) truncated at length `length`."""

    amplitude: float = 0.1
    length: float = 0.5
    omega: float = 1.0
    Ton: float = 0.0
    DeltaT: float = 0.5

    def potential(self, x, t):
        R2 = x[:, 0] ** 2 + x[:, 1] ** 2
        r2 = R2 + x[:, 2] ** 2
        r = jnp.sqrt(r2) + 1e-12
        phi = jnp.arctan2(x[:, 1], x[:, 0])
        amp = self.amplitude * 0.5 * (
            1.0 + jnp.tanh((t - self.Ton) / self.DeltaT))
        b = self.length
        # smooth rational quadrupole profile (UserBar.cc:479-494
        # fac = 1 + (r/b)^5): inner ~ r^2/b^3, outer ~ b^2/r^3, C-inf —
        # a branch-matched profile would kink the radial force at r = b
        shape = (r2 / b ** 3) / (1.0 + (r / b) ** 5)
        return -amp * shape * (R2 / jnp.maximum(r2, 1e-20)) \
            * jnp.cos(2.0 * (phi - self.omega * t))


@dataclass
class UserEllipsoid(ExternalField):
    """Rotating triaxial ellipsoid bar with the EXACT Chandrasekhar
    homoeoid potential (utils/ICs/EllipsoidForce.cc powerlaw/ferrers/
    expon families; ic/ellipsoid.py) and an adiabatic amplitude ramp.
    Forces are autodiff gradients — no force table (the reference
    interpolates a precomputed MakeTable grid)."""

    a: tuple = (0.5, 0.25, 0.125)
    mass: float = 0.1
    bartype: str = "ferrers"
    param: float = 1.0
    omega: float = 1.0
    Ton: float = 0.0
    DeltaT: float = 0.5

    def __post_init__(self):
        from exp_tpu.ic.ellipsoid import EllipsoidForce

        object.__setattr__(self, "_ellip", EllipsoidForce(
            a=tuple(self.a), mass=self.mass, bartype=self.bartype,
            param=self.param))

    def potential(self, x, t):
        ang = self.omega * t
        c, s = jnp.cos(ang), jnp.sin(ang)
        # body frame: rotate by -Omega t about z
        xb = jnp.stack([c * x[:, 0] + s * x[:, 1],
                        -s * x[:, 0] + c * x[:, 1], x[:, 2]], axis=-1)
        amp = 0.5 * (1.0 + jnp.tanh((t - self.Ton) / self.DeltaT))
        return amp * self._ellip.potential(xb)


@dataclass
class UserMW(ExternalField):
    """Milky-Way potential a la Gala (src/user/UserMW.H:9-31): NFW halo +
    Miyamoto–Nagai disk + Hernquist nucleus + Hernquist bulge, with an erf
    amplitude ramp between Ton and Toff."""

    M_halo: float = 1.0
    rs_halo: float = 1.0
    M_disk: float = 0.05
    a_disk: float = 0.3
    b_disk: float = 0.03
    M_nucl: float = 0.0
    c_nucl: float = 0.01
    M_bulge: float = 0.01
    c_bulge: float = 0.1
    Ton: float = -1.0e20
    Toff: float = 1.0e20
    DeltaT: float = 0.25

    def potential(self, x, t):
        from jax.scipy.special import erf

        r = jnp.sqrt(jnp.sum(x * x, axis=-1)) + 1e-12
        R2 = x[:, 0] ** 2 + x[:, 1] ** 2
        # NFW
        u = r / self.rs_halo
        phi = -self.M_halo / r * jnp.log1p(u)
        # MN disk
        zb = jnp.sqrt(x[:, 2] ** 2 + self.b_disk ** 2)
        phi = phi - self.M_disk / jnp.sqrt(R2 + (self.a_disk + zb) ** 2)
        # Hernquist nucleus + bulge
        phi = phi - self.M_nucl / (r + self.c_nucl)
        phi = phi - self.M_bulge / (r + self.c_bulge)
        amp = 0.25 * ((1.0 + erf((t - self.Ton) / self.DeltaT))
                      * (1.0 + erf((self.Toff - t) / self.DeltaT)))
        return amp * phi


class UserDisk(ExternalField):
    """Thin exponential disk, potential tabulated on an (R, |z|) grid
    (src/user/UserDisk.H:8-24).  The table is built host-side from the
    Bessel integral  Phi(R,z) = -2 pi Sigma0 a^2 \\int J0(kR) e^{-k|z|}
    k dk / (1+(ka)^2)^{3/2}, then bilinearly interpolated on device;
    forces come from autodiff of the interpolant."""

    def __init__(self, a=1.0, mass=1.0, Ton=-1e20, Toff=1e20, DeltaT=0.25,
                 Nscale=25.0, Ngrid=256, Nint=600, dtype=jnp.float32):
        from scipy.special import j0

        self.a, self.mass = float(a), float(mass)
        self.Ton, self.Toff, self.DeltaT = Ton, Toff, DeltaT
        Rmax = Zmax = Nscale * self.a
        Rg = np.linspace(0.0, Rmax, Ngrid)
        Zg = np.linspace(0.0, Zmax, Ngrid)
        # log-spaced k quadrature of the Bessel integral
        k = np.geomspace(1e-4 / self.a, 2e2 / self.a, Nint)
        wk = np.gradient(k)
        Sigma0a2 = self.mass / (2.0 * np.pi)   # Sigma0 a^2 for total mass M
        kern = k * wk / (1.0 + (k * self.a) ** 2) ** 1.5   # (Nint,)
        J = j0(k[None, :] * Rg[:, None])                   # (Ngrid, Nint)
        E = np.exp(-k[None, :] * Zg[:, None])              # (Ngrid, Nint)
        tab = -2.0 * np.pi * Sigma0a2 * np.einsum(
            "rk,zk,k->rz", J, E, kern)                     # (R, z)
        self.Rmax, self.Zmax = Rmax, Zmax
        self.dR = Rg[1] - Rg[0]
        self.dZ = Zg[1] - Zg[0]
        self.tab = jnp.asarray(tab, dtype=dtype)

    def potential(self, x, t):
        from jax.scipy.special import erf

        R = jnp.sqrt(x[:, 0] ** 2 + x[:, 1] ** 2)
        Z = jnp.abs(x[:, 2])
        n = self.tab.shape[0]
        tr = jnp.clip(R / self.dR, 0.0, n - 1.001)
        tz = jnp.clip(Z / self.dZ, 0.0, n - 1.001)
        i = jnp.floor(tr).astype(jnp.int32)
        j = jnp.floor(tz).astype(jnp.int32)
        fr, fz = tr - i, tz - j
        p = (self.tab[i, j] * (1 - fr) * (1 - fz)
             + self.tab[i + 1, j] * fr * (1 - fz)
             + self.tab[i, j + 1] * (1 - fr) * fz
             + self.tab[i + 1, j + 1] * fr * fz)
        # Keplerian continuation outside the table
        r = jnp.sqrt(R * R + Z * Z)
        p = jnp.where((R < self.Rmax) & (Z < self.Zmax), p,
                      -self.mass / jnp.maximum(r, 1e-12))
        amp = 0.25 * ((1.0 + erf((t - self.Ton) / self.DeltaT))
                      * (1.0 + erf((self.Toff - t) / self.DeltaT)))
        return amp * p


@dataclass
class ExternalShock(ExternalField):
    """Time-dependent tidal shock along z (src/externalShock.H:7-24):
    Phi = 1/2 A(t) z^2 with a sech^2 pulse of amplitude AMPL and duration
    PER centered on each passage (the reference derives A(t) from an orbit
    through a spherical model; here the pulse profile is specified
    directly)."""

    AMPL: float = 1.0
    PER: float = 0.5
    T0: float = 1.0

    def potential(self, x, t):
        A = self.AMPL / jnp.cosh((t - self.T0) / self.PER) ** 2
        return 0.5 * A * x[:, 2] ** 2


@dataclass
class TidalField(ExternalField):
    """Linear tidal tensor Phi = 1/2 x^T T x (src/tidalField.cc)."""

    txx: float = 0.0
    tyy: float = 0.0
    tzz: float = 0.0

    def potential(self, x, t):
        return 0.5 * (self.txx * x[:, 0] ** 2 + self.tyy * x[:, 1] ** 2
                      + self.tzz * x[:, 2] ** 2)


class ScatterMFP:
    """Mean-free-path dark-matter self-interaction scattering
    (src/ScatterMFP.H:14-45).  Host-side stochastic operator applied
    between jitted blocks: each application, every particle is scattered
    with probability dt/tau weighted by local density (radial shell
    estimate); a scattered particle keeps |v| but gets an isotropic random
    direction (elastic isotropic scattering in the local frame)."""

    is_operator = True

    def __init__(self, tau=10.0, rmax=10.0, tautab=40, nscat=1, seed=11,
                 **kw):
        self.tau = float(tau)
        self.rmax = float(rmax)
        self.tautab = int(tautab)
        self.nscat = int(nscat)       # apply every nscat blocks
        self.rng = np.random.default_rng(seed)
        self.nscattered = 0

    def apply(self, ps, dt, istep, time=0.0, name=""):
        if self.nscat > 0 and istep % self.nscat:
            return ps
        from dataclasses import replace as _rp

        m = np.asarray(ps.mass)
        live = m > 0
        x = np.asarray(ps.x)
        v = np.asarray(ps.v)
        r = np.linalg.norm(x, axis=1)
        # shell density estimate -> scattering rate ~ rho(r)
        edges = np.linspace(0.0, self.rmax, self.tautab + 1)
        idx = np.clip(np.digitize(r, edges) - 1, 0, self.tautab - 1)
        vol = 4.0 * np.pi / 3.0 * np.diff(edges ** 3)
        rho = np.bincount(idx, weights=m, minlength=self.tautab) / vol
        rate = rho[idx] / max(rho.max(), 1e-300)
        p = np.clip(dt / self.tau * rate, 0.0, 1.0)
        hit = live & (self.rng.random(len(m)) < p)
        nh = int(hit.sum())
        if nh:
            u = self.rng.normal(size=(nh, 3))
            u /= np.linalg.norm(u, axis=1, keepdims=True)
            v = v.copy()
            v[hit] = u * np.linalg.norm(v[hit], axis=1, keepdims=True)
            self.nscattered += nh
        return _rp(ps, v=jnp.asarray(v, ps.v.dtype))


class GenerateRelaxation:
    """Relaxation diagnostic (src/generateRelaxation.H:4-16): tracks the
    per-particle relative energy change since the first call and appends
    the mass-weighted <|dE/E|> to `<runtag>.relx`."""

    is_operator = True

    def __init__(self, runtag="run", outdir=".", nscat=1, **kw):
        import os

        self.path = os.path.join(outdir, f"{runtag}.relx")
        self.nscat = max(1, int(nscat))
        self._e0 = {}            # per-component baselines, keyed by name
        with open(self.path, "w") as f:
            f.write("# time  component  <|dE/E|>  max|dE/E|" + chr(10))

    def apply(self, ps, dt, istep, time=0.0, name=""):
        if istep % self.nscat:
            return ps
        m = np.asarray(ps.mass)
        live = m > 0
        E = (0.5 * np.sum(np.asarray(ps.v)[live] ** 2, axis=1)
             + np.asarray(ps.pot)[live])
        e0 = self._e0.get(name)
        if e0 is None or e0.shape != E.shape:
            self._e0[name] = E
            return ps
        # magnitude floor on the denominator: unbound particles (E0 > 0)
        # must not divide by the -1e-12 clamp
        rel = np.abs(E - e0) / np.maximum(np.abs(e0), 1e-12)
        w = m[live] / m[live].sum()
        with open(self.path, "a") as f:
            f.write(f"{time:.10g} {name or 'all'} "
                    f"{np.sum(w * rel):.6g} {rel.max():.6g}" + chr(10))
        return ps


@dataclass
class PeriodicBC:
    """Boundary conditions applied after drift (src/PeriodicBC.H:10-19):
    per-axis edge sizes sx/sy/sz and a btype string of 'p' (periodic wrap
    into [0, s)), 'r' (reflect at 0 and s), or 'v' (vacuum — untouched).
    `L` is a shorthand setting sx = sy = sz.  Not a force — a post-drift
    position transform inside the jitted step."""

    L: float = 1.0
    sx: float = None
    sy: float = None
    sz: float = None
    btype: str = "ppp"

    def wrap(self, x):
        sizes = [self.sx or self.L, self.sy or self.L, self.sz or self.L]
        cols = []
        for a in range(3):
            c = x[:, a]
            s = sizes[a]
            b = self.btype[a] if len(self.btype) > a else "p"
            if b == "p":
                c = jnp.mod(c, s)
            elif b == "r":
                # reflect into [0, s): triangle-wave fold of period 2s
                t = jnp.mod(c, 2.0 * s)
                c = jnp.where(t > s, 2.0 * s - t, t)
            cols.append(c)
        return jnp.stack(cols, axis=-1)


_REGISTRY = {
    "userlogpot": UserLogPot,
    "usermndisk": UserMNdisk,
    "userbar": UserBar,
    "userellipsoid": UserEllipsoid,
    "tidalField": TidalField,
    "usermw": UserMW,
    "userdisk": UserDisk,
    "externalShock": ExternalShock,
}

#: host-side stochastic/diagnostic operators (applied between jitted
#: blocks, not traced): ExternalCollection.cc:67-89 ScatterMFP and
#: generateRelaxation.  Applied by the single-rate driver loop only
#: (multistep runs integrate strictly ballistically between big steps).
_OPERATORS = {
    "scatterMFP": ScatterMFP,
    "generateRelaxation": GenerateRelaxation,
}


def register_external(name: str, cls):
    """Plugin entry point (replaces the dlopen registry,
    ExternalCollection.cc:194-256)."""
    _REGISTRY[name] = cls


def build_external(conf: dict, workdir=".", dtype=jnp.float32):
    """Factory from a YAML stanza {id: ..., parameters: {...}}."""
    eid = conf.get("id")
    params = dict(conf.get("parameters") or {})
    if eid == "userhalo":
        from exp_tpu.basis.model import SphericalModelTable
        import os

        model = SphericalModelTable.from_file(
            os.path.join(workdir, params.pop("modelname")))
        return UserHalo.from_model(model, dtype=dtype)
    cls = _REGISTRY.get(eid)
    if cls is None:
        raise ValueError(f"unknown external force id {eid!r}; "
                         f"known: {sorted(_REGISTRY) + ['userhalo'] + sorted(_OPERATORS)}")
    return cls(**params)


def build_operator(conf: dict, runtag="run", outdir=".", seed=None):
    """Factory for host-side operators (scatterMFP, generateRelaxation);
    returns None if the id is not an operator.  `seed` (Global
    random_seed, parse.cc:115-121) is the default RNG seed when the
    operator's own parameters don't pin one."""
    cls = _OPERATORS.get(conf.get("id"))
    if cls is None:
        return None
    kw = dict(conf.get("parameters") or {})
    if seed is not None and "seed" not in kw:
        kw["seed"] = int(seed)
    return cls(runtag=runtag, outdir=outdir, **kw)
