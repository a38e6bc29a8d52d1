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
        return jnp.interp(lr, self.r_t, self.pot_tab)

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
        # quadrupole with inner r^2 / outer 1/r^3 matching at b
        shape = jnp.where(r < b, r2 / b ** 3, b ** 2 / r ** 3)
        return -amp * shape * (R2 / jnp.maximum(r2, 1e-20)) \
            * jnp.cos(2.0 * (phi - self.omega * t))


@dataclass
class TidalField(ExternalField):
    """Linear tidal tensor Phi = 1/2 x^T T x (src/tidalField.cc)."""

    txx: float = 0.0
    tyy: float = 0.0
    tzz: float = 0.0

    def potential(self, x, t):
        return 0.5 * (self.txx * x[:, 0] ** 2 + self.tyy * x[:, 1] ** 2
                      + self.tzz * x[:, 2] ** 2)


@dataclass
class PeriodicBC:
    """Position wrapping into [0, L)^3 applied after drift
    (src/user PeriodicBC.cc).  Not a force — a post-drift transform."""

    L: float = 1.0

    def wrap(self, x):
        return jnp.mod(x, self.L)


_REGISTRY = {
    "userlogpot": UserLogPot,
    "usermndisk": UserMNdisk,
    "userbar": UserBar,
    "tidalField": TidalField,
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
                         f"known: {sorted(_REGISTRY) + ['userhalo']}")
    return cls(**params)
