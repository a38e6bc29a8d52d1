"""Field expansions over particle attributes (the reference's FieldBasis /
VelocityBasis, expui/FieldBasis.H:23-186, FieldBasis.cc:330-400 — powers
OutVel).

Any per-particle quantity f is projected with the same spherical-harmonic x
radial biorthogonal machinery as the mass density (the reference projects
onto Ylm x OrthoFunction; here the force basis supplies the same
Ylm x radial-table span, shared with the N-body kernels):

    d^f_k = -4 pi sum_i m_i f_i Phi_k(x_i)

The pointwise field estimate is the density-weighted ratio

    f(x) ~ sum_k d^f_k D_k(x) / sum_k d^1_k D_k(x)

(i.e. the BFE representation of rho*f divided by the BFE representation of
rho) — the mass-weighted mean field.  VelocityBasis field sets
(FieldBasis.cc fieldFunc):
  cartesian:   vx, vy, vz
  spherical:   vr, vt (v_theta), vp (v_phi)
  cylindrical: vR, vp, vz
plus v2 (speed squared).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

#: field name -> callable (x, v) -> per-particle value
_SPHERICAL = ("vr", "vt", "vp")
_CYLINDRICAL = ("vR", "vp", "vz")


def _field_value(name, x, v):
    if name == "vx":
        return v[:, 0]
    if name == "vy":
        return v[:, 1]
    if name == "vz":
        return v[:, 2]
    if name == "v2":
        return jnp.sum(v * v, axis=1)
    R = jnp.sqrt(x[:, 0] ** 2 + x[:, 1] ** 2) + 1e-18
    if name == "vR":
        return (x[:, 0] * v[:, 0] + x[:, 1] * v[:, 1]) / R
    if name == "vp":
        return (x[:, 0] * v[:, 1] - x[:, 1] * v[:, 0]) / R
    r = jnp.sqrt(jnp.sum(x * x, axis=1)) + 1e-18
    if name == "vr":
        return jnp.sum(x * v, axis=1) / r
    if name == "vt":
        # v_theta = (cos(th) v_R - sin(th) v_z); cos(th)=z/r, sin(th)=R/r
        vR = (x[:, 0] * v[:, 0] + x[:, 1] * v[:, 1]) / R
        return (x[:, 2] * vR - R * v[:, 2]) / r
    raise ValueError(f"unknown field {name!r}")


class FieldBasis:
    """Expand per-particle fields over a force basis.

    `fields`: any of vx/vy/vz/v2 (cartesian), vr/vt/vp (spherical),
    vR/vp/vz (cylindrical), or "spherical"/"cylindrical"/"cartesian" as a
    shorthand for the corresponding velocity set (VelocityBasis)."""

    def __init__(self, force, fields=("vx", "vy", "vz")):
        if isinstance(fields, str):
            fields = {"spherical": _SPHERICAL, "cylindrical": _CYLINDRICAL,
                      "cartesian": ("vx", "vy", "vz")}[fields]
        self.force = force
        self.fields = tuple(fields)
        self.custom = {}    # label -> vectorized fn(x, v) -> (N,)

    def add_field(self, label, fn):
        """Register a derived phase-space field: vectorized
        fn(x (N,3), v (N,3), mass (N,)) -> (N,) (the reference's
        addPSFunction, FieldBasis.cc:41)."""
        self.custom[str(label)] = fn
        self.fields = self.fields + (str(label),)

    def coefficients(self, x, v, mass, accum_dtype=jnp.float64):
        """Returns dict: 'dens' + each field name -> coefficient array."""
        x = jnp.asarray(np.asarray(x))
        v = jnp.asarray(np.asarray(v))
        m = jnp.asarray(np.asarray(mass))
        out = {"dens": self.force.coefficients(x, m,
                                               accum_dtype=accum_dtype)}
        for f in self.fields:
            if f in self.custom:
                w = m * jnp.asarray(np.asarray(self.custom[f](
                    np.asarray(x), np.asarray(v), np.asarray(m))))
            else:
                w = m * _field_value(f, x, v)
            out[f] = self.force.coefficients(x, w, accum_dtype=accum_dtype)
        return out

    def create_from_snapshots(self, snaps, accum_dtype=jnp.float64):
        """Project (x, v, mass) snapshots -> dict field -> (T, ...) array
        (the reference's createFromReader over a VelocityBasis)."""
        series = None
        for x, v, mass in snaps:
            c = self.coefficients(x, v, mass, accum_dtype=accum_dtype)
            if series is None:
                series = {k: [] for k in c}
            for k, val in c.items():
                series[k].append(np.asarray(val))
        return {k: np.stack(vs) for k, vs in series.items()}

    def write_coefs(self, path, times, series, name=""):
        """Write a create_from_snapshots result to a field coefficient file
        (SphFldCoefs/CylFldCoefs schema — io.coefs field files)."""
        from exp_tpu.io.coefs import (SphFldCoefsFile, CylFldCoefsFile,
                                      pack_sph_matrix)

        labels = ["dens"] + [f for f in self.fields]
        first = series[labels[0]]
        if first.ndim == 5:        # (T, 2, L+1, L+1, nmax): spherical
            angmax = first.shape[2] - 1
            nmax = first.shape[4]
            f = SphFldCoefsFile(path, "w", name=name, nfld=len(labels),
                                angmax=angmax, nmax=nmax, labels=labels)
            pack = pack_sph_matrix
        elif first.ndim == 4 and first.shape[1] == 2:
            # (T, 2, M+1, nmax): polar
            angmax = first.shape[2] - 1
            nmax = first.shape[3]
            f = CylFldCoefsFile(path, "w", name=name, nfld=len(labels),
                                angmax=angmax, nmax=nmax, labels=labels)

            def pack(c):
                return c[0] + 1j * c[1]
        else:
            raise ValueError(
                f"write_coefs supports spherical/polar coefficient shapes; "
                f"got {first.shape} (slab/cube field series have no "
                f"reference field-file schema)")
        with f:
            for i, t in enumerate(np.asarray(times)):
                tensor = np.stack([pack(series[k][i]) for k in labels])
                f.append(float(t), tensor)

    @staticmethod
    def read_coefs(path, native_layout=True):
        """Read a field coefficient file -> (times, dict label -> series).

        native_layout=True (default) unpacks each label back to the REAL
        layout evaluate()/the force expect — sphere (T, 2, L+1, L+1, nmax),
        polar (T, 2, M+1, nmax) — so write_coefs/read_coefs round-trips;
        False returns the file's packed complex (T, rows, nmax) arrays."""
        from exp_tpu.io.coefs import (open_coefs, unpack_sph_matrix,
                                      SphFldCoefsFile)

        with open_coefs(path) as f:
            times, coefs = f.read_all()
            labels = list(getattr(f, "labels", []))
            sph = isinstance(f, SphFldCoefsFile)
            angmax = int(getattr(f, "angmax", 0))
            nmax = int(getattr(f, "nmax", coefs.shape[-1]))
        if not labels:
            labels = [f"f{i}" for i in range(coefs.shape[1])]

        def unpack(c):              # (T, rows, nmax) complex -> native real
            if not native_layout:
                return c
            if sph:
                return np.stack([unpack_sph_matrix(a, angmax, nmax)
                                 for a in c])
            return np.stack([c.real, c.imag], axis=1)

        return times, {k: unpack(coefs[:, i]) for i, k in enumerate(labels)}

    def evaluate(self, coefs: dict, points):
        """Field estimates at points: dict field -> (N,) array."""
        pts = jnp.asarray(np.asarray(points))
        dens = self.force.density(coefs["dens"], pts)
        dens = jnp.where(jnp.abs(dens) > 1e-30, dens, 1e-30)
        out = {"dens": np.asarray(dens)}
        for f in self.fields:
            num = self.force.density(coefs[f], pts)
            out[f] = np.asarray(num / dens)
        return out
