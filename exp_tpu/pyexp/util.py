"""pyEXP.util compatibility (reference pyEXP/UtilWrappers.cc)."""

from __future__ import annotations

import numpy as np

from exp_tpu.analysis import util as _u


def _particles(reader_or_x, mass=None):
    if hasattr(reader_or_x, "Particles"):
        m, x, _ = reader_or_x.Particles()
        return np.asarray(x), np.asarray(m)
    return np.asarray(reader_or_x), mass


def getDensityCenter(reader, stride=1, Nsort=0, Ndens=32):
    """KD-density-weighted center (expui/Centering.cc getDensityCenter);
    accepts a ParticleReader or a position array.  Positional order
    matches the reference binding: (reader, stride, Nsort, Ndens)."""
    x, m = _particles(reader)
    if stride and stride > 1:
        x = x[::stride]
        m = None if m is None else m[::stride]
    return np.asarray(_u.getDensityCenter(x, m, k=max(2, int(Ndens)),
                                          Ndens=int(Nsort)))


def getCenterOfMass(reader):
    x, m = _particles(reader)
    return np.asarray(_u.centerOfMass(x, m))


# snake-case alias kept for the native API
centerOfMass = getCenterOfMass


def particleIterator(reader, func):
    """Apply `func(mass, x, y, z, vx, vy, vz, index)` over the reader's
    particles (UtilWrappers particleIterator)."""
    m, x, v = reader.Particles()
    for i in range(len(m)):
        func(m[i], x[i, 0], x[i, 1], x[i, 2], v[i, 0], v[i, 1], v[i, 2], i)


def getVersionInfo():
    return _u.getVersionInfo()


def Version():
    return getVersionInfo()


def setMPI(flag: bool = True):
    """No-op: the JAX SPMD runtime has no per-process MPI toggle (the
    reference uses this to enable MPI reductions inside pyEXP)."""
    return None
