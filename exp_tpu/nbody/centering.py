"""Expansion-center tracking (the reference's Orient/EJ machinery).

The analogue of src/Orient.cc + cudaOrient.cu: keep the K most-bound
particles (by E = pot + v^2/2 — the EL3 set, Orient.H:19-57), estimate the
expansion center as their mass-weighted centroid, and smooth the estimate
over a sliding window (the reference's boxcar + least-squares regression).
The center is a slowly-varying host-side parameter fed back into the jitted
step as a traced argument — no recompilation when it moves.

TPU-native: the top-K selection is jax.lax.top_k on -(E) over the sharded
particle arrays (replacing the per-rank sorted EL3 merge).

Note on PseudoAccel (include/PseudoAccel.H; Component::getPseudoAccel,
Component.cc:4407-4425): the reference adds fictitious accelerations
(frame acceleration + Coriolis/centrifugal terms) when a component is
integrated in its moving/rotating expansion frame.  exp_tpu always
integrates in the inertial frame — the tracked center (EJ or CenterFile)
only offsets the *expansion origin* passed to the basis evaluation, never
the coordinates being integrated — so no pseudo-acceleration terms are
needed; energy/momentum conservation is checked directly in the tests.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp


from functools import partial


@partial(jax.jit, static_argnames=("k",))
def _most_bound_centroid(x, v, mass, pot, k: int = 256):
    E = pot + 0.5 * jnp.sum(v * v, axis=-1)
    # exclude padding (mass == 0) by pushing it to the end of the ranking
    E = jnp.where(mass > 0, E, jnp.inf)
    kk = min(k, x.shape[0])
    _, idx = jax.lax.top_k(-E, kk)
    w = mass[idx]
    c = jnp.sum(x[idx] * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1e-30)
    # principal axis of the bound set (angular momentum direction), the
    # Orient axis analogue
    L = jnp.sum(w[:, None] * jnp.cross(x[idx] - c, v[idx]), axis=0)
    return c, L


@dataclass
class EJOrient:
    """Sliding-window center estimator."""

    nkeep: int = 256
    window: int = 16
    damp: float = 1.0          # fraction of the new estimate applied
    _hist: deque = field(default_factory=deque)
    center: np.ndarray = field(default_factory=lambda: np.zeros(3))
    axis: np.ndarray = field(default_factory=lambda: np.array([0.0, 0, 1]))

    def update(self, ps) -> np.ndarray:
        c, L = _most_bound_centroid(ps.x, ps.v, ps.mass, ps.pot,
                                    k=self.nkeep)
        self._hist.append(np.asarray(c))
        while len(self._hist) > self.window:
            self._hist.popleft()
        est = np.mean(np.asarray(self._hist), axis=0)
        self.center = (1 - self.damp) * self.center + self.damp * est
        Ln = np.asarray(L)
        nrm = np.linalg.norm(Ln)
        if nrm > 0:
            self.axis = Ln / nrm
        return self.center


class CenterFile:
    """Prescribed expansion-center trajectory from a file
    (the reference's CenterFile, src/CenterFile.cc; Component `centerfile`
    option): columns `t x y z`, linearly interpolated in time."""

    def __init__(self, path):
        a = np.loadtxt(path, ndmin=2)
        if a.shape[1] < 4:
            raise ValueError(f"centerfile {path}: need columns t x y z")
        order = np.argsort(a[:, 0])
        self.t = a[order, 0]
        self.xyz = a[order, 1:4]

    def __call__(self, t):
        return np.array([np.interp(t, self.t, self.xyz[:, k])
                         for k in range(3)])
