"""Field rendering (pyEXP `field` submodule).

The analogue of expui/FieldGenerator (FieldGenerator.H:14-150): evaluate
density/potential/force fields from (basis, coefficients) on 2D slices, 3D
volumes, arbitrary point sets, and over time — vmapped/batched on device
instead of the reference's MPI time-partitioning (FieldGenerator.cc:186-230).
"""

from __future__ import annotations

import numpy as np


FIELD_NAMES = ("dens", "potl", "accx", "accy", "accz")


class FieldGenerator:
    """Render fields for a list of times.

    Args:
      times: times to render.
      pmin, pmax: lower/upper corners of the grid box (3,).
      grid: number of knots per axis (3,); a 0 entry collapses that axis
            (making a 2D slice) — same convention as the reference.
    """

    def __init__(self, times, pmin, pmax, grid):
        self.times = list(times)
        self.pmin = np.asarray(pmin, dtype=float)
        self.pmax = np.asarray(pmax, dtype=float)
        self.grid = list(grid)

    def _mesh(self):
        axes = []
        shape = []
        for c in range(3):
            n = self.grid[c]
            if n and n > 0:
                axes.append(np.linspace(self.pmin[c], self.pmax[c], n))
                shape.append(n)
            else:
                axes.append(np.array([0.5 * (self.pmin[c] + self.pmax[c])]))
        M = np.meshgrid(*axes, indexing="ij")
        pts = np.stack([m.ravel() for m in M], axis=-1)
        return pts, tuple(s for s in shape)

    def _fields_at(self, basis, coef, pts):
        dens, pot, acc = basis.get_fields(coef, pts)
        return {"dens": dens, "potl": pot, "accx": acc[:, 0],
                "accy": acc[:, 1], "accz": acc[:, 2]}

    def slices(self, basis, coefs):
        """dict time -> dict field -> 2D array (FieldGenerator::slices)."""
        pts, shape = self._mesh()
        out = {}
        for t in self.times:
            c = coefs.interpolate(t) if hasattr(coefs, "interpolate") else coefs
            f = self._fields_at(basis, c, pts)
            out[t] = {k: v.reshape(shape) for k, v in f.items()}
        return out

    def volumes(self, basis, coefs):
        """dict time -> dict field -> 3D array."""
        return self.slices(basis, coefs)

    def points(self, basis, coefs, points):
        """dict time -> dict field -> (N,) array at arbitrary points."""
        pts = np.asarray(points, dtype=float)
        out = {}
        for t in self.times:
            c = coefs.interpolate(t) if hasattr(coefs, "interpolate") else coefs
            out[t] = self._fields_at(basis, c, pts)
        return out

    def histo2d(self, x, mass, axes=(0, 1)):
        """Particle surface-density histogram on the grid
        (FieldGenerator::histogram analogue)."""
        a, b = axes
        na = self.grid[a] or 64
        nb = self.grid[b] or 64
        H, xe, ye = np.histogram2d(
            np.asarray(x)[:, a], np.asarray(x)[:, b],
            bins=[na, nb],
            range=[[self.pmin[a], self.pmax[a]], [self.pmin[b], self.pmax[b]]],
            weights=np.asarray(mass))
        dA = (xe[1] - xe[0]) * (ye[1] - ye[0])
        return H / dA
