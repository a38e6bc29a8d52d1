"""Spherical orbit machinery (the reference's SphericalOrbit,
exputil/orbit.cc, orbit_trans.cc): peri/apo, radial and azimuthal
frequencies, actions and angles for orbits in a spherical model — used by
resonance analysis and the biorth_wake tools.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import brentq


class SphericalOrbit:
    """Orbit (E, J) in a SphericalModelTable potential (G = 1)."""

    def __init__(self, model, E: float, kappa: float = None, J: float = None,
                 nquad: int = 64):
        """kappa = J / J_circ(E) in (0, 1]; or give J directly."""
        self.model = model
        self.E = float(E)
        self._nquad = nquad
        if J is None:
            if kappa is None:
                raise ValueError("need kappa or J")
            J = float(kappa) * self.jcirc(E)
        self.J = float(J)
        self._turning_points()
        self._frequencies()

    # -- circular-orbit helpers ------------------------------------------

    def rcirc(self, E: float) -> float:
        """Radius of the circular orbit with energy E:
        E = Phi(r) + r Phi'(r)/2."""
        m = self.model

        def f(r):
            return m.get_pot(r) + 0.5 * r * m.get_dpot(r) - E

        return brentq(f, m.rmin * 1.0001, m.rmax * 0.9999, xtol=1e-12)

    def jcirc(self, E: float) -> float:
        rc = self.rcirc(E)
        return rc * np.sqrt(rc * float(self.model.get_dpot(rc)))

    # -- turning points ----------------------------------------------------

    def _veff2(self, r):
        return 2.0 * (self.E - self.model.get_pot(r)) - (self.J / r) ** 2

    def _turning_points(self):
        m = self.model
        rc = self.rcirc(self.E)

        def f(r):
            return self._veff2(r)

        lo = m.rmin * 1.0001
        hi = m.rmax * 0.9999
        self.peri = brentq(f, lo, rc) if f(lo) < 0 else lo
        self.apo = brentq(f, rc, hi) if f(hi) < 0 else hi

    # -- frequencies / actions ---------------------------------------------

    def _frequencies(self):
        """Radial period and apsidal angle by Gauss–Chebyshev quadrature
        with the sqrt turning-point singularities absorbed."""
        n = self._nquad
        # r = (apo+peri)/2 + (apo-peri)/2 * sin(theta): removes both roots
        th, w = np.polynomial.chebyshev.chebgauss(n)
        a = 0.5 * (self.apo - self.peri)
        b = 0.5 * (self.apo + self.peri)
        r = b + a * th                         # th in (-1, 1)
        v2 = np.maximum(self._veff2(r), 1e-30)
        vr = np.sqrt(v2)
        # dr = a dth;  chebgauss weight includes 1/sqrt(1-th^2):
        # Tr = 2 int dr/vr = 2 a int dth/vr = 2 a sum w sqrt(1-th^2)/vr
        s = np.sqrt(1.0 - th * th)
        self.Tr = 2.0 * a * np.sum(w * s / vr)
        # apsidal angle: dphi = J dr / (r^2 vr)
        self.dphi = self.J * a * np.sum(w * s / (r * r * vr))
        self.omega_r = 2.0 * np.pi / self.Tr
        self.omega_phi = 2.0 * self.dphi / self.Tr
        # radial action: Jr = (1/pi) int vr dr
        self.Jr = a * np.sum(w * s * vr) / np.pi

    def actions(self):
        """(J_r, J_phi=J)."""
        return self.Jr, self.J

    def frequencies(self):
        """(Omega_r, Omega_phi)."""
        return self.omega_r, self.omega_phi

    def resonance(self, l1: int, l2: int) -> float:
        """Resonance combination l1*Omega_r + l2*Omega_phi."""
        return l1 * self.omega_r + l2 * self.omega_phi
