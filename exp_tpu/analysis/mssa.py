"""Multivariate singular spectrum analysis (pyEXP `mssa` submodule).

The analogue of expui/expMSSA (expMSSA.H:13-220, expMSSA.cc): MSSA over
selected coefficient channels — trajectory (Hankel) matrix, SVD of the
trajectory matrix (same convention as the reference's RedSVD usage,
expMSSA.cc:4-8), eigentriple grouping, w-correlation, and reconstruction of
selected groups back into coefficient series by anti-diagonal averaging.

Channels: for 'sphere' geometry a channel key is (cs, l, m, n) into the
(2, lmax+1, lmax+1, nmax) array; any flat index tuple works for other
geometries.  NumPy/SciPy host math (series are small: T x channels).
"""

from __future__ import annotations

import numpy as np


class expMSSA:
    """MSSA over coefficient time series.

    Args:
      data: dict name -> analysis.coefs.Coefs (or (T, ...) arrays).
      window: embedding window length w.
      numpc: number of components to keep.
      keys: dict name -> list of channel index tuples (default: all channels
            with nonzero variance, capped at 500).
    """

    def __init__(self, data: dict, window: int, numpc: int, keys=None,
                 flip_sign: bool = True):
        self.window = int(window)
        self.numpc = int(numpc)
        self._series = {}       # (name, key) -> (T,) detrended series
        self._mean = {}
        self.names = list(data)

        for name, coefs in data.items():
            A = coefs.as_array() if hasattr(coefs, "as_array") \
                else np.asarray(coefs)
            T = A.shape[0]
            flat = A.reshape(T, -1)
            if keys and name in keys:
                sel = [np.ravel_multi_index(k, A.shape[1:]) for k in keys[name]]
            else:
                var = flat.var(axis=0)
                sel = list(np.nonzero(var > 0)[0][:500])
            for j in sel:
                s = flat[:, j].astype(np.float64)
                mu = s.mean()
                self._series[(name, j)] = s - mu
                self._mean[(name, j)] = mu
            self._shape = A.shape[1:]
            self._T = T

        self.keys = list(self._series)
        self.nkeys = len(self.keys)
        if self.window >= self._T:
            raise ValueError("window must be < number of snapshots")
        self._decompose()

    # ------------------------------------------------------------------

    def _decompose(self):
        w = self.window
        K = self._T - w + 1
        C = self.nkeys
        X = np.empty((K, w * C))
        for c, key in enumerate(self.keys):
            s = self._series[key]
            for j in range(w):
                X[:, c * w + j] = s[j:j + K]
        self._X = X
        # SVD of the trajectory matrix (not the covariance), like RedSVD
        U, S, Vt = np.linalg.svd(X, full_matrices=False)
        k = min(self.numpc, S.size)
        self.S = S[:k]
        self.U = U[:, :k]           # (K, k) left vectors
        self.Vt = Vt[:k]            # (k, wC) right vectors
        self.PC = self.U * self.S   # principal components (K, k)
        self._recon = None

    # -- diagnostics ---------------------------------------------------------

    def eigenvalues(self):
        return self.S ** 2

    def singular_values(self):
        return self.S.copy()

    def contributions(self):
        lam = self.S ** 2
        return lam / lam.sum() if lam.sum() > 0 else lam

    def pcs(self):
        return self.PC.copy()

    # ------------------------------------------------------------------

    def _elementary(self, comp, key_index):
        """Reconstructed series of one eigentriple for one channel
        (anti-diagonal averaging of the rank-1 trajectory block)."""
        w = self.window
        K = self._T - w + 1
        block = np.outer(self.PC[:, comp],
                         self.Vt[comp, key_index * w:(key_index + 1) * w])
        out = np.zeros(self._T)
        cnt = np.zeros(self._T)
        for j in range(w):
            out[j:j + K] += block[:, j]
            cnt[j:j + K] += 1.0
        return out / cnt

    def reconstructed(self, groups=None):
        """Sum the selected eigentriples back to per-channel series.

        groups: list of component indices (default: all kept).
        Returns dict (name, flat_index) -> (T,) series including the mean.
        """
        comps = list(range(self.S.size)) if groups is None else list(groups)
        out = {}
        for ci, key in enumerate(self.keys):
            s = np.zeros(self._T)
            for c in comps:
                s += self._elementary(c, ci)
            out[key] = s + self._mean[key]
        self._recon = out
        return out

    def reconstruct_coefs(self, coefs, groups=None):
        """Write a reconstruction into a copy of a Coefs container
        (expMSSA::reconstruct + getReconstructed, expMSSA.H:135-220)."""
        rec = self.reconstructed(groups)
        out = coefs.deepcopy()
        times = out.times()
        A = out.as_array()
        flat = A.reshape(A.shape[0], -1)
        for (name, j), series in rec.items():
            flat[:, j] = series
        for i, t in enumerate(times):
            out._data[t] = flat[i].reshape(self._shape)
        return out

    def wcorr(self, ncomp=None):
        """w-correlation matrix between elementary reconstructions
        (expMSSA w-correlation diagnostics)."""
        k = self.S.size if ncomp is None else min(ncomp, self.S.size)
        w = self.window
        T = self._T
        # weights: how often each time index appears in the Hankel matrix
        wt = np.minimum(np.minimum(np.arange(1, T + 1), w),
                        np.minimum(T - np.arange(T), T - w + 1)).astype(float)
        # use the first channel's elementary series (standard practice is to
        # average; we sum over channels)
        series = np.zeros((k, T))
        for c in range(k):
            for ci in range(self.nkeys):
                series[c] += self._elementary(c, ci)
        W = np.zeros((k, k))
        for a in range(k):
            for b in range(k):
                W[a, b] = np.sum(wt * series[a] * series[b])
        d = np.sqrt(np.diag(W))
        d[d == 0] = 1.0
        return W / np.outer(d, d)
