"""Gate the committed round-5 energy artifacts (doc/direct_energy.json,
doc/ab_relevel_composite.json).

Both artifacts are produced on the real TPU by long flagship-scale runs
(scripts/direct_energy_check.py: 500 bigsteps of the 1M composite +
7 direct O(N_sub x N) pair summations; scripts/ab_relevel_composite.py:
three 100-bigstep arms) — far too heavy to re-run in CI.  These tests
pin the committed artifacts to the claims doc/benchmarks.md makes from
them, so a regenerated artifact that no longer supports a claim fails
the suite instead of silently shipping stale prose:

1. The transient-era represented-field dE/E (~4e-2) is truncated-basis
   BOOKKEEPING: the same fixed subsample's direct-sum (true) energy
   never leaves a <1e-2 envelope and returns to <1e-3 of baseline once
   the disk settles, while its represented energy holds the 4e-2 shift
   (reference match: the conservation claim of Paper/paper/paper.md:64
   and the equilibrium-only gate discipline of tests/Halo/check.py).
2. Boundary-only releveling is invisible at deployment scale: the
   dt-pair (A vs B) bounds the whole numerics contribution orders of
   magnitude below the physical redistribution envelope, and doubling
   the relevel cadence (C) perturbs the drift by less than 1e-3.
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    path = os.path.join(REPO, "doc", name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not present")
    with open(path) as f:
        return json.load(f)


def test_direct_energy_bookkeeping_gate():
    d = _load("direct_energy.json")
    # flagship shape at full depth
    assert d["n_halo"] + d["n_disk"] == 1_048_576
    assert d["multistep"] == 4 and d["nbig"] == 500
    rows = d["rows"]
    assert rows[0]["t"] == 0.0 and rows[-1]["t"] == pytest.approx(1.0)

    E0 = rows[0]
    rel = lambda r, k: abs(r[k] - E0[k]) / abs(E0[k])  # noqa: E731
    # the represented field shows the documented ~4e-2 apparent drift...
    assert d["max_dE_rep"] > 3e-2
    assert d["max_dE_sub_rep"] > 3e-2
    # ...while the SAME subsample's true (direct-sum) energy stays in a
    # sub-1e-2 envelope at every snapshot,
    assert d["max_dE_sub_dir"] < 1e-2
    # returns to baseline once the disk settles (the decisive end-state
    # separation: redistribution reverts, representation error cannot),
    assert rel(rows[-1], "E_sub_dir") < 1e-3
    assert rel(rows[-1], "E_sub_rep") > 3e-2
    # and the Monte-Carlo total-energy estimate is bounded by sampling
    # noise, far below the apparent drift
    assert d["max_dE_dir_est"] < 1e-2


def test_relevel_cadence_flagship_gate():
    d = _load("ab_relevel_composite.json")
    assert d["n_halo"] + d["n_disk"] == 1_048_576
    assert d["multistep"] == 4
    A, B, C = d["A"], d["B"], d["C"]
    # arms cover the same physical time
    assert A["T"] == pytest.approx(B["T"]) == pytest.approx(C["T"])
    assert B["dtime"] == pytest.approx(A["dtime"] / 2)
    assert C["nrelevel"] == 2 * A["nrelevel"]

    # dt-pair: halving BOTH the step and the mis-level window leaves the
    # measured drift unchanged (the envelope is dt-independent physics);
    # the numerics contribution is the A-B difference — tiny
    assert abs(A["dE_true"] - B["dE_true"]) < 1e-4
    # cadence-pair: doubling the mis-level window during peak level
    # migration perturbs the true-energy drift by < 1e-3
    assert abs(C["dE_true"] - A["dE_true"]) < 1e-3
    # level trajectories cadence-insensitive: every population within 5%
    # (of the component size) between A and C
    for comp in ("halo", "disk"):
        la, lc = A["levels"][comp], C["levels"][comp]
        n = sum(la)
        assert all(abs(a - c) / n < 0.05 for a, c in zip(la, lc))
