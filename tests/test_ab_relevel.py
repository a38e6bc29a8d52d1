"""Boundary-only (NoSwitch) relevel A/B gate at multistep=4.

The reference adjusts levels every substep (src/step.cc:223 ->
multistep.cc:344); exp_tpu relevels at bigstep boundaries only — the
reference's own opt-in NoSwitch discipline (multistep.cc:146-155) —
because the TPU-native rebucketing is a global sort.  scripts/
ab_relevel.py quantifies the approximation on a plunging-orbit
Hernquist sample: halving dtime (which also halves the relevel
interval) must reduce the energy drift by about the leapfrog factor 4
— if boundary-only releveling added error ABOVE the integrator's
truncation order, the ratio would collapse toward 1 (the mis-level
error, fixed by the relevel cadence, would dominate both runs).

This runs the actual script at a reduced size (deterministic: f64,
fixed seed, CPU).  Full-size artifact: doc/ab_relevel.json +
doc/benchmarks.md (N=8192, NBIG=16: ratio 2.93, |dE/E|_A = 8.8e-7).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow   # full f64 multistep A/B/C in a subprocess (~minutes)
def test_ab_relevel_energy_ratio(tmp_path):
    out = tmp_path / "ab.json"
    # calibrated so the truncation signal sits well above the f64 /
    # sampling noise floor (dE_A ~ 5e-7 vs truth ~9e-8); measured ratio
    # 7.4 at this config, 2.9 at the full-size artifact
    env = dict(os.environ,
               AB_N="4096", AB_NBIG="8", AB_DT="0.016",
               AB_OUT=str(out), JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ab_relevel.py")],
        env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    d = json.loads(out.read_text())
    # the boundary-only approximation must stay below the leapfrog
    # truncation: absolute drift tiny, and halving dtime must actually
    # reduce it (ratio >> 1; ~4 is the order-2 prediction, generous
    # bounds against sampling noise at this reduced size)
    assert d["dE_A"] < 1e-5, d
    assert d["dE_A"] / max(d["dE_B"], 1e-300) > 2.0, d
    assert d["dE_A"] / max(d["dE_B"], 1e-300) < 30, d
