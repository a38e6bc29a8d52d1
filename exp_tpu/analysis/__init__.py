"""Analysis package — the pyEXP-equivalent API, Python/JAX-native.

Submodule layout mirrors pyEXP (reference pyEXP/PyWrappers.cc:103-135):
  basis  — Basis factory + coefficient generation from snapshots
  coefs  — time-keyed coefficient containers (HDF5-backed)
  field  — FieldGenerator: density/potential/force on slices/volumes/points
  mssa   — multivariate singular spectrum analysis (expMSSA)
  edmd   — Koopman / extended DMD
  util   — centers (COM, density center), version info
"""

from exp_tpu.analysis import basis, coefs, field, mssa, edmd, util  # noqa: F401
