"""Analysis package — the pyEXP-equivalent API, Python/JAX-native.

Submodule layout mirrors pyEXP (reference pyEXP/PyWrappers.cc:103-135):
  basis  — Basis factory + coefficient generation from snapshots
  coefs  — time-keyed coefficient containers (HDF5-backed)
  field  — FieldGenerator: density/potential/force on slices/volumes/points
  mssa   — multivariate singular spectrum analysis (expMSSA)
  edmd   — Koopman / extended DMD
  util   — centers (COM, density center), version info

Beyond the pyEXP surface:
  kincoefs — kinematic Fourier series vs Bessel/Laguerre/ring radial
             sets (psp2bess/psp2lagu/psp2rings formats)
  diskeof  — empirical re-orthogonalization of a disk basis from
             snapshots (diskeof.cc)
"""

from exp_tpu.analysis import basis, coefs, field, mssa, edmd, util  # noqa: F401
from exp_tpu.analysis import kincoefs, diskeof  # noqa: F401
