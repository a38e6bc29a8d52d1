"""pyEXP-compatible API surface.

Drop-in namespace mirroring the reference's pybind11 module layout
(pyEXP/PyWrappers.cc:103-135: submodules read, basis, coefs, field,
mssa, edmd, util) with the reference's METHOD NAMES (camelCase),
delegating to the native exp_tpu implementations:

    import exp_tpu.pyexp as pyEXP

    reader = pyEXP.read.ParticleReader.createReader('PSPout', files)
    basis  = pyEXP.basis.Basis.factory(yaml_config)
    coefs  = basis.createFromReader(reader)
    ssa    = pyEXP.mssa.expMSSA({'halo': (coefs, keys, [])}, 100, 10)
    fields = pyEXP.field.FieldGenerator(times, pmin, pmax, grid)

The snake_case exp_tpu.analysis / exp_tpu.io modules remain the
primary API; this layer exists so reference users can port scripts
with minimal edits.  Where the reference semantics are MPI- or
CUDA-specific the compat functions are no-ops with docstrings saying
so (e.g. util.setMPI).
"""

from . import read, basis, coefs, field, mssa, edmd, util  # noqa: F401

__all__ = ["read", "basis", "coefs", "field", "mssa", "edmd", "util"]
