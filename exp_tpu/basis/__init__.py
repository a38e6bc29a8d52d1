from exp_tpu.basis.model import SphericalModelTable
from exp_tpu.basis.slgrid import SLGridSph, build_sph_sl_tables
