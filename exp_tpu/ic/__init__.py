from exp_tpu.ic.eddington import EddingtonDF, sample_spherical_model
from exp_tpu.ic.diskhalo import (diskhalo_ics, build_disk_tables,
                                 sample_multimass_halo, virial_ratio)
from exp_tpu.ic.qpdistf import QPDistF, sample_qp_model
from exp_tpu.ic.zang import TaperedMestelDF, sample_zang_disk
from exp_tpu.ic.ellip import EllipForce, add_ellip_to_model
from exp_tpu.ic.diskhalo2d import diskhalo2d_ics, add_disk2d_to_model
