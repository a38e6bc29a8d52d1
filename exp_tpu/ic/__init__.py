from exp_tpu.ic.eddington import EddingtonDF, sample_spherical_model
