from exp_tpu.forces.spherical import SphereSL
