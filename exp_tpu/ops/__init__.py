from exp_tpu.ops.special import legendre_lm, dlegendre_lm, sincos_m, real_ylm_norm
from exp_tpu.ops.interp import lerp_uniform, deriv3_uniform
from exp_tpu.ops.coords import r_to_xi, xi_to_r, dxi_dr
