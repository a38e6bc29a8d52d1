from exp_tpu.nbody.particles import ParticleSystem, read_ascii_bodies, write_ascii_bodies
from exp_tpu.nbody.step import make_kdk_step, init_force_state, energies
