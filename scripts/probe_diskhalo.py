"""Probe: self-consistent disk+halo ICs (ic/diskhalo.py) sanity.

Builds small-fidelity bases on CPU, generates ICs, and reports the
velocity-structure diagnostics + the measured virial ratio.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from exp_tpu.basis.model import hernquist_model
from exp_tpu.basis.slgrid import build_sph_sl_tables
from exp_tpu.basis.empcyl import build_empcyl_tables
from exp_tpu.forces.spherical import SphereSL
from exp_tpu.forces.cylinder import CylinderForce
from exp_tpu.ic.diskhalo import diskhalo_ics, virial_ratio

t0 = time.time()
m = hernquist_model(rmin=1e-3, rmax=20.0)
ts = build_sph_sl_tables(m, lmax=2, nmax=6, numr=800, cmap=1, rmap=1.0,
                         cachename="/tmp/probe_sph.h5")
halo = SphereSL.from_tables(ts, dtype=jnp.float32)
tc = build_empcyl_tables(mmax=2, nmax=6, lmaxfid=16, nmaxfid=12,
                         acyl=0.01, hcyl=0.002,
                         cachename="/tmp/probe_eof.h5")
disk = CylinderForce.from_tables(tc, dtype=jnp.float32)
print(f"[{time.time()-t0:.1f}s] bases built")

ics = diskhalo_ics(m, n_halo=20000, n_disk=10000, Mdisk=0.05,
                   acyl=0.01, hcyl=0.002, halo_force=halo,
                   disk_force=disk, seed=3)
print(f"[{time.time()-t0:.1f}s] ICs built; diag={ics.diag}")

R = np.hypot(ics.x_disk[:, 0], ics.x_disk[:, 1])
vphi = (-ics.v_disk[:, 0] * ics.x_disk[:, 1]
        + ics.v_disk[:, 1] * ics.x_disk[:, 0]) / np.maximum(R, 1e-12)
print("disk vphi mean/std:", vphi.mean(), vphi.std())
print("disk vz std:", ics.v_disk[:, 2].std())
tab = ics.tables
print("vc at a:", tab.vc[:, np.searchsorted(np.exp(tab.lnR), 0.01)].mean())
print("kappa2/omega2 range:", (tab.kappa2 / tab.omega2).min(),
      (tab.kappa2 / tab.omega2).max())

ch = halo.coefficients(jnp.asarray(ics.x_halo, jnp.float32),
                       jnp.asarray(np.maximum(ics.m_halo, 0), jnp.float32))
cd = disk.coefficients(jnp.asarray(ics.x_disk, jnp.float32),
                       jnp.asarray(ics.m_disk, jnp.float32))
vr = virial_ratio([(ics.x_halo, ics.v_halo, ics.m_halo),
                   (ics.x_disk, ics.v_disk, ics.m_disk)],
                  [(halo, ch), (disk, cd)])
print(f"[{time.time()-t0:.1f}s] virial -2T/VC = {vr:.4f}")
vrd = virial_ratio([(ics.x_disk, ics.v_disk, ics.m_disk)],
                   [(halo, ch), (disk, cd)])
print(f"disk-only virial = {vrd:.4f}")
