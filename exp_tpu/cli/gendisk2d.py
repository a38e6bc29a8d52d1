"""gendisk2d — razor-thin 2D disk initial conditions
(utils/ICs/ZangICs.cc, initial2d.cc): sample a kuzmin / expon / mestel /
zang surface density, rotate at the model's circular speed with a
Toomre-Q radial dispersion (z = vz = 0)."""

import sys

import numpy as np

from exp_tpu.cli._common import make_parser


def main(argv=None):
    ap = make_parser("gendisk2d", __doc__)
    ap.add_argument("-N", type=int, default=10000)
    ap.add_argument("-i", "--model", default="zang",
                    choices=["kuzmin", "expon", "mestel", "zang"])
    ap.add_argument("--acyl", type=float, default=1.0)
    ap.add_argument("--mass", type=float, default=1.0)
    ap.add_argument("--Q", type=float, default=1.4)
    ap.add_argument("--rmax", type=float, default=10.0,
                    help="sampling radius in units of acyl (mestel/zang "
                         "extend automatically past the outer taper)")
    ap.add_argument("-o", "--output", default="disk2d.bods")
    ap.add_argument("-s", "--seed", type=int, default=11)
    a = ap.parse_args(argv)
    from exp_tpu.basis.flatdisk import surface_density_model, _trapz_w
    from exp_tpu.nbody.particles import write_ascii_bodies

    rng = np.random.default_rng(a.seed)
    S = surface_density_model(a.model, a=a.acyl, M=a.mass)
    rmax_eff = a.rmax * a.acyl
    if a.model in ("mestel", "zang"):
        # the Zang outer taper is centered at router = 10 a (Sigma is
        # still 50% there): sample well past it or the realization gets
        # a hard edge mid-taper, seeding spurious transients
        rmax_eff = max(rmax_eff, 40.0 * a.acyl)
    Rg = np.geomspace(1e-3 * a.acyl, rmax_eff, 4000)
    w = _trapz_w(Rg)
    dM = 2.0 * np.pi * np.asarray(S(Rg)) * Rg * w
    cum = np.cumsum(dM)
    Mtot = cum[-1]
    # positions from the cumulative surface mass
    u = rng.uniform(0, 1, a.N) * Mtot
    R = np.interp(u, cum, Rg)
    phi = rng.uniform(0, 2 * np.pi, a.N)
    x = np.stack([R * np.cos(phi), R * np.sin(phi), np.zeros(a.N)], -1)
    # circular speed of the razor-thin disk: midplane radial force by
    # direct ring quadrature is expensive; use the spherical approximation
    # vc^2 = M(<R)/R (good to ~15% for these profiles) plus Q-dispersion
    Menc = np.interp(R, Rg, cum)
    vc = np.sqrt(np.maximum(Menc / np.maximum(R, 1e-12), 0.0))
    kappa = np.sqrt(2.0) * vc / np.maximum(R, 1e-12)   # flat-curve approx
    sigR = 3.36 * np.asarray(S(R)) * a.Q / np.maximum(kappa, 1e-12)
    sigR = np.minimum(sigR, 0.7 * vc)
    vR = rng.normal(0, 1, a.N) * sigR
    vP = np.sqrt(np.maximum(vc ** 2 - 2.0 * sigR ** 2, 0.0)) \
        + rng.normal(0, 1, a.N) * sigR / np.sqrt(2.0)
    v = np.stack([vR * np.cos(phi) - vP * np.sin(phi),
                  vR * np.sin(phi) + vP * np.cos(phi),
                  np.zeros(a.N)], -1)
    m = np.full(a.N, Mtot / a.N)
    write_ascii_bodies(a.output, (x, v, m))
    print(f"gendisk2d: wrote {a.N} bodies to {a.output} "
          f"(model={a.model}, M={Mtot:.6g})")


if __name__ == "__main__":
    sys.exit(main() or 0)
