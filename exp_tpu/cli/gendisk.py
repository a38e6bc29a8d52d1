"""gendisk — exponential-disk (+ optional halo) ICs (utils/ICs initial/
DiskHalo path, simplified)."""

import sys

from exp_tpu.cli._common import make_parser, load_model


def main(argv=None):
    ap = make_parser("gendisk", __doc__)
    ap.add_argument("-N", "--number", type=int, default=10000)
    ap.add_argument("--acyl", type=float, default=0.01)
    ap.add_argument("--hcyl", type=float, default=0.002)
    ap.add_argument("--mass", type=float, default=0.05)
    ap.add_argument("--halo", default=None,
                    help="optional halo model for the rotation curve")
    ap.add_argument("-Q", type=float, default=1.2,
                    help="Toomre Q for the radial dispersion")
    ap.add_argument("-o", "--output", default="disk.bods")
    ap.add_argument("-s", "--seed", type=int, default=7)
    a = ap.parse_args(argv)

    import numpy as np
    from exp_tpu.ic.disk import sample_exponential_disk, disk_velocities
    from exp_tpu.nbody.particles import write_ascii_bodies

    x, m = sample_exponential_disk(a.number, acyl=a.acyl, hcyl=a.hcyl,
                                   mass=a.mass, seed=a.seed)

    def vc2_disk(R):
        # self-gravity estimate from the enclosed disk mass
        Menc = a.mass * (1 - (1 + R / a.acyl) * np.exp(-R / a.acyl))
        return Menc / np.maximum(R, 1e-12)

    if a.halo:
        halo = load_model(a.halo)

        def vc_of_R(R):
            # TOTAL rotation curve: halo force PLUS the disk's own
            # enclosed mass (disk_velocities' documented contract)
            return np.sqrt(np.maximum(R * halo.get_dpot(R)
                                      + vc2_disk(R), 0.0))
    else:
        def vc_of_R(R):
            return np.sqrt(np.maximum(vc2_disk(R), 0.0))

    v = disk_velocities(x, vc_of_R, acyl=a.acyl, seed=a.seed,
                        Q=a.Q, Mdisk=a.mass, hcyl=a.hcyl)
    write_ascii_bodies(a.output, (x, v, m))
    print(f"gendisk: wrote {a.number} bodies to {a.output}")


if __name__ == "__main__":
    sys.exit(main() or 0)
