"""gensph — equilibrium spherical N-body realization (utils/ICs/gensph).

    python -m exp_tpu.cli.gensph -N 10000 -i SLGridSph.model -o new.bods
"""

from exp_tpu.cli._common import make_parser, load_model


def main(argv=None):
    ap = make_parser("gensph", __doc__)
    ap.add_argument("-N", "--number", type=int, default=10000)
    ap.add_argument("-i", "--model", default="hernquist",
                    help="model file or builtin (hernquist[:a=..,M=..])")
    ap.add_argument("-o", "--output", default="new.bods")
    ap.add_argument("-s", "--seed", type=int, default=11)
    ap.add_argument("--rmin", type=float, default=1e-4)
    ap.add_argument("--rmax", type=float, default=20.0)
    a = ap.parse_args(argv)

    from exp_tpu.ic.eddington import sample_spherical_model
    from exp_tpu.nbody.particles import write_ascii_bodies

    model = load_model(a.model, rmin=a.rmin, rmax=a.rmax)
    x, v, m = sample_spherical_model(model, a.number, seed=a.seed)
    write_ascii_bodies(a.output, (x, v, m))
    print(f"gensph: wrote {a.number} bodies to {a.output} "
          f"(M={m.sum():.6g})")


if __name__ == "__main__":
    main()
