"""Analysis CLI backends: diskprof, haloprof, mssaprof, viewcoefs,
h5compare, slcheck, orthochk, cylcache, eofinfo (the reference's
utils/Analysis, utils/SL, utils/MSSA and expui CLI helpers)."""

from __future__ import annotations

import numpy as np

from exp_tpu.cli._common import make_parser, load_model, load_snapshot


def haloprof(argv=None):
    """haloprof — radial profiles (density, vc, dispersion) of a snapshot."""
    ap = make_parser("haloprof", haloprof.__doc__)
    ap.add_argument("file")
    ap.add_argument("--type", default="ascii")
    ap.add_argument("--comp", default=None)
    ap.add_argument("--nbins", type=int, default=40)
    ap.add_argument("-o", "--output", default=None)
    a = ap.parse_args(argv)
    s = load_snapshot(a.file, a.type)
    x, v, m = s.GetParticles(a.comp)
    r = np.linalg.norm(x, axis=1)
    edges = np.geomspace(max(r.min(), 1e-6), r.max(), a.nbins + 1)
    idx = np.clip(np.digitize(r, edges) - 1, 0, a.nbins - 1)
    rows = []
    for b in range(a.nbins):
        sel = idx == b
        if not sel.any():
            continue
        rc = np.sqrt(edges[b] * edges[b + 1])
        vol = 4 * np.pi / 3 * (edges[b + 1] ** 3 - edges[b] ** 3)
        Mb = m[sel].sum()
        vr = np.sum(x[sel] * v[sel], axis=1) / np.maximum(r[sel], 1e-12)
        rows.append((rc, Mb / vol, np.sqrt(np.average(
            (vr - vr.mean()) ** 2, weights=m[sel])), m[(r <= rc)].sum()))
    out = a.output or a.file + ".haloprof"
    with open(out, "w") as f:
        f.write("# r rho sigma_r M(<r)\n")
        for row in rows:
            f.write(" ".join(f"{v:.8g}" for v in row) + "\n")
    print(f"wrote {out} ({len(rows)} bins)")


def diskprof(argv=None):
    """diskprof — cylindrical disk profiles (Sigma, vc, sigma_z, z_rms)."""
    ap = make_parser("diskprof", diskprof.__doc__)
    ap.add_argument("file")
    ap.add_argument("--type", default="ascii")
    ap.add_argument("--comp", default=None)
    ap.add_argument("--nbins", type=int, default=40)
    ap.add_argument("-o", "--output", default=None)
    a = ap.parse_args(argv)
    s = load_snapshot(a.file, a.type)
    x, v, m = s.GetParticles(a.comp)
    R = np.hypot(x[:, 0], x[:, 1])
    phi = np.arctan2(x[:, 1], x[:, 0])
    vphi = -v[:, 0] * np.sin(phi) + v[:, 1] * np.cos(phi)
    edges = np.geomspace(max(R.min(), 1e-6), R.max(), a.nbins + 1)
    idx = np.clip(np.digitize(R, edges) - 1, 0, a.nbins - 1)
    out = a.output or a.file + ".diskprof"
    with open(out, "w") as f:
        f.write("# R Sigma vphi sigma_z z_rms\n")
        for b in range(a.nbins):
            sel = idx == b
            if not sel.any():
                continue
            rc = np.sqrt(edges[b] * edges[b + 1])
            area = np.pi * (edges[b + 1] ** 2 - edges[b] ** 2)
            sz = np.sqrt(np.average(v[sel, 2] ** 2, weights=m[sel]))
            zr = np.sqrt(np.average(x[sel, 2] ** 2, weights=m[sel]))
            f.write(f"{rc:.8g} {m[sel].sum()/area:.8g} "
                    f"{np.average(vphi[sel], weights=m[sel]):.8g} "
                    f"{sz:.8g} {zr:.8g}\n")
    print(f"wrote {out}")


def viewcoefs(argv=None):
    """viewcoefs — list times and per-harmonic power of a coefficient file
    (expui/viewcoefs + h5power)."""
    ap = make_parser("viewcoefs", viewcoefs.__doc__)
    ap.add_argument("file")
    a = ap.parse_args(argv)
    from exp_tpu.analysis.coefs import Coefs

    c = Coefs.from_file(a.file)
    ts = c.times()
    print(f"geometry={c.geometry} name={c.name!r} snaps={len(ts)} "
          f"t=[{ts[0]:.6g}, {ts[-1]:.6g}]")
    P = c.power()
    if P.ndim == 2:
        print("power per l (first/last):")
        print("  t0 :", np.array2string(P[0], precision=4))
        print("  t-1:", np.array2string(P[-1], precision=4))
    else:
        print(f"total power: t0={P[0]:.6g} t-1={P[-1]:.6g}")


def h5compare(argv=None):
    """h5compare — coefficient-file regression comparator (expui/h5compare):
    exit 0 if all coefficients agree within tolerance."""
    ap = make_parser("h5compare", h5compare.__doc__)
    ap.add_argument("file1")
    ap.add_argument("file2")
    ap.add_argument("--tol", type=float, default=1e-8)
    a = ap.parse_args(argv)
    from exp_tpu.analysis.coefs import Coefs

    c1 = Coefs.from_file(a.file1)
    c2 = Coefs.from_file(a.file2)
    if c1.geometry != c2.geometry:
        print(f"geometry mismatch: {c1.geometry} != {c2.geometry}")
        return 1
    t1, t2 = c1.times(), c2.times()
    if len(t1) != len(t2):
        print(f"snapshot count mismatch: {len(t1)} != {len(t2)}")
        return 1
    A1, A2 = c1.as_array(), c2.as_array()
    scale = np.abs(A1).max() + 1e-300
    err = np.abs(A1 - A2).max() / scale
    print(f"max relative coefficient difference: {err:.3e} (tol {a.tol:g})")
    return 0 if err <= a.tol else 1


def mssaprof(argv=None):
    """mssaprof — MSSA of a coefficient file: contributions + PC table
    (utils/MSSA expmssa / expui expMSSA pipeline)."""
    ap = make_parser("mssaprof", mssaprof.__doc__)
    ap.add_argument("file")
    ap.add_argument("--window", type=int, default=0,
                    help="embedding window (default T/2)")
    ap.add_argument("--numpc", type=int, default=8)
    ap.add_argument("-o", "--output", default=None)
    a = ap.parse_args(argv)
    from exp_tpu.analysis.coefs import Coefs
    from exp_tpu.analysis.mssa import expMSSA

    c = Coefs.from_file(a.file)
    T = len(c.times())
    w = a.window or max(2, T // 2)
    m = expMSSA({"c": c}, window=w, numpc=a.numpc)
    contrib = m.contributions()
    print("MSSA contributions:", np.array2string(contrib, precision=4))
    out = a.output or a.file + ".mssa"
    np.savetxt(out, m.pcs(), header="principal components (K x numpc)")
    print(f"wrote {out}")


def slcheck(argv=None):
    """slcheck — build an SL basis and dump/inspect its functions
    (utils/SL/slcheck)."""
    ap = make_parser("slcheck", slcheck.__doc__)
    ap.add_argument("-i", "--model", default="hernquist")
    ap.add_argument("--lmax", type=int, default=2)
    ap.add_argument("--nmax", type=int, default=8)
    ap.add_argument("--numr", type=int, default=1000)
    ap.add_argument("--rmap", type=float, default=1.0)
    ap.add_argument("-o", "--output", default=None)
    a = ap.parse_args(argv)
    from exp_tpu.basis.slgrid import build_sph_sl_tables

    model = load_model(a.model)
    t = build_sph_sl_tables(model, lmax=a.lmax, nmax=a.nmax, numr=a.numr,
                            cmap=1, rmap=a.rmap)
    print("eigenvalues (per l):")
    for l in range(a.lmax + 1):
        print(f"  l={l}:", np.array2string(t.ev[l], precision=4))
    if a.output:
        cols = [t.r] + [t.pot_table[:, l, n] for l in range(a.lmax + 1)
                        for n in range(a.nmax)]
        np.savetxt(a.output, np.stack(cols, axis=1),
                   header="r then pot_ln columns (l-major)")
        print(f"wrote {a.output}")


def orthochk(argv=None):
    """orthochk — biorthogonality check of a built basis
    (utils/SL/orthochk; the in-code orthoTest)."""
    ap = make_parser("orthochk", orthochk.__doc__)
    ap.add_argument("-i", "--model", default="hernquist")
    ap.add_argument("--lmax", type=int, default=2)
    ap.add_argument("--nmax", type=int, default=8)
    ap.add_argument("--numr", type=int, default=1000)
    ap.add_argument("--rmap", type=float, default=1.0)
    ap.add_argument("--tol", type=float, default=1e-3)
    a = ap.parse_args(argv)
    from exp_tpu.basis.slgrid import (build_sph_sl_tables,
                                      biorthogonality_matrix)

    model = load_model(a.model)
    t = build_sph_sl_tables(model, lmax=a.lmax, nmax=a.nmax, numr=a.numr,
                            cmap=1, rmap=a.rmap)
    worst = 0.0
    for l in range(a.lmax + 1):
        B = biorthogonality_matrix(t, l)
        err = np.abs(B + np.eye(a.nmax)).max()
        worst = max(worst, err)
        print(f"l={l}: max|B+I| = {err:.3e}")
    print("PASS" if worst <= a.tol else "FAIL")
    return 0 if worst <= a.tol else 1


def cylcache(argv=None):
    """cylcache — build (and cache) an EOF cylinder basis
    (utils/ICs cylcache / eof_basis)."""
    ap = make_parser("cylcache", cylcache.__doc__)
    ap.add_argument("-o", "--cachename", default="eof.cache.h5")
    ap.add_argument("--mmax", type=int, default=6)
    ap.add_argument("--nmax", type=int, default=18)
    ap.add_argument("--lmaxfid", type=int, default=48)
    ap.add_argument("--nmaxfid", type=int, default=32)
    ap.add_argument("--acyl", type=float, default=0.01)
    ap.add_argument("--hcyl", type=float, default=0.002)
    ap.add_argument("--ncylnx", type=int, default=256)
    ap.add_argument("--ncylny", type=int, default=128)
    a = ap.parse_args(argv)
    from exp_tpu.basis.empcyl import build_empcyl_tables

    t = build_empcyl_tables(mmax=a.mmax, nmax=a.nmax, lmaxfid=a.lmaxfid,
                            nmaxfid=a.nmaxfid, acyl=a.acyl, hcyl=a.hcyl,
                            numx=a.ncylnx, numy=a.ncylny,
                            cachename=a.cachename, verbose=True)
    print(f"wrote {a.cachename} (mmax={t.mmax} nmax={t.nmax} "
          f"grid {t.numx}x{t.numy})")


def eofinfo(argv=None):
    """eofinfo — inspect an EOF cache file (utils/ICs empinfo)."""
    ap = make_parser("eofinfo", eofinfo.__doc__)
    ap.add_argument("file")
    a = ap.parse_args(argv)
    from exp_tpu.basis.empcyl import EmpCylTables

    t = EmpCylTables.read_cache(a.file)
    print(f"EOF cache: mmax={t.mmax} nmax={t.nmax} grid={t.numx}x{t.numy} "
          f"acyl={t.acyl} hcyl={t.hcyl} rcylmax={t.rcylmax}")
    print(f"even counts per m: {t.even_count.tolist()}")


def slabprof(argv=None):
    """slabprof — vertical slab profiles: rho(z), sigma_z(z), vz_mean(z)
    (utils/Analysis/slabprof.cc)."""
    ap = make_parser("slabprof", slabprof.__doc__)
    ap.add_argument("file")
    ap.add_argument("--type", default="ascii")
    ap.add_argument("--comp", default=None)
    ap.add_argument("--nbins", type=int, default=40)
    ap.add_argument("--L", type=float, default=1.0,
                    help="horizontal box side (for the density unit)")
    ap.add_argument("-o", "--output", default=None)
    a = ap.parse_args(argv)
    s = load_snapshot(a.file, a.type)
    x, v, m = s.GetParticles(a.comp)
    z = x[:, 2]
    edges = np.linspace(z.min(), z.max(), a.nbins + 1)
    idx = np.clip(np.digitize(z, edges) - 1, 0, a.nbins - 1)
    dz = edges[1] - edges[0]
    out = a.output or a.file + ".slabprof"
    with open(out, "w") as f:
        f.write("# z rho sigma_z vz_mean N\n")
        for b in range(a.nbins):
            sel = idx == b
            if not sel.any():
                continue
            zc = 0.5 * (edges[b] + edges[b + 1])
            rho = m[sel].sum() / (a.L * a.L * dz)
            vzm = np.average(v[sel, 2], weights=m[sel])
            sz = np.sqrt(np.average((v[sel, 2] - vzm) ** 2,
                                    weights=m[sel]))
            f.write(f"{zc:.8g} {rho:.8g} {sz:.8g} {vzm:.8g} "
                    f"{int(sel.sum())}\n")
    print(f"wrote {out}")
