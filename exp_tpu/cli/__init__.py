"""Standalone command-line utilities (the reference's utils/ toolbox).

Each tool runs as `python -m exp_tpu.cli.<tool>` (or via the `exp-tpu`
umbrella: `python -m exp_tpu.cli <tool> ...`).  Coverage of the reference's
utils/ inventory (SURVEY section 2.5):

  ICs:         gensph (utils/ICs/gensph; --qp QPDistF, --ebar ellipsoidal
               bar), cubeics, gendisk (full DiskHalo path via --nhalo),
               gendisk2d (Disk2dHalo path via --nhalo), shrinkics,
               modelfit, addring, addsphmod, forcetest, bonnerebert,
               zangics (tapered-Mestel Zang disk), hdf52accel
  PhaseSpace:  pspinfo, pspstat, psp2ascii, ascii2psp, snap2ascii, diffpsp,
               psp2hdf5, psporbv, pspmono (monopole model table),
               psp2bess/psp2lagu/psp2rings (kinematic Fourier series),
               psp2range, pspreal, spl2psp (split-PSP assembly),
               tipstd2psp (+ snapconvert --to tipsy writer), psp2vtu
  Analysis:    diskprof (+--coef), haloprof, sphprof (coefficient-based
               field profiles), mssaprof, viewcoefs, h5compare, diskfreqs,
               diskeof (empirical basis re-orthogonalization), makecoefs,
               coefstoh5 (native coefficient file converter)
  MSSA:        mssafilter (exp_halo_noise / exp_disk_noise), expmssa
               (standalone M-SSA analysis + grouped reconstruction)
  SL/basis:    slcheck, orthochk, cylcache, eofinfo, slshift
"""

TOOLS = [
    "gensph", "cubeics", "gendisk", "genslab", "gendisk2d",
    "pspinfo", "pspstat", "psp2ascii", "ascii2psp", "snap2ascii", "diffpsp",
    "psp2hdf5", "shrinkics", "psphisto", "pspbox", "snapconvert", "snap2vtk",
    "diskprof", "haloprof", "sphprof", "slabprof", "mssaprof", "viewcoefs",
    "h5compare", "h5power",
    "slcheck", "orthochk", "cylcache", "eofinfo", "crossval",
    "diskfreqs", "kldiv", "yamldiff",
    "modelfit", "addring", "addsphmod", "forcetest",
    "psporbv", "bonnerebert", "mssafilter", "slshift",
    "scalarprod", "pspinterp",
    "zangics", "pspmono",
    "psp2bess", "psp2lagu", "psp2rings", "psp2range", "pspreal", "spl2psp",
    "diskeof", "hdf52accel", "makecoefs", "coefstoh5",
    "tipstd2psp", "psp2vtu", "expmssa",
]
