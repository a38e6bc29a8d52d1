"""Simulation driver: config -> components -> jitted run loop.

The orchestration layer of the framework — the TPU-native analogue of the
reference's expand.cc main loop + ComponentContainer + OutputContainer
(src/expand.cc:169-575, src/ComponentContainer.cc, src/OutputContainer.cc):

* builds each component's force from its YAML stanza (force factory,
  Component.cc:1077-1108),
* reads and shards body files,
* runs a jitted multi-component KDK step — component interactions follow the
  reference's Interaction/allcouples pairing (ComponentContainer.cc:309-424,
  :580-867): every component's particles feel the force of every coupled
  component's basis expansion,
* amortizes dispatch latency by running `steps_per_block` steps inside one
  jit via lax.scan (TPU-native replacement for the per-substep host loop),
* dispatches periodic outputs (OutLog / OutCoef / checkpoints) on the host.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, replace, field

import numpy as np
import jax
import jax.numpy as jnp

from exp_tpu.config import RunConfig, ComponentConfig, ConfigError
from exp_tpu.nbody.particles import ParticleSystem, read_bodies
from exp_tpu.nbody.step import shard_map, _diagnostics, _ps_specs, _diag_specs
from exp_tpu.nbody.multistep import _pseudo_accel


# ---------------------------------------------------------------------------
# Force factory
# ---------------------------------------------------------------------------

@jax.jit
def _slice_history(hist, j):
    """Materialize step j of a stacked per-step history in ONE dispatch."""
    return jax.tree_util.tree_map(lambda a: a[j], hist)

def build_force(fc, dtype, workdir=".", particles=None):
    """Instantiate a force from its config stanza (host-side table builds).

    `particles`: optional (x, mass) host arrays of the owning component,
    used when a basis conditions on the snapshot itself (cylinder
    `conditioning: particles`, the reference's accumulate_eof path)."""
    p = dict(fc.parameters)
    if fc.id == "sphereSL":
        from exp_tpu.basis.model import SphericalModelTable
        from exp_tpu.basis.slgrid import build_sph_sl_tables
        from exp_tpu.forces.spherical import SphereSL

        model = p.pop("_model_object", None)   # adaptive-rebuild path
        modelname = p.pop("modelname", "SLGridSph.model")
        if model is None:
            mpath = os.path.join(workdir, str(modelname))
            if os.path.exists(mpath):
                model = SphericalModelTable.from_file(mpath)
            else:
                # builtin analytic models: hernquist[:a=..,M=..], plummer...
                from exp_tpu.cli._common import load_model

                model = load_model(modelname)
        p.pop("dtime", None)        # adaptive recompute interval (driver)
        p.pop("modeltype", None)
        cachename = p.pop("cachename", None)
        if cachename is not None:
            cachename = os.path.join(workdir, cachename)
        lmax = int(p.pop("Lmax", 4))
        nmax = int(p.pop("nmax", 10))
        numr = int(p.pop("numr", 2000))
        rmin = p.pop("rmin", None)
        rmax = p.pop("rmax", None)
        rmap = float(p.pop("rmapping", 0.067))
        cmap = int(p.pop("cmap", 1))
        scale = float(p.pop("scale", 1.0))
        backend = str(p.pop("backend", "matmul"))
        p.pop("self_consistent", True)
        p.pop("modelname_override", None)
        t = build_sph_sl_tables(model, lmax=lmax, nmax=nmax, numr=numr,
                                rmin=None if rmin is None else float(rmin),
                                rmax=None if rmax is None else float(rmax),
                                cmap=cmap, rmap=rmap, cachename=cachename)
        return SphereSL.from_tables(
            t, scale=scale, dtype=dtype, backend=backend,
            pallas_precision=str(p.pop("pallas_precision", "mixed")),
            pallas_interp=str(p.pop("pallas_interp", "spline")),
            numr_cs=int(p.pop("numr_cs", 256)),
            pallas_harmonics=str(p.pop("pallas_harmonics", "auto")))
    elif fc.id == "noforce":
        from exp_tpu.forces.noforce import NoForce

        return NoForce()
    elif fc.id == "cube":
        from exp_tpu.forces.cube import Cube

        return Cube.create(
            nmaxx=int(p.pop("nmaxx", 6)), nmaxy=int(p.pop("nmaxy", 6)),
            nmaxz=int(p.pop("nmaxz", 6)), dtype=dtype,
            backend=str(p.pop("backend", "einsum")),
            pallas_precision=str(p.pop("pallas_precision", "mixed")))
    elif fc.id == "cylinder":
        from exp_tpu.basis.empcyl import build_empcyl_tables
        from exp_tpu.forces.cylinder import CylinderForce

        cachename = p.pop("cachename", p.pop("eof_file", None))
        if cachename is not None:
            cachename = os.path.join(workdir, cachename)
        disk_density = None
        density_key = None
        if str(p.pop("conditioning", "analytic")) == "particles":
            if particles is None:
                raise ConfigError("cylinder conditioning: particles needs "
                                  "the component's bodyfile")
            from exp_tpu.basis.empcyl import disk_density_from_particles

            disk_density = disk_density_from_particles(*particles)
            import hashlib

            h = hashlib.sha256()
            for a in particles:
                h.update(np.ascontiguousarray(a).tobytes())
            density_key = "particles:" + h.hexdigest()[:16]
        t = build_empcyl_tables(
            disk_density=disk_density, density_key=density_key,
            mmax=int(p.pop("mmax", 6)), nmax=int(p.pop("nmax", 18)),
            ncylodd=p.pop("ncylodd", None),
            lmaxfid=int(p.pop("lmaxfid", 48)),
            nmaxfid=int(p.pop("nmaxfid", 32)),
            acyl=float(p.pop("acyl", 0.01)), hcyl=float(p.pop("hcyl", 0.002)),
            rcylmin=float(p.pop("rcylmin", 1e-3)),
            rcylmax=float(p.pop("rcylmax", 20.0)),
            numx=int(p.pop("ncylnx", 256)), numy=int(p.pop("ncylny", 128)),
            rnum=int(p.pop("rnum", 200)), tnum=int(p.pop("tnum", 80)),
            cachename=cachename)
        return CylinderForce.from_tables(
            t, dtype=dtype, backend=str(p.pop("backend", "xla")),
            pallas_precision=str(p.pop("pallas_precision", "default")),
            pallas_interp=str(p.pop("pallas_interp", "spline")))
    elif fc.id in ("flatdisk", "CBDisk"):
        from exp_tpu.basis.flatdisk import build_flatdisk_tables
        from exp_tpu.forces.cylinder import CylinderForce

        cachename = p.pop("cachename", None)
        if cachename is not None:
            cachename = os.path.join(workdir, cachename)
        # CBDisk: the analytic Clutton-Brock 2D set is the Kuzmin-conditioned
        # basis (its lowest member IS the Kuzmin disk) — same span
        model = p.pop("background", "kuzmin" if fc.id == "CBDisk" else "expon")
        if isinstance(model, dict):
            model = model.get("name", "expon")
        t = build_flatdisk_tables(
            mmax=int(p.pop("Mmax", p.pop("mmax", 6))),
            nmax=int(p.pop("nmax", 10)), model=str(model),
            acyl=float(p.pop("acyl", p.pop("scale", 1.0))),
            rcylmin=float(p.pop("rcylmin", 1e-3)),
            rcylmax=float(p.pop("rcylmax", 20.0)),
            numx=int(p.pop("numx", 256)), numy=int(p.pop("numy", 128)),
            knots=int(p.pop("knots", 400)), numk=int(p.pop("numk", 256)),
            cachename=cachename)
        return CylinderForce.from_tables(
            t, dtype=dtype, backend=str(p.pop("backend", "xla")),
            pallas_precision=str(p.pop("pallas_precision", "default")),
            pallas_interp=str(p.pop("pallas_interp", "spline")))
    elif fc.id == "slabSL":
        from exp_tpu.basis.slab import build_slab_tables
        from exp_tpu.forces.slab import SlabForce

        cachename = p.pop("cachename", None)
        if cachename is not None:
            cachename = os.path.join(workdir, cachename)
        t = build_slab_tables(
            nmaxx=int(p.pop("nmaxx", 4)), nmaxy=int(p.pop("nmaxy", 4)),
            nmax=int(p.pop("nmaxz", p.pop("nmax", 6))),
            zmax=float(p.pop("zmax", 0.1)), h=float(p.pop("hslab", 0.01)),
            # reference SLGridSlab knobs: background model type
            # (iso/const/para) and the construction method ('sl' = the
            # Sturm-Liouville solve like SLGridSlab; 'greens' = exact
            # Green's-function pairs, this framework's default)
            type=str(p.pop("type", "iso")),
            method=str(p.pop("method", "greens")),
            cachename=cachename)
        return SlabForce.from_tables(
            t, dtype=dtype, backend=str(p.pop("backend", "einsum")))
    elif fc.id == "bessel":
        from exp_tpu.basis.bessel import make_bessel_force

        return make_bessel_force(
            lmax=int(p.pop("Lmax", p.pop("lmax", 4))),
            nmax=int(p.pop("nmax", 10)),
            rmax=float(p.pop("rmax", 1.0)),
            numr=int(p.pop("numr", 2000)), dtype=dtype)
    elif fc.id in ("CBsphere", "hernq"):
        from exp_tpu.basis.analytic import make_analytic_force

        return make_analytic_force(
            fc.id, lmax=int(p.pop("Lmax", p.pop("lmax", 4))),
            nmax=int(p.pop("nmax", 10)),
            rmin=float(p.pop("rmin", 1e-3)),
            rmax=float(p.pop("rmax", 50.0)),
            numr=int(p.pop("numr", 2000)),
            scale=float(p.pop("scale", 1.0)), dtype=dtype,
            backend=str(p.pop("backend", "matmul")))
    elif fc.id == "direct":
        from exp_tpu.forces.direct import DirectForce

        # reference defaults to the SplineSoft kernel when `type` is
        # absent (src/Direct.cc:88-93)
        kernel = str(p.pop("type", "Spline")).lower()
        kw = dict(eps=float(p.pop("soft", p.pop("eps", 1e-4))),
                  kernel="spline" if kernel.startswith("spline")
                  else "plummer",
                  mn_model=bool(p.pop("mn_model", False)),
                  a=float(p.pop("a", 1.0)), b=float(p.pop("b", 0.1)))
        if p.pop("pm_model", False):
            from exp_tpu.basis.model import SphericalModelTable

            model = SphericalModelTable.from_file(
                str(p.pop("pmmodel_file", "SLGridSph.model")))
            return DirectForce.with_pm_model(model, **kw)
        return DirectForce(**kw)
    elif fc.id == "shells":
        from exp_tpu.forces.shells import ShellsForce

        return ShellsForce(rmax=float(p.pop("rmax", 10.0)),
                           nbins=int(p.pop("nbins", 256)))
    elif fc.id == "halobulge":
        from exp_tpu.basis.model import SphericalModelTable
        from exp_tpu.forces.shells import HaloBulgeForce

        model = SphericalModelTable.from_file(
            os.path.join(workdir, p.pop("modelname")))
        return HaloBulgeForce.from_model(model, dtype=dtype)
    elif fc.id == "twocenter":
        import jax.numpy as jnp
        from exp_tpu.config import ForceConfig
        from exp_tpu.forces.twocenter import TwoCenterForce

        cfac = float(p.pop("cfac", 1.0))
        alpha = float(p.pop("alpha", 1.0))
        inner_cfg = p.pop("inner", None)
        outer_cfg = p.pop("outer", None)
        base_id = p.pop("basis", "sphereSL")
        base_params = p.pop("parameters", dict(p))

        def mk(cfg):
            if cfg is None:
                cfg = {"id": base_id, "parameters": base_params}
            return build_force(
                ForceConfig(id=cfg.get("id", base_id),
                            parameters=dict(cfg.get("parameters",
                                                    base_params))),
                dtype, workdir, particles=particles)

        return TwoCenterForce(inner=mk(inner_cfg), outer=mk(outer_cfg),
                              c1=jnp.zeros(3, dtype), c2=jnp.zeros(3, dtype),
                              cfac=cfac, alpha=alpha)
    raise ConfigError(f"force id {fc.id!r} not implemented yet")


# ---------------------------------------------------------------------------
# Components
# ---------------------------------------------------------------------------

@dataclass
class Component:
    name: str
    force: object
    ps: ParticleSystem
    config: ComponentConfig
    self_consistent: bool = True
    # adiabatic turn-on (Component::Adiabatic, the reference's ton/twid ramp)
    adiabatic: bool = False
    ton: float = 0.0
    twid: float = 1.0
    # EJ center/axis tracking (Orient); ej_flags is the reference bitmask
    # (AXIS=1, CENTER=2, Orient.H:129)
    EJ: bool = False
    ej_flags: int = 0
    orient: object = None
    # prescribed center trajectory (CenterFile)
    center_traj: object = None
    # adaptive basis recomputation (Sphere 'dtime' option, Sphere.cc:50-52)
    basis_dtime: float = 0.0
    basis_tnext: float = 0.0
    # particles beyond rtrunc (from the center) do not contribute to the
    # expansion but still feel it (Component.H:136-139)
    rtrunc: float = 1.0e20
    # expand about the component's instantaneous center of mass
    # (Component.H:155-163 'Local' frame, `com: true`)
    com_system: bool = False
    # non-inertial expansion-frame correction (include/PseudoAccel.H;
    # Component.cc:4407-4425): quadratic-LS estimator over the tracked
    # center history, subtracted from self-gravity (AddAcc) but not
    # externals (AddAccExt).  Enabled by `nEJaccel > 0`.
    pseudo: object = None
    # coefficient playback / Hall smoothing
    playback: object = None
    npca: int = 0
    nsamples: int = 8
    tk_type: str = "Hall"
    tksmooth: float = 3.0
    tkcum: float = 0.95
    # smooth in the subsample-covariance eigenbasis instead of channel-wise
    # (AxisymmetricBasis.H:27 pcaeof)
    pcaeof: bool = False

    def adb(self, t):
        """Adiabatic mass factor in [0, 1]."""
        if not self.adiabatic:
            return 1.0
        import jax.numpy as jnp

        return 0.5 * (1.0 + jnp.tanh((t - self.ton) / self.twid))


class Simulation:
    """Multi-component BFE N-body run."""

    def __init__(self, config: RunConfig, workdir=".", mesh=None,
                 steps_per_block: int | None = None):
        self.config = config
        self.workdir = workdir
        g = config.glob
        self.dt = float(g.dtime)
        self.nsteps = int(g.nsteps)
        self.runtag = g.runtag
        # outdir resolution: an explicit homedir prefixes relative outdirs
        # (parse.cc:231-234); use_cwd roots them at the process cwd
        # (parse.cc:123); default is the workdir
        base = workdir
        if getattr(g, "homedir", ""):
            base = g.homedir
        elif getattr(g, "use_cwd", False):
            base = os.getcwd()
        self.outdir = os.path.join(base, g.outdir)
        os.makedirs(self.outdir, exist_ok=True)
        self.time = 0.0
        self.istep = 0

        # fpe: trace -> jax_debug_nans re-runs the faulting op un-jitted
        # and raises at the op (reference fpe_trace backtrace handler,
        # expand.cc:315-317, exputil/fpetrap.cc)
        if str(getattr(g, "fpe", False)).lower() in ("trace", "debug"):
            jax.config.update("jax_debug_nans", True)

        self.compute_dtype = jnp.dtype(g.compute_dtype)
        # f64 accumulation only if x64 is enabled (on TPU the f32 path with
        # chunked partial sums is the native choice; f64 is for CPU testing)
        if g.accum_dtype == "float64" and not jax.config.jax_enable_x64:
            self.accum_dtype = jnp.dtype("float32")
        else:
            self.accum_dtype = jnp.dtype(g.accum_dtype)

        # device mesh over the particle axis
        if mesh is None:
            from exp_tpu.parallel import particle_mesh

            mesh = particle_mesh()
        self.mesh = mesh
        self.n_shards = mesh.devices.size
        #: multi-process world (jax.distributed initialized by run.py
        #: --distributed or the caller): body reads become process-sharded,
        #: output writing is process-0-gated, and host materialization of
        #: particle state goes through a cross-process allgather
        self.dist = jax.process_count() > 1
        self.is_primary = jax.process_index() == 0

        # components
        self.components: dict[str, Component] = {}
        #: harmonic-restriction state per component: {"mask": (2,L+1,L+1,n)
        #: 0/1 array, "fix_l0": bool, "c0": captured monopole or None}
        self._restrict: dict[str, dict] = {}
        for cc in config.components:
            if cc.bodyfile is None:
                raise ConfigError(f"component {cc.name}: no bodyfile")
            # bodyfile may be reference ascii OR a PSP binary snapshot
            # (sniffed by magic) — the name inside a multi-component PSP
            # defaults to this component's name
            if self.dist:
                # process-sharded ingest: each process parses only its
                # contiguous row block (Component.H:202-204's MPI scatter)
                from exp_tpu.parallel.distributed import (
                    read_bodies_distributed, allgather_ps)

                ps = read_bodies_distributed(
                    os.path.join(workdir, cc.bodyfile), mesh,
                    dtype=self.compute_dtype,
                    component=(cc.parameters or {}).get(
                        "psp_component", cc.name),
                    scale_dattr=(cc.parameters or {}).get("scale_dattr"))
            else:
                ps = read_bodies(os.path.join(workdir, cc.bodyfile),
                                 dtype=self.compute_dtype,
                                 pad_to=self.n_shards,
                                 component=(cc.parameters or {}).get(
                                     "psp_component", cc.name),
                                 scale_dattr=(cc.parameters or {}).get(
                                     "scale_dattr"))
            if g.nbodmax and ps.n > g.nbodmax:
                raise ConfigError(
                    f"component {cc.name}: {ps.n} bodies exceeds "
                    f"nbodmax={g.nbodmax}")
            if (self.dist and cc.force.id == "cylinder"
                    and (cc.force.parameters or {}).get(
                        "conditioning") == "particles"):
                hp = allgather_ps(ps)
                cond_particles = (hp.x, hp.mass)
            elif self.dist:
                cond_particles = None   # only cylinder conditioning uses it
            else:
                cond_particles = (np.asarray(ps.x), np.asarray(ps.mass))
            force = build_force(cc.force, self.compute_dtype, workdir,
                                particles=cond_particles)
            if not self.dist:
                ps = ps.shard(mesh)
            cp = cc.parameters or {}
            orient = None
            # EJ is the reference's orient bitmask (Orient.H:129:
            # AXIS=1, CENTER=2); a bare `EJ: true` means center tracking
            ejraw = cp.get("EJ", 0)
            ej_flags = 2 if ejraw is True else int(ejraw or 0)
            # nEJaccel > 0 enables the non-inertial frame correction
            # (Component.cc:1355 Orient ctor Naccel; PseudoAccel.H)
            naccel = int(cp.get("nEJaccel", 0))
            pseudo = None
            if naccel > 0:
                from exp_tpu.nbody.centering import PseudoAccel

                pseudo = PseudoAccel(
                    nsize=naccel,
                    center=bool(ej_flags & 2) or bool(cp.get("centerfile")),
                    axis=bool(ej_flags & 1))
            if ej_flags:
                from exp_tpu.nbody.centering import EJOrient

                logf = os.path.join(self.outdir,
                                    f"{g.runtag}.orient.{cc.name}")
                orient = EJOrient(nkeep=int(cp.get("nEJkeep", 256)),
                                  window=int(cp.get("EJwindow", 16)),
                                  damp=float(cp.get("EJdamp", 1.0)),
                                  logfile=logf, pseudo=pseudo,
                                  write_log=self.is_primary)
                if g.infile and os.path.exists(logf):
                    # restart: reload the regression history
                    orient.load_log(logf)
            center_traj = None
            if cp.get("centerfile"):
                from exp_tpu.nbody.centering import CenterFile

                center_traj = CenterFile(os.path.join(workdir,
                                                      cp["centerfile"]))
            self.components[cc.name] = Component(
                name=cc.name, force=force, ps=ps, config=cc,
                self_consistent=bool(cc.force.parameters.get(
                    "self_consistent", True)),
                adiabatic=bool(cp.get("adiabatic", False)),
                ton=float(cp.get("ton", 0.0)),
                twid=float(cp.get("twid", 1.0)),
                EJ=bool(ej_flags), ej_flags=ej_flags, orient=orient,
                center_traj=center_traj, pseudo=pseudo,
                rtrunc=float(cp.get("rtrunc", 1.0e20)),
                com_system=bool(cp.get("com", False)),
                basis_dtime=float(cc.force.parameters.get("dtime", 0.0)
                                  if cc.force.id == "sphereSL" else 0.0))
            c0 = self.components[cc.name]
            c0.basis_tnext = c0.basis_dtime
            # coefficient playback (the reference's play_back,
            # SphericalBasis.cc determine_coefficients_playback): drive the
            # force from a stored coefficient series instead of particles
            pb = cp.get("playback")
            if pb:
                from exp_tpu.analysis.coefs import Coefs

                self.components[cc.name].playback = Coefs.from_file(
                    os.path.join(workdir, pb))
            # coefficient NOISE experiment (SphericalBasis.cc:2109-2214):
            # replace the live coefficients each step with Gaussian draws
            # scaled by the one-particle moments of a background model —
            # delivered through the playback channel
            fp = cc.force.parameters
            if fp.get("NOISE") and cc.force.id in ("sphereSL", "bessel"):
                from exp_tpu.nbody.noise import SphereNoise

                nmf = str(fp.get("noise_model_file",
                                 fp.get("modelname", "SLGridSph.model")))
                nmp = os.path.join(workdir, nmf)
                if os.path.exists(nmp):
                    from exp_tpu.basis.model import SphericalModelTable

                    nmodel = SphericalModelTable.from_file(nmp)
                else:
                    from exp_tpu.cli._common import load_model

                    nmodel = load_model(nmf)
                self.components[cc.name].playback = SphereNoise.build(
                    c0.force, nmodel,
                    noiseN=float(fp.get("noiseN", 1.0e-6)),
                    seedN=int(fp.get("seedN", 11)))
            # harmonic restrictions (SphericalBasis valid_keys,
            # SphericalBasis.cc:33-39; applied in the force loop
            # :1568-1600, FIX_L0 :1689-1694).  TPU-native: a static 0/1
            # mask over the coefficient array — the force is linear in
            # the coefficients, so masking them equals skipping terms.
            rkeys = ("NO_L0", "NO_L1", "EVEN_L", "EVEN_M", "M0_ONLY",
                     "FIX_L0")
            if cc.force.id in ("sphereSL", "bessel") and any(
                    fp.get(k) for k in rkeys):
                f0 = c0.force
                L, nm = f0.lmax, f0.nmax
                mask = np.ones((2, L + 1, L + 1, nm), np.float32)
                if fp.get("NO_L0"):
                    mask[:, 0] = 0.0
                if fp.get("NO_L1") and L >= 1:
                    mask[:, 1] = 0.0
                if fp.get("EVEN_L"):
                    mask[:, np.arange(L + 1) % 2 == 1] = 0.0
                if fp.get("EVEN_M"):
                    mask[:, :, np.arange(L + 1) % 2 == 1] = 0.0
                if fp.get("M0_ONLY"):
                    mask[:, :, 1:] = 0.0
                self._restrict[cc.name] = {
                    "mask": mask, "fix_l0": bool(fp.get("FIX_L0")),
                    "c0": None}
            # polar/cylinder analogues (PolarBasis.cc:36-45: NO_M0/NO_M1/
            # EVEN_M/M0_ONLY/mlim; Cylinder.cc valid_keys: EVEN_M/mlim)
            # over the (2, mmax+1, nmax) coefficient layout
            mkeys = ("NO_M0", "NO_M1", "EVEN_M", "M0_ONLY", "mlim")
            if cc.force.id in ("cylinder", "flatdisk", "CBDisk") and any(
                    fp.get(k) is not None and fp.get(k) is not False
                    for k in mkeys):
                f0 = c0.force
                Mm, nm = f0.mmax, f0.nmax
                mask = np.ones((2, Mm + 1, nm), np.float32)
                if fp.get("NO_M0"):
                    mask[:, 0] = 0.0
                if fp.get("NO_M1") and Mm >= 1:
                    mask[:, 1] = 0.0
                if fp.get("EVEN_M"):
                    mask[:, np.arange(Mm + 1) % 2 == 1] = 0.0
                if fp.get("M0_ONLY"):
                    mask[:, 1:] = 0.0
                if fp.get("mlim") is not None:
                    mask[:, int(fp["mlim"]) + 1:] = 0.0
                self._restrict[cc.name] = {
                    "mask": mask, "fix_l0": False, "c0": None}
            # coefficient smoothing config (npca/nsamples/tk_type knobs,
            # AxisymmetricBasis.H:20-43)
            self.components[cc.name].npca = int(cp.get("npca", 0))
            self.components[cc.name].nsamples = int(cp.get("nsamples", 8))
            self.components[cc.name].tk_type = str(cp.get("tk_type", "Hall"))
            self.components[cc.name].tksmooth = float(cp.get("tksmooth", 3.0))
            self.components[cc.name].tkcum = float(cp.get("tkcum", 0.95))
            self.components[cc.name].pcaeof = bool(cp.get("pcaeof", False))
        self._centers = {n: np.zeros(3) for n in self.components}
        self._rots = {n: np.eye(3) for n in self.components}
        # restart: resume orient-tracked centers/rotations immediately
        for n, c in self.components.items():
            if c.orient is not None and len(c.orient._histC):
                if c.ej_flags & 2:
                    self._centers[n] = c.orient.center
                if c.ej_flags & 1:
                    self._rots[n] = c.orient.body
        self._hall = {}          # name -> smoothing factor array
        #: frozen coefficient sets for `self_consistent: false` components
        #: (captured from the initial projection at prime; injected through
        #: the playback channel so the expansion never responds to the
        #: live particles — the reference's fixed-potential component)
        self._frozen = {}
        for n, c in self.components.items():
            if c.self_consistent:
                continue
            if getattr(c.force, "needs_sources", False) or \
                    getattr(c.force, "needs_centers", False):
                raise ConfigError(
                    f"component {n}: self_consistent: false is only "
                    f"supported for coefficient-based forces")
        for n, c in self.components.items():
            if c.npca > 0 and (getattr(c.force, "needs_sources", False)
                               or getattr(c.force, "needs_centers", False)):
                raise ConfigError(
                    f"component {n}: npca smoothing needs an array-valued "
                    f"coefficient basis (AxisymmetricBasis PCA)")
            if (c.ej_flags & 1) and getattr(c.force, "needs_centers",
                                            False):
                raise ConfigError(
                    f"component {n}: EJ AXIS tracking is not supported "
                    f"with a twocenter force (the two-center blend is "
                    f"evaluated in the inertial frame); use EJ: 2 "
                    f"(CENTER) only")

        # interaction couples: an entry `a: b` means "b feels a", ONE-WAY
        # (Interaction.l is "components whose particles will feel the force
        # from c", ComponentContainer.H:27-35, .cc:410-440); list mutual
        # pairs explicitly.  Deduped: a repeated/reciprocal entry must not
        # double-apply gravity.
        names = list(self.components)
        self.couples: dict[str, list[str]] = {b: [b] for b in names}
        if config.interactions:
            for a, b in config.interactions:
                if a not in names or b not in names:
                    raise ConfigError(f"Interaction {a}:{b}: unknown component")
                if a not in self.couples[b]:
                    self.couples[b].append(a)
        elif config.glob.allcouples:
            for b in names:
                self.couples[b] = list(names)

        # external fields + boundary wrappers (External: stanza)
        from exp_tpu.forces.external import (build_external, build_operator,
                                             PeriodicBC)

        self.externals = []
        self.wrappers = []
        self.operators = []      # host-side per-block operators
        for e in (config.external or []):
            if not e:
                continue
            if e.get("id") == "periodicBC":
                self.wrappers.append(PeriodicBC(
                    **(e.get("parameters") or {})))
                continue
            op = build_operator(e, runtag=config.glob.runtag,
                                outdir=self.outdir,
                                seed=getattr(g, "random_seed", None))
            if op is not None:
                self.operators.append(op)
            else:
                self.externals.append(build_external(
                    e, workdir=workdir, dtype=self.compute_dtype))

        # outputs; on an `infile:` restart the writers CONTINUE existing
        # files instead of truncating them (which would also destroy the
        # old outputs before restore_checkpoint even runs).  restart_as_new
        # reads the checkpoint bodies but starts a NEW run with fresh
        # outputs (parse.cc:243 ignore_info)
        self.is_restart = bool(config.glob.infile) and not bool(
            getattr(config.glob, "restart_as_new", False))
        self.outputs = [self._make_output(o) for o in config.outputs]
        self._nint_gcd = 1
        nints = [o.nint for o in self.outputs if o.nint > 0]
        if nints:
            self._nint_gcd = int(np.gcd.reduce(nints))
        self.steps_per_block = (steps_per_block if steps_per_block
                                else self._nint_gcd)
        # playback coefficients / prescribed centers are interpolated on the
        # host per block; a block must then be ONE step or the run would
        # integrate against stale fields mid-block (the reference
        # interpolates them every step)
        if steps_per_block is None and any(
                c.playback is not None or c.center_traj is not None
                for c in self.components.values()):
            self.steps_per_block = 1

        self._step_fn = None
        # graceful-stop machinery (the reference's chkTimer + signal paths,
        # src/chkTimer.cc, expand.cc:236-257,430-437)
        self.stop_requested = False
        self.dump_requested = False
        # wall-clock budget: Global.runtime is in HOURS (chkTimer.cc:62);
        # run.py --wall (seconds) overrides
        self.wall_limit = (float(g.runtime) * 3600.0
                           if getattr(g, "runtime", -1.0) > 0 else None)
        self.restart_cmd = getattr(g, "restart_cmd", "") or None
        #: progress report cadence in steps (reference nreport, global.H:56)
        self.nreport = int(getattr(g, "nreport", 0))
        #: eqmotion: false freezes the phase space — coefficients, forces
        #: and outputs still run every step (incpos.cc:75, incvel.cc:93)
        self.eqmotion = bool(getattr(g, "eqmotion", True))
        #: host-side RNG seeded from Global.random_seed (parse.cc:115-121)
        self.rng = np.random.default_rng(int(getattr(g, "random_seed", 11)))
        self._wall0 = time.time()
        # per-phase wall-clock timers (the reference's step timers printed
        # at VERBOSE>3, src/step.cc:28-29,347-374; here the jitted block is
        # one fused phase so the split is Compute/Orient/Hall/Output/Relevel)
        self.verbose = int(getattr(config.glob, "VERBOSE", 0))
        self.timers = {k: 0.0 for k in
                       ("Compute", "Orient", "Hall", "Output", "Relevel")}
        self._state = {n: c.ps for n, c in self.components.items()}
        self._coefs = None
        self._diag = None
        self._host_cache = {}           # name -> host ParticleSystem
        self._host_cache_step = {}      # name -> istep of the cached copy

        # multistep machinery (Global.multistep > 0)
        self.M = int(g.multistep)
        self._ms_runner = None
        self._ms_state = None
        self._ms_regs = None
        if self.M > 0:
            from exp_tpu.nbody.multistep import MultistepRunner, CompFeats

            forces = {n: c.force for n, c in self.components.items()}
            feats = {
                n: CompFeats(
                    adiabatic=c.adiabatic, ton=c.ton, twid=c.twid,
                    rtrunc=c.rtrunc, com_system=c.com_system,
                    needs_sources=bool(getattr(c.force, "needs_sources",
                                               False)))
                for n, c in self.components.items()}
            self._ms_runner = MultistepRunner(
                forces, self.couples, self.dt, self.M, self.mesh,
                accum_dtype=self.accum_dtype,
                externals=getattr(self, "externals", ()),
                dynparams={"dynfracV": g.dynfracV, "dynfracA": g.dynfracA,
                           "dynfracP": g.dynfracP, "dynfracD": g.dynfracD,
                           "dynfracS": g.dynfracS},
                shiftlevl=g.shiftlevl, feats=feats, wrappers=self.wrappers,
                fused=g.fused_bigstep, cap_headroom=g.cap_headroom,
                eqmotion=bool(getattr(g, "eqmotion", True)))

    # ------------------------------------------------------------------
    # jitted stepping
    # ------------------------------------------------------------------

    def _project_and_accel(self, state, xs, t, centers, extras, rots=None):
        """Shared per-component projection + acceleration (shard-local):
        coefficients with adiabatic/rtrunc/centers/playback/Hall applied,
        then the coupled-field acceleration at positions `xs` — used by both
        the step body and the initial prime so features are honored
        identically in both (reference: same determine_coefficients path for
        begin_run and do_step).

        `rots`: per-component body-frame rotations (EJ AXIS tracking,
        Orient): positions are rotated into the basis frame before
        projection/evaluation and forces rotated back
        (Cylinder.cc:800,1419)."""
        forces = {n: c.force for n, c in self.components.items()}
        if centers is None:
            centers = {n: jnp.zeros(3, xs[n].dtype) for n in state}
        if rots is None:
            rots = {n: jnp.eye(3, dtype=xs[n].dtype) for n in state}
        if extras is None:
            extras = {}
        # com_system components expand about their instantaneous COM
        # (the reference's Local frame, Component.H:155-163)
        for n in state:
            if self.components[n].com_system:
                mm = state[n].mass
                Mtot = jax.lax.psum(jnp.sum(mm), "p")
                centers[n] = jax.lax.psum(
                    jnp.sum(mm[:, None] * xs[n], axis=0), "p") / Mtot
        # two-center forces: inner center = the tracked (EJ/centerfile)
        # center, outer = the instantaneous COM (TwoCenter.cc:106-155);
        # rebuild the force pytree with the traced centers
        twocenter = set()
        for n in state:
            if getattr(forces[n], "needs_centers", False):
                twocenter.add(n)
                mm = state[n].mass
                Mtot = jax.lax.psum(jnp.sum(mm), "p")
                com = jax.lax.psum(
                    jnp.sum(mm[:, None] * xs[n], axis=0), "p") / Mtot
                forces[n] = forces[n].with_centers(
                    centers[n].astype(xs[n].dtype), com)
        coefs = {}
        for n in state:
            if n in extras.get("playback", {}):
                coefs[n] = extras["playback"][n]
            elif getattr(forces[n], "needs_sources", False):
                coefs[n] = jnp.zeros((1,), xs[n].dtype)
            else:
                c = self.components[n]
                adb = c.adb(t)
                # two-center forces subtract their own centers internally
                xc = (xs[n] if n in twocenter
                      else (xs[n] - centers[n][None, :]) @ rots[n].T)
                mw = state[n].mass * adb
                if c.rtrunc < 1.0e19:   # Component.H:136: no contribution
                    xr = xc - centers[n][None, :] if n in twocenter else xc
                    mw = mw * (jnp.sum(xr * xr, axis=-1)
                               < c.rtrunc ** 2).astype(mw.dtype)
                coefs[n] = forces[n].coefficients(
                    xc, mw, axis_name="p", accum_dtype=self.accum_dtype)
                if n in extras.get("hall", {}):
                    from exp_tpu.nbody.pca import apply_hall

                    coefs[n] = jax.tree_util.tree_map(
                        lambda t_: apply_hall(t_, extras["hall"][n]),
                        coefs[n])
            # harmonic restriction / FIX_L0 (SphericalBasis.cc:1568-1600,
            # 1689-1694): affine (mask, offset) over the coefficient array
            if n in extras.get("restrict", {}):
                mk, off = extras["restrict"][n]
                coefs[n] = coefs[n] * mk + off
        accs = {}
        pots = {}
        for n, ps in state.items():
            acc = jnp.zeros_like(ps.x)
            pot = jnp.zeros_like(ps.mass)
            for a in self.couples[n]:
                if getattr(forces[a], "needs_sources", False):
                    aa, pp = forces[a].acceleration(
                        (xs[a], state[a].mass), xs[n], axis_name="p")
                elif a in twocenter:
                    aa, pp = forces[a].acceleration(coefs[a], xs[n])
                else:
                    aa, pp = forces[a].acceleration(
                        coefs[a],
                        (xs[n] - centers[a][None, :]) @ rots[a].T)
                    aa = aa @ rots[a]       # back to the inertial frame
                acc = acc + aa
                pot = pot + pp
            # non-inertial expansion-frame correction: subtracted from
            # self-gravity (AddAcc, Component.H:913-921) BEFORE externals
            # are added (AddAccExt applies no correction)
            if n in extras.get("pseudo", {}):
                acc = acc - _pseudo_accel(extras["pseudo"][n], xs[n],
                                          state[n].v, centers[n])
            for ext in self.externals:
                aa, pp = ext.acceleration(xs[n], t)
                acc = acc + aa
                pot = pot + pp
            accs[n] = acc
            pots[n] = pot
        return coefs, accs, pots

    def _system_step_body(self, state, t_new, centers=None, extras=None,
                          rots=None):
        """One KDK step for all components (shard-local view); t_new is the
        (traced) time at the end of the step, used by external fields."""
        # eqmotion: false freezes x/v (reference incpos.cc:75/incvel.cc:93
        # return early) while the field evaluation below still runs
        dt = self.dt if self.eqmotion else 0.0
        # half kick + drift
        new_x = {}
        v_half = {}
        for n, ps in state.items():
            v_half[n] = ps.v + ps.acc * (dt * 0.5)
            xd = ps.x + v_half[n] * dt
            for wrp in self.wrappers:
                xd = wrp.wrap(xd)
            new_x[n] = xd
        coefs, accs, pots = self._project_and_accel(state, new_x, t_new,
                                                    centers, extras, rots)
        out = {}
        for n, ps in state.items():
            v_new = v_half[n] + accs[n] * (dt * 0.5)
            out[n] = replace(ps, x=new_x[n], v=v_new, acc=accs[n],
                             pot=pots[n])
        diag = {n: _diagnostics(out[n], axis_name="p") for n in out}
        return out, coefs, diag

    def _make_step_fn(self, k: int):
        from jax.sharding import PartitionSpec as P

        names = list(self.components)

        def block(state, t0, centers, rots, extras):
            def body(carry, _):
                st, tcur = carry
                tnew = tcur + self.dt
                st, coefs, diag = self._system_step_body(st, tnew, centers,
                                                         extras, rots)
                return (st, tnew), (coefs, diag)

            (st, _), (coefs_hist, diag_hist) = jax.lax.scan(
                body, (state, t0), None, length=k)
            return st, coefs_hist, diag_hist

        state_specs = {n: _ps_specs("p") for n in names}
        coef_specs = {n: P() for n in names}
        diag_specs = {n: _diag_specs() for n in names}
        center_specs = {n: P() for n in self.components}
        rot_specs = {n: P() for n in self.components}
        extras_specs = jax.tree_util.tree_map(
            lambda _: P(), self._make_extras(), is_leaf=lambda x: x is None)
        return jax.jit(shard_map(
            block, self.mesh,
            (state_specs, P(), center_specs, rot_specs, extras_specs),
            (state_specs, coef_specs, diag_specs)))

    def prime(self):
        """Initial coefficient/force evaluation (begin_run, begin.cc:86-127),
        honoring the same component features as the stepping path."""
        if self.M > 0:
            return      # multistep primes lazily in _run_multistep
        from jax.sharding import PartitionSpec as P

        names = list(self.components)
        extras = self._make_extras(t=self.time)
        self._refresh_centerfile()
        cts = {n: jnp.asarray(self._centers[n], self.compute_dtype)
               for n in self.components}
        rts = self._rot_arrays()

        def init(state, centers, rots, extras):
            coefs, accs, pots = self._project_and_accel(
                state, {n: ps.x for n, ps in state.items()}, self.time,
                centers, extras, rots)
            out = {n: replace(ps, acc=accs[n], pot=pots[n])
                   for n, ps in state.items()}
            diag = {n: _diagnostics(out[n], axis_name="p") for n in out}
            return out, coefs, diag

        state_specs = {n: _ps_specs("p") for n in names}
        center_specs = {n: P() for n in names}
        rot_specs = {n: P() for n in names}
        extras_specs = jax.tree_util.tree_map(lambda _: P(), extras)
        fn = jax.jit(shard_map(init, self.mesh,
                               (state_specs, center_specs, rot_specs,
                                extras_specs),
                               (state_specs, {n: P() for n in names},
                                {n: _diag_specs() for n in names})))
        self._state, self._coefs, self._diag = fn(self._state, cts, rts,
                                                  extras)
        self._capture_frozen()
        for o in self.outputs:
            o.run(self, self.istep, force=True)

    def _capture_frozen(self):
        """Record the initial coefficients of `self_consistent: false`
        components; every later block reads them back via the playback
        channel instead of re-projecting the live particles."""
        for n, c in self.components.items():
            if not c.self_consistent and n not in self._frozen:
                self._frozen[n] = np.asarray(self._coefs[n])
        # FIX_L0: save the monopole on the first evaluation
        # (SphericalBasis.cc:1689-1694)
        for n, r in self._restrict.items():
            if r["fix_l0"] and r["c0"] is None and n in (self._coefs or {}):
                r["c0"] = np.asarray(self._coefs[n])[:, 0, 0, :].copy()

    def _restrict_arrays(self):
        """Traced (mask, offset) per restricted component: coefficients
        are consumed as `c * mask + offset`."""
        out = {}
        for n, r in self._restrict.items():
            mk = r["mask"]
            # f64 staging: a float32 offset would round the captured
            # monopole before the accum-dtype cast
            off = np.zeros(mk.shape, np.float64)
            if r["fix_l0"] and r["c0"] is not None:
                mk = mk.copy()
                mk[:, 0, 0, :] = 0.0
                off[:, 0, 0, :] = r["c0"]
            # accum dtype: the mask/offset combine with the coefficient
            # accumulators (a compute-dtype offset would round the frozen
            # monopole relative to the captured prime value)
            adt = getattr(self, "accum_dtype", self.compute_dtype)
            out[n] = (jnp.asarray(mk, adt), jnp.asarray(off, adt))
        return out

    def run(self, nsteps=None):
        """Main loop (expand.cc:422-424)."""
        if self.M > 0:
            return self._run_multistep(nsteps)
        if self._coefs is None:
            self.prime()
        nsteps = self.nsteps if nsteps is None else nsteps
        k = max(1, self.steps_per_block)
        if not hasattr(self, "_step_fns"):
            self._step_fns = {}

        done = 0
        while done < nsteps:
            if self._check_stop():
                break
            kk = min(k, nsteps - done)
            # end blocks exactly on output-due steps: particle writers
            # (OutPS/OutChkpt/...) read self._state, which only matches
            # the labeled step at block end (coefs/diag are sliced per
            # step; particle history is not kept)
            dues = [o.nint - (self.istep % o.nint) for o in self.outputs
                    if o.nint > 0]
            if dues:
                kk = min(kk, min(dues))
            extras = self._make_extras()
            sig = (kk, tuple(sorted(extras["playback"])),
                   tuple(sorted(extras["hall"])),
                   tuple(sorted(extras["restrict"])),
                   tuple(sorted(extras["pseudo"])))
            fn = self._step_fns.get(sig)
            if fn is None:
                fn = self._step_fns[sig] = self._make_step_fn(kk)
            self._refresh_centerfile()
            cts = {n: jnp.asarray(self._centers[n], self.compute_dtype)
                   for n in self.components}
            rts = self._rot_arrays()
            t0 = time.time()
            self._state, coefs_hist, diag_hist = fn(self._state, self.time,
                                                    cts, rts, extras)
            jax.block_until_ready(jax.tree_util.tree_leaves(self._state)[0])
            t1 = time.time()
            self.timers["Compute"] += t1 - t0
            # advance counters; materialize per-step history slices ONLY for
            # steps where an output is due (each device slice is a separate
            # dispatch — per-step unpacking costs more than the physics)
            for j in range(kk):
                self.istep += 1
                self.time += self.dt
                done += 1
                self._nreport_line()
                due = [o for o in self.outputs
                       if o.nint > 0 and self.istep % o.nint == 0]
                if j == kk - 1:
                    # EJ center/axis tracking (Orient) + Hall refresh at
                    # block end, AFTER the counters advance and BEFORE the
                    # writes — the same order as the multistep path, so
                    # the orient log and the npca cadence see the
                    # post-block step/time
                    t2 = time.time()
                    self._update_orient()
                    self.timers["Orient"] += time.time() - t2
                    t2 = time.time()
                    self._update_hall()
                    self.timers["Hall"] += time.time() - t2
                if due or j == kk - 1:
                    # one jitted gather + one transfer: per-array slicing
                    # costs a tunnel round-trip each (~10-30 ms apiece)
                    sl = _slice_history({"c": coefs_hist, "d": diag_hist},
                                        j)
                    host = jax.device_get(sl)
                    self._coefs, self._diag = host["c"], host["d"]
                t3 = time.time()
                for o in due:
                    # collective gathers on every process; file writes on
                    # the primary only (reference myid==0 gating)
                    if self.dist:
                        o.gather(self)
                    if self.is_primary:
                        o.write(self, self.istep)
                self.timers["Output"] += time.time() - t3
            # host-side operators (scatterMFP, generateRelaxation): applied
            # once per block, outside the jitted step
            if self.operators:
                for op in self.operators:
                    for n in self._state:
                        self._state[n] = op.apply(self._state[n],
                                                  self.dt * kk,
                                                  self.istep,
                                                  time=self.time, name=n)
                # writers at this istep already cached the pre-operator
                # state; a stop/SIGHUP checkpoint after this point must
                # see the operator kicks
                self._host_cache_step.clear()
            if self.verbose > 3:
                self._print_timings()
            self._check_bad_values()
            self._maybe_recompute_bases()
        return self._state

    def _nreport_line(self):
        """Progress report every nreport steps (reference nreport,
        global.H:56: per-step counter print)."""
        if self.nreport > 0 and self.istep % self.nreport == 0 \
                and self.is_primary:
            wall = time.time() - self._wall0
            print(f"[exp_tpu] step {self.istep}  time {self.time:.6g}  "
                  f"wall {wall:.1f}s", flush=True)

    def _maybe_recompute_bases(self, multistep=False):
        """Adaptive basis recomputation (Sphere::make_model* — Sphere.H:156,
        Sphere.cc:203-354): for sphereSL components with `dtime > 0`, rebuild
        the SL basis from the binned particle distribution every dtime.
        Triggers one re-jit of the step function per rebuild."""
        from dataclasses import replace as _rp

        rebuilt = False
        for n, c in self.components.items():
            if c.basis_dtime <= 0 or self.time < c.basis_tnext:
                continue
            from exp_tpu.basis.model import model_from_particles

            if multistep:
                self._sync_flat_state()
            # multi-process: every process needs the identical model (the
            # rebuilt tables feed the jitted step) — gather collectively
            ps = self.host_ps(n) if self.dist else self._state[n]
            model = model_from_particles(np.asarray(ps.x),
                                         np.asarray(ps.mass))
            fc = c.config.force
            stanza = _rp(fc, parameters={
                **{k: v for k, v in fc.parameters.items()
                   if k != "cachename"},
                "_model_object": model})
            c.force = build_force(stanza, self.compute_dtype, self.workdir)
            c.basis_tnext += c.basis_dtime
            rebuilt = True
            if self.verbose > 0:
                print(f"[exp_tpu] recomputed {n!r} basis at t={self.time:g}")
        if rebuilt:
            # step functions close over the old force tables — drop them
            self._step_fns = {}
            if self._ms_runner is not None:
                # the multistep runner's compiled substep/init/relevel
                # closures captured the old force pytrees too
                r = self._ms_runner
                for n, c in self.components.items():
                    r.forces[n] = c.force
                r._fns.clear()
                r._init_fns.clear()
                r._relevel_fns = {}

    def _check_bad_values(self):
        """NaN guard (reference bad_values(), ComponentContainer.cc:1596;
        fpe_trap expand.cc:315-317): on non-finite diagnostics or
        coefficients, dump a diagnostic checkpoint and raise.  This is the
        step-fence: it runs on the synchronized state after every jitted
        block, so a blow-up is caught within `steps_per_block` steps of
        the faulting step (use `fpe: trace` to locate the faulting op)."""
        if not getattr(self.config.glob, "fpe", False) or self._diag is None:
            return

        def _dump_and_raise(n, what):
            from exp_tpu.nbody.output import OutChkpt
            name = f"SPSCHK.{self.runtag}.badvalues"
            path = os.path.join(self.outdir, name)
            # every process gathers (collective); the primary writes; the
            # raise happens on all processes (the reference MPI_Aborts)
            OutChkpt(self, nint=0, filename=name).run(self, self.istep,
                                                      force=True)
            raise FloatingPointError(
                f"non-finite {what} in component {n!r} at step "
                f"{self.istep}; state dumped to {path}")

        for n, d in self._diag.items():
            ke = float(np.asarray(d["KE"]))
            pe = float(np.asarray(d["PE"]))
            if not (np.isfinite(ke) and np.isfinite(pe)):
                _dump_and_raise(n, f"diagnostics (KE={ke}, PE={pe})")
        if self._coefs is not None:
            for n, c in self._coefs.items():
                arr = np.asarray(jax.tree_util.tree_leaves(c)[0]) \
                    if not isinstance(c, np.ndarray) else c
                if not np.isfinite(arr).all():
                    _dump_and_raise(n, "coefficients")

    def _refresh_centerfile(self):
        """Evaluate prescribed (CenterFile) centers at the current time and
        feed the frame-acceleration estimator when enabled (the EJ path
        feeds it from orient.update instead, Orient.cc:697)."""
        for n, c in self.components.items():
            if c.center_traj is None:
                continue
            self._centers[n] = c.center_traj(self.time)
            if c.pseudo is not None and c.orient is None:
                c.pseudo.add(self.time, self._centers[n])

    def _pseudo_arrays(self):
        """Traced (accel, omega, domdt) per pseudo-enabled component."""
        out = {}
        for n, c in self.components.items():
            if c.pseudo is None:
                continue
            a, w, dw = c.pseudo()
            out[n] = (jnp.asarray(a, self.compute_dtype),
                      jnp.asarray(w, self.compute_dtype),
                      jnp.asarray(dw, self.compute_dtype))
        return out

    def _ms_centers(self):
        """Prescribed expansion centers for the multistep path (EJ orient /
        centerfile); com_system centers are computed in-graph."""
        self._refresh_centerfile()
        return {n: jnp.asarray(self._centers[n], self.compute_dtype)
                for n in self.components}

    def _ms_extras_fn(self, t):
        """Substep extras: playback coefficients interpolated at the
        substep's drift time t + current Hall factors."""
        pb = {}
        hall = {}
        for n, c in self.components.items():
            if c.playback is not None:
                pb[n] = jnp.asarray(c.playback.interpolate(t),
                                    self.compute_dtype)
            elif n in self._frozen:
                pb[n] = jnp.asarray(self._frozen[n], self.compute_dtype)
            if n in self._hall:
                hall[n] = jnp.asarray(self._hall[n], self.compute_dtype)
        return {"playback": pb, "hall": hall,
                "restrict": self._restrict_arrays(),
                "pseudo": self._pseudo_arrays()}

    def _ms_sanity_check(self):
        """Diverging-run force stop (multistep.cc:296-341): if a component
        has more than maxMindt of its particles requesting a timestep below
        the finest level, checkpoint and stop."""
        max_mindt = float(getattr(self.config.glob, "maxMindt", 0.05))
        bad = []
        for n, (offlo, offhi, nlive) in self._ms_runner.overrun.items():
            if nlive > 0 and offlo / nlive > max_mindt:
                bad.append((n, offlo, nlive))
        if not bad:
            return
        for n, offlo, nlive in bad:
            print(f"[exp_tpu] multistep overrun: component {n!r} has "
                  f"{offlo}/{nlive} ({100.0 * offlo / nlive:.1f}%) particles "
                  f"below the minimum timestep (> maxMindt="
                  f"{100 * max_mindt:.0f}%)")
        print("[exp_tpu] stopping this run: decrease dtime, increase "
              "multistep, or both, and restart.  Writing a checkpoint.")
        self.stop_requested = True

    def _run_multistep(self, nsteps=None):
        """Multistep main loop: one jitted big step per dtime, boundary
        re-leveling (see nbody/multistep.py)."""
        from exp_tpu.nbody.multistep import flatten_buckets, LevelBuckets

        nsteps = self.nsteps if nsteps is None else nsteps
        r = self._ms_runner
        has_ej = any(c.EJ and c.orient is not None
                     for c in self.components.values())
        if self._ms_state is None:
            st, regs, coef, diag = r.init_state(
                self._state, t0=self.time, centers=self._ms_centers(),
                extras_fn=self._ms_extras_fn, rots=self._rot_arrays())
            self._ms_state, self._ms_regs = st, regs
            self._coefs, self._diag = coef, diag
            self._capture_frozen()
            self._sync_flat_state()
            for o in self.outputs:
                o.run(self, self.istep, force=True)
        for _ in range(nsteps):
            if self._check_stop():
                break
            centers = self._ms_centers()
            rots = self._rot_arrays()
            t0 = time.time()
            st, regs, coef, diag = r.bigstep(self._ms_state, self._ms_regs,
                                             self.time, centers=centers,
                                             extras_fn=self._ms_extras_fn,
                                             rots=rots)
            t1 = time.time()
            self.timers["Compute"] += t1 - t0
            if (self.istep + 1) % max(1, self.config.glob.nrelevel) == 0:
                st, regs = r.relevel(st, regs, t0=self.time + self.dt,
                                     centers=centers,
                                     extras_fn=self._ms_extras_fn,
                                     rots=rots)
            t2 = time.time()
            self.timers["Relevel"] += t2 - t1
            self._ms_state, self._ms_regs = st, regs
            self.istep += 1
            self.time += self.dt
            self._nreport_line()
            if has_ej:
                self._update_orient(multistep=True)
            self._update_hall(multistep=True)
            self.timers["Orient"] += time.time() - t2
            t2b = time.time()
            if any((self.nint_due(o) for o in self.outputs)):
                # single batched transfer (see _slice_history note)
                self._coefs, self._diag = jax.device_get((coef, diag))
                self._sync_flat_state()
            else:
                self._coefs, self._diag = coef, diag
            for o in self.outputs:
                o.run(self, self.istep)
            self.timers["Output"] += time.time() - t2b
            self._ms_sanity_check()
            self._check_bad_values()
            self._maybe_recompute_bases(multistep=True)
            if self.verbose > 3:
                self._print_timings()
        self._sync_flat_state()
        return self._state

    def _print_timings(self):
        """Per-phase wall-clock percentages (step.cc:347-374 analogue)."""
        tot = sum(self.timers.values()) or 1.0
        parts = " ".join(f"{k}={v:.3f}s({100 * v / tot:.0f}%)"
                         for k, v in self.timers.items() if v > 0)
        print(f"[exp_tpu] step {self.istep} timing: {parts}")

    def _make_extras(self, t=None):
        """Traced per-block extras: playback coefficients (interpolated at
        the end-of-step time by default) and Hall smoothing factors."""
        import jax.numpy as jnp

        pb = {}
        hall = {}
        for n, c in self.components.items():
            if c.playback is not None:
                # coefficients apply to the DRIFTED positions: interpolate at
                # the end-of-step time (blocks are capped to one step when
                # playback is configured, so this is exact per step)
                pb[n] = jnp.asarray(c.playback.interpolate(
                    self.time + self.dt if t is None else t),
                    self.compute_dtype)
            elif n in self._frozen:
                pb[n] = jnp.asarray(self._frozen[n], self.compute_dtype)
            if n in self._hall:
                hall[n] = jnp.asarray(self._hall[n], self.compute_dtype)
        return {"playback": pb, "hall": hall,
                "restrict": self._restrict_arrays(),
                "pseudo": self._pseudo_arrays()}

    def _rot_arrays(self):
        """Per-component body-frame rotations as traced arrays."""
        return {n: jnp.asarray(self._rots[n], self.compute_dtype)
                for n in self.components}

    def _update_orient(self, multistep=False):
        """EJ Orient update: center (flag CENTER=2) and axis frame
        (flag AXIS=1) per block/bigstep (src/Orient.cc; Component.H:775)."""
        for n, c in self.components.items():
            if not (c.EJ and c.orient is not None):
                continue
            if multistep:
                self._sync_flat_state()
            c.orient.update(self._state[n], time=self.time)
            if c.ej_flags & 2:
                self._centers[n] = c.orient.center
            if c.ej_flags & 1:
                self._rots[n] = c.orient.body

    def _update_hall(self, multistep=False):
        """Recompute coefficient smoothing weights every npca steps
        (pca_hall analogue; tk_type selects Hall/VarianceCut/CumulativeCut/
        VarianceWeighted per AxisymmetricBasis.cc:482-503)."""
        from exp_tpu.nbody.pca import (subsample_coefficients,
                                       smoothing_weights,
                                       eof_smoothing_matrix)

        for n, c in self.components.items():
            if c.npca > 0 and self.istep % c.npca == 0:
                if multistep:
                    self._sync_flat_state()
                # multi-process: host-materialize via the collective
                # gather (np.asarray of non-addressable shards fails);
                # each process then computes the identical Hall weights
                ps = self.host_ps(n) if self.dist else self._state[n]
                # project in the SAME frame/weighting as the stepping path
                # (_project_and_accel): center + body rotation, adiabatic
                # ramp, rtrunc cutoff — otherwise the subsample variance
                # describes a different coefficient set than the one the
                # Hall weights are applied to
                x = np.asarray(ps.x)
                m = np.asarray(ps.mass)
                center = np.asarray(self._centers[n], x.dtype)
                if c.com_system:
                    live = m > 0
                    center = ((m[live, None] * x[live]).sum(0)
                              / max(m[live].sum(), 1e-300)).astype(x.dtype)
                xc = (x - center) @ np.asarray(self._rots[n], x.dtype).T
                mw = m * float(c.adb(self.time))
                if c.rtrunc < 1.0e19:
                    mw = mw * ((xc * xc).sum(-1) < c.rtrunc ** 2)
                cs = subsample_coefficients(c.force, jnp.asarray(xc),
                                            jnp.asarray(mw),
                                            nsamples=c.nsamples,
                                            accum_dtype=self.accum_dtype)
                if c.pcaeof:
                    self._hall[n] = np.asarray(
                        eof_smoothing_matrix(np.asarray(cs),
                                             tk_type=c.tk_type,
                                             tksmooth=c.tksmooth,
                                             tkcum=c.tkcum),
                        np.asarray(cs).dtype)
                    continue
                T = cs.shape[0]
                mean = jnp.mean(cs, axis=0)
                var = jnp.var(cs, axis=0, ddof=1) / T
                w = smoothing_weights(mean, var, tk_type=c.tk_type,
                                      tksmooth=c.tksmooth, tkcum=c.tkcum)
                self._hall[n] = np.asarray(w)

    def _check_stop(self):
        """Wall-clock budget / SIGTERM stop; SIGHUP checkpoint dump."""
        if self.dump_requested:
            self.dump_requested = False
            self._write_checkpoint()
        if self.stop_requested:
            self._write_checkpoint()
            return True
        if self.wall_limit is not None and \
                time.time() - self._wall0 > self.wall_limit:
            print(f"[exp_tpu] wall-clock limit reached at step {self.istep}; "
                  "checkpointing and stopping")
            self._write_checkpoint()
            if self.restart_cmd and self.is_primary:
                import subprocess

                print(f"[exp_tpu] launching restart_cmd: {self.restart_cmd}")
                subprocess.Popen(self.restart_cmd, shell=True)
            self.stop_requested = True
            return True
        return False

    def _write_checkpoint(self):
        from exp_tpu.nbody.output import OutChkpt

        self._sync_flat_state()
        for o in self.outputs:
            if isinstance(o, OutChkpt):
                o.run(self, self.istep, force=True)
                return
        o = OutChkpt(self, nint=0)
        o.run(self, self.istep, force=True)

    def install_signal_handlers(self):
        """SIGTERM -> stop after the current block; SIGHUP -> checkpoint
        (the reference's signals.cc behavior)."""
        import signal

        def _term(sig, frame):
            print("[exp_tpu] SIGTERM: stopping after current block")
            self.stop_requested = True

        def _hup(sig, frame):
            print("[exp_tpu] SIGHUP: checkpoint requested")
            self.dump_requested = True

        signal.signal(signal.SIGTERM, _term)
        if hasattr(signal, "SIGHUP"):
            signal.signal(signal.SIGHUP, _hup)

    def nint_due(self, o):
        return o.nint > 0 and self.istep % o.nint == 0

    def _sync_flat_state(self):
        from exp_tpu.nbody.multistep import flatten_buckets, LevelBuckets

        if self._ms_state is not None:
            # lazy device concats: writers pull only the fields they touch
            self._state = {
                n: flatten_buckets(LevelBuckets(list(bs), None))
                for n, bs in self._ms_state.items()}

    def host_ps(self, name):
        """Host-materialized particle state for output writers: ONE
        batched device_get per component per step, cached — writers due
        at the same step (OutChkpt + OutPS + OutLog + ...) share the
        copy instead of each paying a per-field device round-trip
        (~10-30 ms apiece through a remote runtime)."""
        if self._host_cache_step.get(name) != self.istep:
            if self.dist:
                # COLLECTIVE: every process must reach this gather (the
                # run loop pre-gathers on all processes before gating the
                # writes to process 0)
                from exp_tpu.parallel.distributed import allgather_ps

                self._host_cache[name] = allgather_ps(self._state[name])
            else:
                self._host_cache[name] = jax.device_get(self._state[name])
            self._host_cache_step[name] = self.istep
        return self._host_cache[name]

    # ------------------------------------------------------------------
    # outputs
    # ------------------------------------------------------------------

    def _make_output(self, oc):
        from exp_tpu.nbody.output import (OutLog, OutCoef, OutChkpt,
                                          OutAscii, OutPSN, OutMulti)

        from exp_tpu.nbody.output import (OutVel, OutSamp, OrbTrace,
                                          OutDiag, OutFrac, OutCalbr,
                                          OutPS, OutHDF5, OutSPL)

        if oc.id == "outchkptq":        # quick = single-precision variant
            return OutChkpt(self, real4=True, **oc.parameters)
        if oc.id in ("outpsq", "outpsr"):
            # reference split-piece writers with an nbeg dump counter
            # (src/OutPSQ.H:6-24, OutPSR.H); the piece count replaces
            # the MPI rank count, threads is an MPI-write knob → n/a
            p = dict(oc.parameters)
            p.pop("threads", None)
            p.setdefault("nbeg", 0)
            return OutSPL(self, **p)
        cls = {"outlog": OutLog, "outcoef": OutCoef, "outchkpt": OutChkpt,
               "outascii": OutAscii, "outpsn": OutPSN,
               "outmulti": OutMulti, "outvel": OutVel,
               "outsamp": OutSamp, "orbtrace": OrbTrace,
               "outdiag": OutDiag, "outfrac": OutFrac,
               "outcalbr": OutCalbr, "outps": OutPS,
               "outhdf5": OutHDF5, "outpsp": OutSPL,
               "outspl": OutSPL}.get(oc.id)
        if cls is None:
            raise ConfigError(f"output id {oc.id!r} not implemented yet")
        return cls(self, **oc.parameters)

    def total_diag(self):
        """Sum per-component diagnostics to global values."""
        tot = {}
        for n, d in self._diag.items():
            for key, val in d.items():
                v = np.asarray(val)
                tot[key] = tot.get(key, 0.0) + v
        return tot

    @classmethod
    def from_file(cls, path, **kw):
        cfg = RunConfig.from_file(path)
        return cls(cfg, workdir=os.path.dirname(os.path.abspath(path)), **kw)
