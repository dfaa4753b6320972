"""mdp parameter file parsing into MdParams — the readir analogue
(reference: src/gromacs/gmxpreprocess/readir.cpp:2152 get_ir; FEP keys
:2544-2588).  Unknown keys warn rather than abort (warninp-style budget).
"""
from __future__ import annotations

import warnings
from typing import Dict, Optional, Tuple

import numpy as np

from ..core.types import (CoulombType, ExpandedParams, FepParams,
                          IntegratorType, MdParams, PcouplType, SoftcoreType,
                          TcouplType, VdwModifier, FepCoupling)

_COUL = {"cut-off": CoulombType.CUTOFF, "cutoff": CoulombType.CUTOFF,
         "reaction-field": CoulombType.REACTION_FIELD, "pme": CoulombType.PME}
_VMOD = {"none": VdwModifier.NONE,
         "potential-shift": VdwModifier.POTENTIAL_SHIFT,
         "potential-shift-verlet": VdwModifier.POTENTIAL_SHIFT,
         "potential-switch": VdwModifier.POTENTIAL_SWITCH,
         "force-switch": VdwModifier.FORCE_SWITCH}
_INTEG = {"md": IntegratorType.MD, "md-vv": IntegratorType.MD_VV,
          "sd": IntegratorType.SD, "bd": IntegratorType.BD,
          "steep": IntegratorType.STEEP, "cg": IntegratorType.CG,
          "l-bfgs": IntegratorType.LBFGS, "nm": IntegratorType.NM,
          "tpi": IntegratorType.TPI}
_TC = {"no": TcouplType.NO, "berendsen": TcouplType.BERENDSEN,
       "v-rescale": TcouplType.V_RESCALE,
       "nose-hoover": TcouplType.NOSE_HOOVER,
       "andersen-massive": TcouplType.ANDERSEN_MASSIVE}
_PC = {"no": PcouplType.NO, "mttk": PcouplType.MTTK,
       "berendsen": PcouplType.BERENDSEN,
       "c-rescale": PcouplType.C_RESCALE,
       "parrinello-rahman": PcouplType.PARRINELLO_RAHMAN}
_SC = {"beutler": SoftcoreType.BEUTLER, "gapsys": SoftcoreType.GAPSYS}


def parse_mdp(text: str) -> Dict[str, str]:
    kv = {}
    for line in text.splitlines():
        line = line.split(";")[0].strip()
        if not line or "=" not in line:
            continue
        k, v = line.split("=", 1)
        kv[k.strip().lower().replace("_", "-")] = v.strip()
    return kv


def _lambda_vector(kv: Dict[str, str]):
    """Assemble (7, n_lambda) all_lambda from the per-component mdp keys
    (reference: t_lambda::all_lambda; fep-lambdas is the fallback for all
    components)."""
    comp_keys = {
        FepCoupling.FEP: "fep-lambdas",
        FepCoupling.MASS: "mass-lambdas",
        FepCoupling.COUL: "coul-lambdas",
        FepCoupling.VDW: "vdw-lambdas",
        FepCoupling.BONDED: "bonded-lambdas",
        FepCoupling.RESTRAINT: "restraint-lambdas",
        FepCoupling.TEMPERATURE: "temperature-lambdas",
    }
    fep = [float(v) for v in kv.get("fep-lambdas", "").split()]
    n = len(fep)
    cols = {}
    for c, key in comp_keys.items():
        vals = [float(v) for v in kv.get(key, "").split()]
        if vals:
            n = max(n, len(vals))
        cols[c] = vals
    if n == 0:
        return None
    out = np.zeros((int(FepCoupling.COUNT), n), np.float32)
    base = fep if fep else [0.0] * n
    for c in comp_keys:
        vals = cols[c] or base
        if len(vals) != n:
            raise ValueError(f"lambda vector length mismatch for {c}")
        out[int(c)] = vals
    return out


def mdp_extras(text: str) -> Dict[str, object]:
    """Grompp-level keys that shape the topology/system rather than the
    run parameters (reference: readir.cpp couple-moltype :2544-2588,
    constraints conversion topshake.cpp, separate_dvdl :1811-1846)."""
    kv = parse_mdp(text)
    comp_keys = ["fep-lambdas", "mass-lambdas", "coul-lambdas", "vdw-lambdas",
                 "bonded-lambdas", "restraint-lambdas", "temperature-lambdas"]
    present = [bool(kv.get(k, "").split()) for k in comp_keys]
    # separate_dvdl: true for every component with its own lambda array,
    # Temperature never; with scalar init-lambda only, the generic Fep
    # component is separate (readir.cpp:1811-1846)
    separate = list(present)
    separate[int(FepCoupling.TEMPERATURE)] = False
    init_lambda = float(kv.get("init-lambda", "-1") or -1)
    if not any(present) and init_lambda >= 0:
        separate[int(FepCoupling.FEP)] = True
    defines = {}
    for tok in kv.get("define", "").split():
        if tok.startswith("-D"):
            body = tok[2:]
            name, _, val = body.partition("=")
            defines[name] = val or "1"
    # mdp `include = -I/dir1 -I/dir2`: extra topology include search
    # dirs (reference: readir.cpp inputrec include field + gmxcpp -I)
    include_dirs = [tok[2:] if tok.startswith("-I") else tok
                    for tok in kv.get("include", "").split()]
    return {
        "include_dirs": include_dirs,
        "separate_dvdl": separate,
        "couple_moltype": kv.get("couple-moltype", "").strip() or None,
        "couple_lam0": kv.get("couple-lambda0", "vdw-q").lower(),
        "couple_lam1": kv.get("couple-lambda1", "vdw-q").lower(),
        "couple_intramol": kv.get("couple-intramol", "no").lower() == "yes",
        "constraints": kv.get("constraints", "none").lower(),
        "defines": defines,
        "verlet_buffer_tolerance": float(kv.get("verlet-buffer-tolerance",
                                                "0.005")),
        "nstcalcenergy": int(kv.get("nstcalcenergy", "100")),
        "gen_vel": kv.get("gen-vel", "no").lower() == "yes",
        "gen_temp": float(kv.get("gen-temp", "300")),
        "gen_seed": int(kv.get("gen-seed", "-1")),
        "simulated_tempering": kv.get("simulated-tempering",
                                      "no").lower() == "yes",
        "nstexpanded": int(kv.get("nstexpanded", "-1")),
        "lmc_stats": kv.get("lmc-stats", "no").lower(),
        "lmc_move": kv.get("lmc-move", "no").lower(),
        "lmc_seed": int(kv.get("lmc-seed", "-1")),
        "sim_temp_low": float(kv.get("sim-temp-low", "300")),
        "sim_temp_high": float(kv.get("sim-temp-high", "300")),
        "simulated_tempering_scaling": kv.get("simulated-tempering-scaling",
                                              "geometric").lower(),
        "wl_scale": float(kv.get("wl-scale", "0.8")),
        "wl_ratio": float(kv.get("wl-ratio", "0.8")),
        "init_wl_delta": float(kv.get("init-wl-delta", "1.0")),
    }


def mdp_to_params(text: str, ndx=None
                  ) -> Tuple[MdParams, Optional[np.ndarray]]:
    """Returns (MdParams, all_lambda or None).

    ndx: optional name -> 0-based index-array dict (io/ndxio.py) used
    to resolve pull-groupN-name / density-guided-simulation-group
    names, the reference's index-file path (readir.cpp do_index)."""
    kv = parse_mdp(text)

    def _lookup(key):
        # mdp keys treat '-', '_' and nothing interchangeably
        # (e.g. coulombtype / coulomb-type / coulomb_type)
        if key in kv:
            return kv[key]
        flat = key.replace("-", "")
        for k, v in kv.items():
            if k.replace("-", "") == flat:
                return v
        return None

    def get(key, default, cast=float):
        v = _lookup(key)
        return cast(v) if v is not None else default

    def gete(key, table, default):
        v = _lookup(key)
        if v is None:
            return default
        v = v.lower()
        if v not in table:
            warnings.warn(f"mdp: unsupported {key} = {v}, keeping default")
            return default
        return table[v]

    all_lambda = _lambda_vector(kv)
    sc_alpha = get("sc-alpha", 0.0)
    sc_coul = kv.get("sc-coul", "no").lower() == "yes"
    # bOneLambda: a single global lambda controls everything (scalar
    # init-lambda, or only fep-lambdas given) -> soft-core must also act on
    # Coulomb or the simultaneously vanishing LJ would leave bare charges
    # (reference: readir.cpp:1890-1893 forces bScCoul = TRUE)
    comp_specific = ["mass-lambdas", "coul-lambdas", "vdw-lambdas",
                     "bonded-lambdas", "restraint-lambdas",
                     "temperature-lambdas"]
    one_lambda = not any(kv.get(k, "").split() for k in comp_specific)
    if one_lambda and sc_alpha > 0:
        sc_coul = True
    fep_on = kv.get("free-energy", "no").lower() in ("yes", "expanded")
    # simulated tempering also drives the lambda machinery
    # (reference: readir.cpp bSimTemp handling)
    if kv.get("simulated-tempering", "no").lower() == "yes":
        fep_on = True
    fep = FepParams(
        enabled=fep_on,
        init_lambda_state=get("init-lambda-state", -1, int),
        init_lambda=get("init-lambda", -1.0),
        delta_lambda=get("delta-lambda", 0.0),
        sc_alpha=sc_alpha,
        sc_power=get("sc-power", 1, int),
        sc_sigma=get("sc-sigma", 0.3),
        sc_sigma_min=get("sc-sigma", 0.3),   # grompp sets sc_sigma_min = sc_sigma
        sc_coul=sc_coul,
        softcore=gete("sc-function", _SC, SoftcoreType.BEUTLER),
        nstdhdl=get("nstdhdl", 100, int),
        calc_lambda_neighbors=get("calc-lambda-neighbors", -1, int),
    )
    vdw_modifier = gete("vdw-modifier", _VMOD, VdwModifier.POTENTIAL_SHIFT)
    # Verlet scheme reinterprets legacy vdw-type = shift/switch as the
    # corresponding modifier on a plain cutoff (reference: readir.cpp)
    vdwtype = (_lookup("vdwtype") or "cut-off").lower()
    vdw_type = "cut-off"
    if vdwtype == "shift":
        vdw_modifier = VdwModifier.FORCE_SWITCH
    elif vdwtype == "switch":
        vdw_modifier = VdwModifier.POTENTIAL_SWITCH
    elif vdwtype == "pme":
        vdw_type = "pme"
        comb = kv.get("lj-pme-comb-rule", "geometric").lower()
        if comb != "geometric":
            raise ValueError(f"lj-pme-comb-rule = {comb} unsupported "
                             "(geometric only)")

    expanded = None
    sim_temp = kv.get("simulated-tempering", "no").lower() == "yes"
    if kv.get("free-energy", "no").lower() == "expanded" or sim_temp:
        ref_t_val = float(kv.get("ref-t", "300").split()[0])
        expanded = ExpandedParams(
            nstexpanded=get("nstexpanded", 100, int),
            lmc_stats=kv.get("lmc-stats", "no").lower(),
            lmc_move=kv.get("lmc-move", "no").lower(),
            lmc_seed=get("lmc-seed", -1, int),
            wl_scale=get("wl-scale", 0.8),
            wl_ratio=get("wl-ratio", 0.8),
            init_wl_delta=get("init-wl-delta", 1.0),
            weight_equil_wl_delta=(
                get("weight-equil-wl-delta", 0.001)
                if kv.get("lmc-weights-equil", "no").lower() == "wl-delta"
                else -1.0),
            mc_temp=get("mc-temp", ref_t_val),
            sim_temp=sim_temp,
            sim_temp_low=get("sim-temp-low", 300.0),
            sim_temp_high=get("sim-temp-high", 300.0),
            sim_temp_scale=kv.get("simulated-tempering-scaling",
                                  "geometric").lower(),
        )

    # AWH biasing on the FEP lambda coordinate (reference: readir.cpp
    # awh keys; applied_forces/awh).  coord-provider = fep-lambda
    # (discrete) or pull (continuous umbrella grid on one 1-D dim).
    awh = None
    if kv.get("awh", "no").lower() == "yes":
        from ..core.types import AwhParams
        nbias = int(kv.get("awh-nbias", "1"))
        provider = kv.get("awh1-dim1-coord-provider", "").lower() \
            .replace("_", "-")
        if nbias != 1 or provider not in ("fep-lambda", "pull"):
            raise ValueError(
                "awh: only awh-nbias = 1 with awh1-dim1-coord-provider = "
                "fep-lambda | pull is supported")
        growth = kv.get("awh1-growth", "exp-linear").lower()
        if growth not in ("exp-linear", "linear"):
            raise ValueError(f"awh1-growth = {growth} unsupported")
        target = kv.get("awh1-target", "constant").lower()
        if target != "constant":
            raise ValueError(f"awh1-target = {target} unsupported")
        pull_keys = {}
        if provider == "pull":
            # reference grid spacing derives from the diffusion estimate
            # (awh1-dim1-diffusion, grid.cpp); here the point count is
            # explicit via awh1-dim1-grid-points
            pull_keys = dict(
                coord_provider="pull",
                pull_coord=get("awh1-dim1-coord-index", 1, int),
                coord_min=get("awh1-dim1-start", 0.0),
                coord_max=get("awh1-dim1-end", 1.0),
                n_points=get("awh1-dim1-grid-points", 32, int),
                force_constant=get("awh1-dim1-force-constant", 4000.0),
            )
            if pull_keys["coord_max"] <= pull_keys["coord_min"]:
                raise ValueError("awh1-dim1-end must exceed -start")
        awh = AwhParams(
            nstsample=get("awh-nstsample", 10, int),
            n_samples_update=get("awh-nsamples-update", 10, int),
            error_init=get("awh1-error-init", 10.0),
            growth_factor=get("awh1-growth-factor", 3.0),
            growth=growth,
            target=target,
            seed=get("awh-seed", 93, int),
            share=kv.get("awh-share-multisim", "no").lower() == "yes",
            **pull_keys,
        )

    params = MdParams(
        dt=get("dt", 0.001),
        nsteps=get("nsteps", 0, int),
        integrator=gete("integrator", _INTEG, IntegratorType.MD),
        rcoulomb=get("rcoulomb", 1.0),
        rvdw=get("rvdw", 1.0),
        rlist=get("rlist", 1.05),
        nstlist=get("nstlist", 10, int),
        coulomb=gete("coulombtype", _COUL, CoulombType.REACTION_FIELD),
        vdw_modifier=vdw_modifier,
        vdw_type=vdw_type,
        ewald_rtol_lj=get("ewald-rtol-lj", 1e-3),
        epsilon_r=get("epsilon-r", 1.0),
        epsilon_rf=get("epsilon-rf", 0.0),
        rvdw_switch=get("rvdw-switch", 0.9),
        ewald_rtol=get("ewald-rtol", 1e-5),
        fourier_spacing=get("fourier-spacing", 0.12),
        pme_order=get("pme-order", 4, int),
        ewald_geometry=kv.get("ewald-geometry", "3d").lower(),
        epsilon_surface=get("epsilon-surface", 0.0),
        dispcorr=kv.get("dispcorr", "no").lower() != "no",
        tcoupl=gete("tcoupl", _TC, TcouplType.NO),
        ref_t=float(kv.get("ref-t", "300").split()[0]),
        tau_t=float(kv.get("tau-t", "1.0").split()[0]),
        nsttcouple=get("nsttcouple", 10, int),
        nhchainlength=get("nhchainlength", 10, int),
        pcoupl=gete("pcoupl", _PC, PcouplType.NO),
        pcoupltype=kv.get("pcoupltype", "isotropic").lower(),
        ref_p=float(kv.get("ref-p", "1.0").split()[0]),
        ref_p_z=(float(kv.get("ref-p", "1.0").split()[-1])
                 if len(kv.get("ref-p", "1.0").split()) > 1 else None),
        tau_p=get("tau-p", 5.0),
        compressibility=float(kv.get("compressibility", "4.5e-5").split()[0]),
        compressibility_z=(
            float(kv.get("compressibility", "4.5e-5").split()[-1])
            if len(kv.get("compressibility", "4.5e-5").split()) > 1
            else None),
        nstpcouple=get("nstpcouple", 10, int),
        ld_seed=get("ld-seed", 1993, int),
        lincs_order=get("lincs-order", 4, int),
        lincs_iter=get("lincs-iter", 2, int),
        niter=get("niter", 20, int),
        emtol=get("emtol", 10.0),
        emstep=get("emstep", 0.01),
        nbfgscorr=get("nbfgscorr", 10, int),
        tpi_ninsert=get("tpi-ninsert", 1000, int),
        nstcomm=get("nstcomm", 100, int),
        nstxout=get("nstxout", 0, int),
        nstxout_compressed=get("nstxout-compressed", 0, int),
        compressed_x_precision=get("compressed-x-precision", 1000.0),
        nstcalcenergy=get("nstcalcenergy", 1, int),
        nstlog=get("nstlog", 1000, int),
        # multiple time stepping (reference: readir.cpp mts block)
        mts=get("mts", "no", str).lower() in ("yes", "true"),
        mts_factor=get("mts-level2-factor", 2, int),
        mts_forces=get("mts-level2-forces", "longrange-nonbonded", str),
        fep=fep,
        expanded=expanded,
        awh=awh,
        pull=_parse_pull(kv, ndx),
        nstpullout=get("pull-nstxout", 50, int),
        # distance restraints (reference: readir.cpp disre keys); only
        # the instantaneous "simple" treatment exists (no time-averaged
        # disre-tau > 0, no ensemble averaging across simulations)
        disre_fc=get("disre-fc", 1000.0),
        orires_fc=(get("orire-fc", 0.0)
                   if kv.get("orire", "no").lower() == "yes" else 0.0),
    )
    if kv.get("orire", "no").lower() == "yes" and get("orire-tau", 0.0) > 0:
        raise ValueError("orire-tau > 0 (time-averaged orientation "
                         "restraints) unsupported")
    from ..md.efield import parse_efield
    ef = parse_efield(kv)
    if ef is not None:
        params = params.replace(efield=ef)
    from ..md.densfit import parse_densfit
    df = parse_densfit(kv, ndx)
    if df is not None:
        params = params.replace(densfit=df)
    ann = kv.get("annealing", "no").split()[0].lower() \
        if kv.get("annealing") else "no"
    if ann in ("single", "periodic"):
        # one tcoupl group (readir.cpp annealing arrays, group 0)
        npts = int(kv.get("annealing-npoints", "0").split()[0])
        at = tuple(float(v) for v in kv.get("annealing-time", "").split())
        atemp = tuple(float(v)
                      for v in kv.get("annealing-temp", "").split())
        if npts and (len(at) != npts or len(atemp) != npts):
            raise ValueError("annealing-time/-temp length != "
                             "annealing-npoints")
        if len(at) < 2:
            raise ValueError("annealing needs >= 2 points")
        params = params.replace(annealing=(ann, at, atemp))
    elif ann not in ("no",):
        raise ValueError(f"annealing = {ann}")
    dr = kv.get("disre", "no").lower()
    if dr not in ("no", "simple"):
        raise ValueError(f"disre = {dr} unsupported (no ensemble/"
                         "time-averaged restraints)")
    dtau = get("disre-tau", 0.0)
    if dtau > 0.0:
        raise ValueError("disre-tau > 0 (time-averaged restraints) "
                         "unsupported")
    return params, all_lambda


def _parse_pull(kv: Dict[str, str], ndx=None):
    """COM pulling keys (reference: readir.cpp read_pullparams / pull
    mdp section).  Groups: `pull-groupN-atoms` inline 1-based lists, or
    `pull-groupN-name` resolved against the index file (the reference's
    path, readir.cpp do_index)."""
    if kv.get("pull", "no").lower() != "yes":
        return None
    from ..md.pull import PullCoord, PullType
    ngroups = int(kv.get("pull-ngroups", "0"))
    ncoords = int(kv.get("pull-ncoords", "0"))
    groups = {}
    for g in range(1, ngroups + 1):
        atoms = kv.get(f"pull-group{g}-atoms", "").split()
        name = kv.get(f"pull-group{g}-name", "").strip()
        if atoms:
            groups[g] = tuple(int(a) - 1 for a in atoms)
        elif name and ndx and name in ndx:
            groups[g] = tuple(int(i) for i in ndx[name])
        else:
            raise ValueError(
                f"pull-group{g}-atoms missing (give an inline 1-based "
                f"atom list, or pull-group{g}-name + an index file)")
    coords = []
    types = {"umbrella": PullType.UMBRELLA,
             "constant-force": PullType.CONSTANT_FORCE,
             "flat-bottom": PullType.FLAT_BOTTOM}
    for c in range(1, ncoords + 1):
        g0, g1 = (int(v) for v in kv.get(f"pull-coord{c}-groups",
                                         "1 2").split()[:2])
        geom = kv.get(f"pull-coord{c}-geometry", "distance").lower()
        if geom != "distance":
            raise NotImplementedError(
                f"pull-coord{c}-geometry = {geom} (only 'distance')")
        coords.append(PullCoord(
            group0=groups[g0], group1=groups[g1],
            type=types[kv.get(f"pull-coord{c}-type", "umbrella").lower()],
            init=float(kv.get(f"pull-coord{c}-init", "0")),
            rate=float(kv.get(f"pull-coord{c}-rate", "0")),
            k=float(kv.get(f"pull-coord{c}-k", "1000"))))
    return tuple(coords) if coords else None
