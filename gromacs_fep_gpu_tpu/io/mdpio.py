"""mdp parameter file parsing into MdParams — the readir analogue
(reference: src/gromacs/gmxpreprocess/readir.cpp:2152 get_ir; FEP keys
:2544-2588).  Unknown keys warn rather than abort (warninp-style budget).
"""
from __future__ import annotations

import warnings
from typing import Dict, Optional, Tuple

import numpy as np

from ..core.types import (CoulombType, FepParams, IntegratorType, MdParams,
                          PcouplType, SoftcoreType, TcouplType, VdwModifier,
                          FepCoupling)

_COUL = {"cut-off": CoulombType.CUTOFF, "cutoff": CoulombType.CUTOFF,
         "reaction-field": CoulombType.REACTION_FIELD, "pme": CoulombType.PME}
_VMOD = {"none": VdwModifier.NONE,
         "potential-shift": VdwModifier.POTENTIAL_SHIFT,
         "potential-shift-verlet": VdwModifier.POTENTIAL_SHIFT,
         "potential-switch": VdwModifier.POTENTIAL_SWITCH,
         "force-switch": VdwModifier.FORCE_SWITCH}
_INTEG = {"md": IntegratorType.MD, "md-vv": IntegratorType.MD_VV,
          "sd": IntegratorType.SD, "bd": IntegratorType.BD,
          "steep": IntegratorType.STEEP, "cg": IntegratorType.CG}
_TC = {"no": TcouplType.NO, "berendsen": TcouplType.BERENDSEN,
       "v-rescale": TcouplType.V_RESCALE, "nose-hoover": TcouplType.NOSE_HOOVER}
_PC = {"no": PcouplType.NO, "berendsen": PcouplType.BERENDSEN,
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


def mdp_to_params(text: str) -> Tuple[MdParams, Optional[np.ndarray]]:
    """Returns (MdParams, all_lambda or None)."""
    kv = parse_mdp(text)

    def get(key, default, cast=float):
        return cast(kv[key]) if key in kv else default

    def gete(key, table, default):
        if key not in kv:
            return default
        v = kv[key].lower()
        if v not in table:
            warnings.warn(f"mdp: unsupported {key} = {v}, keeping default")
            return default
        return table[v]

    all_lambda = _lambda_vector(kv)
    sc_alpha = get("sc-alpha", 0.0)
    fep_on = kv.get("free-energy", "no").lower() in ("yes", "expanded")
    fep = FepParams(
        enabled=fep_on,
        init_lambda_state=get("init-lambda-state", 0, int),
        delta_lambda=get("delta-lambda", 0.0),
        sc_alpha=sc_alpha,
        sc_power=get("sc-power", 1, int),
        sc_sigma=get("sc-sigma", 0.3),
        sc_coul=kv.get("sc-coul", "no").lower() == "yes",
        softcore=gete("sc-function", _SC, SoftcoreType.BEUTLER),
        nstdhdl=get("nstdhdl", 100, int),
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
        vdw_modifier=gete("vdw-modifier", _VMOD, VdwModifier.POTENTIAL_SHIFT),
        epsilon_r=get("epsilon-r", 1.0),
        epsilon_rf=get("epsilon-rf", 0.0),
        rvdw_switch=get("rvdw-switch", 0.9),
        ewald_rtol=get("ewald-rtol", 1e-5),
        fourier_spacing=get("fourier-spacing", 0.12),
        pme_order=get("pme-order", 4, int),
        dispcorr=kv.get("dispcorr", "no").lower() != "no",
        tcoupl=gete("tcoupl", _TC, TcouplType.NO),
        ref_t=float(kv.get("ref-t", "300").split()[0]),
        tau_t=float(kv.get("tau-t", "1.0").split()[0]),
        nsttcouple=get("nsttcouple", 10, int),
        pcoupl=gete("pcoupl", _PC, PcouplType.NO),
        ref_p=float(kv.get("ref-p", "1.0").split()[0]),
        tau_p=get("tau-p", 5.0),
        compressibility=float(kv.get("compressibility", "4.5e-5").split()[0]),
        nstpcouple=get("nstpcouple", 10, int),
        ld_seed=get("ld-seed", 1993, int),
        lincs_order=get("lincs-order", 4, int),
        lincs_iter=get("lincs-iter", 2, int),
        nstcomm=get("nstcomm", 100, int),
        nstxout=get("nstxout", 0, int),
        fep=fep,
    )
    return params, all_lambda
