"""Golden-data validation against the reference's FEP acceptance matrix
(reference: src/programs/mdrun/tests/freeenergy.cpp:91-165 runs the systems
in src/testutils/simulationdatabase/freeenergy/* for 20 steps and compares
per-step energy terms against tests/refdata/*FreeEnergyReferenceTest*.xml).

This module parses those refdata XMLs and evaluates our framework on the
same inputs, producing the same reported terms:

    Potential, dVremain/dl, dVcoul/dl, dVvdw/dl, dVbonded/dl,
    dVrestraint/dl

dV*/dl routing follows enerdata_utils.cpp set_dhdl_output: components with
their own lambda array are reported separately; everything else (plus the
generic Fep component) accumulates into dVremain/dl.  The kinetic
dEkin/dlambda-mass term joins dVremain/dl when mass-lambdas is not given
(finalizeKineticContributions).
"""
from __future__ import annotations

import dataclasses
import os
import re
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional

import numpy as np

from ..core.types import FepCoupling

REFDATA_DIR = ("/root/reference/src/programs/mdrun/tests/refdata")
SIMDB_DIR = ("/root/reference/src/testutils/simulationdatabase/freeenergy")


def refdata_path(system_name: str, precision: str = "d") -> str:
    tag = system_name.replace("-", "_")
    return os.path.join(
        REFDATA_DIR,
        f"EquivalentToReference_FreeEnergyReferenceTest_WithinTolerances_"
        f"{tag}_{precision}.xml")


def load_refdata(system_name: str, precision: str = "d"
                 ) -> Dict[str, np.ndarray]:
    """{term name: per-step values} from a recorded refdata XML."""
    tree = ET.parse(refdata_path(system_name, precision))
    out = {}
    for energy in tree.getroot().iter("Energy"):
        name = energy.get("Name")
        vals = []
        for real in energy.iter("Real"):
            m = re.search(r"Step (\d+)", real.get("Name") or "")
            step = int(m.group(1)) if m else len(vals)
            vals.append((step, float(real.text)))
        vals.sort()
        out[name] = np.array([v for _, v in vals])
    return out


def reported_dvdl_terms(dvdl: np.ndarray, separate_dvdl: List[bool],
                        dekindl: float = 0.0, dvdl_constr: float = 0.0
                        ) -> Dict[str, float]:
    """Assemble the printed dV/dl terms from the per-component vector
    (reference: enerdata_utils.cpp:195-246 set_dhdl_output +
    accumulateKineticLambdaComponents)."""
    names = {
        FepCoupling.COUL: "dVcoul/dl",
        FepCoupling.VDW: "dVvdw/dl",
        FepCoupling.BONDED: "dVbonded/dl",
        FepCoupling.RESTRAINT: "dVrestraint/dl",
        FepCoupling.MASS: "dEkin/dl",
    }
    out: Dict[str, float] = {}
    remain = float(dvdl[FepCoupling.FEP])
    for comp, label in names.items():
        v = float(dvdl[comp])
        if comp == FepCoupling.MASS:
            v += dekindl
        if separate_dvdl[int(comp)]:
            out[label] = v
        else:
            remain += v
    # constraint dH/dl joins bonded if separate, else remain
    if separate_dvdl[int(FepCoupling.BONDED)]:
        out["dVbonded/dl"] = out.get("dVbonded/dl", 0.0) + dvdl_constr
    else:
        remain += dvdl_constr
    out["dVremain/dl"] = remain
    return out


@dataclasses.dataclass
class GoldenCase:
    name: str
    mdp: str
    top: str
    gro_path: str
    include_dir: str


def load_case(system_name: str) -> GoldenCase:
    d = os.path.join(SIMDB_DIR, system_name)
    return GoldenCase(
        name=system_name,
        mdp=open(os.path.join(d, "grompp.mdp")).read(),
        top=open(os.path.join(d, "topol.top")).read(),
        gro_path=os.path.join(d, "conf.gro"),
        include_dir=d)
