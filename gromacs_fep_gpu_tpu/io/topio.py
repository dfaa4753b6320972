"""GROMACS .top subset parser — the grompp-lite topology front end
(reference: src/gromacs/gmxpreprocess/topio.cpp + toppush.cpp; FEP B-state
columns and couple-moltype semantics from grompp.cpp:516,641).

Supported directives: defaults, atomtypes, nonbond_params, moleculetype,
atoms (with B-state columns), bonds(1), pairs(1), angles(1/5), dihedrals
(1/2/3/4/9), settles, exclusions, position_restraints(1), system,
molecules.  Interaction rows must carry explicit parameters (no bonded
type database yet); #include/#define are handled for simple cases.

Produces MoleculeType objects + the LJ table, then core.topology.
build_system flattens everything.
"""
from __future__ import annotations

import dataclasses
import os
import re
import warnings
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.topology import MoleculeType, build_system
from ..core.types import System


@dataclasses.dataclass
class AtomType:
    name: str
    mass: float
    charge: float
    sigma: float
    eps: float
    index: int


@dataclasses.dataclass
class ParsedTop:
    system_name: str
    molecules: List[Tuple[str, int]]
    moltypes: Dict[str, MoleculeType]
    atomtypes: Dict[str, AtomType]
    nbfp: np.ndarray
    fudge_lj: float
    fudge_qq: float
    comb_rule: int


def _strip(line: str) -> str:
    return line.split(";")[0].strip()


def _preprocess(text: str, include_dirs: List[str]) -> List[str]:
    """Minimal cpp: #include (from include_dirs), #define constants,
    #ifdef/#ifndef/#endif with defined() logic for flags."""
    defines: Dict[str, str] = {}
    out: List[str] = []
    skip_stack: List[bool] = []

    def process(lines):
        for raw in lines:
            line = raw.rstrip("\n")
            s = line.strip()
            if s.startswith("#"):
                parts = s.split()
                if parts[0] == "#ifdef":
                    skip_stack.append(parts[1] not in defines)
                elif parts[0] == "#ifndef":
                    skip_stack.append(parts[1] in defines)
                elif parts[0] == "#else":
                    if skip_stack:
                        skip_stack[-1] = not skip_stack[-1]
                elif parts[0] == "#endif":
                    if skip_stack:
                        skip_stack.pop()
                elif any(skip_stack):
                    continue
                elif parts[0] == "#define":
                    defines[parts[1]] = " ".join(parts[2:]) if len(parts) > 2 else "1"
                elif parts[0] == "#include":
                    name = parts[1].strip('"<>')
                    for d in include_dirs:
                        p = os.path.join(d, name)
                        if os.path.exists(p):
                            with open(p) as f:
                                process(f.readlines())
                            break
                    else:
                        warnings.warn(f"top: include {name} not found; skipped")
                continue
            if any(skip_stack):
                continue
            # substitute defines (token-wise)
            if defines and s:
                toks = line.split()
                line = " ".join(defines.get(t, t) for t in toks)
            out.append(line)

    process(text.splitlines())
    return out


def parse_top(text: str, include_dirs: Optional[List[str]] = None) -> ParsedTop:
    lines = _preprocess(text, include_dirs or [])
    section = None
    fudge_lj, fudge_qq, comb_rule = 1.0, 1.0, 2
    atomtypes: Dict[str, AtomType] = {}
    nb_override: Dict[Tuple[str, str], Tuple[float, float]] = {}
    moltypes: Dict[str, MoleculeType] = {}
    cur: Optional[MoleculeType] = None
    cur_atom_types: List[str] = []   # per-atom type names (A state)
    cur_atom_types_b: List[str] = []
    system_name = "system"
    molecules: List[Tuple[str, int]] = []

    def close_mol():
        nonlocal cur
        if cur is not None:
            moltypes[cur.name] = cur
        cur = None

    for line in lines:
        s = _strip(line)
        if not s:
            continue
        m = re.match(r"\[\s*(\S+)\s*\]", s)
        if m:
            section = m.group(1).lower()
            if section == "moleculetype":
                close_mol()
            continue
        t = s.split()
        if section == "defaults":
            # nbfunc comb-rule gen-pairs fudgeLJ fudgeQQ
            comb_rule = int(t[1])
            if len(t) > 3:
                fudge_lj = float(t[3])
            if len(t) > 4:
                fudge_qq = float(t[4])
        elif section == "atomtypes":
            # flexible column counts; last two floats are sigma/eps (rule 2/3)
            # or V/W (rule 1); name is first token
            name = t[0]
            floats = []
            for tok in t[1:]:
                try:
                    floats.append(float(tok))
                except ValueError:
                    floats.append(None)
            nums = [f for f in floats if f is not None]
            sigma, eps = nums[-2], nums[-1]
            mass = nums[-4] if len(nums) >= 4 else 0.0
            charge = nums[-3] if len(nums) >= 4 else 0.0
            atomtypes[name] = AtomType(name, mass, charge, sigma, eps,
                                       len(atomtypes))
        elif section == "nonbond_params":
            nb_override[(t[0], t[1])] = (float(t[3]), float(t[4]))
        elif section == "moleculetype":
            cur = MoleculeType(name=t[0], types_a=[], charges_a=[],
                               masses_a=[], types_b=[], charges_b=[],
                               masses_b=[], nrexcl=int(t[1]))
            cur_atom_types, cur_atom_types_b = [], []
            cur._type_names = cur_atom_types        # type: ignore
            cur._type_names_b = cur_atom_types_b    # type: ignore
        elif section == "atoms":
            # nr type resnr residu atom cgnr charge mass [typeB chargeB massB]
            tname = t[1]
            at = atomtypes[tname]
            charge = float(t[6]) if len(t) > 6 else at.charge
            mass = float(t[7]) if len(t) > 7 else at.mass
            cur_atom_types.append(tname)
            cur.charges_a.append(charge)
            cur.masses_a.append(mass)
            if len(t) > 8:
                tb = t[8]
                qb = float(t[9]) if len(t) > 9 else atomtypes[tb].charge
                mb = float(t[10]) if len(t) > 10 else atomtypes[tb].mass
                cur_atom_types_b.append(tb)
                cur.charges_b.append(qb)
                cur.masses_b.append(mb)
            else:
                cur_atom_types_b.append(tname)
                cur.charges_b.append(charge)
                cur.masses_b.append(mass)
        elif section == "bonds":
            ai, aj, funct = int(t[0]) - 1, int(t[1]) - 1, int(t[2])
            if funct != 1 or len(t) < 5:
                if len(t) >= 5:
                    warnings.warn(f"bonds funct {funct} treated as harmonic")
                else:
                    raise ValueError("bonds need explicit b0 kb")
            pa = (float(t[3]), float(t[4]))
            pb = (float(t[5]), float(t[6])) if len(t) >= 7 else None
            cur.bonds.append(((ai, aj), pa, pb))
        elif section == "pairs":
            ai, aj = int(t[0]) - 1, int(t[1]) - 1
            cur._pairs_raw = getattr(cur, "_pairs_raw", [])
            explicit = tuple(float(v) for v in t[3:5]) if len(t) >= 5 else None
            cur._pairs_raw.append((ai, aj, explicit))
        elif section == "angles":
            ai, aj, ak, funct = (int(t[0]) - 1, int(t[1]) - 1,
                                 int(t[2]) - 1, int(t[3]))
            if funct == 5:  # Urey-Bradley
                pa = (float(t[4]), float(t[5]), float(t[6]), float(t[7]))
                pb = (tuple(float(v) for v in t[8:12]) if len(t) >= 12
                      else None)
                cur.ub.append(((ai, aj, ak), pa, pb))
            else:
                pa = (float(t[4]), float(t[5]))
                pb = (float(t[6]), float(t[7])) if len(t) >= 8 else None
                cur.angles.append(((ai, aj, ak), pa, pb))
        elif section == "dihedrals":
            idx = tuple(int(v) - 1 for v in t[:4])
            funct = int(t[4])
            vals = [float(v) for v in t[5:]]
            if funct in (1, 9, 4):   # proper (9 = multiple), 4 = periodic improper
                pa = (vals[0], vals[1], vals[2])
                pb = tuple(vals[3:6]) if len(vals) >= 6 else None
                cur.pdihs.append((idx, pa, pb))
            elif funct == 2:         # harmonic improper
                pa = (vals[0], vals[1])
                pb = tuple(vals[2:4]) if len(vals) >= 4 else None
                cur.idihs.append((idx, pa, pb))
            elif funct == 3:         # Ryckaert-Bellemans
                pa = tuple(vals[0:6])
                pb = tuple(vals[6:12]) if len(vals) >= 12 else None
                cur.rbdihs.append((idx, pa, pb))
            else:
                raise ValueError(f"dihedral funct {funct} unsupported")
        elif section == "settles":
            ow = int(t[0]) - 1
            doh, dhh = float(t[2]), float(t[3])
            cur.settle = (ow, ow + 1, ow + 2, doh, dhh)
        elif section == "exclusions":
            ai = int(t[0]) - 1
            for v in t[1:]:
                cur.extra_exclusions.append((ai, int(v) - 1))
        elif section == "position_restraints":
            ai, funct = int(t[0]) - 1, int(t[1])
            kx, ky, kz = float(t[2]), float(t[3]), float(t[4])
            # reference position filled at build time from coordinates
            cur.posres.append(((ai,), (0.0, 0.0, 0.0, kx, ky, kz), None))
        elif section == "virtual_sites2":
            sid, ai, aj = int(t[0]) - 1, int(t[1]) - 1, int(t[2]) - 1
            cur.vsites2.append(((sid, ai, aj), (float(t[4]),)))
        elif section == "virtual_sites3":
            sid, ai, aj, ak = (int(t[0]) - 1, int(t[1]) - 1, int(t[2]) - 1,
                               int(t[3]) - 1)
            funct = int(t[4])
            vals = [float(v) for v in t[5:]]
            if funct == 1:
                cur.vsites3.append(((sid, ai, aj, ak), (vals[0], vals[1])))
            elif funct == 4:
                cur.vsites3out.append(((sid, ai, aj, ak), tuple(vals[:3])))
            else:
                raise ValueError(f"virtual_sites3 funct {funct} unsupported")
        elif section == "constraints":
            ai, aj = int(t[0]) - 1, int(t[1]) - 1
            la = float(t[3])
            lb = float(t[4]) if len(t) > 4 else la
            cur.constraints.append((ai, aj, la, lb))
        elif section == "system":
            system_name = s
        elif section == "molecules":
            molecules.append((t[0], int(t[1])))

    close_mol()

    # LJ table from atomtypes
    T = len(atomtypes)
    names = [None] * T
    for at in atomtypes.values():
        names[at.index] = at.name
    nbfp = np.zeros((T, T, 2), np.float32)
    for i in range(T):
        for j in range(T):
            a, b = atomtypes[names[i]], atomtypes[names[j]]
            if comb_rule == 1:
                c6 = np.sqrt(a.sigma * b.sigma)    # V = c6 directly
                c12 = np.sqrt(a.eps * b.eps)
            else:
                if comb_rule == 2:
                    sij = 0.5 * (a.sigma + b.sigma)
                else:
                    sij = np.sqrt(a.sigma * b.sigma)
                eij = np.sqrt(a.eps * b.eps)
                c6 = 4.0 * eij * sij**6
                c12 = 4.0 * eij * sij**12
            nbfp[i, j] = (c6, c12)
    for (na, nb_), (v, w) in nb_override.items():
        i, j = atomtypes[na].index, atomtypes[nb_].index
        if comb_rule == 1:
            nbfp[i, j] = nbfp[j, i] = (v, w)
        else:
            nbfp[i, j] = nbfp[j, i] = (4 * w * v**6, 4 * w * v**12)

    # resolve per-molecule type indices and 1-4 pairs
    for mol in moltypes.values():
        tn = mol._type_names           # type: ignore
        tnb = mol._type_names_b        # type: ignore
        mol.types_a = [atomtypes[t].index for t in tn]
        mol.types_b = [atomtypes[t].index for t in tnb]
        for (ai, aj, explicit) in getattr(mol, "_pairs_raw", []):
            qa = mol.charges_a[ai] * mol.charges_a[aj]
            qb = mol.charges_b[ai] * mol.charges_b[aj]
            if explicit is not None:
                pa = (qa, explicit[0], explicit[1])
                pb = (qb, explicit[0], explicit[1])
            else:
                ta, tb_ = mol.types_a[ai], mol.types_a[aj]
                c6 = fudge_lj * nbfp[ta, tb_, 0]
                c12 = fudge_lj * nbfp[ta, tb_, 1]
                tb1, tb2 = mol.types_b[ai], mol.types_b[aj]
                c6b = fudge_lj * nbfp[tb1, tb2, 0]
                c12b = fudge_lj * nbfp[tb1, tb2, 1]
                pa = (qa, c6, c12)
                pb = (qb, c6b, c12b)
            mol.pairs14.append(((ai, aj), pa, pb))

    return ParsedTop(system_name=system_name, molecules=molecules,
                     moltypes=moltypes, atomtypes=atomtypes, nbfp=nbfp,
                     fudge_lj=fudge_lj, fudge_qq=fudge_qq,
                     comb_rule=comb_rule)


def decouple_moltype(mol: MoleculeType, atomtypes: Dict[str, AtomType],
                     nbfp: np.ndarray, vdw: bool = True, coul: bool = True
                     ) -> Tuple[MoleculeType, np.ndarray]:
    """couple-moltype: generate a B state that turns the molecule's
    intermolecular interactions off (reference: grompp.cpp:516
    couple-moltype decoupling; couple-intramol=no semantics for charges/LJ
    toward the environment is approximated by full decoupling here)."""
    T = nbfp.shape[0]
    # add one dummy type with zero LJ
    nbfp2 = np.zeros((T + 1, T + 1, 2), np.float32)
    nbfp2[:T, :T] = nbfp
    mol2 = dataclasses.replace(mol)
    if vdw:
        mol2.types_b = [T] * mol.n_atoms
    if coul:
        mol2.charges_b = [0.0] * mol.n_atoms
    return mol2, nbfp2


def system_from_top(text: str, include_dirs: Optional[List[str]] = None,
                    couple_moltype: Optional[str] = None) -> System:
    parsed = parse_top(text, include_dirs)
    nbfp = parsed.nbfp
    mols = []
    for name, count in parsed.molecules:
        mol = parsed.moltypes[name]
        if couple_moltype is not None and name == couple_moltype:
            mol, nbfp = decouple_moltype(mol, parsed.atomtypes, nbfp)
        mols.append((mol, count))
    return build_system(mols, nbfp, fudge_qq=parsed.fudge_qq)
