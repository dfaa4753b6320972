"""GROMACS .top parser — the grompp-lite topology front end
(reference: src/gromacs/gmxpreprocess/topio.cpp + toppush.cpp; FEP B-state
columns and couple-moltype semantics from toppush.cpp:2726
convert_moltype_couple; bonded type databases and wildcard dihedral
matching from toppush.cpp:1757 defaultInteractionsOfType; h-bond
constraint conversion from topshake.cpp make_shake).

Supported directives: defaults (incl. gen-pairs/fudgeLJ/fudgeQQ),
atomtypes (with optional bonded-type and atomic-number columns),
nonbond_params, bondtypes, angletypes, dihedraltypes (funct 1/2/3/4/9,
wildcards, 2- and 4-atom forms), pairtypes, constrainttypes,
moleculetype, atoms (B-state columns), bonds(1), pairs(1), angles(1/5),
dihedrals(1/2/3/4/9), settles, exclusions, constraints(1/2),
position_restraints(1, A/B force constants), dihedral_restraints(1),
angle_restraints(1), virtual_sites2/3, system, molecules.

Interaction rows without explicit parameters are resolved against the
bonded-type databases exactly as grompp does: canonical atom ordering by
bonded-type id (grompp.cpp:183 sortAtomIds), most-exact-match wildcard
dihedrals, B-state lookup via the B atom types with fall-back to the A
parameters + warning for perturbed atoms (toppush.cpp:2220-2236).
"""
from __future__ import annotations

import dataclasses
import math
import os
import re
import warnings
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.topology import MoleculeType, build_system
from ..core.types import System


@dataclasses.dataclass
class AtomType:
    name: str
    btype: str            # bonded type name (defaults to name)
    atnum: int
    mass: float
    charge: float
    ptype: str
    v: float              # sigma (rule 2/3) or c6 (rule 1)
    w: float              # eps   (rule 2/3) or c12 (rule 1)
    index: int


# number of A-state force parameters per funct, keyed by (section, funct)
_NPARAM = {
    ("bonds", 1): 2,
    ("bonds", 10): 4,
    ("angles", 1): 2,
    ("angles", 5): 4,
    ("dihedrals", 1): 3,
    ("dihedrals", 9): 3,
    ("dihedrals", 4): 3,
    ("dihedrals", 2): 2,
    ("dihedrals", 3): 6,
    ("pairs", 1): 2,
    ("constraints", 1): 1,
    ("constraints", 2): 1,
    ("dihedral_restraints", 1): 3,
    ("angle_restraints", 1): 3,
}

# dihedral funct -> database group (GROMACS F_PDIHS covers funct 1 and 9)
_DIH_GROUP = {1: "pdihs", 9: "pdihs", 2: "idihs", 3: "rbdihs", 4: "pidihs"}


class BondedDB:
    """Type databases keyed by canonicalized bonded-type-id tuples."""

    def __init__(self):
        self.bt_ids: Dict[str, int] = {}
        self.bonds: Dict[Tuple[int, int], Tuple] = {}
        self.angles: Dict[Tuple[int, int, int], Tuple] = {}
        self.pairs: Dict[Tuple[int, int], Tuple] = {}
        self.constraints: Dict[Tuple[int, int], Tuple] = {}
        # dihedrals: group -> list of (key4 ids with -1 wildcard, params)
        self.dihedrals: Dict[str, List[Tuple[Tuple[int, int, int, int], Tuple]]] = {
            "pdihs": [], "idihs": [], "rbdihs": [], "pidihs": []}

    def bt_id(self, name: str) -> int:
        if name == "X":
            return -1
        if name not in self.bt_ids:
            self.bt_ids[name] = len(self.bt_ids)
        return self.bt_ids[name]

    @staticmethod
    def canon2(k):
        return k if k[0] <= k[1] else (k[1], k[0])

    @staticmethod
    def canon3(k):
        return k if k[0] <= k[2] else (k[2], k[1], k[0])

    @staticmethod
    def canon4(k):
        # reference: grompp.cpp sortDihedralAtomIds (reverse if al < ai)
        return k if k[0] <= k[3] else (k[3], k[2], k[1], k[0])

    def add(self, section: str, names: List[str], funct: int, params: Tuple):
        ids = tuple(self.bt_id(n) for n in names)
        if section == "bondtypes":
            self.bonds[self.canon2(ids)] = params
        elif section == "angletypes":
            self.angles[self.canon3(ids)] = params
        elif section == "pairtypes":
            self.pairs[self.canon2(ids)] = params
        elif section == "constrainttypes":
            self.constraints[self.canon2(ids)] = params
        elif section == "dihedraltypes":
            if len(names) == 2:   # two-atom form = X-a-b-X on the inner atoms
                ids = (-1, ids[0], ids[1], -1)
            group = _DIH_GROUP[funct]
            self.dihedrals[group].append((self.canon4(ids), params))

    def lookup_dihedral(self, group: str, ids4) -> Optional[Tuple]:
        terms = self.lookup_dihedral_terms(group, ids4)
        return terms[0] if terms else None

    def lookup_dihedral_terms(self, group: str, ids4) -> List[Tuple]:
        """Most-exact-match wildcard search, both orientations — canon4
        cannot orient X-a-b-X entries, so the stored inner-pair direction
        is arbitrary (reference: toppush.cpp:1757
        defaultInteractionsOfType tries forward and reverse).  Returns
        ALL db lines sharing the winning type key, in file order —
        multi-term funct-9 dihedraltypes expand to one interaction per
        line (toppush.cpp push_bond bAllowRepeat)."""
        key = self.canon4(tuple(ids4))
        best, best_n = None, -1
        for tids, _params in self.dihedrals[group]:
            for cand in (key, key[::-1]):
                n = 0
                ok = True
                for t, a in zip(tids, cand):
                    if t == a:
                        n += 1
                    elif t != -1:
                        ok = False
                        break
                if ok and n > best_n:
                    best, best_n = tids, n
        if best is None:
            return []
        return [p for t, p in self.dihedrals[group] if t == best]


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
    gen_pairs: bool = False
    db: Optional[BondedDB] = None
    # (T, gs, gs) CMAP energy grids from [ cmaptypes ]
    cmap_grids: Optional[np.ndarray] = None


def _strip(line: str) -> str:
    return line.split(";")[0].strip()


def _preprocess(text: str, include_dirs: List[str],
                defines: Optional[Dict[str, str]] = None) -> List[str]:
    """Minimal cpp: #include (from include_dirs), #define constants,
    #ifdef/#ifndef/#endif with defined() logic for flags."""
    defines = dict(defines or {})
    out: List[str] = []
    skip_stack: List[bool] = []

    def process(lines, cur_dir=None):
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
                    # like cpp: the including file's own directory is
                    # searched first (gmxpreprocess/gmxcpp.cpp)
                    name = parts[1].strip('"<>')
                    dirs = (([cur_dir] if cur_dir else []) + include_dirs)
                    for d in dirs:
                        p = os.path.join(d, name)
                        if os.path.exists(p):
                            with open(p) as f:
                                process(f.readlines(), os.path.dirname(p))
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
    # join backslash line continuations (used by [ cmaptypes ] grids)
    joined: List[str] = []
    for line in out:
        if joined and joined[-1].rstrip().endswith("\\"):
            joined[-1] = joined[-1].rstrip().rstrip("\\") + " " + line
        else:
            joined.append(line)
    return joined


def _is_float(tok: str) -> bool:
    try:
        float(tok)
        return True
    except ValueError:
        return False


def _parse_atomtype_line(t: List[str], comb_rule: int, index: int) -> AtomType:
    """Column-count-flexible atomtypes row
    (reference: toppush.cpp push_at field detection).

    Formats: name [btype] [atnum] mass charge ptype V W
    """
    name = t[0]
    # locate ptype: single letter A/S/V/D followed by >= 2 floats
    pt_idx = None
    for i in range(1, len(t) - 2):
        if t[i].upper() in ("A", "S", "V", "D") and not _is_float(t[i]) \
                and _is_float(t[i + 1]) and _is_float(t[i + 2]):
            pt_idx = i
    if pt_idx is None or pt_idx < 3:
        # no btype/atnum columns: name mass charge ptype V W
        pt_idx = 3
    mass = float(t[pt_idx - 2])
    charge = float(t[pt_idx - 1])
    ptype = t[pt_idx].upper()
    v, w = float(t[pt_idx + 1]), float(t[pt_idx + 2])
    mid = t[1:pt_idx - 2]
    btype, atnum = name, 0
    if len(mid) == 2:
        btype, atnum = mid[0], int(mid[1])
    elif len(mid) == 1:
        if _is_float(mid[0]):
            atnum = int(float(mid[0]))
        else:
            btype = mid[0]
    return AtomType(name, btype, atnum, mass, charge, ptype, v, w, index)


def _combine_lj(at_i: AtomType, at_j: AtomType, comb_rule: int
                ) -> Tuple[float, float]:
    """(c6, c12) from two atom types (reference: convparm.cpp)."""
    if comb_rule == 1:
        return (math.sqrt(at_i.v * at_j.v), math.sqrt(at_i.w * at_j.w))
    if comb_rule == 2:
        sij = 0.5 * (at_i.v + at_j.v)
    else:
        sij = math.sqrt(at_i.v * at_j.v)
    eij = math.sqrt(at_i.w * at_j.w)
    return (4.0 * eij * sij ** 6, 4.0 * eij * sij ** 12)


@dataclasses.dataclass
class _RawMol:
    """Unresolved molecule body (resolved against the DBs at the end)."""
    name: str
    nrexcl: int
    atoms: List[Tuple] = dataclasses.field(default_factory=list)
    # each row: (section, funct, idx tuple, explicit float list)
    rows: List[Tuple] = dataclasses.field(default_factory=list)
    settle: Optional[Tuple] = None
    exclusions: List[Tuple[int, int]] = dataclasses.field(default_factory=list)
    posres: List[Tuple] = dataclasses.field(default_factory=list)
    fbposres: List[Tuple] = dataclasses.field(default_factory=list)
    vsites2: List[Tuple] = dataclasses.field(default_factory=list)
    vsites3: List[Tuple] = dataclasses.field(default_factory=list)
    vsites3out: List[Tuple] = dataclasses.field(default_factory=list)
    vsites3fd: List[Tuple] = dataclasses.field(default_factory=list)
    vsites3fad: List[Tuple] = dataclasses.field(default_factory=list)
    vsites4fdn: List[Tuple] = dataclasses.field(default_factory=list)


def parse_top(text: str, include_dirs: Optional[List[str]] = None,
              defines: Optional[Dict[str, str]] = None) -> ParsedTop:
    lines = _preprocess(text, include_dirs or [], defines)
    section = None
    fudge_lj, fudge_qq, comb_rule = 1.0, 1.0, 2
    gen_pairs = False
    atomtypes: Dict[str, AtomType] = {}
    nb_override: Dict[Tuple[str, str], Tuple[float, float]] = {}
    db = BondedDB()
    raw_mols: Dict[str, _RawMol] = {}
    cur: Optional[_RawMol] = None
    system_name = "system"
    molecules: List[Tuple[str, int]] = []
    # CMAP grid types keyed by the 5 bonded-type names
    # (reference: gmxpreprocess/toppush.cpp push_cmaptype)
    cmaptypes: Dict[Tuple[str, ...], int] = {}
    cmap_grids: List[np.ndarray] = []

    for line in lines:
        s = _strip(line)
        if not s:
            continue
        m = re.match(r"\[\s*(\S+)\s*\]", s)
        if m:
            section = m.group(1).lower()
            continue
        t = s.split()
        if section == "defaults":
            # nbfunc comb-rule [gen-pairs [fudgeLJ [fudgeQQ]]]
            comb_rule = int(t[1])
            if len(t) > 2:
                gen_pairs = t[2].lower() in ("yes", "true", "1")
            if len(t) > 3:
                fudge_lj = float(t[3])
            if len(t) > 4:
                fudge_qq = float(t[4])
        elif section == "atomtypes":
            at = _parse_atomtype_line(t, comb_rule, len(atomtypes))
            atomtypes[at.name] = at
            db.bt_id(at.btype)
        elif section == "nonbond_params":
            nb_override[(t[0], t[1])] = (float(t[3]), float(t[4]))
        elif section in ("bondtypes", "angletypes", "pairtypes",
                         "constrainttypes"):
            na = {"bondtypes": 2, "angletypes": 3, "pairtypes": 2,
                  "constrainttypes": 2}[section]
            names = t[:na]
            funct = int(t[na])
            params = tuple(float(v) for v in t[na + 1:])
            db.add(section, names, funct, params)
        elif section == "dihedraltypes":
            # 4-atom or legacy 2-atom form; funct follows the names
            if len(t) > 4 and not _is_float(t[2]) and not _is_float(t[3]):
                names, funct = t[:4], int(t[4])
                params = tuple(float(v) for v in t[5:])
            else:
                names, funct = t[:2], int(t[2])
                params = tuple(float(v) for v in t[3:])
            db.add("dihedraltypes", names, funct, params)
        elif section == "cmaptypes":
            # name1..name5 funct nx ny v00 v01 ... (row = phi index)
            names5 = tuple(t[:5])
            nx, ny = int(t[6]), int(t[7])
            vals = np.asarray([float(v) for v in t[8:8 + nx * ny]],
                              np.float64)
            if vals.size != nx * ny or nx != ny:
                raise ValueError(
                    f"cmaptypes {names5}: expected square {nx}x{ny} grid, "
                    f"got {vals.size} values")
            cmaptypes[names5] = len(cmap_grids)
            cmap_grids.append(vals.reshape(nx, ny))
        elif section == "moleculetype":
            cur = _RawMol(name=t[0], nrexcl=int(t[1]))
            raw_mols[cur.name] = cur
        elif section == "atoms":
            # nr type resnr residue atom cgnr [charge [mass [typeB [chargeB [massB]]]]]
            tname = t[1]
            at = atomtypes[tname]
            aname = t[4]
            charge = float(t[6]) if len(t) > 6 else at.charge
            mass = float(t[7]) if len(t) > 7 else at.mass
            if len(t) > 8:
                tb = t[8]
                qb = float(t[9]) if len(t) > 9 else atomtypes[tb].charge
                mb = float(t[10]) if len(t) > 10 else atomtypes[tb].mass
            else:
                tb, qb, mb = tname, charge, mass
            cur.atoms.append((tname, charge, mass, tb, qb, mb, aname))
        elif section in ("bonds", "pairs", "angles", "dihedrals",
                         "constraints", "dihedral_restraints",
                         "angle_restraints", "cmap", "polarization",
                         "distance_restraints", "orientation_restraints"):
            k = {"bonds": 2, "pairs": 2, "angles": 3, "dihedrals": 4,
                 "constraints": 2, "dihedral_restraints": 4,
                 "angle_restraints": 4, "cmap": 5,
                 "distance_restraints": 2, "polarization": 2,
                 "orientation_restraints": 2}[section]
            idx = tuple(int(v) - 1 for v in t[:k])
            funct = int(t[k])
            vals = [float(v) for v in t[k + 1:]]
            cur.rows.append((section, funct, idx, vals))
        elif section == "settles":
            ow = int(t[0]) - 1
            doh, dhh = float(t[2]), float(t[3])
            cur.settle = (ow, ow + 1, ow + 2, doh, dhh)
        elif section == "exclusions":
            ai = int(t[0]) - 1
            for v in t[1:]:
                cur.exclusions.append((ai, int(v) - 1))
        elif section == "position_restraints":
            ai, funct = int(t[0]) - 1, int(t[1])
            vals = [float(v) for v in t[2:]]
            if funct == 2:
                # flat-bottom: g r k (reference: toppush.cpp F_FBPOSRES)
                cur.fbposres.append((ai, (vals[0], vals[1], vals[2])))
            else:
                ka = tuple(vals[:3])
                kb = tuple(vals[3:6]) if len(vals) >= 6 else ka
                cur.posres.append((ai, ka, kb))
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
            elif funct == 2:      # 3fd: (a, d)
                cur.vsites3fd.append(((sid, ai, aj, ak),
                                      (vals[0], vals[1])))
            elif funct == 3:      # 3fad: (theta_deg, d) -> (d cos, d sin)
                import math as _math
                th = _math.radians(vals[0])
                cur.vsites3fad.append(((sid, ai, aj, ak),
                                       (vals[1] * _math.cos(th),
                                        vals[1] * _math.sin(th))))
            elif funct == 4:
                cur.vsites3out.append(((sid, ai, aj, ak), tuple(vals[:3])))
            else:
                raise ValueError(f"virtual_sites3 funct {funct} unsupported")
        elif section == "virtual_sites4":
            sid, ai, aj, ak, al = (int(t[0]) - 1, int(t[1]) - 1,
                                   int(t[2]) - 1, int(t[3]) - 1,
                                   int(t[4]) - 1)
            funct = int(t[5])
            vals = [float(v) for v in t[6:]]
            if funct != 2:
                raise ValueError(f"virtual_sites4 funct {funct} unsupported "
                                 "(only 2 = 4fdn)")
            cur.vsites4fdn.append(((sid, ai, aj, ak, al), tuple(vals[:3])))
        elif section == "system":
            system_name = s
        elif section == "molecules":
            molecules.append((t[0], int(t[1])))

    # ---- LJ table from atomtypes ----
    T = len(atomtypes)
    names = [None] * T
    for at in atomtypes.values():
        names[at.index] = at.name
    nbfp = np.zeros((T, T, 2), np.float64)
    for i in range(T):
        for j in range(T):
            nbfp[i, j] = _combine_lj(atomtypes[names[i]], atomtypes[names[j]],
                                     comb_rule)
    for (na, nb_), (v, w) in nb_override.items():
        i, j = atomtypes[na].index, atomtypes[nb_].index
        if comb_rule == 1:
            nbfp[i, j] = nbfp[j, i] = (v, w)
        else:
            nbfp[i, j] = nbfp[j, i] = (4 * w * v ** 6, 4 * w * v ** 12)

    # ---- resolve molecule bodies against the databases ----
    moltypes: Dict[str, MoleculeType] = {}
    for raw in raw_mols.values():
        moltypes[raw.name] = _resolve_molecule(
            raw, atomtypes, db, nbfp, comb_rule, fudge_lj, fudge_qq,
            gen_pairs, cmaptypes)

    return ParsedTop(system_name=system_name, molecules=molecules,
                     moltypes=moltypes, atomtypes=atomtypes,
                     nbfp=nbfp.astype(np.float32), fudge_lj=fudge_lj,
                     fudge_qq=fudge_qq, comb_rule=comb_rule,
                     gen_pairs=gen_pairs, db=db,
                     cmap_grids=(np.stack(cmap_grids)
                                 if cmap_grids else None))


def _resolve_molecule(raw: _RawMol, atomtypes: Dict[str, AtomType],
                      db: BondedDB, nbfp: np.ndarray, comb_rule: int,
                      fudge_lj: float, fudge_qq: float, gen_pairs: bool,
                      cmaptypes: Optional[Dict[Tuple[str, ...], int]] = None
                      ) -> MoleculeType:
    cmaptypes = cmaptypes or {}
    mol = MoleculeType(name=raw.name, types_a=[], charges_a=[], masses_a=[],
                       types_b=[], charges_b=[], masses_b=[],
                       nrexcl=raw.nrexcl)
    mol.atom_names = []
    bt_a, bt_b = [], []            # per-atom bonded-type ids
    type_names_a, type_names_b = [], []
    for (tname, q, m_, tb, qb, mb, aname) in raw.atoms:
        mol.types_a.append(atomtypes[tname].index)
        mol.types_b.append(atomtypes[tb].index)
        mol.charges_a.append(q)
        mol.charges_b.append(qb)
        mol.masses_a.append(m_)
        mol.masses_b.append(mb)
        mol.atom_names.append(aname)
        bt_a.append(db.bt_id(atomtypes[tname].btype))
        bt_b.append(db.bt_id(atomtypes[tb].btype))
        type_names_a.append(tname)
        type_names_b.append(tb)
    mol._type_names = type_names_a     # type: ignore[attr-defined]
    mol._type_names_b = type_names_b   # type: ignore[attr-defined]

    def pert(idx) -> bool:
        """PERTURBED(atom) over any atom of the interaction."""
        return any(mol.types_a[i] != mol.types_b[i]
                   or mol.charges_a[i] != mol.charges_b[i]
                   or mol.masses_a[i] != mol.masses_b[i] for i in idx)

    def warn_bpert(section):
        warnings.warn(
            f"{raw.name}: no default {section} type for perturbed atoms, "
            "using the same parameters for both states "
            "(grompp: toppush.cpp:2233)")

    for (section, funct, idx, vals) in raw.rows:
        if section == "polarization":
            # ai(shell? core?) — GROMACS convention: "ai aj funct alpha"
            # with aj the SHELL (charge[aj] enters k, bonded.cpp:734);
            # our Molecule rows are ((shell, core), (alpha,))
            if funct != 1:
                raise ValueError(f"{raw.name}: polarization funct {funct} "
                                 "unsupported (only simple polarization)")
            mol.polarization.append(((idx[1], idx[0]), (vals[0],)))
            continue
        if section == "orientation_restraints":
            # ai aj funct exp label alpha const obs weight
            # (reference: topology table; orires.cpp init_orires)
            exp, label = int(vals[0]), int(vals[1])
            alpha, const, obs = vals[2], vals[3], vals[4]
            weight = vals[5] if len(vals) > 5 else 1.0
            mol.orires.append(((idx[0], idx[1]),
                               (exp, label, int(alpha), const, obs,
                                weight)))
            continue
        if section == "distance_restraints":
            # ai aj funct type label lo up1 up2 weight
            # (reference: topology section table, disre.cpp init_disres)
            typ, label = int(vals[0]), int(vals[1])
            lo, up1, up2 = vals[2], vals[3], vals[4]
            weight = vals[5] if len(vals) > 5 else 1.0
            if typ not in (1, 2):
                raise ValueError(f"{raw.name}: distance_restraints type "
                                 f"{typ} unsupported")
            mol.disres.append(((idx[0], idx[1]),
                               (lo, up1, up2, weight, float(label))))
            continue
        if section == "cmap":
            # resolve the grid by the 5 atoms' bonded-type names
            # (reference: toppush.cpp push_cmap)
            key = tuple(atomtypes[type_names_a[i]].btype for i in idx)
            hit = cmaptypes.get(key)
            if hit is None:
                raise ValueError(f"{raw.name}: no cmaptype for {key}")
            mol.cmap.append((idx, hit))
            continue
        npA = _NPARAM.get((section, funct))
        if npA is None:
            raise ValueError(f"{section} funct {funct} unsupported")

        if section == "pairs":
            pa = pb = None
            if len(vals) >= 2:
                if comb_rule == 1:
                    pa = (vals[0], vals[1])
                else:
                    pa = (4 * vals[1] * vals[0] ** 6, 4 * vals[1] * vals[0] ** 12)
                pb = pa
                if len(vals) >= 4:
                    if comb_rule == 1:
                        pb = (vals[2], vals[3])
                    else:
                        pb = (4 * vals[3] * vals[2] ** 6,
                              4 * vals[3] * vals[2] ** 12)
            else:
                key_a = db.canon2((bt_a[idx[0]], bt_a[idx[1]]))
                key_b = db.canon2((bt_b[idx[0]], bt_b[idx[1]]))
                hit_a = db.pairs.get(key_a)
                hit_b = db.pairs.get(key_b)
                if hit_a is not None:
                    if comb_rule == 1:
                        pa = (hit_a[0], hit_a[1])
                    else:
                        pa = (4 * hit_a[1] * hit_a[0] ** 6,
                              4 * hit_a[1] * hit_a[0] ** 12)
                elif gen_pairs:
                    # generate from atomtypes, scaled by fudgeLJ
                    # (reference: toppush.cpp generate_nbparams gen-pairs)
                    c6, c12 = _combine_lj(
                        atomtypes[type_names_a[idx[0]]],
                        atomtypes[type_names_a[idx[1]]], comb_rule)
                    pa = (fudge_lj * c6, fudge_lj * c12)
                else:
                    raise ValueError(f"{raw.name}: no pairtype for pair {idx}")
                if hit_b is not None:
                    if comb_rule == 1:
                        pb = (hit_b[0], hit_b[1])
                    else:
                        pb = (4 * hit_b[1] * hit_b[0] ** 6,
                              4 * hit_b[1] * hit_b[0] ** 12)
                elif gen_pairs:
                    c6, c12 = _combine_lj(
                        atomtypes[type_names_b[idx[0]]],
                        atomtypes[type_names_b[idx[1]]], comb_rule)
                    pb = (fudge_lj * c6, fudge_lj * c12)
                else:
                    pb = pa
            mol.pairs_raw.append((idx[0], idx[1], pa, pb))
            continue

        # ---- explicit parameters ----
        if len(vals) >= npA:
            pa = tuple(vals[:npA])
            if len(vals) >= 2 * npA:
                pb = tuple(vals[npA:2 * npA])
            else:
                pb = pa
                if pert(idx) and section != "constraints":
                    warnings.warn(
                        f"{raw.name}: {section} {idx} explicit A-state "
                        "parameters copied to B for perturbed atoms")
            terms = [(pa, pb)]
        else:
            # ---- database lookup (may expand to several funct-9 terms) ----
            terms = _db_lookup(db, section, funct, idx, bt_a, bt_b,
                               pert(idx), raw.name, warn_bpert)

        for pa, pb in terms:
            _store_interaction(mol, section, funct, idx, pa, pb)

    # settles / exclusions / posres / vsites
    mol.settle = raw.settle
    mol.extra_exclusions.extend(raw.exclusions)
    for (ai, ka, kb) in raw.posres:
        # reference position filled at build time from coordinates
        mol.posres.append(((ai,), (0.0, 0.0, 0.0) + ka,
                           (0.0, 0.0, 0.0) + kb))
    for (ai, grk) in raw.fbposres:
        # (geom, r, k); reference position filled at build time
        mol.fbposres.append(((ai,), (grk[0], 0.0, 0.0, 0.0,
                                     grk[1], grk[2])))
    mol.vsites2 = raw.vsites2
    mol.vsites3fd = raw.vsites3fd
    mol.vsites3fad = raw.vsites3fad
    mol.vsites4fdn = raw.vsites4fdn
    mol.vsites3 = raw.vsites3
    mol.vsites3out = raw.vsites3out
    return mol


def _db_lookup(db: BondedDB, section: str, funct: int, idx, bt_a, bt_b,
               perturbed: bool, mol_name: str, warn_bpert):
    """A/B parameter lookup (reference: toppush.cpp:1990-2240 push_bond).
    Returns a list of (pa, pb) terms — len > 1 only for multi-term
    funct-9 dihedraltypes."""
    def one(bt) -> List[Tuple]:
        if section == "bonds":
            hit = db.bonds.get(db.canon2((bt[idx[0]], bt[idx[1]])))
        elif section == "angles":
            hit = db.angles.get(db.canon3((bt[idx[0]], bt[idx[1]],
                                           bt[idx[2]])))
        elif section == "constraints":
            hit = db.constraints.get(db.canon2((bt[idx[0]], bt[idx[1]])))
        elif section == "dihedrals":
            terms = db.lookup_dihedral_terms(_DIH_GROUP[funct],
                                             tuple(bt[i] for i in idx))
            # only funct 9 repeats (toppush.cpp bAllowRepeat)
            return terms if funct == 9 else terms[:1]
        else:
            hit = None
        return [] if hit is None else [hit]

    la = one(bt_a)
    if not la:
        raise ValueError(f"{mol_name}: no default {section} type for atoms "
                         f"{tuple(i + 1 for i in idx)}")
    if perturbed:
        lb = one(bt_b)
        if not lb:
            warn_bpert(section)
            lb = la
        elif len(lb) != len(la):
            raise ValueError(
                f"{mol_name}: perturbed {section} {tuple(i + 1 for i in idx)}"
                f" has {len(la)} A-state but {len(lb)} B-state multiple "
                "terms (reference errors likewise)")
    else:
        lb = la
    return list(zip(la, lb))


def _store_interaction(mol: MoleculeType, section: str, funct: int, idx,
                       pa: Tuple, pb: Tuple):
    def pad(p, n):
        return tuple(p[:n]) + (0.0,) * max(0, n - len(p))

    if section == "bonds":
        if funct == 10:   # flat-bottom restraint bond (F_RESTRBONDS)
            mol.restrbonds.append((idx, pad(pa, 4), pad(pb, 4)))
        else:
            mol.bonds.append((idx, pad(pa, 2), pad(pb, 2)))
    elif section == "angles":
        if funct == 5:
            mol.ub.append((idx, pad(pa, 4), pad(pb, 4)))
        else:
            mol.angles.append((idx, pad(pa, 2), pad(pb, 2)))
    elif section == "dihedrals":
        if funct in (1, 9, 4):
            mol.pdihs.append((idx, pad(pa, 3), pad(pb, 3)))
        elif funct == 2:
            mol.idihs.append((idx, pad(pa, 2), pad(pb, 2)))
        elif funct == 3:
            mol.rbdihs.append((idx, pad(pa, 6), pad(pb, 6)))
    elif section == "constraints":
        # funct 2 generates no exclusions; tracked separately
        la, lb = pa[0], pb[0]
        mol.constraints.append((idx[0], idx[1], la, lb)
                               if funct == 1 else
                               (idx[0], idx[1], la, lb, 2))
    elif section == "dihedral_restraints":
        mol.dihres.append((idx, pad(pa, 3), pad(pb, 3)))
    elif section == "angle_restraints":
        mol.angres.append((idx, pad(pa, 3), pad(pb, 3)))


# ---------------------------------------------------------------------------
# grompp transforms: 1-4 pair resolution, couple-moltype, h-bond constraints
# ---------------------------------------------------------------------------

def _finalize_pairs(mol: MoleculeType, fudge_qq: float):
    """Turn raw pair rows into pairs14 entries with final qq (fudge applied)
    (reference: listed_forces/pairs.cpp F_LJ14 uses fudgeQQ at run time; we
    bake it into the stored parameter)."""
    for (ai, aj, pa, pb) in mol.pairs_raw:
        qa = fudge_qq * mol.charges_a[ai] * mol.charges_a[aj]
        qb = fudge_qq * mol.charges_b[ai] * mol.charges_b[aj]
        mol.pairs14.append(((ai, aj), (qa,) + tuple(pa), (qb,) + tuple(pb)))
    mol.pairs_raw = []


def convert_moltype_couple(mol: MoleculeType, decoupled_type: int,
                           fudge_qq: float, couple_lam0: str,
                           couple_lam1: str, intramol: bool,
                           nbfp: np.ndarray) -> MoleculeType:
    """couple-moltype decoupling (reference: toppush.cpp:2778
    convert_moltype_couple).

    1. 1-4 pairs are frozen: full-strength LJ+Coulomb with the original
       charges, independent of lambda (convert_pairs_to_pairsQ).
    2. couple-intramol=no: every non-excluded intramolecular pair becomes
       an explicit plain pair (original charges/types), and ALL
       intramolecular pairs become exclusions (generate_LJCpairsNB +
       set_excl_all).
    3. decouple_atoms: state A/B charges zeroed and/or types pointed at the
       all-zero decoupled type according to couple_lambda0/1 ('vdw-q',
       'vdw', 'q', 'none': which interactions are ON in that state).
    """
    mol = dataclasses.replace(mol)
    # 1. freeze 1-4 pairs with the pre-decoupling charges
    raw = mol.pairs_raw
    mol.pairs14 = []
    for (ai, aj, pa, pb) in raw:
        qa = fudge_qq * mol.charges_a[ai] * mol.charges_a[aj]
        mol.pairs14.append(((ai, aj), (qa,) + tuple(pa), (qa,) + tuple(pa)))
    mol.pairs_raw = []

    if not intramol:
        # 2. explicit plain pairs for all non-excluded intramolecular pairs
        # (LJC_PAIRS_NB: no fudge factor), then exclude everything
        excl = mol.generate_exclusions()
        n = mol.n_atoms
        for i in range(n):
            for j in range(i + 1, n):
                if j in excl[i]:
                    continue
                qq = mol.charges_a[i] * mol.charges_a[j]
                c6 = float(nbfp[mol.types_a[i], mol.types_a[j], 0])
                c12 = float(nbfp[mol.types_a[i], mol.types_a[j], 1])
                mol.pairs14.append((((i, j)), (qq, c6, c12), (qq, c6, c12)))
        mol.extra_exclusions = list(mol.extra_exclusions) + [
            (i, j) for i in range(n) for j in range(i + 1, n)]

    # 3. decouple atoms
    q_off_a = couple_lam0 in ("none", "vdw")
    v_off_a = couple_lam0 in ("none", "q")
    q_off_b = couple_lam1 in ("none", "vdw")
    v_off_b = couple_lam1 in ("none", "q")
    n = mol.n_atoms
    mol.charges_a = [0.0 if q_off_a else q for q in mol.charges_a]
    mol.types_a = [decoupled_type if v_off_a else t for t in mol.types_a]
    mol.charges_b = [0.0 if q_off_b else q for q in mol.charges_b]
    mol.types_b = [decoupled_type if v_off_b else t for t in mol.types_b]
    return mol


def make_hbond_constraints(mol: MoleculeType, all_bonds: bool = False):
    """constraints = h-bonds/all-bonds: move (hydrogen) bonds into the
    constraint list, using the A/B equilibrium lengths
    (reference: gmxpreprocess/topshake.cpp make_shake; hydrogens are
    identified by atom names starting with 'H', topshake.cpp:55)."""
    names = getattr(mol, "atom_names", None)
    keep = []
    for (idx, pa, pb) in mol.bonds:
        i, j = idx
        is_h = all_bonds or (names is not None and (
            names[i].upper().startswith("H") or names[j].upper().startswith("H")))
        if is_h:
            mol.constraints.append((i, j, pa[0], pb[0]))
        else:
            keep.append((idx, pa, pb))
    mol.bonds = keep


def decouple_moltype(mol: MoleculeType, atomtypes: Dict[str, AtomType],
                     nbfp: np.ndarray, vdw: bool = True, coul: bool = True
                     ) -> Tuple[MoleculeType, np.ndarray]:
    """Back-compat helper: full decoupling (A = on, B = off)."""
    T = nbfp.shape[0]
    nbfp2 = np.zeros((T + 1, T + 1, 2), np.float32)
    nbfp2[:T, :T] = nbfp
    lam1 = "none" if (vdw and coul) else ("q" if vdw else "vdw")
    mol2 = convert_moltype_couple(mol, T, 1.0, "vdw-q", lam1, True, nbfp)
    return mol2, nbfp2


def system_from_top(text: str, include_dirs: Optional[List[str]] = None,
                    couple_moltype: Optional[str] = None,
                    couple_lam0: str = "vdw-q", couple_lam1: str = "none",
                    couple_intramol: bool = True,
                    constraints: str = "none",
                    defines: Optional[Dict[str, str]] = None,
                    epsilon_r: float = 1.0) -> System:
    """Parse + grompp transforms -> flat System.

    Defaults preserve the historical behavior: `couple_moltype=name` alone
    decouples the molecule fully in the B state (lambda0 = coupled).
    """
    parsed = parse_top(text, include_dirs, defines)
    nbfp = parsed.nbfp
    mols = []
    decoupled_type = None
    if couple_moltype is not None:
        T = nbfp.shape[0]
        nbfp2 = np.zeros((T + 1, T + 1, 2), np.float32)
        nbfp2[:T, :T] = nbfp
        nbfp = nbfp2
        decoupled_type = T
    for name, count in parsed.molecules:
        mol = parsed.moltypes[name]
        if couple_moltype is not None and name == couple_moltype:
            mol = convert_moltype_couple(
                mol, decoupled_type, parsed.fudge_qq, couple_lam0,
                couple_lam1, couple_intramol, parsed.nbfp)
        else:
            mol = dataclasses.replace(mol)
            mol.pairs14 = list(mol.pairs14)
            mol.pairs_raw = list(mol.pairs_raw)
            _finalize_pairs(mol, parsed.fudge_qq)
        if constraints in ("h-bonds", "all-bonds"):
            mol.bonds = list(mol.bonds)
            mol.constraints = list(mol.constraints)
            make_hbond_constraints(mol, all_bonds=constraints == "all-bonds")
        mols.append((mol, count))
    return build_system(mols, nbfp, fudge_qq=1.0, epsilon_r=epsilon_r,
                        cmap_grids=parsed.cmap_grids)
