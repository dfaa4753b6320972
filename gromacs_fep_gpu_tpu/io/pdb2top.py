"""pdb2gmx-lite: protein topology generation from force-field residue
databases.

Reference: src/gromacs/gmxpreprocess/pdb2gmx.cpp + pdb2top.cpp +
gen_ad.cpp (angle/dihedral generation) + resall.cpp (.rtp parsing) +
xlate.cpp (.arn renaming).  Scope: H-complete input structures (no
.hdb hydrogen building), termini via the force field's dedicated
N-/C-terminal rtp building blocks (the Amber convention, .r2b columns
2-4), HIS protonation state inferred from the hydrogens present.
Charmm-style interactive tdb terminus patching and cmap lookup are out
of scope here (CHARMM topologies still run through grompp when written
by stock pdb2gmx).

The generated .top contains parameterless bonded lines (funct only) —
exactly like the reference's output — so the force-field type
databases (ffbonded.itp, resolved by io/topio.py at grompp time)
supply the actual parameters.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# residues recognized as water/ions in input structures (skipped with a
# notice rather than built into the protein moleculetype)
_SKIP_RES = {"HOH", "SOL", "WAT", "NA", "CL", "K", "MG", "CA2", "ZN"}


@dataclasses.dataclass
class BondedTypes:
    """[ bondedtypes ] header (resall.cpp read_resall)."""
    bonds: int = 1
    angles: int = 1
    dihedrals: int = 9
    impropers: int = 4
    all_dihedrals: int = 1
    nrexcl: int = 3
    hh14: int = 1
    remove_dih: int = 0


@dataclasses.dataclass
class RtpResidue:
    name: str
    atoms: List[Tuple[str, str, float, int]]   # name, type, charge, cgnr
    bonds: List[Tuple[str, str]]
    impropers: List[Tuple[str, str, str, str]]
    dihedrals: List[Tuple[str, str, str, str]]
    exclusions: List[Tuple[str, str]]


def parse_rtp(text: str) -> Tuple[BondedTypes, Dict[str, RtpResidue]]:
    bt = BondedTypes()
    residues: Dict[str, RtpResidue] = {}
    cur: Optional[RtpResidue] = None
    section = None
    for raw in text.splitlines():
        line = raw.split(";")[0].strip()
        if not line:
            continue
        if line.startswith("[") and line.endswith("]"):
            tag = line[1:-1].strip()
            if tag == "bondedtypes":
                cur = None
                section = "bondedtypes"
            elif tag in ("atoms", "bonds", "angles", "dihedrals",
                         "impropers", "exclusions", "cmap"):
                section = tag
            else:
                cur = RtpResidue(tag, [], [], [], [], [])
                residues[tag] = cur
                section = None
            continue
        t = line.split()
        if section == "bondedtypes":
            vals = [int(v) for v in t[:8]]
            bt = BondedTypes(*vals + [getattr(BondedTypes(), f.name)
                                      for f in dataclasses.fields(
                                          BondedTypes)][len(vals):])
            section = None
        elif cur is None:
            continue
        elif section == "atoms":
            cur.atoms.append((t[0], t[1], float(t[2]),
                              int(t[3]) if len(t) > 3 else 0))
        elif section == "bonds":
            cur.bonds.append((t[0], t[1]))
        elif section == "impropers":
            cur.impropers.append(tuple(t[:4]))
        elif section == "dihedrals":
            cur.dihedrals.append(tuple(t[:4]))
        elif section == "exclusions":
            cur.exclusions.append((t[0], t[1]))
    return bt, residues


def parse_atp(text: str) -> Dict[str, float]:
    out = {}
    for raw in text.splitlines():
        line = raw.split(";")[0].strip()
        if line:
            t = line.split()
            out[t[0]] = float(t[1])
    return out


def parse_r2b(text: str) -> Dict[str, Tuple[str, str, str, str]]:
    """GMX residue name -> (main, n-ter, c-ter, 2-ter) building blocks
    ('-' = no dedicated block)."""
    out = {}
    for raw in text.splitlines():
        line = raw.split(";")[0].strip()
        if line:
            t = line.split()
            row = (t[1:] + ["-"] * 4)[:4] if len(t) > 1 else ["-"] * 4
            out[t[0]] = tuple(row)
    return out


def parse_arn(text: str) -> Dict[Tuple[str, str], str]:
    """(residue-block-pattern, gromacs name) -> forcefield name."""
    out = {}
    for raw in text.splitlines():
        line = raw.split(";")[0].strip()
        if line:
            t = line.split()
            if len(t) >= 3:
                out[(t[0], t[1])] = t[2]
    return out


def parse_xlate(text: str) -> Dict[Tuple[str, str], str]:
    """share/top/xlateat.dat: (context, from) -> to, where context is a
    residue name or protein / protein-nterm / protein-cterm
    (reference: gmxpreprocess/xlate.cpp)."""
    out = {}
    for raw in text.splitlines()[1:]:      # first line = row count
        line = raw.split(";")[0].strip()
        if line:
            t = line.split()
            if len(t) >= 3:
                out[(t[0], t[1])] = t[2]
    return out


def parse_hdb(text: str) -> Dict[str, List[Tuple[int, int, str, List[str]]]]:
    """Hydrogen database: residue/block name -> list of
    (nh, geometry type, name prefix, control atom names)
    (reference: gmxpreprocess/h_db.cpp read_h_db)."""
    out: Dict[str, List[Tuple[int, int, str, List[str]]]] = {}
    lines = [ln.split(";")[0].rstrip() for ln in text.splitlines()]
    i = 0
    while i < len(lines):
        if not lines[i].strip():
            i += 1
            continue
        t = lines[i].split()
        res, nblocks = t[0], int(t[1])
        entries = []
        for _ in range(nblocks):
            i += 1
            t = lines[i].split()
            entries.append((int(t[0]), int(t[1]), t[2], t[3:]))
        out[res] = entries
        i += 1
    return out


# water-hydrogen direction table (reference: calch.cpp gen_waterhydrogen,
# "copied from Gromos"); cycled by the l counter so neighboring waters
# don't all point the same way
_WAT_A, _WAT_C = 0.081649, 0.0577350
_WAT_M1 = np.array([[_WAT_A, 0, _WAT_C]] * 3 + [[-_WAT_A, 0, _WAT_C]] * 2
                   + [[0, _WAT_A, -_WAT_C]])
_WAT_M2 = np.array([[-_WAT_A, 0, _WAT_C], [0, _WAT_A, -_WAT_C],
                    [0, -_WAT_A, -_WAT_C], [0, _WAT_A, -_WAT_C],
                    [0, -_WAT_A, -_WAT_C], [0, -_WAT_A, -_WAT_C]])


def _unit(v):
    return v / np.linalg.norm(v)


def calc_h_pos(tp: int, nh: int, xa: np.ndarray, l: int
               ) -> Tuple[List[np.ndarray], int]:
    """Construct hydrogen (or missing heavy-atom) positions for one hdb
    entry.  xa rows = control atoms i[,j,k,l]; returns (positions, l').
    Geometry rules re-derived from gmxpreprocess/calch.cpp:91
    calc_h_pos (behavioral spec, not a copy): distances 0.1 nm (H),
    tetrahedral angle acos(-1/3), planar 120 deg."""
    alfa_h = np.arccos(-1.0 / 3.0)
    alfa_pl = 2.0 * np.pi / 3.0
    d_h = 0.1
    xi = xa[0]

    if tp in (2, 3, 4, 8, 9):
        # local orthonormal frame: sij along (i-j), sa normal to the
        # i-j-k plane, sb completing the triad
        sij = _unit(xa[0] - xa[1])
        sa = _unit(np.cross(xa[0] - xa[1], xa[1] - xa[2]))
        sb = np.cross(sa, sij)

    if tp == 1:      # one planar H on the j-i-k bisector (peptide N-H)
        return [xi + d_h * _unit(_unit(xa[0] - xa[1])
                                 + _unit(xa[0] - xa[2]))], l
    if tp == 2:      # one dihedral H (hydroxyl), anti to k
        return [xi + d_h * np.sin(alfa_h) * sb
                - d_h * np.cos(alfa_h) * sij], l
    if tp == 3:      # two planar H (amide/arginine NH2)
        return [xi - d_h * np.sin(alfa_pl) * sb - d_h * np.cos(alfa_pl) * sij,
                xi + d_h * np.sin(alfa_pl) * sb
                - d_h * np.cos(alfa_pl) * sij], l
    if tp == 4:      # two or three tetrahedral H (-CH3)
        s6 = 0.5 * np.sqrt(3.0)
        base = xi - d_h * np.cos(alfa_h) * sij
        out = [base + d_h * np.sin(alfa_h) * sb,
               base - d_h * np.sin(alfa_h) * 0.5 * sb
               + d_h * np.sin(alfa_h) * s6 * sa]
        if nh > 2:
            out.append(base - d_h * np.sin(alfa_h) * 0.5 * sb
                       - d_h * np.sin(alfa_h) * s6 * sa)
        return out, l
    if tp == 5:      # one tetrahedral H opposite the j/k/l centroid
        return [xi + d_h * _unit(xi - (xa[1] + xa[2] + xa[3]) / 3.0)], l
    if tp == 6:      # two tetrahedral H (C-CH2-C)
        r_bb = _unit(xi - 0.5 * (xa[1] + xa[2]))
        r_nn = _unit(np.cross(xi - xa[1], xi - xa[2]))
        c, s = np.cos(alfa_h / 2.0), np.sin(alfa_h / 2.0)
        return [xi + d_h * (c * r_bb + s * r_nn),
                xi + d_h * (c * r_bb - s * r_nn)], l
    if tp in (7, 10, 11):   # water hydrogens from the Gromos table
        out = [xi + _WAT_M1[l], xi + _WAT_M2[l]]
        while len(out) < nh:
            out.append(xi.copy())     # dummy/vsite slots sit on the O
        return out, (l + 1) % 6
    if tp == 8:      # two carboxylate oxygens -COO-
        d_om, a_om = 0.136, np.deg2rad(117.0)
        return [xi - d_om * np.sin(a_om) * sb - d_om * np.cos(a_om) * sij,
                xi + d_om * np.sin(a_om) * sb
                - d_om * np.cos(a_om) * sij], l
    if tp == 9:      # carboxyl -COOH: =O, -O, then H on the -O by rule 2
        d_o, a_o = 0.123, np.deg2rad(121.0)
        d_oa, a_oa = 0.125, np.deg2rad(115.0)
        o1 = xi - d_o * np.sin(a_o) * sb - d_o * np.cos(a_o) * sij
        o2 = xi + d_oa * np.sin(a_oa) * sb - d_oa * np.cos(a_oa) * sij
        hs, l = calc_h_pos(2, 1, np.stack([o2, xi, xa[1]]), l)
        return [o1, o2, hs[0]], l
    raise Pdb2TopError(f"hdb geometry type {tp} not supported")


def _his_block(atom_names: Sequence[str]) -> str:
    """HIS protonation state from the hydrogens present
    (pdb2gmx.cpp HIS logic)."""
    has_d = "HD1" in atom_names
    has_e = "HE2" in atom_names
    if has_d and has_e:
        return "HIP"
    if has_d:
        return "HID"
    return "HIE"


class Pdb2TopError(ValueError):
    pass


def load_forcefield(ff_dir: str):
    """Parse the residue databases of one <name>.ff directory."""
    def rd(fname):
        p = os.path.join(ff_dir, fname)
        return open(p).read() if os.path.exists(p) else ""
    bt, residues = parse_rtp(rd("aminoacids.rtp"))
    masses = parse_atp(rd("atomtypes.atp"))
    r2b = parse_r2b(rd("aminoacids.r2b"))
    arn = parse_arn(rd("aminoacids.arn"))
    xl_path = os.path.join(os.path.dirname(ff_dir), "xlateat.dat")
    xlate = (parse_xlate(open(xl_path).read())
             if os.path.exists(xl_path) else {})
    return bt, residues, masses, r2b, arn, xlate


def group_residues(resnames: Sequence[str], resids: Sequence[int]):
    """[(resname, resid, [atom indices])] in order."""
    out = []
    for i, (rn, rid) in enumerate(zip(resnames, resids)):
        if out and out[-1][1] == rid and out[-1][0] == rn.strip():
            out[-1][2].append(i)
        else:
            out.append([rn.strip(), rid, [i]])
    return out


def _choose_blocks(groups, names, residues, r2b, ff_dir: str) -> List[str]:
    """rtp building block per residue (r2b + termini columns + HIS)."""
    blocks = []
    for pos, (rn, rid, idx) in enumerate(groups):
        res_atoms = [names[i].strip() for i in idx]
        base = rn
        if rn == "HIS":
            base = _his_block(res_atoms)
        row = r2b.get(base, (base, "-", "-", "-"))
        main = row[0] if row[0] != "-" else base
        if pos == 0 and len(groups) > 1:
            block = row[1] if row[1] != "-" else "N" + main
        elif pos == len(groups) - 1 and len(groups) > 1:
            block = row[2] if row[2] != "-" else "C" + main
        else:
            block = main
        if block not in residues and main in residues:
            block = main          # no dedicated terminal block
        if block not in residues:
            raise Pdb2TopError(f"residue {rn} (rtp block {block}) not in "
                               f"{ff_dir}")
        blocks.append(block)
    return blocks


def _translate_name(nm: str, rn: str, block: str, pos: int, ngroups: int,
                    arn, xlate) -> str:
    """PDB atom name -> force-field name: global xlateat.dat first
    (PDB variants -> gromacs), then the force field's .arn."""
    contexts = [rn, block]
    if pos == 0:
        contexts.append("protein-nterm")
    if pos == ngroups - 1:
        contexts.append("protein-cterm")
    contexts.append("protein")
    for ctx in contexts:
        if (ctx, nm) in xlate:
            nm = xlate[(ctx, nm)]
            break
    return arn.get((block, nm), arn.get((rn, nm), nm))


def build_protein_top(names, resnames, resids, ff_dir: str):
    """Returns (TopologyData, atom order permutation) for the protein
    chain; raises Pdb2TopError on unmatched residues/atoms."""
    bt, residues, masses, r2b, arn, xlate = load_forcefield(ff_dir)
    groups = [g for g in group_residues(resnames, resids)
              if g[0] not in _SKIP_RES]
    if not groups:
        raise Pdb2TopError("no protein residues found")

    blocks = _choose_blocks(groups, names, residues, r2b, ff_dir)

    # match + reorder atoms to rtp order (pdb2top.cpp atom sorting)
    order: List[int] = []
    atom_rows = []                 # (type, resid, resname, name, charge)
    res_atom_index: List[Dict[str, int]] = []
    for pos, ((rn, rid, idx), block) in enumerate(zip(groups, blocks)):
        rtp = residues[block]
        have = {}
        for i in idx:
            nm_ff = _translate_name(names[i].strip(), rn, block, pos,
                                    len(groups), arn, xlate)
            have[nm_ff] = i
        table = {}
        for (anm, atype, q, _cg) in rtp.atoms:
            if anm not in have:
                raise Pdb2TopError(
                    f"residue {rn}{rid} (rtp {block}): atom {anm} "
                    f"missing from the structure (H-complete input "
                    f"required; available: {sorted(have)})")
            table[anm] = len(order)
            order.append(have[anm])
            atom_rows.append((atype, rid, rn, anm, q,
                              masses.get(atype, 0.0)))
        extra = set(have) - {a[0] for a in rtp.atoms}
        if extra:
            raise Pdb2TopError(f"residue {rn}{rid}: unknown atoms "
                               f"{sorted(extra)} for rtp block {block}")
        res_atom_index.append(table)

    def resolve(res_i: int, name: str) -> Optional[int]:
        """rtp name with -/+ prefixes -> global atom index."""
        if name.startswith("-"):
            return (res_atom_index[res_i - 1].get(name[1:])
                    if res_i > 0 else None)
        if name.startswith("+"):
            return (res_atom_index[res_i + 1].get(name[1:])
                    if res_i + 1 < len(res_atom_index) else None)
        return res_atom_index[res_i].get(name)

    # bonds
    bonds = set()
    for ri, block in enumerate(blocks):
        for a, b in residues[block].bonds:
            ia, ib = resolve(ri, a), resolve(ri, b)
            if ia is None or ib is None:
                continue           # dangling terminal -C/+N
            bonds.add((min(ia, ib), max(ia, ib)))
    bonds = sorted(bonds)
    nbrs: Dict[int, set] = {}
    for a, b in bonds:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)

    # angles: every bonded triple (gen_ad.cpp gen_angles)
    angles = set()
    for j in nbrs:
        ns = sorted(nbrs[j])
        for ii in range(len(ns)):
            for kk in range(ii + 1, len(ns)):
                angles.add((ns[ii], j, ns[kk]))
    angles = sorted(angles)

    # proper dihedrals: every quartet around every central bond,
    # canonical direction = lexicographically smaller orientation
    dihedrals = set()
    for (j, k) in bonds:
        for i in nbrs[j] - {k}:
            for l in nbrs[k] - {j}:
                if i == l:
                    continue
                dihedrals.add(min((i, j, k, l), (l, k, j, i)))
    # explicit rtp dihedrals are appended (rare in amber)
    for ri, block in enumerate(blocks):
        for quad in residues[block].dihedrals:
            ids = [resolve(ri, nm) for nm in quad]
            if None not in ids:
                dihedrals.add(tuple(ids))
    dihedrals = sorted(dihedrals)

    # impropers from the rtp entries
    impropers = []
    for ri, block in enumerate(blocks):
        for quad in residues[block].impropers:
            ids = [resolve(ri, nm) for nm in quad]
            if None not in ids:
                impropers.append(tuple(ids))

    # 1-4 pairs: graph distance exactly 3 (gen_ad.cpp gen_pad); HH14
    # controls hydrogen-hydrogen pairs
    excl12 = set(bonds)
    excl13 = {(min(a, c), max(a, c)) for (a, b, c) in angles}
    pairs = set()
    is_h = [atom_rows[i][5] < 3.5 for i in range(len(atom_rows))]
    for (i, j, k, l) in dihedrals:
        p = (min(i, l), max(i, l))
        if p in excl12 or p in excl13 or p[0] == p[1]:
            continue
        if not bt.hh14 and is_h[p[0]] and is_h[p[1]]:
            continue
        pairs.add(p)
    pairs = sorted(pairs)

    return {
        "bondedtypes": bt,
        "atoms": atom_rows,
        "bonds": bonds,
        "pairs": pairs,
        "angles": angles,
        "dihedrals": dihedrals,
        "impropers": impropers,
        "order": order,
        "blocks": blocks,
        "groups": groups,
    }


def _is_hydrogen_name(nm: str) -> bool:
    """PDB-convention hydrogen: first alphabetic character is H
    (handles 1HB2-style names; reference: pdb2gmx.cpp is_hydrogen)."""
    s = nm.strip().lstrip("0123456789")
    return bool(s) and s[0].upper() == "H"


def add_missing_atoms(names, resnames, resids, x, ff_dir: str,
                      ignh: bool = False):
    """Build missing hydrogens (and hdb-listed heavy atoms like the
    C-terminal OC1) from the force field's .hdb geometry database
    (reference: gmxpreprocess/genhydro.cpp add_h + calch.cpp).

    Returns (names, resnames, resids, x, n_added) with the built atoms
    appended at the end of their residue; pass the result through
    build_protein_top, which reorders everything into rtp order.  With
    ignh=True all input hydrogens are dropped first and regenerated
    (the -ignh flag of the reference)."""
    bt, residues, masses, r2b, arn, xlate = load_forcefield(ff_dir)
    hdb_path = os.path.join(ff_dir, "aminoacids.hdb")
    hdb = (parse_hdb(open(hdb_path).read())
           if os.path.exists(hdb_path) else {})
    x = np.asarray(x, np.float64)

    if ignh:
        keep = [i for i in range(len(names))
                if not _is_hydrogen_name(names[i])]
        names = [names[i] for i in keep]
        resnames = [resnames[i] for i in keep]
        resids = [resids[i] for i in keep]
        x = x[keep]

    all_groups = group_residues(resnames, resids)
    prot = [g for g in all_groups if g[0] not in _SKIP_RES]
    if not prot:
        return list(names), list(resnames), list(resids), x, 0
    blocks = _choose_blocks(prot, names, residues, r2b, ff_dir)

    # translated-name lookup per protein residue (hdb control atoms are
    # written in force-field naming)
    tables: List[Dict[str, int]] = []
    for pos, ((rn, rid, idx), block) in enumerate(zip(prot, blocks)):
        tables.append({_translate_name(names[i].strip(), rn, block, pos,
                                       len(prot), arn, xlate): i
                       for i in idx})

    def ctrl(pos: int, nm: str) -> Optional[int]:
        if nm.startswith("-"):
            return tables[pos - 1].get(nm[1:]) if pos > 0 else None
        if nm.startswith("+"):
            return (tables[pos + 1].get(nm[1:])
                    if pos + 1 < len(tables) else None)
        return tables[pos].get(nm)

    added: List[Tuple[int, str, np.ndarray]] = []   # (insert-after, name, x)
    l_state = 0
    for pos, ((rn, rid, idx), block) in enumerate(zip(prot, blocks)):
        rtp_names = {a[0] for a in residues[block].atoms}
        for (nh, tp, prefix, ctrls) in (hdb.get(block) or hdb.get(rn) or []):
            targets = ([prefix] if nh == 1 else
                       [f"{prefix}{k + 1}" for k in range(nh)])
            # only build atoms this rtp block actually wants
            missing = [t for t in targets
                       if t in rtp_names and t not in tables[pos]]
            if not missing:
                continue
            ctrl_idx = [ctrl(pos, c) for c in ctrls]
            if any(c is None for c in ctrl_idx):
                bad = [c for c, ci in zip(ctrls, ctrl_idx) if ci is None]
                raise Pdb2TopError(
                    f"residue {rn}{rid}: cannot construct {missing} — "
                    f"control atoms {bad} missing from the structure")
            xa = x[np.asarray(ctrl_idx)]
            pts, l_state = calc_h_pos(tp, nh, xa, l_state)
            anchor = max(idx)
            for t, p in zip(targets, pts):
                if t in missing:
                    added.append((anchor, t, p))

    if not added:
        return list(names), list(resnames), list(resids), x, 0

    # splice the built atoms in right after their residue's last atom
    by_anchor: Dict[int, List[Tuple[str, np.ndarray]]] = {}
    for anchor, t, p in added:
        by_anchor.setdefault(anchor, []).append((t, p))
    out_n, out_rn, out_rid, out_x = [], [], [], []
    for i in range(len(names)):
        out_n.append(names[i])
        out_rn.append(resnames[i])
        out_rid.append(resids[i])
        out_x.append(x[i])
        for (t, p) in by_anchor.get(i, ()):
            out_n.append(t)
            out_rn.append(resnames[i])
            out_rid.append(resids[i])
            out_x.append(p)
    return out_n, out_rn, out_rid, np.asarray(out_x), len(added)


def write_top(top: dict, ff_include: str, system_name: str = "Protein",
              molname: str = "Protein",
              posres_fc: float = 1000.0) -> str:
    """Render the standalone .top text (pdb2top.cpp print_top)."""
    bt: BondedTypes = top["bondedtypes"]
    lines = [
        "; Generated by tpumd pdb2gmx "
        "(reference: gmxpreprocess/pdb2top.cpp)",
        "",
        "; Include forcefield parameters",
        f'#include "{ff_include}"',
        "",
        "[ moleculetype ]",
        "; Name            nrexcl",
        f"{molname}             {bt.nrexcl}",
        "",
        "[ atoms ]",
        ";   nr  type  resnr residue  atom  cgnr  charge    mass",
    ]
    qtot = 0.0
    for n, (atype, rid, rn, anm, q, m) in enumerate(top["atoms"], 1):
        qtot += q
        lines.append(f"{n:6d} {atype:>6s} {rid:6d} {rn:>6s} {anm:>6s} "
                     f"{n:6d} {q:9.4f} {m:9.4f}")
    lines += ["", "[ bonds ]"]
    for a, b in top["bonds"]:
        lines.append(f"{a + 1:6d} {b + 1:6d}     {bt.bonds}")
    lines += ["", "[ pairs ]"]
    for a, b in top["pairs"]:
        lines.append(f"{a + 1:6d} {b + 1:6d}     1")
    lines += ["", "[ angles ]"]
    for a, b, c in top["angles"]:
        lines.append(f"{a + 1:6d} {b + 1:6d} {c + 1:6d}     {bt.angles}")
    lines += ["", "[ dihedrals ]"]
    for a, b, c, d in top["dihedrals"]:
        lines.append(f"{a + 1:6d} {b + 1:6d} {c + 1:6d} {d + 1:6d}     "
                     f"{bt.dihedrals}")
    lines += ["", "[ dihedrals ]"]
    for a, b, c, d in top["impropers"]:
        lines.append(f"{a + 1:6d} {b + 1:6d} {c + 1:6d} {d + 1:6d}     "
                     f"{bt.impropers}")
    lines += ["", "#ifdef POSRES", "[ position_restraints ]"]
    for n, (atype, rid, rn, anm, q, m) in enumerate(top["atoms"], 1):
        if m > 3.5:
            lines.append(f"{n:6d}  1  {posres_fc:g} {posres_fc:g} "
                         f"{posres_fc:g}")
    lines += ["#endif", "", "[ system ]", system_name, "",
              "[ molecules ]", f"{molname}  1", ""]
    return "\n".join(lines)
