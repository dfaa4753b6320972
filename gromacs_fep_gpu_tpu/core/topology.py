"""Host-side topology construction — the grompp-lite layer.

Builds a flat, padded, device-ready System from molecule templates
(reference: src/gromacs/gmxpreprocess/grompp.cpp compiles .top text into
gmx_mtop_t; here molecule types are declared programmatically or parsed
from .top subset by io/topio.py, then replicated and flattened).

Exclusions are generated from the bond graph out to `nrexcl` bonds
(reference: gmxpreprocess/gen_ad.cpp / topology exclusion blocks).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from .types import (CmapList, Exclusions, InteractionList, LincsConstraints,
                    SettleGroups, ShellList, System, VirtualSites)
from .units import ONE_4PI_EPS0


@dataclasses.dataclass
class MoleculeType:
    """One molecule template with optional B (perturbed) state."""
    name: str
    # per-atom
    types_a: List[int]
    charges_a: List[float]
    masses_a: List[float]
    types_b: Optional[List[int]] = None
    charges_b: Optional[List[float]] = None
    masses_b: Optional[List[float]] = None
    # interactions: (atom indices, params_a, params_b); params_b=None => =A
    bonds: List[Tuple] = dataclasses.field(default_factory=list)
    angles: List[Tuple] = dataclasses.field(default_factory=list)
    ub: List[Tuple] = dataclasses.field(default_factory=list)
    pdihs: List[Tuple] = dataclasses.field(default_factory=list)
    rbdihs: List[Tuple] = dataclasses.field(default_factory=list)
    idihs: List[Tuple] = dataclasses.field(default_factory=list)
    posres: List[Tuple] = dataclasses.field(default_factory=list)
    dihres: List[Tuple] = dataclasses.field(default_factory=list)
    angres: List[Tuple] = dataclasses.field(default_factory=list)
    restrbonds: List[Tuple] = dataclasses.field(default_factory=list)
    # NMR distance restraints: ((ai, aj), (lo, up1, up2, weight, label))
    disres: List[Tuple] = dataclasses.field(default_factory=list)
    # flat-bottom posres: ((ai,), (geom, x0, y0, z0, r, k))
    fbposres: List[Tuple] = dataclasses.field(default_factory=list)
    pairs14: List[Tuple] = dataclasses.field(default_factory=list)
    # unresolved 1-4 pair rows (ai, aj, (c6,c12)A, (c6,c12)B); consumed by
    # the grompp transforms in io/topio.py which bake charges+fudge in
    pairs_raw: List[Tuple] = dataclasses.field(default_factory=list)
    # constraints
    settle: Optional[Tuple[int, int, int, float, float]] = None  # (O,H1,H2,dOH,dHH)
    # additional settle groups (a molecule type holding many waters,
    # e.g. a whole-system moltype written by io/tprwrite.py)
    settles: List[Tuple] = dataclasses.field(default_factory=list)
    constraints: List[Tuple] = dataclasses.field(default_factory=list)  # (i,j,lenA[,lenB])
    # virtual sites: (indices tuple, params tuple); see md/vsites.py kinds
    vsites2: List[Tuple] = dataclasses.field(default_factory=list)   # ((s,i,j),(a,))
    vsites3: List[Tuple] = dataclasses.field(default_factory=list)   # ((s,i,j,k),(a,b))
    vsites3out: List[Tuple] = dataclasses.field(default_factory=list)  # ((s,i,j,k),(a,b,c))
    vsites3fd: List[Tuple] = dataclasses.field(default_factory=list)   # ((s,i,j,k),(a,d))
    vsites3fad: List[Tuple] = dataclasses.field(default_factory=list)  # ((s,i,j,k),(dcos,dsin))
    vsites4fdn: List[Tuple] = dataclasses.field(default_factory=list)  # ((s,i,j,k,l),(a,b,c))
    # CMAP cross terms: (idx5 tuple, grid type index)
    cmap: List[Tuple] = dataclasses.field(default_factory=list)
    # orientation restraints: ((ai, aj), (exp, label, power, c, obs, w))
    orires: List[Tuple] = dataclasses.field(default_factory=list)
    # polarizable shells: ((shell, core), (alpha,)) — the [ polarization ]
    # section; spring k derived from the shell charge at build time
    # (reference: listed_forces/bonded.cpp:709 polarize)
    polarization: List[Tuple] = dataclasses.field(default_factory=list)
    # explicit extra exclusions beyond bond graph
    extra_exclusions: List[Tuple[int, int]] = dataclasses.field(default_factory=list)
    nrexcl: int = 3
    # per-atom names (for h-bond constraint detection); optional
    atom_names: Optional[List[str]] = None

    @property
    def n_atoms(self) -> int:
        return len(self.types_a)

    def bond_graph_edges(self) -> List[Tuple[int, int]]:
        edges = [(int(b[0][0]), int(b[0][1])) for b in self.bonds]
        # core-shell springs exclude the pair from nonbonded interactions
        # exactly like a chemical bond (reference: grompp exclusion
        # generation treats F_POLARIZATION as a bond)
        edges += [(int(r[0][0]), int(r[0][1])) for r in self.polarization]
        # constraints funct 2 (5-tuple marker) generate no exclusions
        # (reference: toppush.cpp push_bond bGenerateExclusions for F_CONSTR)
        edges += [(int(c[0]), int(c[1])) for c in self.constraints
                  if len(c) <= 4]
        # virtual sites inherit connectivity from their first constructor
        for row in (self.vsites2 + self.vsites3 + self.vsites3out
                    + self.vsites3fd + self.vsites3fad + self.vsites4fdn):
            edges.append((int(row[0][0]), int(row[0][1])))
        for st in ([self.settle] if self.settle is not None else []) \
                + list(self.settles):
            o, h1, h2 = st[:3]
            edges += [(o, h1), (o, h2), (h1, h2)]
        return edges

    def generate_exclusions(self) -> List[set]:
        """All atom pairs within nrexcl bonds, plus extras, plus settle."""
        n = self.n_atoms
        adj = [set() for _ in range(n)]
        for i, j in self.bond_graph_edges():
            adj[i].add(j)
            adj[j].add(i)
        excl = [set() for _ in range(n)]
        for i in range(n):
            frontier = {i}
            seen = {i}
            for _ in range(self.nrexcl):
                frontier = set().union(*(adj[a] for a in frontier)) - seen
                seen |= frontier
            excl[i] = seen - {i}
        for i, j in self.extra_exclusions:
            excl[i].add(j)
            excl[j].add(i)
        return excl


def lj_table_from_types(c6: Sequence[float], c12: Sequence[float],
                        comb_rule: int = 1) -> np.ndarray:
    """(T, T, 2) pairwise c6/c12 table from per-type values
    (reference: gmxpreprocess/convparm.cpp; comb rule 1 = geometric c6/c12)."""
    c6 = np.asarray(c6, np.float64)
    c12 = np.asarray(c12, np.float64)
    if comb_rule == 1:
        t6 = np.sqrt(c6[:, None] * c6[None, :])
        t12 = np.sqrt(c12[:, None] * c12[None, :])
    else:
        raise NotImplementedError("use sigma/eps helper for comb rule 2/3")
    return np.stack([t6, t12], axis=-1).astype(np.float32)


def lj_table_from_sigma_eps(sigma: Sequence[float], eps: Sequence[float],
                            comb_rule: int = 2) -> np.ndarray:
    sigma = np.asarray(sigma, np.float64)
    eps = np.asarray(eps, np.float64)
    if comb_rule == 2:   # Lorentz-Berthelot
        sij = 0.5 * (sigma[:, None] + sigma[None, :])
        eij = np.sqrt(eps[:, None] * eps[None, :])
    elif comb_rule == 3:  # geometric on sigma and eps
        sij = np.sqrt(sigma[:, None] * sigma[None, :])
        eij = np.sqrt(eps[:, None] * eps[None, :])
    else:
        raise ValueError(comb_rule)
    s6 = sij**6
    c6 = 4.0 * eij * s6
    c12 = 4.0 * eij * s6 * s6
    return np.stack([c6, c12], axis=-1).astype(np.float32)


def _pad_rows(rows: List[Tuple], k: int, p: int, pad_to: Optional[int] = None
              ) -> InteractionList:
    n = len(rows)
    cap = n if pad_to is None else max(pad_to, n)
    atoms = np.zeros((cap, k), np.int32)
    pa = np.zeros((cap, p), np.float32)
    pb = np.zeros((cap, p), np.float32)
    mask = np.zeros((cap,), np.float32)
    for r, row in enumerate(rows):
        idx, par_a, par_b = row
        atoms[r] = idx
        pa[r] = par_a
        pb[r] = par_a if par_b is None else par_b
        mask[r] = 1.0
    return InteractionList(atoms=jnp.asarray(atoms), params_a=jnp.asarray(pa),
                           params_b=jnp.asarray(pb), mask=jnp.asarray(mask))


_TERM_SHAPES = {
    "bonds": (2, 2), "angles": (3, 2), "ub": (3, 4), "pdihs": (4, 3),
    "rbdihs": (4, 6), "idihs": (4, 2), "posres": (1, 6),
    "dihres": (4, 3), "angres": (4, 3), "restrbonds": (2, 4),
    "disres": (2, 5),
    "fbposres": (1, 6),
}


def build_system(molecules: Sequence[Tuple[MoleculeType, int]],
                 nbfp: np.ndarray,
                 fudge_qq: float = 1.0,
                 epsilon_r: float = 1.0,
                 cmap_grids: Optional[np.ndarray] = None) -> System:
    """Flatten (molecule, count) blocks into one System.

    cmap_grids: (T, gs, gs) CMAP energy grids referenced by the
    molecules' cmap rows; derivatives are precomputed here
    (ops/cmap.py)."""
    qa, qb, ta, tb, ma, mb = [], [], [], [], [], []
    excl_sets: List[set] = []
    term_rows: Dict[str, List[Tuple]] = {k: [] for k in _TERM_SHAPES}
    pair14_rows: List[Tuple] = []
    settle_rows: List[Tuple] = []
    lincs_rows: List[Tuple] = []
    vsite_rows: List[Tuple] = []   # (atoms4, params3, kind)
    shell_rows: List[Tuple] = []   # (shell_idx, core_idx, k)
    cmap_rows: List[Tuple] = []    # (atoms5, grid type)
    orires_rows: List[Tuple] = []
    orires_fit: List[int] = []
    offset = 0
    disre_label_base = 0
    epsfac = ONE_4PI_EPS0 / epsilon_r

    for mol, count in molecules:
        nm = mol.n_atoms
        cb = mol.charges_b if mol.charges_b is not None else mol.charges_a
        tbv = mol.types_b if mol.types_b is not None else mol.types_a
        mbv = mol.masses_b if mol.masses_b is not None else mol.masses_a
        mol_excl = mol.generate_exclusions()
        # dense per-molecule disre label ids so copies don't share
        # restraint groups (reference: disre.cpp init_disres label blocks)
        disre_local = sorted({int(r[1][4]) for r in mol.disres})
        disre_map = {l: i for i, l in enumerate(disre_local)}
        for c in range(count):
            qa += list(mol.charges_a); qb += list(cb)
            ta += list(mol.types_a); tb += list(tbv)
            ma += list(mol.masses_a); mb += list(mbv)
            excl_sets += [{e + offset for e in s} for s in mol_excl]

            def off(idx):
                return tuple(int(a) + offset for a in idx)

            for name in _TERM_SHAPES:
                for row in getattr(mol, name):
                    idx, par_a = row[0], row[1]
                    par_b = row[2] if len(row) > 2 else None
                    if name == "disres":
                        lbl = disre_label_base + disre_map[int(par_a[4])]
                        par_a = tuple(par_a[:4]) + (float(lbl),)
                        if par_b is not None:
                            par_b = tuple(par_b[:4]) + (float(lbl),)
                    term_rows[name].append((off(idx), par_a, par_b))
            disre_label_base += len(disre_local)
            for row in mol.polarization:
                (s_i, c_i), (alpha,) = row[0], row[1]
                # k from the SHELL charge (bonded.cpp:734 charge[aj]);
                # no B state: polarization springs are not perturbable
                # in the reference either (no F_POLARIZATION B params)
                k_sh = (float(mol.charges_a[s_i]) ** 2
                        * ONE_4PI_EPS0 / float(alpha))
                term_rows["bonds"].append((off((s_i, c_i)),
                                           (0.0, k_sh), None))
                shell_rows.append((s_i + offset, c_i + offset, k_sh))
            for row in mol.pairs14:
                idx, par_a = row[0], row[1]
                par_b = row[2] if len(row) > 2 else None
                # scale qq by epsfac*fudge once here
                sa = (par_a[0] * epsfac * fudge_qq, par_a[1], par_a[2])
                sb = None if par_b is None else (par_b[0] * epsfac * fudge_qq,
                                                 par_b[1], par_b[2])
                pair14_rows.append((off(idx), sa, sb))
            for row in mol.vsites2:
                (sid, i, j), pars = row[0], row[1]
                vsite_rows.append((off((sid, i, j, i, i)),
                                   (pars[0], 0.0, 0.0), 2))
            for row in mol.vsites3:
                (sid, i, j, k), pars = row[0], row[1]
                vsite_rows.append((off((sid, i, j, k, i)),
                                   (pars[0], pars[1], 0.0), 3))
            for row in mol.vsites3out:
                (sid, i, j, k), pars = row[0], row[1]
                vsite_rows.append((off((sid, i, j, k, i)),
                                   tuple(pars[:3]), 4))
            for row in mol.vsites3fd:
                (sid, i, j, k), pars = row[0], row[1]
                vsite_rows.append((off((sid, i, j, k, i)),
                                   (pars[0], pars[1], 0.0), 5))
            for row in mol.vsites3fad:
                (sid, i, j, k), pars = row[0], row[1]
                vsite_rows.append((off((sid, i, j, k, i)),
                                   (pars[0], pars[1], 0.0), 6))
            for row in mol.vsites4fdn:
                idx, pars = row[0], row[1]
                vsite_rows.append((off(idx), tuple(pars[:3]), 7))
            for row in mol.cmap:
                cmap_rows.append((off(row[0]), int(row[1])))
            if mol.orires:
                if orires_rows:
                    raise ValueError(
                        "orientation restraints are limited to one "
                        "molecule instance (reference: orires.cpp "
                        "single-molecule requirement)")
                for row in mol.orires:
                    orires_rows.append((off(row[0]), row[1]))
                orires_fit = list(range(offset, offset + nm))
            for st in ([mol.settle] if mol.settle is not None else []) \
                    + list(mol.settles):
                o, h1, h2, doh, dhh = st
                settle_rows.append((off((o, h1, h2)), doh, dhh))
            for con in mol.constraints:
                i, j, la = con[0], con[1], con[2]
                lb = con[3] if len(con) > 3 else la
                lincs_rows.append((off((i, j)), la, lb))
            offset += nm

    n = offset
    max_excl = max((len(s) for s in excl_sets), default=1)
    max_excl = max(max_excl, 1)
    excl_arr = np.full((n, max_excl), -1, np.int32)
    for i, s in enumerate(excl_sets):
        for k, e in enumerate(sorted(s)):
            excl_arr[i, k] = e

    bonded = {}
    for name, (k, p) in _TERM_SHAPES.items():
        if name == "posres":
            continue
        if term_rows[name]:
            bonded[name] = _pad_rows(term_rows[name], k, p)
    if term_rows["posres"]:
        bonded["posres"] = _pad_rows(term_rows["posres"], 1, 6)

    pairs14 = _pad_rows(pair14_rows, 2, 3) if pair14_rows else \
        InteractionList.empty(2, 3)

    if settle_rows:
        settle = SettleGroups(
            atoms=jnp.asarray(np.array([r[0] for r in settle_rows], np.int32)),
            d_oh=jnp.asarray(np.array([r[1] for r in settle_rows], np.float32)),
            d_hh=jnp.asarray(np.array([r[2] for r in settle_rows], np.float32)),
            mask=jnp.ones((len(settle_rows),), jnp.float32))
    else:
        settle = SettleGroups.empty()

    if lincs_rows:
        lincs = LincsConstraints(
            atoms=jnp.asarray(np.array([r[0] for r in lincs_rows], np.int32)),
            length_a=jnp.asarray(np.array([r[1] for r in lincs_rows], np.float32)),
            length_b=jnp.asarray(np.array([r[2] for r in lincs_rows], np.float32)),
            mask=jnp.ones((len(lincs_rows),), jnp.float32))
    else:
        lincs = LincsConstraints.empty()

    if vsite_rows:
        vsites = VirtualSites(
            atoms=jnp.asarray(np.array([r[0] for r in vsite_rows], np.int32)),
            params=jnp.asarray(np.array([r[1] for r in vsite_rows],
                                        np.float32)),
            kind=jnp.asarray(np.array([r[2] for r in vsite_rows], np.int32)),
            mask=jnp.ones((len(vsite_rows),), np.float32))
    else:
        vsites = VirtualSites.empty()

    cmap = None
    if cmap_rows:
        if cmap_grids is None:
            raise ValueError("molecules carry cmap terms but no cmap_grids "
                             "were provided")
        from ..ops.cmap import precompute_cmap_tables
        cmap = CmapList(
            atoms=jnp.asarray(np.array([r[0] for r in cmap_rows], np.int32)),
            typ=jnp.asarray(np.array([r[1] for r in cmap_rows], np.int32)),
            mask=jnp.ones((len(cmap_rows),), jnp.float32),
            tables=jnp.asarray(precompute_cmap_tables(cmap_grids)))

    orires = None
    if orires_rows:
        from ..ops.orires import OriresList
        exps = sorted({int(r[1][0]) for r in orires_rows})
        exp_map = {e: i for i, e in enumerate(exps)}
        fit_m = np.asarray([ma[i] for i in orires_fit], np.float32)
        orires = OriresList(
            atoms=jnp.asarray(np.array([r[0] for r in orires_rows],
                                       np.int32)),
            exp=jnp.asarray(np.array([exp_map[int(r[1][0])]
                                      for r in orires_rows], np.int32)),
            power=jnp.asarray(np.array([int(r[1][2])
                                        for r in orires_rows], np.int32)),
            c=jnp.asarray(np.array([r[1][3] for r in orires_rows],
                                   np.float32)),
            obs=jnp.asarray(np.array([r[1][4] for r in orires_rows],
                                     np.float32)),
            weight=jnp.asarray(np.array([r[1][5] for r in orires_rows],
                                        np.float32)),
            mask=jnp.ones((len(orires_rows),), jnp.float32),
            fit_idx=jnp.asarray(np.asarray(orires_fit, np.int32)),
            fit_mass=jnp.asarray(fit_m),
            # reference orientation filled from the start coordinates by
            # grompp/tpr loading (like posres reference positions)
            xref=jnp.zeros((len(orires_fit), 3), jnp.float32),
            n_exp=len(exps))

    qa = np.asarray(qa, np.float32); qb = np.asarray(qb, np.float32)
    ta_ = np.asarray(ta, np.int32); tb_ = np.asarray(tb, np.int32)
    ma_ = np.asarray(ma, np.float32); mb_ = np.asarray(mb, np.float32)
    perturbed = (qa != qb) | (ta_ != tb_) | (ma_ != mb_)

    return System(
        charge_a=jnp.asarray(qa), charge_b=jnp.asarray(qb),
        type_a=jnp.asarray(ta_), type_b=jnp.asarray(tb_),
        mass_a=jnp.asarray(ma_), mass_b=jnp.asarray(mb_),
        perturbed=jnp.asarray(perturbed),
        nbfp=jnp.asarray(nbfp),
        exclusions=Exclusions(idx=jnp.asarray(excl_arr)),
        bonded=bonded,
        pairs14=pairs14,
        settle=settle,
        lincs=lincs,
        vsites=vsites,
        cmap=cmap,
        orires=orires,
        shells=(None if not shell_rows else ShellList(
            idx=jnp.asarray(np.array([r[0] for r in shell_rows], np.int32)),
            core=jnp.asarray(np.array([r[1] for r in shell_rows], np.int32)),
            k=jnp.asarray(np.array([r[2] for r in shell_rows], np.float32)))),
        n_atoms=n,
    )
