"""System-construction tools: solvate, insert-molecules, genion.

Reference: src/gromacs/gmxpreprocess/solvate.cpp (tile a solvent
configuration over the box, remove solvent overlapping the solute or
outside the box), insert-molecules.cpp (random rigid-body insertions
with van-der-Waals overlap rejection), genion.cpp (replace solvent
molecules by monoatomic ions, optionally neutralizing the system).

These operate on (names, resnames, x, box) coordinate sets — the same
data the gro files carry — and leave topology bookkeeping to the user's
[ molecules ] section, exactly like the reference tools (which print
the molecule counts to splice into the .top).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..models.water import _random_rotations, water_template

_VDW_DEFAULT = 0.105   # default atom radius, nm (vdwradii.dat default)


def _min_image(d: np.ndarray, box_diag: np.ndarray) -> np.ndarray:
    return d - box_diag * np.round(d / box_diag)


def solvate(solute_x: np.ndarray, box: np.ndarray,
            spacing: float = 0.31, shell: float = 0.24,
            seed: int = 2021
            ) -> Tuple[np.ndarray, int]:
    """Fill the box with TIP3P-geometry waters avoiding the solute.

    Returns (water_x (3*nwater, 3) with O,H1,H2 per molecule, n_water).
    spacing sets the target density (0.31 nm lattice ~ 33.4 /nm^3, the
    SPC216 density); shell is the minimum O-to-solute-atom distance
    (solvate.cpp removes solvent with atom pairs under the vdW sum).
    """
    bd = np.diag(np.asarray(box, np.float64))
    n_side = np.maximum((bd / spacing).astype(int), 1)
    rng = np.random.RandomState(seed)
    grid = np.stack(np.meshgrid(*[np.arange(n) for n in n_side],
                                indexing="ij"), -1).reshape(-1, 3)
    centers = (grid + 0.5) * (bd / n_side)
    if solute_x is not None and len(solute_x):
        d = _min_image(centers[:, None, :]
                       - np.asarray(solute_x)[None, :, :], bd)
        keep = (np.sqrt((d * d).sum(-1)).min(1) >= shell)
        centers = centers[keep]
    rots = _random_rotations(len(centers), rng)
    tmpl = water_template()
    xw = (centers[:, None, :]
          + np.einsum("nij,aj->nai", rots, tmpl)).reshape(-1, 3)
    return xw.astype(np.float32), len(centers)


def insert_molecules(existing_x: Optional[np.ndarray], box: np.ndarray,
                     mol_x: np.ndarray, n_insert: int,
                     radius: float = _VDW_DEFAULT, ntries: int = 400,
                     seed: int = 1997
                     ) -> Tuple[np.ndarray, int]:
    """Random rigid-body insertions with overlap rejection
    (insert-molecules.cpp): each trial draws a random position +
    rotation and is accepted when every new atom stays 2*radius away
    from all existing atoms.  Returns (inserted coords, n_placed)."""
    bd = np.diag(np.asarray(box, np.float64))
    rng = np.random.RandomState(seed)
    mol = np.asarray(mol_x, np.float64)
    mol = mol - mol.mean(0)
    placed: List[np.ndarray] = []
    pool = (np.asarray(existing_x, np.float64)
            if existing_x is not None and len(existing_x)
            else np.zeros((0, 3)))
    min2 = (2.0 * radius) ** 2
    for _ in range(n_insert):
        ok = False
        for _try in range(ntries):
            pos = rng.rand(3) * bd
            rot = _random_rotations(1, rng)[0]
            cand = pos + mol @ rot.T
            if pool.shape[0]:
                d = _min_image(cand[:, None, :] - pool[None, :, :], bd)
                if (d * d).sum(-1).min() < min2:
                    continue
            ok = True
            break
        if not ok:
            break
        placed.append(cand)
        pool = np.concatenate([pool, cand])
    if not placed:
        return np.zeros((0, 3), np.float32), 0
    return np.concatenate(placed).astype(np.float32), len(placed)


def genion(water_o_idx: np.ndarray, x: np.ndarray, charges: np.ndarray,
           n_positive: int = 0, n_negative: int = 0,
           neutralize: bool = False, seed: int = 1993
           ) -> Tuple[np.ndarray, np.ndarray]:
    """Pick water molecules (by their O atom index) to replace with
    monoatomic ions (genion.cpp random replacement).

    Returns (pos_sites, neg_sites): O-atom indices whose water becomes a
    cation/anion.  With neutralize=True, the counts are topped up so
    total charge + n_positive - n_negative rounds to zero."""
    rng = np.random.RandomState(seed)
    if neutralize:
        qtot = float(np.sum(charges))
        net = int(round(qtot)) + n_positive - n_negative
        if net > 0:
            n_negative += net
        elif net < 0:
            n_positive += -net
    n_total = n_positive + n_negative
    if n_total > len(water_o_idx):
        raise ValueError(f"need {n_total} waters to replace, "
                         f"only {len(water_o_idx)} available")
    pick = rng.choice(len(water_o_idx), size=n_total, replace=False)
    sites = np.asarray(water_o_idx)[pick]
    return sites[:n_positive], sites[n_positive:]
