"""TIP4P/2005 water: rigid 3-site geometry + massless M charge site
(virtual_sites3 funct 1) — exercises the vsite machinery
(reference model parameters: Abascal & Vega 2005)."""
from __future__ import annotations

import numpy as np

from ..core.topology import MoleculeType, build_system, lj_table_from_sigma_eps
from ..core.types import make_state
from ..core.units import BOLTZ
from .water import D_OH, D_HH, M_H, M_O, water_template, _random_rotations

O_SIGMA = 0.31589
O_EPS = 0.7749
Q_M = -1.1128
Q_H = 0.5564
D_OM = 0.01546


def tip4p_moltype() -> MoleculeType:
    # a = b = dOM / |r_H1 + r_H2 - 2 r_O| component along each OH vector
    import math
    half = math.radians(104.52 / 2.0)
    a = D_OM / (2.0 * D_OH * math.cos(half))
    mol = MoleculeType(
        name="SOL4",
        types_a=[0, 1, 1, 1],                 # O, H, H, M
        charges_a=[0.0, Q_H, Q_H, Q_M],
        masses_a=[M_O, M_H, M_H, 0.0],
        nrexcl=3,
    )
    mol.settle = (0, 1, 2, D_OH, float(D_HH))
    mol.vsites3 = [((3, 0, 1, 2), (a, a))]
    return mol


def tip4p_box(n_side: int = 3, spacing: float = 0.4, seed: int = 0,
              temperature: float | None = None):
    nbfp = lj_table_from_sigma_eps([O_SIGMA, 0.1], [O_EPS, 0.0], comb_rule=3)
    n_mol = n_side ** 3
    system = build_system([(tip4p_moltype(), n_mol)], nbfp)

    rng = np.random.RandomState(seed)
    grid = np.mgrid[0:n_side, 0:n_side, 0:n_side].reshape(3, -1).T
    centers = (grid + 0.5) * spacing
    rots = _random_rotations(n_mol, rng)
    tpl3 = water_template()
    x = np.zeros((n_mol, 4, 3))
    x[:, :3] = centers[:, None, :] + np.einsum('nij,kj->nki', rots, tpl3)
    # M site constructed later; initialize at O
    x[:, 3] = x[:, 0]
    x = x.reshape(-1, 3)
    box = np.diag([n_side * spacing] * 3).astype(np.float32)

    n_atoms = 4 * n_mol
    masses = np.tile([M_O, M_H, M_H, 1.0], n_mol)  # dummy 1 for velocity init
    if temperature is not None:
        sd = np.sqrt(BOLTZ * temperature / masses)[:, None]
        v = rng.normal(0.0, 1.0, (n_atoms, 3)) * sd
        v[3::4] = 0.0   # vsites carry no momentum
    else:
        v = np.zeros((n_atoms, 3))
    state = make_state(x.astype(np.float32), v.astype(np.float32), box,
                       seed=seed)
    return system, state
