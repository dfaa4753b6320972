"""TIP3P water systems (analogue of reference simulationdatabase spc/tip
boxes; force-field values from share/top/oplsaa.ff tip3p)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.topology import MoleculeType, build_system, lj_table_from_sigma_eps
from ..core.types import make_state
from ..core.units import BOLTZ

# TIP3P parameters
O_SIGMA = 0.315061   # nm
O_EPS = 0.636386     # kJ/mol
Q_O = -0.834
Q_H = 0.417
M_O = 15.99940
M_H = 1.00800
D_OH = 0.09572       # nm
ANGLE_HOH = 104.52   # degrees
D_HH = 2.0 * D_OH * np.sin(np.deg2rad(ANGLE_HOH / 2.0))


def tip3p_moltype(rigid: bool = True, type_o: int = 0, type_h: int = 1
                  ) -> MoleculeType:
    mol = MoleculeType(
        name="SOL",
        types_a=[type_o, type_h, type_h],
        charges_a=[Q_O, Q_H, Q_H],
        masses_a=[M_O, M_H, M_H],
        nrexcl=3,
    )
    if rigid:
        mol.settle = (0, 1, 2, D_OH, float(D_HH))
    else:
        # flexible TIP3P: harmonic bonds + angle
        mol.bonds = [((0, 1), (D_OH, 502416.0)), ((0, 2), (D_OH, 502416.0))]
        mol.angles = [((1, 0, 2), (ANGLE_HOH, 628.02))]
    return mol


def water_template() -> np.ndarray:
    """(3,3) O,H1,H2 positions, O at origin, in the xz plane."""
    half = np.deg2rad(ANGLE_HOH / 2.0)
    return np.array([
        [0.0, 0.0, 0.0],
        [D_OH * np.sin(half), 0.0, D_OH * np.cos(half)],
        [-D_OH * np.sin(half), 0.0, D_OH * np.cos(half)],
    ], np.float64)


def _random_rotations(n, rng):
    """Uniform random rotation matrices via QR of gaussian matrices."""
    a = rng.normal(size=(n, 3, 3))
    q, r = np.linalg.qr(a)
    d = np.sign(np.einsum('nii->ni', r))
    q = q * d[:, None, :]
    det = np.linalg.det(q)
    q[det < 0, :, 0] *= -1.0
    return q


def water_box(n_side: int = 4, spacing: float = 0.31, seed: int = 0,
              temperature: float | None = None, rigid: bool = True):
    """Lattice of randomly-oriented TIP3P waters; returns (System, State)."""
    n_mol = n_side ** 3
    nbfp = lj_table_from_sigma_eps([O_SIGMA, 0.1], [O_EPS, 0.0], comb_rule=3)
    system = build_system([(tip3p_moltype(rigid=rigid), n_mol)], nbfp)

    rng = np.random.RandomState(seed)
    grid = np.mgrid[0:n_side, 0:n_side, 0:n_side].reshape(3, -1).T
    centers = (grid + 0.5) * spacing
    rots = _random_rotations(n_mol, rng)
    tpl = water_template()
    x = (centers[:, None, :] + np.einsum('nij,kj->nki', rots, tpl)).reshape(-1, 3)
    box = np.diag([n_side * spacing] * 3).astype(np.float32)

    n_atoms = 3 * n_mol
    if temperature is not None:
        masses = np.array([M_O, M_H, M_H] * n_mol)
        sd = np.sqrt(BOLTZ * temperature / masses)[:, None]
        v = rng.normal(0.0, 1.0, size=(n_atoms, 3)) * sd
        v -= (masses[:, None] * v).sum(0) / masses.sum()
    else:
        v = np.zeros((n_atoms, 3))
    state = make_state(x.astype(np.float32), v.astype(np.float32), box, seed=seed)
    return system, state
