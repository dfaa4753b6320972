"""Electrostatic trajectory analysis: total dipole moment (gmx dipoles)
and the transmembrane potential profile (gmx potential).

Reference: gmxana/gmx_dipoles.cpp (M(t), <|M|>, Debye units, the
Neumann fluctuation estimate of epsilon) and gmxana/gmx_potential.cpp
(slab charge density integrated twice through Poisson's equation).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ..core.units import BOLTZ

ENM2DEBYE = 48.0320798   # 1 e*nm in Debye (gmx_dipoles.cpp e2d)
# vacuum permittivity in GROMACS units: e^2 mol / (kJ nm) —
# 1/(4 pi eps0) = 138.935458 kJ nm / (mol e^2)
KE = 138.935458
EPS0 = 1.0 / (4.0 * np.pi * KE)


def dipole_series(frames: Sequence[np.ndarray], charges: np.ndarray,
                  group: Optional[np.ndarray] = None) -> np.ndarray:
    """(T, 3) total dipole M = sum q_i r_i per frame, in e*nm.
    For neutral selections M is origin-independent (gmx dipoles)."""
    q = np.asarray(charges, np.float64)
    idx = group if group is not None else slice(None)
    return np.asarray([(q[idx][:, None] * np.asarray(f)[idx]).sum(0)
                       for f in frames])


def dipole_stats(m_series: np.ndarray, volume_nm3: float,
                 temperature: float) -> dict:
    """<|M|> (Debye), <M>, and the Neumann fluctuation dielectric
    estimate eps = 1 + (<M^2>-<M>^2) / (3 eps0 V kT)
    (gmx_dipoles.cpp calc_eps)."""
    m = np.asarray(m_series, np.float64)
    mu_abs = np.sqrt((m * m).sum(1))
    m_mean = m.mean(0)
    fluct = (m * m).sum(1).mean() - (m_mean * m_mean).sum()
    eps = 1.0 + fluct / (3.0 * EPS0 * volume_nm3 * BOLTZ * temperature)
    return {"mu_mean_D": float(mu_abs.mean() * ENM2DEBYE),
            "mu_mean_enm": float(mu_abs.mean()),
            "M_mean": m_mean,
            "fluct_enm2": float(fluct),
            "epsilon": float(eps)}


def potential_profile(frames: Sequence[np.ndarray],
                      boxes: Sequence[np.ndarray], charges: np.ndarray,
                      axis: int = 2, nslices: int = 50,
                      group: Optional[np.ndarray] = None
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(slice centers nm, charge density e/nm^3, potential Volt).

    Poisson integrated twice from slab charge densities with psi(0)=0
    and field E(0)=0, exactly gmx_potential.cpp calc_potential:
    psi(z) = -1/eps0 * int_0^z dz' int_0^z' rho(z'') dz''.
    Conversion to Volt: kJ/(mol e) * 0.010364272 V (gmx unit tables)."""
    q = np.asarray(charges, np.float64)
    idx = group if group is not None else slice(None)
    rho = np.zeros(nslices)
    centers = None
    length = area = None
    for x, box in zip(frames, boxes):
        bd = np.diag(np.asarray(box, np.float64))
        length = bd[axis]
        area = np.prod(np.delete(bd, axis))
        zi = np.asarray(x)[idx, axis] % length
        sl = np.minimum((zi / length * nslices).astype(int), nslices - 1)
        np.add.at(rho, sl, q[idx])
        if centers is None:
            centers = (np.arange(nslices) + 0.5) * length / nslices
    dz = length / nslices
    rho = rho / (len(frames) * area * dz)          # e / nm^3
    # double integration (trapezoid-free cumulative sums, as gmx does)
    field = np.cumsum(rho) * dz                     # e/nm^2 / eps0 later
    psi = -np.cumsum(field) * dz / EPS0             # kJ/(mol e)
    psi = psi - psi[0]
    volt = psi * 0.010364272                        # -> Volt
    return centers, rho, volt
