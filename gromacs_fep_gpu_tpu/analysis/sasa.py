"""Solvent-accessible surface area by Shrake-Rupley point sampling.

Reference: gmx sasa (trajectoryanalysis/modules/sasa.cpp), which wraps
the Eisenhaber et al. NSC algorithm; this implementation uses the
classical Shrake-Rupley variant — a near-uniform golden-spiral point
set on each atom's expanded sphere (r_i + r_probe), with a point
counting as accessible when it lies outside every other atom's
expanded sphere.  Converges to the same SASA as NSC as n_points grows.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def golden_spiral_points(n: int) -> np.ndarray:
    """(n, 3) near-uniform unit-sphere points (Fibonacci lattice)."""
    i = np.arange(n) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    theta = np.pi * (1.0 + 5.0 ** 0.5) * i
    return np.stack([np.cos(theta) * np.sin(phi),
                     np.sin(theta) * np.sin(phi),
                     np.cos(phi)], 1)


def radii_from_nbfp(nbfp: np.ndarray, types: np.ndarray,
                    default: float = 0.15) -> np.ndarray:
    """Per-atom vdW radius = sigma_ii/2 from the LJ diagonal
    (the vdwradii.dat analogue; atoms with no LJ get `default`)."""
    t = np.asarray(types)
    c6 = np.asarray(nbfp)[t, t, 0]
    c12 = np.asarray(nbfp)[t, t, 1]
    ok = (c6 > 0) & (c12 > 0)
    sigma = np.where(ok, (np.where(ok, c12, 1.0)
                          / np.where(ok, c6, 1.0)) ** (1.0 / 6.0), 0.0)
    return np.where(ok, 0.5 * sigma, default)


def sasa(x: np.ndarray, radii: np.ndarray, probe: float = 0.14,
         n_points: int = 240, box: Optional[np.ndarray] = None
         ) -> Tuple[float, np.ndarray]:
    """(total SASA nm^2, per-atom SASA) — Shrake & Rupley 1973.

    box: optional (3,3) for minimum-image neighbor distances (periodic
    molecules); None treats the coordinates as an isolated cluster."""
    x = np.asarray(x, np.float64)
    r = np.asarray(radii, np.float64) + probe
    n = len(x)
    pts = golden_spiral_points(n_points)
    bd = np.diag(box) if box is not None else None
    d = x[:, None, :] - x[None, :, :]
    if bd is not None:
        d -= bd * np.round(d / bd)
    dist = np.sqrt((d * d).sum(-1))
    np.fill_diagonal(dist, np.inf)
    per_atom = np.zeros(n)
    for i in range(n):
        nbr = np.where(dist[i] < r[i] + r.max())[0]
        nbr = nbr[dist[i, nbr] < r[i] + r[nbr]]
        surf = x[i] + r[i] * pts
        if len(nbr):
            dn = surf[:, None, :] - x[nbr][None, :, :]
            if bd is not None:
                dn -= bd * np.round(dn / bd)
            buried = ((dn * dn).sum(-1) < (r[nbr] ** 2)[None, :]).any(1)
            frac = 1.0 - buried.mean()
        else:
            frac = 1.0
        per_atom[i] = 4.0 * np.pi * r[i] ** 2 * frac
    return float(per_atom.sum()), per_atom
