"""WHAM: potential of mean force from umbrella-sampling windows.

Reference: src/gromacs/gmxana/gmx_wham.cpp (the `gmx wham` tool) — the
standard weighted-histogram self-consistent iteration over umbrella
windows (Kumar et al. 1992), run here over the pullx.xvg time series
written by this framework's COM-pulling output (md/pull.py +
cli pullx writer; reference: pulling/output.cpp).

TPU note: this is an offline analysis over a few thousand histogram
bins — plain numpy is the right tool (the reference's gmx_wham is
host-side C++ for the same reason).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core.units import BOLTZ


def wham(samples: Sequence[np.ndarray], x0: Sequence[float],
         k_spring: Sequence[float], temp: float = 300.0,
         n_bins: int = 200,
         bin_range: Optional[Tuple[float, float]] = None,
         tol: float = 1e-7, max_iter: int = 10000,
         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Self-consistent WHAM over harmonic umbrella windows.

    samples[i]: reaction-coordinate time series of window i (nm);
    x0[i], k_spring[i]: its umbrella center (nm) and force constant
    (kJ/mol/nm^2, the pull-coord1-k convention).

    Returns (bin_centers, pmf, prob) with pmf in kJ/mol, minimum set to
    zero (gmx_wham's default zero convention).
    """
    kT = BOLTZ * temp
    n_win = len(samples)
    if not (n_win == len(x0) == len(k_spring)):
        raise ValueError("samples/x0/k length mismatch")
    if n_win < 2:
        raise ValueError("wham needs >= 2 umbrella windows")
    allx = np.concatenate([np.asarray(s, float) for s in samples])
    if bin_range is None:
        bin_range = (float(allx.min()), float(allx.max()))
    edges = np.linspace(bin_range[0], bin_range[1], n_bins + 1)
    centers = 0.5 * (edges[:-1] + edges[1:])

    hist = np.zeros((n_win, n_bins))
    n_i = np.zeros(n_win)
    for i, s in enumerate(samples):
        hist[i], _ = np.histogram(np.asarray(s, float), bins=edges)
        n_i[i] = hist[i].sum()
    counts = hist.sum(axis=0)

    # bias energy of window i evaluated at every bin center
    x0a = np.asarray(x0, float)[:, None]
    ka = np.asarray(k_spring, float)[:, None]
    w_ib = 0.5 * ka * (centers[None, :] - x0a) ** 2
    boltz_ib = np.exp(-w_ib / kT)

    f_i = np.zeros(n_win)                     # window free energies / kT
    for _ in range(max_iter):
        denom = (n_i[:, None] * np.exp(f_i)[:, None] * boltz_ib).sum(0)
        prob = np.where(denom > 0, counts / np.where(denom > 0, denom, 1),
                        0.0)
        z_i = (boltz_ib * prob[None, :]).sum(axis=1)
        f_new = -np.log(np.where(z_i > 0, z_i, 1.0))
        f_new -= f_new[0]
        if np.abs(f_new - f_i).max() < tol:
            f_i = f_new
            break
        f_i = f_new
    denom = (n_i[:, None] * np.exp(f_i)[:, None] * boltz_ib).sum(0)
    prob = np.where(denom > 0, counts / np.where(denom > 0, denom, 1), 0.0)
    with np.errstate(divide="ignore"):
        pmf = -kT * np.log(np.where(prob > 0, prob, np.nan))
    pmf -= np.nanmin(pmf)
    return centers, pmf, prob


def read_pullx(path: str, coord: int = 1) -> np.ndarray:
    """Reaction-coordinate column of a pullx.xvg written by mdrun
    (time in column 0, one column per pull coordinate)."""
    rows = []
    with open(path) as f:
        for line in f:
            if line.startswith(("#", "@")) or not line.strip():
                continue
            rows.append([float(v) for v in line.split()])
    a = np.asarray(rows)
    if a.ndim != 2 or a.shape[1] <= coord:
        raise ValueError(f"{path}: no pull coordinate column {coord}")
    return a[:, coord]


def write_pmf_xvg(path: str, centers: np.ndarray, pmf: np.ndarray):
    with open(path, "w") as f:
        f.write("@    title \"Umbrella potential of mean force\"\n"
                "@    xaxis  label \"Reaction coordinate (nm)\"\n"
                "@    yaxis  label \"PMF (kJ/mol)\"\n")
        for c, p in zip(centers, pmf):
            if np.isfinite(p):
                f.write(f"{c:.6f} {p:.6f}\n")
