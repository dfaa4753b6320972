"""Structural trajectory analysis: radial distribution function and
mean-squared displacement.

Reference: src/gromacs/gmxana/gmx_rdf.cpp (pair-distance histograms,
ideal-gas normalization by shell volume and density) and gmx_msd.cpp
(restart-averaged MSD with the Einstein relation, msd.cpp
diffusion-coefficient fit).  Offline numpy analysis over trajectory
frames, like the reference's host-side tools.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def _min_image(d: np.ndarray, box_diag: np.ndarray) -> np.ndarray:
    return d - box_diag * np.round(d / box_diag)


def rdf(frames: Sequence[np.ndarray], boxes: Sequence[np.ndarray],
        sel_a: Optional[np.ndarray] = None,
        sel_b: Optional[np.ndarray] = None,
        r_max: Optional[float] = None, n_bins: int = 200,
        ) -> Tuple[np.ndarray, np.ndarray]:
    """g(r) between selections A and B (default: all-vs-all), averaged
    over frames; rectangular boxes.  Normalization: shell volume x
    mean B-density, self-pairs excluded when A is B (gmx_rdf.cpp)."""
    first_box = np.diag(np.asarray(boxes[0]))
    if r_max is None:
        r_max = 0.49 * float(first_box.min())
    edges = np.linspace(0.0, r_max, n_bins + 1)
    hist = np.zeros(n_bins, np.float64)
    norm_frames = 0
    dens_sum = 0.0
    n_a_total = 0
    for x, box in zip(frames, boxes):
        x = np.asarray(x)
        bd = np.diag(np.asarray(box))
        ia = np.arange(x.shape[0]) if sel_a is None else np.asarray(sel_a)
        ib = np.arange(x.shape[0]) if sel_b is None else np.asarray(sel_b)
        d = _min_image(x[ia][:, None, :] - x[ib][None, :, :], bd)
        r = np.sqrt((d * d).sum(-1))
        same = (sel_a is None and sel_b is None) or (
            sel_a is not None and sel_b is not None
            and np.array_equal(ia, ib))
        if same:
            r[np.arange(len(ia)), np.arange(len(ia))] = np.inf
        h, _ = np.histogram(r.ravel(), bins=edges)
        hist += h
        dens_sum += len(ib) / float(np.prod(bd))
        n_a_total += len(ia)
        norm_frames += 1
    centers = 0.5 * (edges[:-1] + edges[1:])
    shell_vol = 4.0 / 3.0 * np.pi * (edges[1:] ** 3 - edges[:-1] ** 3)
    rho_b = dens_sum / norm_frames
    expected = shell_vol * rho_b * n_a_total
    g = np.where(expected > 0, hist / np.where(expected > 0, expected, 1),
                 0.0)
    return centers, g


def msd(frames: Sequence[np.ndarray], times: Sequence[float],
        sel: Optional[np.ndarray] = None,
        n_restarts: int = 10) -> Tuple[np.ndarray, np.ndarray]:
    """Restart-averaged mean-squared displacement over lag time.

    frames must be UNWRAPPED coordinates (no pbc jumps), as the
    reference requires for gmx msd.  Returns (lag_times, msd)."""
    X = np.stack([np.asarray(f) for f in frames])    # (T, N, 3)
    if sel is not None:
        X = X[:, np.asarray(sel)]
    T = X.shape[0]
    t = np.asarray(times, np.float64)
    starts = np.unique(np.linspace(0, T - 2, min(n_restarts, T - 1),
                                   dtype=int))
    max_lag = T - 1
    acc = np.zeros(max_lag + 1, np.float64)
    cnt = np.zeros(max_lag + 1, np.int64)
    for s in starts:
        d = X[s:] - X[s]
        m = (d * d).sum(-1).mean(-1)                 # (T-s,)
        acc[: len(m)] += m
        cnt[: len(m)] += 1
    msd_t = acc / np.maximum(cnt, 1)
    lags = t[: max_lag + 1] - t[0]
    return lags, msd_t


def fit_diffusion(lags: np.ndarray, msd_t: np.ndarray,
                  fit_range: Tuple[float, float] = (0.1, 0.9)
                  ) -> float:
    """Einstein relation D = slope/6 from a linear fit over the middle
    of the MSD curve (gmx msd -beginfit/-endfit convention), in
    nm^2/ps."""
    lo = fit_range[0] * lags[-1]
    hi = fit_range[1] * lags[-1]
    m = (lags >= lo) & (lags <= hi)
    if m.sum() < 2:
        m = slice(1, None)
    slope = np.polyfit(lags[m], msd_t[m], 1)[0]
    return float(slope / 6.0)
