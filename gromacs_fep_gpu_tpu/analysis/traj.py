"""Structural trajectory analysis: rms, rmsf, gyrate, mindist, density,
hbond.

Reference: the classic gmxana tools — gmx_rms.cpp (least-squares-fit
RMSD), gmx_rmsf.cpp (per-atom fluctuation about the fitted mean),
gmx_gyrate.cpp (mass-weighted radius of gyration), gmx_mindist.cpp
(minimum inter-group distance), gmx_density.cpp (partial density
profile in slabs along an axis), gmx_hbond.cpp (geometric H-bond
criterion: donor-acceptor distance + hydrogen-donor-acceptor angle).

All functions are plain numpy over (n_frames, N, 3) coordinate stacks
decoded by the io codecs — analysis is host-side by design (the
reference's tools are serial C too); the MD hot path is the jitted
device program.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def kabsch(x: np.ndarray, xref: np.ndarray,
           w: Optional[np.ndarray] = None) -> np.ndarray:
    """Least-squares superposition of x onto xref (both centered by the
    caller): returns the 3x3 rotation (do_fit semantics)."""
    if w is None:
        w = np.ones(len(x))
    h = (w[:, None] * x).T @ xref
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(u @ vt))
    s = np.diag([1.0, 1.0, d])
    return (u @ s @ vt).T


def _center(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    return (w[:, None] * x).sum(0) / w.sum()


def rms_series(frames: Sequence[np.ndarray], xref: np.ndarray,
               mass: Optional[np.ndarray] = None,
               fit: bool = True) -> np.ndarray:
    """Mass-weighted RMSD of each frame to xref, after optional
    translational+rotational least-squares fit (gmx rms default)."""
    xref = np.asarray(xref, np.float64)
    w = (np.asarray(mass, np.float64) if mass is not None
         else np.ones(len(xref)))
    ref_c = xref - _center(xref, w)
    out = []
    for x in frames:
        xc = np.asarray(x, np.float64) - _center(np.asarray(x), w)
        if fit:
            xc = xc @ kabsch(xc, ref_c, w).T
        out.append(np.sqrt((w * ((xc - ref_c) ** 2).sum(1)).sum()
                           / w.sum()))
    return np.asarray(out)


def fitted_stack(frames: Sequence[np.ndarray], xref: np.ndarray,
                 mass: Optional[np.ndarray] = None) -> np.ndarray:
    """All frames superposed onto xref -> (n_frames, N, 3)."""
    xref = np.asarray(xref, np.float64)
    w = (np.asarray(mass, np.float64) if mass is not None
         else np.ones(len(xref)))
    ref_c = xref - _center(xref, w)
    out = []
    for x in frames:
        xc = np.asarray(x, np.float64) - _center(np.asarray(x), w)
        out.append(xc @ kabsch(xc, ref_c, w).T)
    return np.asarray(out)


def rmsf(frames: Sequence[np.ndarray], xref: np.ndarray,
         mass: Optional[np.ndarray] = None) -> np.ndarray:
    """Per-atom root-mean-square fluctuation about the time-mean of the
    fitted trajectory (gmx rmsf)."""
    stack = fitted_stack(frames, xref, mass)
    mean = stack.mean(0)
    return np.sqrt(((stack - mean) ** 2).sum(-1).mean(0))


def gyrate(frames: Sequence[np.ndarray],
           mass: np.ndarray) -> np.ndarray:
    """Mass-weighted radius of gyration per frame (gmx gyrate):
    Rg^2 = sum_i m_i |r_i - r_com|^2 / sum_i m_i."""
    m = np.asarray(mass, np.float64)
    out = []
    for x in frames:
        xc = np.asarray(x, np.float64) - _center(np.asarray(x), m)
        out.append(np.sqrt((m * (xc ** 2).sum(1)).sum() / m.sum()))
    return np.asarray(out)


def mindist(frames: Sequence[np.ndarray], boxes: Sequence[np.ndarray],
            g1: np.ndarray, g2: np.ndarray) -> np.ndarray:
    """Minimum-image minimum distance between two atom groups per
    frame (gmx mindist)."""
    out = []
    for x, box in zip(frames, boxes):
        bd = np.diag(np.asarray(box, np.float64))
        d = (np.asarray(x)[g1][:, None, :]
             - np.asarray(x)[g2][None, :, :])
        d -= bd * np.round(d / bd)
        out.append(float(np.sqrt((d * d).sum(-1)).min()))
    return np.asarray(out)


def density_profile(frames: Sequence[np.ndarray],
                    boxes: Sequence[np.ndarray],
                    weights: np.ndarray, axis: int = 2,
                    nslices: int = 50,
                    group: Optional[np.ndarray] = None
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Partial density along a box axis in kg/m^3 when weights are
    amu masses (gmx density -dens mass); returns (slice centers nm,
    mean density).  Slab volume uses the per-frame box."""
    amu_per_nm3_to_kg_m3 = 1.66053906660
    hist = np.zeros(nslices)
    centers = None
    for x, box in zip(frames, boxes):
        bd = np.diag(np.asarray(box, np.float64))
        length = bd[axis]
        area = np.prod(np.delete(bd, axis))
        xi = np.asarray(x)[:, axis] % length
        idx = group if group is not None else slice(None)
        xi = xi[idx]
        ww = np.asarray(weights, np.float64)[idx]
        sl = np.minimum((xi / length * nslices).astype(int), nslices - 1)
        np.add.at(hist, sl, ww / (area * length / nslices))
        if centers is None:
            centers = (np.arange(nslices) + 0.5) * length / nslices
    return centers, hist / len(frames) * amu_per_nm3_to_kg_m3


def hbonds(x: np.ndarray, box: np.ndarray, donors: np.ndarray,
           hydrogens: np.ndarray, acceptors: np.ndarray,
           r_cut: float = 0.35, angle_cut: float = 30.0) -> int:
    """Geometric hydrogen-bond count for one frame (gmx hbond
    defaults: donor-acceptor distance <= 0.35 nm AND
    hydrogen-donor-acceptor angle <= 30 deg).  donors/hydrogens are
    parallel arrays (one H per row; list a donor twice for two H)."""
    bd = np.diag(np.asarray(box, np.float64))
    x = np.asarray(x, np.float64)
    d_da = x[acceptors][None, :, :] - x[donors][:, None, :]
    d_da -= bd * np.round(d_da / bd)
    r_da = np.sqrt((d_da ** 2).sum(-1))
    # exclude the donor being its own acceptor
    same = donors[:, None] == acceptors[None, :]
    within = (r_da <= r_cut) & ~same
    if not within.any():
        return 0
    d_dh = x[hydrogens] - x[donors]
    d_dh -= bd * np.round(d_dh / bd)
    # angle H-D-A at the donor
    num = (d_dh[:, None, :] * d_da).sum(-1)
    den = (np.sqrt((d_dh ** 2).sum(-1))[:, None] * r_da)
    cosa = np.clip(num / np.where(den > 0, den, 1.0), -1.0, 1.0)
    ang = np.degrees(np.arccos(cosa))
    return int((within & (ang <= angle_cut)).sum())


def rotacf(frames: Sequence[np.ndarray], pairs: np.ndarray,
           boxes: Optional[Sequence[np.ndarray]] = None,
           order: int = 2, nlags: Optional[int] = None) -> np.ndarray:
    """Rotational autocorrelation of unit vectors defined by atom pairs
    (gmx rotacf): C_l(t) = <P_l(u(0).u(t))>, l = 1 or 2
    (P2(x) = (3x^2-1)/2)."""
    us = []
    for i, x in enumerate(frames):
        x = np.asarray(x, np.float64)
        d = x[pairs[:, 1]] - x[pairs[:, 0]]
        if boxes is not None:
            bd = np.diag(np.asarray(boxes[i], np.float64))
            d -= bd * np.round(d / bd)
        us.append(d / np.linalg.norm(d, axis=1, keepdims=True))
    u = np.asarray(us)                               # (T, P, 3)
    t_tot = len(u)
    if nlags is None:
        nlags = t_tot // 2
    out = np.zeros(nlags)
    for lag in range(nlags):
        c = (u[:t_tot - lag] * u[lag:]).sum(-1)       # cos angle
        out[lag] = (((3 * c * c - 1) / 2) if order == 2 else c).mean()
    return out


def vacf(v_frames: Sequence[np.ndarray],
         mass: Optional[np.ndarray] = None,
         nlags: Optional[int] = None) -> np.ndarray:
    """Mass-weighted normalized velocity autocorrelation C(t)
    (gmx velacc -m): C(t) = <sum_i m_i v_i(0).v_i(t)> / <sum m v^2>,
    averaged over time origins."""
    v = np.asarray(v_frames, np.float64)          # (T, N, 3)
    t_tot = v.shape[0]
    if nlags is None:
        nlags = t_tot // 2
    w = (np.asarray(mass, np.float64) if mass is not None
         else np.ones(v.shape[1]))
    out = np.zeros(nlags)
    for lag in range(nlags):
        prod = (v[:t_tot - lag] * v[lag:]).sum(-1)      # (T-lag, N)
        out[lag] = (w[None, :] * prod).sum(-1).mean()
    return out / out[0]


def dos_spectrum(c_t: np.ndarray, dt_ps: float
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """(frequencies 1/ps, cosine-transform spectrum) of an
    autocorrelation (gmx dos: S(nu) ~ int C(t) cos(2 pi nu t) dt)."""
    c = np.asarray(c_t, np.float64)
    # even extension -> real FFT gives the cosine transform
    ext = np.concatenate([c, c[-2:0:-1]])
    spec = np.fft.rfft(ext).real * dt_ps
    freq = np.fft.rfftfreq(len(ext), d=dt_ps)
    return freq, spec


def hbond_series(frames: Sequence[np.ndarray],
                 boxes: Sequence[np.ndarray], donors: np.ndarray,
                 hydrogens: np.ndarray, acceptors: np.ndarray,
                 r_cut: float = 0.35,
                 angle_cut: float = 30.0) -> np.ndarray:
    return np.asarray([hbonds(x, b, donors, hydrogens, acceptors,
                              r_cut, angle_cut)
                       for x, b in zip(frames, boxes)])
