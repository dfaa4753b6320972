"""Principal component analysis of trajectories + conformational
clustering.

Reference: gmx covar (gmxana/gmx_covar.cpp — mass-weighted covariance
of the LSQ-fitted trajectory, eigendecomposition), gmx anaeig
(projections onto eigenvectors), gmx cluster (gmxana/gmx_cluster.cpp —
RMSD matrix + gromos (Daura et al.) / single-linkage clustering).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from .traj import fitted_stack, kabsch, _center


def covar(frames: Sequence[np.ndarray], xref: np.ndarray,
          mass: Optional[np.ndarray] = None
          ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(eigenvalues desc (3N,), eigenvectors (3N, 3N) columns, mean
    (N,3)) of the mass-weighted covariance of the fitted trajectory:
    C = <dx dx^T> with dx_i scaled by sqrt(m_i) (gmx covar)."""
    stack = fitted_stack(frames, xref, mass)      # (T, N, 3)
    mean = stack.mean(0)
    w = (np.sqrt(np.asarray(mass, np.float64))
         if mass is not None else np.ones(stack.shape[1]))
    dx = (stack - mean) * w[None, :, None]
    flat = dx.reshape(len(stack), -1)             # (T, 3N)
    c = flat.T @ flat / len(stack)
    vals, vecs = np.linalg.eigh(c)
    order = np.argsort(vals)[::-1]
    return vals[order], vecs[:, order], mean


def project(frames: Sequence[np.ndarray], xref: np.ndarray,
            vecs: np.ndarray, mean: np.ndarray, n_proj: int = 2,
            mass: Optional[np.ndarray] = None) -> np.ndarray:
    """(T, n_proj) projections of each fitted frame onto the first
    n_proj eigenvectors (gmx anaeig -proj)."""
    stack = fitted_stack(frames, xref, mass)
    w = (np.sqrt(np.asarray(mass, np.float64))
         if mass is not None else np.ones(stack.shape[1]))
    dx = (stack - mean) * w[None, :, None]
    flat = dx.reshape(len(stack), -1)
    return flat @ vecs[:, :n_proj]


def rmsd_matrix(frames: Sequence[np.ndarray],
                mass: Optional[np.ndarray] = None) -> np.ndarray:
    """(T, T) pairwise least-squares-fit RMSD (gmx cluster input)."""
    n = len(frames)
    w = (np.asarray(mass, np.float64) if mass is not None
         else np.ones(len(frames[0])))
    cen = [np.asarray(f, np.float64) - _center(np.asarray(f), w)
           for f in frames]
    m = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            r = kabsch(cen[j], cen[i], w)
            d = cen[j] @ r.T - cen[i]
            m[i, j] = m[j, i] = np.sqrt(
                (w * (d ** 2).sum(1)).sum() / w.sum())
    return m


def gromos_cluster(rmsd: np.ndarray, cutoff: float
                   ) -> Tuple[np.ndarray, List[int]]:
    """Daura et al. (gmx cluster -method gromos): repeatedly take the
    structure with most neighbors within cutoff as a cluster center,
    remove it and its neighbors.  Returns (cluster id per frame,
    center frame indices)."""
    n = len(rmsd)
    unassigned = np.ones(n, bool)
    labels = np.full(n, -1, int)
    centers: List[int] = []
    within = rmsd <= cutoff
    cid = 0
    while unassigned.any():
        counts = (within & unassigned[None, :]
                  & unassigned[:, None]).sum(1)
        counts[~unassigned] = -1
        c = int(np.argmax(counts))
        members = np.where(within[c] & unassigned)[0]
        labels[members] = cid
        centers.append(c)
        unassigned[members] = False
        cid += 1
    return labels, centers
