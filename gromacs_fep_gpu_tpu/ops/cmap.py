"""CMAP correction-map dihedral energies (CHARMM cross-term).

TPU-native counterpart of the reference's CMAP machinery: the grid
tables come from ``[ cmaptypes ]`` (reference: gmxpreprocess/toppush.cpp
push_cmaptype), the per-5-atom terms from ``[ cmap ]``, and the energy
is a C1 bicubic-Hermite surface over the periodic (phi, psi) grid
(reference: listed_forces/bonded.cpp cmap_dihs(), which evaluates the
same 4x4 bicubic patch from the point values and their spline-computed
first/cross derivatives; setup in gmxpreprocess/grompp.cpp).

Design notes (TPU-first):
- Grid derivatives (dV/dphi, dV/dpsi, d2V/dphidpsi) are precomputed
  host-side at build time with an exact *periodic* cubic-spline
  derivative operator (a cyclic tridiagonal solve), stacked into one
  (T, 4, gs, gs) table that lives on device.
- The per-term evaluation is a fully vectorized gather (4 corners x 4
  tables) + Hermite polynomial contraction — no data-dependent control
  flow, so it fuses into the bonded XLA program.
- Forces and dV/dlambda come from jax.grad of the (smooth) energy, the
  same AD path every other bonded term uses.  CMAP carries no B state
  in GROMACS; the energy is lambda-independent.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import pbc as pbc_mod


def spline_derivative_matrix(n: int, h: float) -> np.ndarray:
    """(n, n) operator D with (D y) = dy/dx of the periodic cubic spline
    through samples y on a uniform grid of spacing h.

    The natural periodic-spline conditions give the cyclic tridiagonal
    system d[i-1] + 4 d[i] + d[i+1] = 3 (y[i+1] - y[i-1]) / h
    (reference: grompp.cpp spline1d-based CMAP setup uses the same
    cubic-spline derivative definition)."""
    A = np.zeros((n, n))
    B = np.zeros((n, n))
    for i in range(n):
        A[i, (i - 1) % n] = 1.0
        A[i, i] = 4.0
        A[i, (i + 1) % n] = 1.0
        B[i, (i + 1) % n] += 3.0 / h
        B[i, (i - 1) % n] -= 3.0 / h
    return np.linalg.solve(A, B)


def precompute_cmap_tables(grids: np.ndarray) -> np.ndarray:
    """(T, gs, gs) energy grids -> (T, 4, gs, gs) stacked
    (V, dV/dphi, dV/dpsi, d2V/dphidpsi) with periodic-spline derivatives.

    Grid convention (reference: toppush.cpp push_cmaptype): row index =
    phi from -180 in steps of 360/gs, column index = psi likewise, values
    in kJ/mol."""
    grids = np.asarray(grids, np.float64)
    T, gs, gs2 = grids.shape
    assert gs == gs2, "CMAP grids must be square"
    h = 2.0 * np.pi / gs
    D = spline_derivative_matrix(gs, h)
    out = np.zeros((T, 4, gs, gs))
    for t in range(T):
        V = grids[t]
        Vx = D @ V              # d/dphi (rows)
        Vy = V @ D.T            # d/dpsi (cols)
        Vxy = D @ Vy            # cross
        out[t] = np.stack([V, Vx, Vy, Vxy])
    return out.astype(np.float32)


def _dihedral(x, box, a, b, c, d):
    """Signed dihedral for index arrays (reference: bonded.cpp dih_angle)."""
    rij = pbc_mod.pbc_dx(x[a] - x[b], box)
    rkj = pbc_mod.pbc_dx(x[c] - x[b], box)
    rkl = pbc_mod.pbc_dx(x[c] - x[d], box)
    m = jnp.cross(rij, rkj)
    n = jnp.cross(rkj, rkl)
    w = jnp.cross(m, n)
    wlen = jnp.sqrt(jnp.sum(w * w, -1) + 1e-32)
    s = jnp.sum(m * n, -1)
    phi = jnp.arctan2(wlen, s)
    ipr = jnp.sum(rij * n, -1)
    sign = jnp.where(ipr < 0.0, -1.0, 1.0)
    return sign * phi


def cmap_energy(x, box, cmap) -> jnp.ndarray:
    """Total CMAP energy.  cmap: core.types.CmapList with
    atoms (n, 5), typ (n,), mask (n,), tables (T, 4, gs, gs)."""
    if cmap.n == 0:
        return jnp.zeros((), x.dtype)
    at = cmap.atoms
    phi = _dihedral(x, box, at[:, 0], at[:, 1], at[:, 2], at[:, 3])
    psi = _dihedral(x, box, at[:, 1], at[:, 2], at[:, 3], at[:, 4])
    gs = cmap.tables.shape[-1]
    h = 2.0 * jnp.pi / gs

    # cell + local coordinate; grid index 0 is phi = -pi
    u = (phi + jnp.pi) / h
    v = (psi + jnp.pi) / h
    iu = jnp.clip(jnp.floor(u), 0, gs - 1).astype(jnp.int32)
    iv = jnp.clip(jnp.floor(v), 0, gs - 1).astype(jnp.int32)
    t = u - iu
    s = v - iv
    iu1 = (iu + 1) % gs
    iv1 = (iv + 1) % gs

    tab = cmap.tables[cmap.typ]                    # (n, 4, gs, gs)
    rows = jnp.arange(at.shape[0])

    def corner(ii, jj):
        # (n, 4): V, Vx, Vy, Vxy at one corner, derivative scaled to
        # cell-local units (chain rule: d/dt = h d/dphi)
        c = tab[rows, :, ii, jj]
        return c * jnp.asarray([1.0, h, h, h * h], c.dtype)

    c00 = corner(iu, iv)
    c01 = corner(iu, iv1)
    c10 = corner(iu1, iv)
    c11 = corner(iu1, iv1)

    def hermite(tt):
        t2 = tt * tt
        t3 = t2 * tt
        return (2.0 * t3 - 3.0 * t2 + 1.0,   # value at corner 0
                -2.0 * t3 + 3.0 * t2,        # value at corner 1
                t3 - 2.0 * t2 + tt,          # derivative at corner 0
                t3 - t2)                     # derivative at corner 1
    h0t, h1t, g0t, g1t = hermite(t)
    h0s, h1s, g0s, g1s = hermite(s)

    # patch = sum over corners of (value * h + d/dt * g) x (same in s)
    e = (
        (c00[:, 0] * h0t + c10[:, 0] * h1t
         + c00[:, 1] * g0t + c10[:, 1] * g1t) * h0s
        + (c01[:, 0] * h0t + c11[:, 0] * h1t
           + c01[:, 1] * g0t + c11[:, 1] * g1t) * h1s
        + (c00[:, 2] * h0t + c10[:, 2] * h1t
           + c00[:, 3] * g0t + c10[:, 3] * g1t) * g0s
        + (c01[:, 2] * h0t + c11[:, 2] * h1t
           + c01[:, 3] * g0t + c11[:, 3] * g1t) * g1s
    )
    return jnp.sum(cmap.mask * e)
