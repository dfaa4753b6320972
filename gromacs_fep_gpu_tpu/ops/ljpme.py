"""LJ-PME: particle-mesh Ewald for r^-6 dispersion
(reference: ewald/pme_solve.cpp solve_pme_lj_yzx, ewald/pme.cpp LJ
grids, long_range_correction.cpp; method: Essmann 1995 appendix +
Wennberg et al. JCTC 2013).

Geometric combination (lj-pme-comb-rule = geometric): per-atom
coefficients b_i = sqrt(c6_ii) are spread on one grid, and

  E_recip = -(pi^{3/2} beta^3 / 3V) sum_k f(b_k) |S(k)|^2 / moduli,
  f(b) = (1 - 2 b^2) e^{-b^2} + 2 sqrt(pi) b^3 erfc(b),  b = pi|m|/beta

(the reference's eterm with its 3V/(pi^{3/2} beta^3) denominator; the
k = 0 term is finite, f(0) = 1, and included).  The real-space
counterpart multiplies -c6/r^6 by g(x) = e^{-x^2}(1 + x^2 + x^4/2),
x = beta r; self-interactions contribute beta^6 c6_ii/12 and excluded
pairs c6_ij (1 - g)/r^6, both corrected analytically.

All pieces are differentiable; forces and dV/dlambda ride the same AD
pass as the other cheap terms.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import pbc as pbc_mod
from .pme import (make_dft_matrices, make_influence_function, matmul_fft3,
                  spread_charges)

SQRT_PI = float(np.sqrt(np.pi))


def dispersion_g(x2):
    """g(x) with x2 = (beta r)^2: the real-space dispersion switch."""
    return jnp.exp(-x2) * (1.0 + x2 + 0.5 * x2 * x2)


def _lj_influence_scaled(box, influence, beta, dtype):
    """(G, scale) with E_grid = scale * sum(G * |S|^2)."""
    m1, m2, m3, bb = (jnp.asarray(a, dtype) for a in influence)
    binv = pbc_mod.inv3(box)
    gT = jnp.einsum('ji,jk->ik', binv, binv,
                    precision=jax.lax.Precision.HIGHEST)
    mm = (m1[:, None, None] ** 2 * gT[0, 0]
          + m2[None, :, None] ** 2 * gT[1, 1]
          + m3[None, None, :] ** 2 * gT[2, 2]
          + 2.0 * m1[:, None, None] * m2[None, :, None] * gT[0, 1]
          + 2.0 * m1[:, None, None] * m3[None, None, :] * gT[0, 2]
          + 2.0 * m2[None, :, None] * m3[None, None, :] * gT[1, 2])
    b2 = (jnp.pi ** 2) * mm / (beta ** 2)
    b = jnp.sqrt(jnp.maximum(b2, 0.0))
    f = ((1.0 - 2.0 * b2) * jnp.exp(-b2)
         + 2.0 * SQRT_PI * b * b2 * jax.lax.erfc(b))
    vol = pbc_mod.box_volume(box)
    # full-spectrum sum: the reference's 3V denominator pairs with its
    # half-spectrum iteration + 2x structure factors, so /6V here
    scale = -(np.pi ** 1.5) * beta ** 3 / (6.0 * vol)
    return f * bb, scale


def ljpme_reciprocal_energy(x, box, b6, grid_shape, beta, order: int = 4,
                            influence=None, dft_mats=None):
    """Reciprocal dispersion energy over spread sqrt(c6) coefficients
    (includes self and excluded-pair artifacts — correct those with
    ljpme_self_energy / the excluded-pair term)."""
    if influence is None:
        influence = make_influence_function(grid_shape, order)
    if dft_mats is None:
        dft_mats = make_dft_matrices(grid_shape)
    grid = spread_charges(x, box, b6, grid_shape, order)
    q_re, q_im = matmul_fft3(grid, dft_mats)
    G, scale = _lj_influence_scaled(box, influence, beta, x.dtype)
    return scale * jnp.sum(G * (q_re * q_re + q_im * q_im))


def ljpme_self_energy(b6, beta):
    """Correction removing the recip sum's self-interaction:
    +beta^6/12 sum_i c6_ii (the r->0 limit of c6 (1-g)/r^6 halved)."""
    return beta ** 6 / 12.0 * jnp.sum(b6 * b6)


def ljpme_excluded_correction(x, box, b6, excl_idx, beta):
    """Correction removing the recip contribution of excluded pairs:
    +c6_ij (1 - g(beta r)) / r^6 summed over the exclusion list
    (each pair appears twice in excl_idx -> halved)."""
    n = x.shape[0]
    K = excl_idx.shape[1]
    ii = jnp.repeat(jnp.arange(n), K)
    jj = excl_idx.reshape(-1)
    valid = (jj >= 0) & (jj != ii)
    jj_s = jnp.where(valid, jj, 0)
    d = pbc_mod.pbc_dx(x[ii] - x[jj_s], box)
    r2 = jnp.sum(d * d, -1)
    r2 = jnp.maximum(r2, 1e-12)
    x2 = beta * beta * r2
    c6 = b6[ii] * b6[jj_s]
    inv6 = 1.0 / (r2 * r2 * r2)
    # 1 - g has a removable r^6 zero at r=0: safe as written for r>0
    e = c6 * (1.0 - dispersion_g(x2)) * inv6
    return 0.5 * jnp.sum(jnp.where(valid, e, 0.0))


def ewald_dispersion_exact(x, box, c6_table, types, n_images: int = 3):
    """Brute-force absolutely-convergent dispersion lattice sum
    -1/2 sum_{i,j,images} c6_ij / r^6 (test oracle; f64 numpy)."""
    x = np.asarray(x, np.float64)
    b = np.asarray(box, np.float64)
    n = x.shape[0]
    c6 = np.asarray(c6_table, np.float64)[np.asarray(types)[:, None],
                                          np.asarray(types)[None, :]]
    e = 0.0
    rng = range(-n_images, n_images + 1)
    for i0 in rng:
        for i1 in rng:
            for i2 in rng:
                sh = i0 * b[0] + i1 * b[1] + i2 * b[2]
                d = x[:, None, :] - x[None, :, :] + sh
                r2 = (d ** 2).sum(-1)
                if i0 == i1 == i2 == 0:
                    np.fill_diagonal(r2, np.inf)
                e += -0.5 * (c6 / r2 ** 3).sum()
    return e


def make_ljpme_recip_fn(system, params):
    """e(x, box) -> reciprocal dispersion energy incl. self/excluded
    corrections, or None when vdwtype != pme.  Geometric combination on
    the A-state c6 diagonal (perturbed topologies are rejected — the
    reference restricts LJ-PME+FEP similarly)."""
    if params.vdw_type != "pme":
        return None
    import numpy as np

    from .nonbonded_ref import ewald_beta
    from .pme import make_dft_matrices, make_influence_function

    if bool(np.asarray(system.perturbed).any()):
        raise NotImplementedError(
            "vdwtype = pme with perturbed atoms is not supported")
    if params.pme_grid is None:
        raise ValueError("vdwtype = pme needs pme_grid")
    beta6 = ewald_beta(params.rvdw, params.ewald_rtol_lj)
    t = np.asarray(system.type_a)
    c6_diag = np.asarray(system.nbfp)[t, t, 0]
    b6 = jnp.asarray(np.sqrt(np.maximum(c6_diag, 0.0)), jnp.float32)
    grid_shape = tuple(params.pme_grid)
    influence = make_influence_function(grid_shape, params.pme_order)
    dft = make_dft_matrices(grid_shape)
    e_self = ljpme_self_energy(b6, beta6)
    excl_idx = system.exclusions.idx

    def energy(x, box):
        e = ljpme_reciprocal_energy(x, box, b6, grid_shape, beta6,
                                    order=params.pme_order,
                                    influence=influence, dft_mats=dft)
        e = e + e_self
        e = e + ljpme_excluded_correction(x, box, b6, excl_idx, beta6)
        return e

    return energy
