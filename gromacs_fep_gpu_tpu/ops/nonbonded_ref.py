"""Dense O(N^2) reference nonbonded energies — the oracle layer.

Plays the role of the reference's plain-C kernels
(reference: src/gromacs/nbnxm/kernels_reference/kernel_ref.cpp and
gmxlib/nonbonded/nb_free_energy.cpp): every optimized cluster/Pallas path
is validated against these on small systems.

All functions are energy-only and differentiable; forces are obtained via
jax.grad at the assembly level (ops/forces.py), which also yields dV/dl
exactly (including the soft-core chain rule) by differentiating w.r.t.
lambda.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core import pbc as pbc_mod
from ..core.types import CoulombType, MdParams, System, VdwModifier
from ..core.units import ONE_4PI_EPS0


def exclusion_matrix(excl_idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """Dense (n, n) float mask: 1.0 where the pair is EXCLUDED."""
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], excl_idx.shape)
    valid = excl_idx >= 0
    cols = jnp.where(valid, excl_idx, 0)
    m = jnp.zeros((n, n), jnp.float32)
    m = m.at[rows, cols].max(valid.astype(jnp.float32))
    return m


def rf_constants(params: MdParams) -> Tuple[float, float]:
    """Reaction-field k_rf and c_rf (reference: mdlib/forcerec.cpp calc_rffac)."""
    rc = params.rcoulomb
    eps_r, eps_rf = params.epsilon_r, params.epsilon_rf
    if eps_rf == 0.0:  # conducting boundary (infinity)
        krf = 1.0 / (2.0 * rc**3)
    else:
        krf = (eps_rf - eps_r) / (2.0 * eps_rf + eps_r) / rc**3
    crf = 1.0 / rc + krf * rc**2
    return krf, crf


def forceswitch_constants(p: float, rsw: float, rc: float):
    """(c2, c3, cpot) for force-switched r^-p
    (reference: mdtypes/interaction_const.cpp:216 force_switch_constants):
    force/p = r^-(p+1) + c2 r^2 + c3 r^3 for r > rsw;
    potential = r^-p + (p c2/3)(r-rsw)^3 + (p c3/4)(r-rsw)^4 + cpot."""
    c2 = ((p + 1) * rsw - (p + 4) * rc) / (rc ** (p + 2) * (rc - rsw) ** 2)
    c3 = -((p + 1) * rsw - (p + 3) * rc) / (rc ** (p + 2) * (rc - rsw) ** 3)
    cpot = (-(rc ** -p) + p * c2 / 3 * (rc - rsw) ** 3
            + p * c3 / 4 * (rc - rsw) ** 4)
    return c2, c3, cpot


def vdw_shift_constants(params: MdParams):
    """Constant potential shifts (cpot) for dispersion/repulsion under the
    active vdW modifier; this is all the FEP kernel applies even for
    force-switch (reference: nb_free_energy.cpp:344-345 uses only
    dispersion_shift.cpot / repulsion_shift.cpot)."""
    rc = params.rvdw
    if params.vdw_modifier == VdwModifier.POTENTIAL_SHIFT:
        return -1.0 / rc ** 6, -1.0 / rc ** 12
    if params.vdw_modifier == VdwModifier.FORCE_SWITCH:
        _, _, cpot6 = forceswitch_constants(6.0, params.rvdw_switch, rc)
        _, _, cpot12 = forceswitch_constants(12.0, params.rvdw_switch, rc)
        return cpot6, cpot12
    return 0.0, 0.0


def ewald_beta(rc: float, rtol: float) -> float:
    """Ewald splitting parameter from cutoff + tolerance
    (reference: ewald/ewald_utils.h calc_ewaldcoeff_q bisection)."""
    import math
    lo, hi = 0.0, 50.0
    for _ in range(100):
        beta = 0.5 * (lo + hi)
        if math.erfc(beta * rc) > rtol:
            lo = beta
        else:
            hi = beta
    return 0.5 * (lo + hi)


def _coulomb_pair_energy(qq, r, rinv, incut, excluded, params: MdParams,
                         beta: float | None):
    """Per-pair Coulomb energy including exclusion corrections.

    Follows the scale-don't-skip convention of the reference CUDA kernel
    (nbnxm_cuda_kernel.cuh:487-529): excluded pairs still receive the RF
    constant terms / Ewald reciprocal compensation.
    """
    included = (1.0 - excluded)
    if params.coulomb == CoulombType.CUTOFF:
        v = qq * (rinv - 1.0 / params.rcoulomb) * included * incut
    elif params.coulomb == CoulombType.REACTION_FIELD:
        krf, crf = rf_constants(params)
        # included pairs: qq(1/r + krf r^2 - crf); excluded: qq(krf r^2 - crf)
        v = qq * (included * rinv + krf * r * r - crf) * incut
    elif params.coulomb == CoulombType.PME:
        # short-range: qq (erfc(br)/r - sh_ewald) inside cutoff (the
        # potential-shift modifier, reference: nbnxm_cuda_kernel.cuh:642);
        # excluded pairs get the compensation -qq erf(br)/r at ANY distance
        # (the reciprocal sum includes them) but no shift.
        import math
        sh_ewald = math.erfc(beta * params.rcoulomb) / params.rcoulomb
        sr = qq * (rinv * jax.lax.erfc(beta * r) - sh_ewald) * included * incut
        comp = -qq * rinv * jax.lax.erf(beta * r) * excluded
        v = sr + comp
    else:
        raise ValueError(params.coulomb)
    return v


def _lj_pair_energy(c6, c12, r2, rinv2, incut, params: MdParams):
    rinv6 = rinv2 * rinv2 * rinv2
    if params.vdw_type == "pme":
        # LJ-PME real space: the dispersion is Ewald-split, the grid
        # carries the long tail (reference: nbnxm LJ-PME kernels;
        # ops/ljpme.py for the reciprocal part)
        from .ljpme import dispersion_g
        beta6 = ewald_beta(params.rvdw, params.ewald_rtol_lj)
        v = (c12 * rinv6 * rinv6
             - c6 * dispersion_g(beta6 * beta6 * r2) * rinv6)
        if params.vdw_modifier == VdwModifier.POTENTIAL_SHIFT:
            rc2 = params.rvdw ** 2
            rcinv6 = 1.0 / params.rvdw ** 6
            import numpy as _np
            g_rc = float(_np.exp(-beta6 ** 2 * rc2)
                         * (1.0 + beta6 ** 2 * rc2
                            + 0.5 * beta6 ** 4 * rc2 * rc2))
            v = v - (c12 * rcinv6 * rcinv6 - c6 * g_rc * rcinv6)
        return v * incut
    v = c12 * rinv6 * rinv6 - c6 * rinv6
    if params.vdw_modifier == VdwModifier.POTENTIAL_SHIFT:
        rcinv6 = 1.0 / params.rvdw**6
        vshift = c12 * rcinv6 * rcinv6 - c6 * rcinv6
        v = v - vshift
    elif params.vdw_modifier == VdwModifier.FORCE_SWITCH:
        # V_p = r^-p - (p c2/3) rs^3 - (p c3/4) rs^4 + cpot, rs = max(r-rsw,0)
        # so that F/p = r^-(p+1) + c2 rs^2 + c3 rs^3 and V(rc) = 0
        # (reference: interaction_const.cpp:216 force_switch_constants,
        # nbnxm_cuda_kernel_utils.cuh calculate_force_switch_F_E)
        c2d, c3d, cp6 = forceswitch_constants(6.0, params.rvdw_switch,
                                              params.rvdw)
        c2r, c3r, cp12 = forceswitch_constants(12.0, params.rvdw_switch,
                                               params.rvdw)
        r = r2 * jax.lax.rsqrt(jnp.maximum(r2, 1e-12))
        rs = jnp.maximum(r - params.rvdw_switch, 0.0)
        rs3 = rs * rs * rs
        v = v + c12 * (-4.0 * c2r * rs3 - 3.0 * c3r * rs3 * rs + cp12) \
              - c6 * (-2.0 * c2d * rs3 - 1.5 * c3d * rs3 * rs + cp6)
    elif params.vdw_modifier == VdwModifier.POTENTIAL_SWITCH:
        v = v * _potential_switch(jnp.sqrt(r2), params.rvdw_switch, params.rvdw)
    return v * incut


def _potential_switch(r, r1, rc):
    """GROMACS potential-switch polynomial (reference: forcerec.cpp swV3-5)."""
    d = rc - r1
    t = jnp.clip((r - r1) / d, 0.0, 1.0)
    sw = 1.0 + t**3 * (-10.0 + t * (15.0 - 6.0 * t))
    return jnp.where(r < r1, 1.0, sw)


def dense_nonbonded_energy(
    x: jnp.ndarray,
    box: jnp.ndarray,
    charges: jnp.ndarray,
    c6m: jnp.ndarray,
    c12m: jnp.ndarray,
    excl: jnp.ndarray,
    pair_mask: jnp.ndarray,
    params: MdParams,
    beta: float | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(e_coul, e_lj) over all pairs selected by pair_mask (n,n in {0,1}).

    c6m/c12m: per-pair (n,n) LJ parameters; excl: (n,n) exclusion mask.
    pair_mask should be 0 on the diagonal and symmetric; each pair counted
    once via the upper triangle.
    """
    n = x.shape[0]
    dx = x[:, None, :] - x[None, :, :]
    dx = pbc_mod.pbc_dx(dx, box)
    r2 = jnp.sum(dx * dx, axis=-1)
    # floor r^2 (diagonal is exactly 0; masked lanes must stay finite so
    # 0*inf=NaN cannot leak through the pair masks, fwd or reverse-mode)
    r2_safe = jnp.maximum(r2, 1e-6)
    rinv = jax.lax.rsqrt(r2_safe)
    r = r2_safe * rinv
    rinv2 = rinv * rinv

    triu = jnp.triu(jnp.ones((n, n), jnp.float32), k=1)
    sel = pair_mask * triu

    in_coul = (r2 < params.rcoulomb**2).astype(x.dtype)
    in_vdw = (r2 < params.rvdw**2).astype(x.dtype)

    qq = ONE_4PI_EPS0 / params.epsilon_r * charges[:, None] * charges[None, :]
    e_coul = jnp.sum(sel * _coulomb_pair_energy(qq, r, rinv, in_coul, excl,
                                                params, beta))
    e_lj = jnp.sum(sel * (1.0 - excl) * _lj_pair_energy(c6m, c12m, r2, rinv2,
                                                        in_vdw, params))
    return e_coul, e_lj


def pair_lj_params(system: System, type_idx: jnp.ndarray):
    """Dense (n,n) c6/c12 from the type table for one end state."""
    tbl = system.nbfp
    c6m = tbl[type_idx[:, None], type_idx[None, :], 0]
    c12m = tbl[type_idx[:, None], type_idx[None, :], 1]
    return c6m, c12m
