"""Soft-core FEP pair interactions (Beutler and Gapsys).

This reproduces the physics of the fork's FEP kernels
(reference: src/gromacs/nbnxm/cuda/nbnxm_fep_cuda_kernel.cuh:88-628 and
the CPU twin gmxlib/nonbonded/nb_free_energy.cpp:274, soft-core math in
gmxlib/nonbonded/nb_softcore.h) as a *differentiable energy function*:

    V(r^2, lambda_c, lambda_v) summed over both end states k in {A, B}

so that jax.grad w.r.t. (x, lambda) yields forces and dV/dlambda with the
exact soft-core chain-rule term
(reference: nb_free_energy.cpp:1005-1013 dvdl assembly) by construction,
and jax.vmap over a lambda axis yields the foreign-lambda energies that
the fork computes with a dedicated sequential CUDA kernel
(nbnxm_foreign_fep_cuda_kernel.cuh) — on TPU the vmap batches them.

Conventions matched to the reference:
 - soft-core power over r is 6 (rp = r^6), lambdaPower p in {1, 2}
 - sigma6 = c12/c6 when both > 0 (raw, unscaled c6/c12), clamped to
   sigma6_min; else sc_sigma^6  (nb_free_energy.cpp:845-870 preload)
 - soft-core disabled per pair when both end states have c12 > 0
   (nb_free_energy.cpp:876-893)
 - r^2 clamped to 1e-12, r^-6 clamped to 1e15 (nb_free_energy.cpp:99,107)
 - Ewald: plain (soft-cored) 1/r minus erf(beta r)/r compensation applied
   to included pairs within cutoff AND excluded pairs at any distance,
   with a 1/2 factor for the i==j self pair (nb_free_energy.cpp:1057-1100)
 - RF: constant correction terms also hit excluded pairs
   (nb_free_energy.cpp:1023-1055)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.types import CoulombType, FepParams, MdParams, SoftcoreType, VdwModifier
from ..core.units import ONE_4PI_EPS0
from .nonbonded_ref import rf_constants, _potential_switch

# The reference floors r^2 at 1e-12 (nb_free_energy.cpp:99); we floor at
# 1e-6 so that reverse-mode intermediates like rpinv^2 = r^-12 stay within
# fp32 range (1e36 < 3.4e38).  Physically indistinguishable: both floors
# are far below any real pair distance and the r^-6 clamp below dominates.
MIN_DIST_SQ = 1.0e-6
MAX_RINV_SIX = 1.0e15


class FepPairData(NamedTuple):
    """Per-pair A/B parameters; every field broadcastable to the pair shape."""
    qq_a: jnp.ndarray     # epsfac * qi_A * qj_A
    qq_b: jnp.ndarray
    c6_a: jnp.ndarray
    c12_a: jnp.ndarray
    c6_b: jnp.ndarray
    c12_b: jnp.ndarray


def _sixth_root(x):
    # x^(1/6) for x > 0 via cbrt(sqrt(x)); rInv = (rpinv)^(1/6)
    return jnp.cbrt(jnp.sqrt(x))


def _gapsys_pair_energies(r2, rinv, r, qq, c6, c12, lfac_c, lfac_v, sc_on,
                          inc, excluded, is_self, fep: FepParams,
                          params: MdParams, beta):
    """Gapsys ('softcore-function = gapsys') linearized soft-core
    (reference: gmxlib/nonbonded/nb_softcore.h — reactionFieldQuadratic
    Potential / ewaldQuadraticPotential / lennardJonesQuadraticPotential).

    Below a lambda-dependent linearization point rQ the plain potential is
    replaced by its second-order expansion around rQ; above rQ the plain
    (hard-core) potential applies.  Written energy-only: jax.grad w.r.t.
    lambda reproduces the reference's hand-derived dvdl including the
    rQ(lambda) chain rule, because the expansion matches value and slope
    at rQ (the masks are C1-continuous switch points).
    """
    dtype = r2.dtype
    epsfac = ONE_4PI_EPS0 / params.epsilon_r

    # per-state sigma^6 with the Gapsys default
    sig6_def = fep.sc_gapsys_sigma_lj ** 6
    have_lj = (c6 > 0) & (c12 > 0)
    sigma6 = jnp.where(have_lj, c12 / jnp.where(c6 > 0, c6, 1.0), sig6_def)

    scale_q = fep.sc_gapsys_scale_linpoint_q * sc_on
    scale_lj = fep.sc_gapsys_scale_linpoint_lj * sc_on

    lfac_c_safe = jnp.minimum(lfac_c, 1.0 - 1e-6)
    lfac_v_safe = jnp.minimum(lfac_v, 1.0 - 1e-6)

    # ---- Coulomb ----
    rc = params.rcoulomb
    if params.coulomb == CoulombType.PME:
        sh = jax.lax.erfc(jnp.asarray(beta * rc, dtype)) / rc
        krf, crf = 0.0, sh
    elif params.coulomb == CoulombType.REACTION_FIELD:
        krf, crf = rf_constants(params)
    else:
        krf, crf = 0.0, 1.0 / rc

    # plain (hard-core) per-state potential on the true distance
    mask_c = (r < rc).astype(dtype) * (qq != 0) * inc
    v_c_plain = qq * (rinv + krf * r2 - crf)

    # linearization point rQ = scale * (1-LF)^(1/6) * (1 + |q_i q_j|)
    qq_raw = qq / epsfac
    r_q = (jnp.cbrt(jnp.sqrt(1.0 - lfac_c_safe))
           * (1.0 + jnp.abs(qq_raw)) * scale_q)
    r_q = jnp.minimum(r_q, rc)
    use_quad = (r < r_q) & (scale_q > 0) & (lfac_c < 1.0) & (qq != 0)
    r_q_safe = jnp.where(use_quad, jnp.maximum(r_q, 1e-6), 1.0)
    rinv_q = 1.0 / r_q_safe
    const_f = qq * rinv_q
    lin_f = const_f * r * rinv_q
    quad_f = lin_f * r * rinv_q
    v_c_quad = quad_f - 3.0 * (lin_f - const_f) + qq * (krf * r2 - crf)
    v_c = jnp.where(use_quad, v_c_quad, v_c_plain) * mask_c

    # ---- LJ ----
    rv = params.rvdw
    rinv2 = rinv * rinv
    rinv6 = jnp.minimum((rinv2 * rinv2 * rinv2), MAX_RINV_SIX)
    mask_v = (r < rv).astype(dtype) * ((c6 != 0) | (c12 != 0)) * inc
    rvinv6 = 1.0 / rv ** 6
    shift_v = -(c12 * rvinv6 * rvinv6 - c6 * rvinv6)
    v_v_plain = c12 * rinv6 * rinv6 - c6 * rinv6 + shift_v

    r_qv = (jnp.sqrt(jnp.cbrt(26.0 / 7.0 * sigma6 * (1.0 - lfac_v_safe)))
            * scale_lj)
    use_quad_v = (r < r_qv) & (scale_lj > 0) & (lfac_v < 1.0)
    r_qv_safe = jnp.where(use_quad_v, jnp.maximum(r_qv, 1e-6), 1.0)
    rinv_qv = 1.0 / r_qv_safe
    i6 = rinv_qv ** 6
    i7 = i6 * rinv_qv
    i8 = i7 * rinv_qv
    t14 = c12 * i7 * i7 * r2
    t13 = c12 * i7 * i6 * r
    t12 = c12 * i6 * i6
    t8 = i8 * c6 * r2
    t7 = i7 * c6 * r
    t6 = i6 * c6
    quad = 156.0 * t14 - 42.0 * t8
    lin = 168.0 * t13 - 48.0 * t7
    const = 91.0 * t12 - 28.0 * t6
    v_v_quad = 0.5 * quad - lin + const + shift_v
    v_v = jnp.where(use_quad_v, v_v_quad, v_v_plain) * mask_v

    v_coul = jnp.sum(lfac_c * v_c, axis=0)
    v_vdw = jnp.sum(lfac_v * v_v, axis=0)

    # exclusion / reciprocal corrections (identical to the Beutler path)
    self_fac = jnp.where(is_self > 0, 0.5, 1.0)
    if params.coulomb == CoulombType.REACTION_FIELD:
        in_rc = (r2 < rc * rc).astype(dtype)
        vv = (krf * r2 - crf) * self_fac * excluded * in_rc
        v_coul = v_coul + jnp.sum(lfac_c * qq, axis=0) * vv
    elif params.coulomb == CoulombType.PME:
        in_rc = (r2 < rc * rc).astype(dtype)
        corr_mask = jnp.maximum(excluded, inc * in_rc)
        v_lr = jax.lax.erf(beta * r) * rinv * self_fac * corr_mask
        v_coul = v_coul - jnp.sum(lfac_c * qq, axis=0) * v_lr
    return v_coul, v_vdw


def softcore_pair_energies(
    r2: jnp.ndarray,
    pair: FepPairData,
    lam_coul: jnp.ndarray,
    lam_vdw: jnp.ndarray,
    included: jnp.ndarray,
    excluded: jnp.ndarray,
    is_self: jnp.ndarray,
    fep: FepParams,
    params: MdParams,
    beta: float | None = None,
):
    """Per-pair (v_coul, v_vdw) for perturbed pairs.

    included: 1.0 for real non-excluded pairs; excluded: 1.0 for pairs on
    the exclusion list (which still receive RF/Ewald corrections); padding
    rows must have both zero.  is_self: the artificial i==i pair used for
    the Ewald self-correction (counted with factor 1/2).
    """
    dtype = r2.dtype
    # Park masked-out lanes at r = 1 so neither the forward values nor the
    # reverse-mode cotangents can overflow before the mask zeroes them
    # (0 * inf = NaN in AD otherwise).
    active = (included + excluded) > 0
    r2 = jnp.where(active, jnp.maximum(r2, MIN_DIST_SQ), 1.0)
    rinv = jax.lax.rsqrt(r2)
    r = r2 * rinv
    rp = r2 * r2 * r2  # r^6

    p = fep.sc_power
    # state axis leads; reshape to (2, 1, 1, ...) to broadcast over pairs
    bshape = (2,) + (1,) * r2.ndim
    lfac_c = jnp.stack([1.0 - lam_coul, lam_coul]).reshape(bshape)
    lfac_v = jnp.stack([1.0 - lam_vdw, lam_vdw]).reshape(bshape)
    # soft-core lambda factor of the opposite state: (1 - LF)^p
    sc_lf_c = (1.0 - lfac_c) ** p
    sc_lf_v = (1.0 - lfac_v) ** p

    qq = jnp.stack([pair.qq_a, pair.qq_b])
    c6 = jnp.stack([pair.c6_a, pair.c6_b])
    c12 = jnp.stack([pair.c12_a, pair.c12_b])

    # sigma^6 per state; the minimum clamp is only active with sc-coul
    # (reference: interaction_const.cpp:55 sigma6Minimum = bScCoul ? ... : 0)
    sigma6_def = fep.sc_sigma ** 6
    sigma6_min = fep.sc_sigma_min ** 6 if fep.sc_coul else 0.0
    have_lj = (c6 > 0) & (c12 > 0)
    sigma6 = jnp.where(have_lj,
                       jnp.maximum(c12 / jnp.where(c6 > 0, c6, 1.0), sigma6_min),
                       sigma6_def)

    # soft-core active only if either end state is vanishing (c12 == 0)
    sc_on = jnp.logical_not((pair.c12_a > 0) & (pair.c12_b > 0)).astype(dtype)
    alpha_v = fep.sc_alpha * sc_on
    alpha_c = (fep.sc_alpha if fep.sc_coul else 0.0) * sc_on

    if fep.softcore == SoftcoreType.GAPSYS:
        return _gapsys_pair_energies(
            r2, rinv, r, qq, c6, c12, lfac_c, lfac_v, sc_on, inc=included,
            excluded=excluded, is_self=is_self, fep=fep, params=params,
            beta=beta)

    use_softcore = (fep.softcore == SoftcoreType.BEUTLER and fep.sc_alpha != 0.0)
    if use_softcore:
        rpinv_c = 1.0 / (alpha_c * sc_lf_c * sigma6 + rp)
        rinv_c = _sixth_root(rpinv_c)
        rpinv_v = 1.0 / (alpha_v * sc_lf_v * sigma6 + rp)
        rinv_v = _sixth_root(rpinv_v)
    else:
        rpinv_c = rpinv_v = (rinv * rinv) ** 3 * jnp.ones_like(sigma6)
        rinv_c = rinv_v = rinv * jnp.ones_like(sigma6)
    r_c = 1.0 / rinv_c
    r_v = 1.0 / rinv_v

    inc = included
    # ---- Coulomb per state ----
    if params.coulomb == CoulombType.PME:
        assert beta is not None
        sh_ewald = jax.lax.erfc(jnp.asarray(beta * params.rcoulomb, dtype)) / params.rcoulomb
        mask_c = (r < params.rcoulomb).astype(dtype) * (qq != 0) * inc
        v_c = qq * (rinv_c - sh_ewald) * mask_c
    elif params.coulomb == CoulombType.REACTION_FIELD:
        krf, crf = rf_constants(params)
        mask_c = (r_c < params.rcoulomb).astype(dtype) * (qq != 0) * inc
        v_c = qq * (rinv_c + krf * r_c * r_c - crf) * mask_c
    else:  # plain cutoff, treated as RF with krf=0, crf=1/rc
        mask_c = (r_c < params.rcoulomb).astype(dtype) * (qq != 0) * inc
        v_c = qq * (rinv_c - 1.0 / params.rcoulomb) * mask_c

    # ---- VdW per state ----
    rinv6 = jnp.minimum(rpinv_v, MAX_RINV_SIX)
    mask_v = (r_v < params.rvdw).astype(dtype) * ((c6 != 0) | (c12 != 0)) * inc
    v_v = c12 * rinv6 * rinv6 - c6 * rinv6
    if params.vdw_modifier in (VdwModifier.POTENTIAL_SHIFT,
                               VdwModifier.FORCE_SWITCH):
        # the FEP kernel applies only the constant potential shift (cpot),
        # even under force-switch — no switching polynomial on perturbed
        # pairs (reference: nb_free_energy.cpp:344-345,912 uses
        # dispersion_shift.cpot/repulsion_shift.cpot only)
        from .nonbonded_ref import vdw_shift_constants
        cp6, cp12 = vdw_shift_constants(params)
        v_v = v_v + c12 * cp12 - c6 * cp6
    elif params.vdw_modifier == VdwModifier.POTENTIAL_SWITCH:
        v_v = v_v * _potential_switch(r_v, params.rvdw_switch, params.rvdw)
    v_v = v_v * mask_v

    # lambda-weighted sums over states
    v_coul = jnp.sum(lfac_c * v_c, axis=0)
    v_vdw = jnp.sum(lfac_v * v_v, axis=0)

    # ---- exclusion / long-range corrections ----
    self_fac = jnp.where(is_self > 0, 0.5, 1.0)
    if params.coulomb == CoulombType.REACTION_FIELD:
        krf, crf = rf_constants(params)
        in_rc = (r2 < params.rcoulomb ** 2).astype(dtype)
        vv = (krf * r2 - crf) * self_fac * excluded * in_rc
        v_coul = v_coul + jnp.sum(lfac_c * qq, axis=0) * vv
    elif params.coulomb == CoulombType.PME:
        in_rc = (r2 < params.rcoulomb ** 2).astype(dtype)
        corr_mask = jnp.maximum(excluded, inc * in_rc)
        v_lr = jax.lax.erf(beta * r) * rinv * self_fac * corr_mask
        v_coul = v_coul - jnp.sum(lfac_c * qq, axis=0) * v_lr

    return v_coul, v_vdw
