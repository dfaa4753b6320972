"""Total-energy assembly and force evaluation (dense reference path).

This is the do_force analogue for the oracle layer (reference:
src/gromacs/mdlib/sim_util.cpp:1399 do_force): it sums nonbonded
(normal + FEP soft-core), bonded, 1-4 pair and reciprocal-space energies
into one differentiable scalar; jax.value_and_grad over (x, lam) then
yields forces, the full dV/dlambda vector (reference:
enerdata_utils.cpp:293 accumulatePotentialEnergies) and the energy
decomposition in a single reverse pass.

The optimized cluster-pair path (ops/cluster_nb.py / ops/pallas_nb.py)
must agree with this module to tight tolerances on any system.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import pbc as pbc_mod
from ..core.types import (CoulombType, EnergyTerms, FepCoupling, MdParams,
                          System, VdwModifier)
from ..core.units import ONE_4PI_EPS0
from . import bonded as bonded_mod
from . import nonbonded_ref as nbref
from .fep import FepPairData, softcore_pair_energies


def get_beta(params: MdParams) -> Optional[float]:
    if params.coulomb == CoulombType.PME:
        return nbref.ewald_beta(params.rcoulomb, params.ewald_rtol)
    return None


def dense_group_energies(x, box, lam, system: System, params: MdParams,
                         groups, beta: Optional[float] = None):
    """Per-energy-group-pair short-range (e_coul, e_lj) matrices
    (reference: mdp `energygrps`; the nbnxm kernels' Egrp flavor,
    kerneldispatch.cpp energy-group output into gmx_grppairener_t).

    groups: sequence of index arrays (need not cover all atoms — pairs
    outside any group are simply not reported, as gmx does with `rest`).
    Returns two (G, G) symmetric matrices, each pair counted once in
    [gi, gj] with gi <= gj.  Exact for FEP via the same soft-core path
    as dense_energy."""
    n = system.n_atoms
    epsfac = ONE_4PI_EPS0 / params.epsilon_r
    lam_c = lam[FepCoupling.COUL]
    lam_v = lam[FepCoupling.VDW]
    excl = nbref.exclusion_matrix(system.exclusions.idx, n)
    pert = system.perturbed.astype(jnp.float32)
    pert_pair = jnp.maximum(pert[:, None], pert[None, :])
    normal_pair = 1.0 - pert_pair
    c6m, c12m = nbref.pair_lj_params(system, system.type_a)
    c6b, c12b = nbref.pair_lj_params(system, system.type_b)
    pair = FepPairData(
        qq_a=epsfac * system.charge_a[:, None] * system.charge_a[None, :],
        qq_b=epsfac * system.charge_b[:, None] * system.charge_b[None, :],
        c6_a=c6m, c12_a=c12m, c6_b=c6b, c12_b=c12b)
    dx = pbc_mod.pbc_dx(x[:, None, :] - x[None, :, :], box)
    r2 = jnp.sum(dx * dx, -1)
    triu = jnp.triu(jnp.ones((n, n), jnp.float32), k=1)

    members = []
    for g in groups:
        m = jnp.zeros((n,), jnp.float32).at[jnp.asarray(g)].set(1.0)
        members.append(m)
    G = len(members)
    e_c = jnp.zeros((G, G), x.dtype)
    e_l = jnp.zeros((G, G), x.dtype)
    for a in range(G):
        for b in range(a, G):
            ma, mb = members[a], members[b]
            gmask = ma[:, None] * mb[None, :]
            if a != b:
                gmask = gmask + mb[:, None] * ma[None, :]
            ec_n, el_n = nbref.dense_nonbonded_energy(
                x, box, system.charge_a, c6m, c12m, excl,
                normal_pair * gmask, params, beta)
            sel = pert_pair * triu * gmask
            v_c, v_v = softcore_pair_energies(
                r2, pair, lam_c, lam_v, sel * (1.0 - excl), sel * excl,
                is_self=jnp.zeros_like(r2), fep=params.fep, params=params,
                beta=beta)
            e_c = e_c.at[a, b].set(ec_n + jnp.sum(v_c))
            e_l = e_l.at[a, b].set(el_n + jnp.sum(v_v))
    return e_c, e_l


def dense_energy(x, box, lam, system: System, params: MdParams,
                 beta: Optional[float] = None,
                 pme_recip_fn: Optional[Callable] = None) -> EnergyTerms:
    """Full potential-energy decomposition on the dense O(N^2) path."""
    n = system.n_atoms
    epsfac = ONE_4PI_EPS0 / params.epsilon_r
    lam_c = lam[FepCoupling.COUL]
    lam_v = lam[FepCoupling.VDW]
    lam_b = lam[FepCoupling.BONDED]
    lam_r = lam[FepCoupling.RESTRAINT]

    excl = nbref.exclusion_matrix(system.exclusions.idx, n)
    pert = system.perturbed.astype(jnp.float32)
    pert_pair = jnp.maximum(pert[:, None], pert[None, :])
    normal_pair = 1.0 - pert_pair

    # ---- normal nonbonded (unperturbed pairs; A == B there) ----
    c6m, c12m = nbref.pair_lj_params(system, system.type_a)
    e_coul_nb, e_lj_nb = nbref.dense_nonbonded_energy(
        x, box, system.charge_a, c6m, c12m, excl, normal_pair, params, beta)

    # ---- FEP soft-core pairs (>=1 perturbed atom) ----
    dx = pbc_mod.pbc_dx(x[:, None, :] - x[None, :, :], box)
    r2 = jnp.sum(dx * dx, -1)
    triu = jnp.triu(jnp.ones((n, n), jnp.float32), k=1)
    sel = pert_pair * triu
    c6a, c12a = nbref.pair_lj_params(system, system.type_a)
    c6b, c12b = nbref.pair_lj_params(system, system.type_b)
    pair = FepPairData(
        qq_a=epsfac * system.charge_a[:, None] * system.charge_a[None, :],
        qq_b=epsfac * system.charge_b[:, None] * system.charge_b[None, :],
        c6_a=c6a, c12_a=c12a, c6_b=c6b, c12_b=c12b)
    included = sel * (1.0 - excl)
    excluded = sel * excl
    v_c_fep, v_v_fep = softcore_pair_energies(
        r2, pair, lam_c, lam_v, included, excluded,
        is_self=jnp.zeros_like(r2), fep=params.fep, params=params, beta=beta)
    e_coul_fep = jnp.sum(v_c_fep)
    e_lj_fep = jnp.sum(v_v_fep)

    # Ewald self-pair correction for perturbed charges is handled with the
    # reciprocal term (pme.py adds per-state self energies); unperturbed
    # self energy likewise.

    # ---- bonded ----
    terms = EnergyTerms.zeros(x.dtype)
    terms = terms.replace(
        lj=e_lj_nb + e_lj_fep,
        coulomb=e_coul_nb + e_coul_fep,
    )
    for name, il in system.bonded.items():
        if il.n == 0:
            continue
        _, _, fn = bonded_mod.TERMS[name]
        lam_term = lam_r if name in bonded_mod.RESTRAINT_TERMS else lam_b
        e = (fn(x, box, il, lam_term, params.disre_fc)
             if name == "disres" else fn(x, box, il, lam_term))
        ch = bonded_mod.TERM_CHANNEL[name]
        terms = terms.replace(**{ch: getattr(terms, ch) + e})

    # ---- CMAP cross terms ----
    if system.cmap is not None and system.cmap.n > 0:
        from .cmap import cmap_energy
        terms = terms.replace(
            dihedrals=terms.dihedrals + cmap_energy(x, box, system.cmap))

    # ---- orientation restraints ----
    if system.orires is not None and params.orires_fc > 0:
        from .orires import orires_energy
        terms = terms.replace(
            restraints=terms.restraints
            + orires_energy(x, box, system.orires, params.orires_fc))

    # ---- 1-4 pairs ----
    if system.pairs14.n > 0:
        e14c, e14l = pairs14_energy(x, box, system, lam_c, lam_v, params)
        terms = terms.replace(coul14=terms.coul14 + e14c,
                              lj14=terms.lj14 + e14l)

    # ---- reciprocal space (PME) ----
    if pme_recip_fn is not None:
        e_recip = pme_recip_fn(x, box, lam_c)
        terms = terms.replace(coul_recip=terms.coul_recip + e_recip)

    # ---- Ewald surface/dipole correction ----
    from .ewald_surface import make_surface_corr_fn
    surf_fn = make_surface_corr_fn(system, params)
    if surf_fn is not None:
        terms = terms.replace(
            coul_recip=terms.coul_recip + surf_fn(x, box, lam_c))

    # ---- LJ-PME reciprocal dispersion ----
    if params.vdw_type == "pme":
        from .ljpme import make_ljpme_recip_fn
        ljr = make_ljpme_recip_fn(system, params)
        terms = terms.replace(lj_recip=terms.lj_recip + ljr(x, box))

    return terms


def pairs14_energy(x, box, system: System, lam_c, lam_v, params: MdParams):
    """1-4 pair interactions: bare LJ + Coulomb (no cutoff, no modifier)
    with soft-core on perturbed rows (reference: listed_forces/pairs.cpp:516
    do_pairs_general)."""
    il = system.pairs14
    ai, aj = il.atoms[:, 0], il.atoms[:, 1]
    dxv = pbc_mod.pbc_dx(x[ai] - x[aj], box)
    r2 = jnp.sum(dxv * dxv, -1)

    qq_a, c6_a, c12_a = il.params_a[:, 0], il.params_a[:, 1], il.params_a[:, 2]
    qq_b, c6_b, c12_b = il.params_b[:, 0], il.params_b[:, 1], il.params_b[:, 2]
    perturbed = (jnp.abs(il.params_a - il.params_b).max(-1) > 0).astype(x.dtype)

    # plain path (state A == B)
    r2s = jnp.maximum(r2, 1e-12)
    rinv = jax.lax.rsqrt(r2s)
    rinv6 = (rinv * rinv) ** 3
    # qq params are stored with epsfac and fudgeQQ already applied
    v_c_plain = qq_a * rinv
    v_l_plain = c12_a * rinv6 * rinv6 - c6_a * rinv6

    # soft-core path for perturbed rows: bare interaction = cutoff form with
    # huge cutoffs and no shift
    p14 = dataclasses.replace(
        params, coulomb=CoulombType.CUTOFF, rcoulomb=1e9, rvdw=1e9,
        vdw_modifier=VdwModifier.NONE)
    pairdat = FepPairData(qq_a=qq_a, qq_b=qq_b, c6_a=c6_a, c12_a=c12_a,
                          c6_b=c6_b, c12_b=c12_b)
    ones = jnp.ones_like(r2)
    v_c_sc, v_l_sc = softcore_pair_energies(
        r2, pairdat, lam_c, lam_v, included=ones, excluded=jnp.zeros_like(r2),
        is_self=jnp.zeros_like(r2), fep=params.fep, params=p14, beta=None)

    v_c = jnp.where(perturbed > 0, v_c_sc, v_c_plain)
    v_l = jnp.where(perturbed > 0, v_l_sc, v_l_plain)
    return jnp.sum(il.mask * v_c), jnp.sum(il.mask * v_l)


def make_dense_force_fn(system: System, params: MdParams,
                        pme_recip_fn: Optional[Callable] = None):
    """Returns force_fn(x, box, lam) -> (f, EnergyTerms with dvdl)."""
    beta = get_beta(params)

    def epot(x, lam, box):
        terms = dense_energy(x, box, lam, system, params, beta, pme_recip_fn)
        return terms.epot, terms

    grad_fn = jax.value_and_grad(epot, argnums=(0, 1), has_aux=True)

    disp_e_fn = None
    if params.dispcorr:
        from .dispcorr import make_dispersion_correction
        disp_e_fn, _ = make_dispersion_correction(system, params)

    def force_fn(x, box, lam):
        (_, terms), (gx, glam) = grad_fn(x, lam, box)
        terms = terms.replace(dvdl=glam)
        if disp_e_fn is not None:
            e_dc, dvdl_dc = disp_e_fn(box, lam[FepCoupling.VDW])
            terms = terms.replace(
                dispcorr=e_dc,
                dvdl=terms.dvdl.at[FepCoupling.VDW].add(dvdl_dc))
        return -gx, terms

    return force_fn
