"""Cluster-pair nonbonded kernel (XLA) + full force assembly.

The production force path: the analogue of the reference's nbnxm cluster
kernels (reference: nbnxm/cuda/nbnxm_cuda_kernel.cuh:141-713 and the SIMD
CPU kernels).  TPU design decisions vs. the CUDA kernel:

 - FULL pair list (i,j)+(j,i): forces accumulate only into i-atoms, so
   there is no scatter/atomics in the hot loop (the CUDA kernel's
   staggered atomic adds do not map to TPU); energies take a 0.5 factor.
 - exclusions are applied by scaling, not skipping, inside the kernel
   (same convention as nbnxm_cuda_kernel.cuh:487-529), so RF/Ewald
   excluded-pair corrections come out of the same pass.
 - perturbed pairs are masked out entirely and handled by the flat FEP
   pair list (ops/pairlist.build_fep_pairlist) through the soft-core
   module — mirroring the fork's separate FEP kernel
   (nbnxm_fep_cuda_kernel.cuh) but with dvdl/foreign-lambda obtained by
   AD/vmap instead of hand-written derivative code.
 - processed in fixed-size cluster blocks under lax.map so the working
   set stays in VMEM; the Pallas twin (ops/pallas_nb.py) streams the same
   layout explicitly.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import pbc as pbc_mod
from ..core.types import (CoulombType, EnergyTerms, FepCoupling, MdParams,
                          System, VdwModifier)
from ..core.units import ONE_4PI_EPS0
from . import bonded as bonded_mod
from .fep import FepPairData, softcore_pair_energies
from .forces import pairs14_energy
from .nonbonded_ref import rf_constants
from .pairlist import CLUSTER, ClusterPairlist, FepPairlist

R2_FLOOR = 1e-6
TWO_OVER_SQRT_PI = 1.1283791670955126


def lj_table_mode(nbfp_np) -> str:
    """'geometric' when the (T,T,2) table factorizes as sqrt-outer-products
    (GROMACS comb-rule 1/3), enabling the gather-free per-atom fast path;
    'table' otherwise (one-hot MXU contraction)."""
    import numpy as _np
    nbfp_np = _np.asarray(nbfp_np)
    for p in range(2):
        d = _np.sqrt(_np.maximum(_np.diagonal(nbfp_np[:, :, p]), 0.0))
        if not _np.allclose(nbfp_np[:, :, p], _np.outer(d, d),
                            rtol=1e-5, atol=1e-12):
            return "table"
    return "geometric"


def cluster_nb_kernel(x, box, nlist: ClusterPairlist, nbfp, params: MdParams,
                      beta: Optional[float], block: int = 64,
                      block_offset=None, n_blocks: Optional[int] = None,
                      total_blocks: Optional[int] = None,
                      lj_mode: str = "table",
                      compute_virial: bool = False):
    """Analytic forces + energies over the cluster pair list.

    Returns (f_sorted (n_pad,3), e_coul, e_lj[, vir_diag (3,) when
    compute_virial]).  When block_offset /
    n_blocks are given, only cluster blocks [offset, offset+n_blocks) are
    computed and f covers just those rows — the hook spatial sharding uses
    to give each device its block range (parallel/spatial.py)."""
    C = nlist.n_clusters
    nnbr = nlist.nbr.shape[1]
    n_pad = nlist.n_pad
    n = nlist.inv_perm.shape[0]

    block = max(1, min(block, C))
    Cb = (C + block - 1) // block
    if n_blocks is not None and total_blocks is not None:
        Cb = max(Cb, total_blocks)
    Cp = Cb * block
    # i-side rows padded to Cp clusters plus one trailing dummy cluster so
    # the padded neighbour id C always gathers valid (far-away) rows
    total = Cp * CLUSTER + CLUSTER
    extra = total - n_pad

    xs = jnp.where((nlist.perm < n)[:, None], x[jnp.minimum(nlist.perm, n - 1)],
                   1e4 + jnp.arange(n_pad, dtype=x.dtype)[:, None])
    dummy = (2e4 + jnp.arange(extra, dtype=x.dtype)[:, None]
             * jnp.ones(3, x.dtype))
    xs_pad = jnp.concatenate([xs, dummy])                       # (total, 3)
    zpad = jnp.zeros(extra, x.dtype)
    qs_pad = jnp.concatenate([nlist.q_a, zpad])
    ts_pad = jnp.concatenate([nlist.t_a, jnp.zeros(extra, jnp.int32)])
    pert_pad = jnp.concatenate([nlist.pert, zpad])
    valid_pad = jnp.concatenate([(nlist.perm < n).astype(x.dtype), zpad])
    excl_pad = jnp.concatenate(
        [nlist.excl, jnp.full((extra, nlist.excl.shape[1]), -1, jnp.int32)])

    nbr_p = jnp.pad(nlist.nbr, ((0, Cp - C), (0, 0)), constant_values=C)
    nbrm_p = jnp.pad(nlist.nbr_mask, ((0, Cp - C), (0, 0)))

    if n_blocks is None:
        off, n_blocks_eff, keep = None, Cb, n_pad
    else:
        off, n_blocks_eff, keep = block_offset, n_blocks, None
    return cluster_nb_kernel_core(
        xs_pad, qs_pad, ts_pad, pert_pad, valid_pad, excl_pad,
        nbr_p, nbrm_p, box, nbfp, params, beta, block,
        block_offset=off, n_blocks=n_blocks_eff, lj_mode=lj_mode,
        n_keep=keep, compute_virial=compute_virial)


def cluster_nb_kernel_core(xs_pad, qs_pad, ts_pad, pert_pad, valid_pad,
                           excl_pad, nbr_p, nbrm_p, box, nbfp,
                           params: MdParams, beta: Optional[float],
                           block: int, block_offset=None,
                           n_blocks: Optional[int] = None,
                           lj_mode: str = "table",
                           n_keep: Optional[int] = None,
                           compute_virial: bool = False):
    """Pair-interaction core over pre-arranged padded row arrays.

    xs_pad..excl_pad: (ncl*CLUSTER, ...) rows in cluster-sorted order,
    where ncl includes any dummy clusters; nbr_p/nbrm_p: (Cp, nnbr)
    cluster ids indexing into those rows (same id space as excl_pad's
    exclusion ids).  Split from cluster_nb_kernel so the halo-exchange
    spatial path (parallel/spatial.py) can feed [left | own | right]
    concatenated blocks with locally remapped ids — the dd_move_x
    analogue (reference: domdec/domdec.cpp:263)."""
    total = xs_pad.shape[0]
    nnbr = nbr_p.shape[1]
    x = xs_pad
    T = nbfp.shape[0]

    if lj_mode == "geometric":
        # comb-rule-1/3 fast path: c6_ij = s6_i s6_j with s6 = sqrt(c6_ii)
        diag6 = jnp.sqrt(jnp.maximum(jnp.diagonal(nbfp[:, :, 0]), 0.0))
        diag12 = jnp.sqrt(jnp.maximum(jnp.diagonal(nbfp[:, :, 1]), 0.0))
        s6_pad = diag6[ts_pad]
        s12_pad = diag12[ts_pad]

    epsfac = ONE_4PI_EPS0 / params.epsilon_r
    rc2 = params.rcoulomb**2
    rv2 = params.rvdw**2
    if params.coulomb == CoulombType.REACTION_FIELD:
        krf, crf = rf_constants(params)
    rcinv6 = 1.0 / params.rvdw**6

    ids = jnp.arange(total, dtype=jnp.int32)

    # Structure-of-arrays coordinate planes: the pair grid is laid out
    # (block, 8, J) with the large J dimension on VPU lanes; carrying xyz
    # as a trailing dim of 3 would waste 125/128 lanes.
    # All j-side data is gathered at CLUSTER-row granularity ((ncl, 8) rows
    # indexed by nbr) — per-element gathers measured ~12 ns/element on TPU
    # while row gathers are ~free; this is the analogue of the reference
    # kernel staging whole j-clusters (nbnxm_cuda_kernel.cuh:423-432).
    ncl = total // CLUSTER

    def rows(a):
        return a.reshape((ncl, CLUSTER) + a.shape[1:])

    xs_xr = rows(xs_pad[:, 0])
    xs_yr = rows(xs_pad[:, 1])
    xs_zr = rows(xs_pad[:, 2])
    qs_r = rows(qs_pad)
    ts_r = rows(ts_pad)
    pert_r = rows(pert_pad)
    valid_r = rows(valid_pad)
    if lj_mode == "geometric":
        s6_r = rows(s6_pad)
        s12_r = rows(s12_pad)

    def one_block(cb):
        c0 = cb * block
        # i data: (block*8,)
        i_slice = jax.lax.dynamic_slice(xs_pad, (c0 * CLUSTER, 0),
                                        (block * CLUSTER, 3))
        i_ids = jax.lax.dynamic_slice(ids, (c0 * CLUSTER,), (block * CLUSTER,))
        qi = jax.lax.dynamic_slice(qs_pad, (c0 * CLUSTER,), (block * CLUSTER,))
        ti = jax.lax.dynamic_slice(ts_pad, (c0 * CLUSTER,), (block * CLUSTER,))
        pi = jax.lax.dynamic_slice(pert_pad, (c0 * CLUSTER,), (block * CLUSTER,))
        vi = jax.lax.dynamic_slice(valid_pad, (c0 * CLUSTER,), (block * CLUSTER,))
        ei = jax.lax.dynamic_slice(
            excl_pad, (c0 * CLUSTER, 0),
            (block * CLUSTER, excl_pad.shape[1]))           # sorted ids, -1 pad

        nbr_b = jax.lax.dynamic_slice(nbr_p, (c0, 0), (block, nnbr))
        nbrm_b = jax.lax.dynamic_slice(nbrm_p, (c0, 0), (block, nnbr))

        # j atom sorted ids: (block, nnbr*8) — arithmetic, no gather
        j_ids = (nbr_b[:, :, None] * CLUSTER
                 + jnp.arange(CLUSTER, dtype=jnp.int32)[None, None, :]
                 ).reshape(block, nnbr * CLUSTER)

        def jgather(ar):  # (ncl, 8) -> (block, J) via whole-cluster rows
            return ar[nbr_b].reshape(block, nnbr * CLUSTER)

        xj_x = jgather(xs_xr)                                # (block, J)
        xj_y = jgather(xs_yr)
        xj_z = jgather(xs_zr)
        qj = jgather(qs_r)
        pj = jgather(pert_r)
        vj = jgather(valid_r) * jnp.repeat(nbrm_b, CLUSTER, axis=1)

        # reshape i to (block, 8, ...)
        xi = i_slice.reshape(block, CLUSTER, 3)
        xi_x = xi[:, :, 0:1]
        xi_y = xi[:, :, 1:2]
        xi_z = xi[:, :, 2:3]
        qi = qi.reshape(block, CLUSTER)
        ti = ti.reshape(block, CLUSTER)
        pi = pi.reshape(block, CLUSTER)
        vi = vi.reshape(block, CLUSTER)
        iid = i_ids.reshape(block, CLUSTER)
        ei = ei.reshape(block, CLUSTER, -1)

        # per-component triclinic minimum image (pbc_dx semantics)
        dxx = xi_x - xj_x[:, None, :]                        # (block, 8, J)
        dxy = xi_y - xj_y[:, None, :]
        dxz = xi_z - xj_z[:, None, :]
        s = jnp.round(dxz / box[2, 2])
        dxx = dxx - s * box[2, 0]
        dxy = dxy - s * box[2, 1]
        dxz = dxz - s * box[2, 2]
        s = jnp.round(dxy / box[1, 1])
        dxx = dxx - s * box[1, 0]
        dxy = dxy - s * box[1, 1]
        dxx = dxx - jnp.round(dxx / box[0, 0]) * box[0, 0]

        r2 = dxx * dxx + dxy * dxy + dxz * dxz               # (block, 8, J)
        r2 = jnp.maximum(r2, R2_FLOOR)
        rinv = jax.lax.rsqrt(r2)
        rinv2 = rinv * rinv

        # masks
        pairm = (vi[:, :, None] * vj[:, None, :]
                 * (iid[:, :, None] != j_ids[:, None, :])
                 * (1.0 - jnp.maximum(pi[:, :, None], pj[:, None, :])))
        # exclusion: any of i's exclusion partners == j id (small static K
        # loop keeps the compare in the (block, 8, J) layout)
        exm = jnp.zeros_like(r2, dtype=bool)
        for k in range(ei.shape[-1]):
            exm = exm | (ei[:, :, k:k + 1] == j_ids[:, None, :])
        exm = exm.astype(x.dtype)
        incl = (1.0 - exm)
        in_c = (r2 < rc2).astype(x.dtype) * pairm
        in_v = (r2 < rv2).astype(x.dtype) * pairm * incl

        # ---- LJ pair parameters ----
        if lj_mode == "geometric":
            s6i = jax.lax.dynamic_slice(s6_pad, (c0 * CLUSTER,),
                                        (block * CLUSTER,)).reshape(block,
                                                                    CLUSTER)
            s12i = jax.lax.dynamic_slice(s12_pad, (c0 * CLUSTER,),
                                         (block * CLUSTER,)).reshape(block,
                                                                     CLUSTER)
            c6 = s6i[:, :, None] * jgather(s6_r)[:, None, :]
            c12 = s12i[:, :, None] * jgather(s12_r)[:, None, :]
        else:
            # general table: one-hot j-type contraction on the MXU instead
            # of a 2.7M-element serialized gather (measured 47 ms -> matmul)
            tj = jgather(ts_r)
            onehot_j = (tj[:, None, :]
                        == jnp.arange(T, dtype=jnp.int32)[None, :, None]
                        ).astype(x.dtype)                      # (block, T, J)
            rows_c6 = nbfp[:, :, 0][ti]                        # (block, 8, T)
            rows_c12 = nbfp[:, :, 1][ti]
            # HIGHEST precision: the default matmul precision truncates
            # fp32 operands to bf16 on the MXU, which corrupts the LJ
            # parameters at the 1e-3 level (observed as a 0.75% LJ energy
            # error at 12k atoms)
            c6 = jnp.einsum('bit,btj->bij', rows_c6, onehot_j,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=x.dtype)
            c12 = jnp.einsum('bit,btj->bij', rows_c12, onehot_j,
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=x.dtype)
        rinv6 = jnp.minimum(rinv2 * rinv2 * rinv2, 1e15)
        rinv12 = rinv6 * rinv6
        if params.vdw_type == "pme":
            # LJ-PME real-space kernel: dispersion Ewald-split with
            # g(u) = e^-u (1+u+u^2/2), u = beta6^2 r^2; force factor
            # -(6 g + u^3 e^-u) c6 r^-8 (reference: nbnxm LJ-PME
            # F_E kernels; reciprocal part in ops/ljpme.py)
            from .nonbonded_ref import ewald_beta as _eb
            import math as _math
            b6 = _eb(params.rvdw, params.ewald_rtol_lj)
            u = (b6 * b6) * r2
            eu = jnp.exp(-u)
            g6 = eu * (1.0 + u + 0.5 * u * u)
            e_lj_pair = c12 * rinv12 - c6 * g6 * rinv6
            f_lj = (12.0 * c12 * rinv12
                    - (6.0 * g6 + u * u * u * eu) * c6 * rinv6) * rinv2
            if params.vdw_modifier == VdwModifier.POTENTIAL_SHIFT:
                u_c = (b6 * params.rvdw) ** 2
                g_c = float(_math.exp(-u_c)
                            * (1.0 + u_c + 0.5 * u_c * u_c))
                e_lj_pair = e_lj_pair - (c12 * rcinv6 * rcinv6
                                         - c6 * g_c * rcinv6)
            e_lj_pair = e_lj_pair * in_v
            f_lj = f_lj * in_v
            # fall through to Coulomb with the pme-split LJ applied
        else:
            e_lj_pair = c12 * rinv12 - c6 * rinv6
            f_lj = (12.0 * c12 * rinv12 - 6.0 * c6 * rinv6) * rinv2
        if params.vdw_type == "pme":
            pass
        elif params.vdw_modifier == VdwModifier.POTENTIAL_SHIFT:
            e_lj_pair = e_lj_pair - (c12 * rcinv6 * rcinv6 - c6 * rcinv6)
        elif params.vdw_modifier == VdwModifier.FORCE_SWITCH:
            # force-switched LJ (reference: interaction_const.cpp:216
            # force_switch_constants, nbnxm_cuda_kernel_utils.cuh
            # calculate_force_switch_F_E); energy matches the dense
            # oracle's _lj_pair_energy, force is its analytic -dE/dr / r
            from .nonbonded_ref import forceswitch_constants
            c2d, c3d, cp6 = forceswitch_constants(
                6.0, params.rvdw_switch, params.rvdw)
            c2r, c3r, cp12 = forceswitch_constants(
                12.0, params.rvdw_switch, params.rvdw)
            r = r2 * rinv
            rs = jnp.maximum(r - params.rvdw_switch, 0.0)
            rs3 = rs * rs * rs
            e_lj_pair = (e_lj_pair
                         + c12 * (-4.0 * c2r * rs3 - 3.0 * c3r * rs3 * rs
                                  + cp12)
                         - c6 * (-2.0 * c2d * rs3 - 1.5 * c3d * rs3 * rs
                                 + cp6))
            f_lj = f_lj + (12.0 * c12 * (c2r + c3r * rs)
                           - 6.0 * c6 * (c2d + c3d * rs)) * rs * rs * rinv
        elif params.vdw_modifier == VdwModifier.POTENTIAL_SWITCH:
            r = r2 * rinv
            r1, rcv = params.rvdw_switch, params.rvdw
            d = rcv - r1
            t = jnp.clip((r - r1) / d, 0.0, 1.0)
            sw = 1.0 + t**3 * (-10.0 + t * (15.0 - 6.0 * t))
            dsw = (t**2 * (-30.0 + t * (60.0 - 30.0 * t))) / d
            f_lj = f_lj * sw - e_lj_pair * dsw * rinv
            e_lj_pair = e_lj_pair * sw
        e_lj_pair = e_lj_pair * in_v
        f_lj = f_lj * in_v

        # ---- Coulomb ----
        qq = epsfac * qi[:, :, None] * qj[:, None, :]
        if params.coulomb == CoulombType.REACTION_FIELD:
            e_c = qq * (incl * rinv + krf * r2 - crf) * in_c
            f_c = qq * (incl * rinv2 * rinv - 2.0 * krf) * in_c
        elif params.coulomb == CoulombType.PME:
            br = beta * (r2 * rinv)
            erfc_t = jax.lax.erfc(br)
            gauss = jnp.exp(-br * br)
            e_c = qq * rinv * (erfc_t - (1.0 - incl)) * in_c
            f_c = (qq * rinv2
                   * ((incl - (1.0 - erfc_t)) * rinv
                      + beta * TWO_OVER_SQRT_PI * gauss) * in_c)
        else:  # plain cutoff
            e_c = qq * incl * (rinv - 1.0 / params.rcoulomb) * in_c
            f_c = qq * incl * rinv2 * rinv * in_c

        fscal = f_lj + f_c
        f_ix = jnp.sum(fscal * dxx, axis=2)                   # (block, 8)
        f_iy = jnp.sum(fscal * dxy, axis=2)
        f_iz = jnp.sum(fscal * dxz, axis=2)
        f_i = jnp.stack([f_ix, f_iy, f_iz], axis=-1)
        e_lj = jnp.sum(e_lj_pair)
        e_c_tot = jnp.sum(e_c)
        if compute_virial:
            # diagonal pair virial: the fscal*dx products are already in
            # registers (reference: nbnxm kernels accumulate shift forces
            # for calc_virial; here the per-pair form directly)
            vir = jnp.stack([jnp.sum(fscal * dxx * dxx),
                             jnp.sum(fscal * dxy * dxy),
                             jnp.sum(fscal * dxz * dxz)])
        else:
            vir = jnp.zeros((3,), x.dtype)
        return f_i.reshape(block * CLUSTER, 3), e_c_tot, e_lj, vir

    off = jnp.asarray(0 if block_offset is None else block_offset, jnp.int32)
    blocks = off + jnp.arange(n_blocks)
    f_blocks, e_c, e_lj, vir_b = jax.lax.map(one_block, blocks)
    f_rows = f_blocks.reshape(n_blocks * block * CLUSTER, 3)
    if n_keep is not None:
        f_rows = f_rows[:n_keep]
    # pairs are visited from both sides: halve sums; virial sign is
    # Xi_aa = -1/2 sum_pairs fscal dx_a^2 over unique pairs
    out = (f_rows, 0.5 * jnp.sum(e_c), 0.5 * jnp.sum(e_lj))
    if compute_virial:
        return out + (-0.25 * jnp.sum(vir_b, axis=0),)
    return out


def fep_pair_energy(x, box, lam_c, lam_v, feplist: FepPairlist,
                    system: System, params: MdParams,
                    beta: Optional[float]):
    """Soft-core energies over the flat FEP pair list (differentiable)."""
    epsfac = ONE_4PI_EPS0 / params.epsilon_r
    ii, jj = feplist.iidx, feplist.jidx
    dx = pbc_mod.pbc_dx(x[ii] - x[jj], box)
    r2 = jnp.sum(dx * dx, -1)
    ta_i, ta_j = system.type_a[ii], system.type_a[jj]
    tb_i, tb_j = system.type_b[ii], system.type_b[jj]
    pair = FepPairData(
        qq_a=epsfac * system.charge_a[ii] * system.charge_a[jj],
        qq_b=epsfac * system.charge_b[ii] * system.charge_b[jj],
        c6_a=system.nbfp[ta_i, ta_j, 0], c12_a=system.nbfp[ta_i, ta_j, 1],
        c6_b=system.nbfp[tb_i, tb_j, 0], c12_b=system.nbfp[tb_i, tb_j, 1])
    v_c, v_v = softcore_pair_energies(
        r2, pair, lam_c, lam_v, feplist.included, feplist.excluded,
        is_self=jnp.zeros_like(r2), fep=params.fep, params=params, beta=beta)
    return jnp.sum(v_c), jnp.sum(v_v)


def make_cluster_force_fn(system: System, params: MdParams,
                          pme_recip_fn: Optional[Callable] = None,
                          has_fep: Optional[bool] = None,
                          block: int = 64,
                          use_pallas: bool = False,
                          pallas_interpret: bool = False,
                          pme_recip_force_fn: Optional[Callable] = None,
                          nb_kernel_override: Optional[Callable] = None):
    """Production force function: force_fn(x, box, lam, nlist, feplist)
    -> (f, EnergyTerms).  use_pallas routes the plain nonbonded kernel
    through the Pallas supercluster kernel (requires a geometric LJ table,
    a rectangular box, and a pair list built with super_nnbr).

    nb_kernel_override(x, box, nlist) -> (f_sorted, e_coul, e_lj): plug-in
    replacement for the plain NB kernel — used by the spatial-DD runner to
    route it through the ppermute halo shard_map (parallel/spatial.py;
    the do_nb_verlet local/non-local dispatch slot, sim_util.cpp:410)."""
    from .forces import get_beta
    beta = get_beta(params)
    import numpy as _np
    if has_fep is None:
        has_fep = bool(_np.asarray(system.perturbed).any())
    lj_mode = lj_table_mode(_np.asarray(system.nbfp))
    if use_pallas and (lj_mode != "geometric"
                       or params.vdw_modifier != VdwModifier.POTENTIAL_SHIFT
                       or params.vdw_type == "pme"):
        # the Pallas kernel implements the potential-shift modifier and the
        # geometric LJ fast path only; other combinations fall back to the
        # XLA kernel (same physics, slower)
        use_pallas = False
    if use_pallas:
        from .pallas_nb import (PallasPrepCl, PallasPrepV2, PallasPrepV2U,
                                pallas_cluster_forces,
                                pallas_cluster_forces_cl,
                                pallas_cluster_forces_v2,
                                pallas_cluster_forces_v2u)
    disp_e_fn = None
    if params.dispcorr:
        from .dispcorr import make_dispersion_correction
        disp_e_fn, _ = make_dispersion_correction(system, params)
    from .ewald_surface import make_surface_corr_fn
    surf_fn = make_surface_corr_fn(system, params)
    ljpme_fn = None
    if params.vdw_type == "pme":
        from .ljpme import make_ljpme_recip_fn
        ljpme_fn = make_ljpme_recip_fn(system, params)

    def other_energy(x, lam, box, feplist):
        """Everything except the plain cluster kernel, as one scalar for
        AD: FEP pairs, bonded, 1-4, PME reciprocal."""
        lam_c, lam_v = lam[FepCoupling.COUL], lam[FepCoupling.VDW]
        lam_b, lam_r = lam[FepCoupling.BONDED], lam[FepCoupling.RESTRAINT]
        terms = EnergyTerms.zeros(x.dtype)
        if has_fep and feplist is not None:
            e_c_fep, e_v_fep = fep_pair_energy(x, box, lam_c, lam_v, feplist,
                                               system, params, beta)
            terms = terms.replace(coulomb=e_c_fep, lj=e_v_fep)
        for name, il in system.bonded.items():
            if il.n == 0:
                continue
            _, _, fn = bonded_mod.TERMS[name]
            lam_term = (lam_r if name in bonded_mod.RESTRAINT_TERMS
                        else lam_b)
            e = (fn(x, box, il, lam_term, params.disre_fc)
                 if name == "disres" else fn(x, box, il, lam_term))
            ch = bonded_mod.TERM_CHANNEL[name]
            terms = terms.replace(**{ch: getattr(terms, ch) + e})
        if system.cmap is not None and system.cmap.n > 0:
            from .cmap import cmap_energy
            terms = terms.replace(
                dihedrals=terms.dihedrals + cmap_energy(x, box, system.cmap))
        if system.orires is not None and params.orires_fc > 0:
            from .orires import orires_energy
            terms = terms.replace(
                restraints=terms.restraints
                + orires_energy(x, box, system.orires, params.orires_fc))
        if system.pairs14.n > 0:
            e14c, e14l = pairs14_energy(x, box, system, lam_c, lam_v, params)
            terms = terms.replace(coul14=e14c, lj14=e14l)
        if pme_recip_fn is not None and pme_recip_force_fn is None:
            terms = terms.replace(coul_recip=pme_recip_fn(x, box, lam_c))
        if surf_fn is not None:
            terms = terms.replace(
                coul_recip=terms.coul_recip + surf_fn(x, box, lam_c))
        if ljpme_fn is not None:
            terms = terms.replace(lj_recip=terms.lj_recip + ljpme_fn(x, box))
        return terms.epot, terms

    grad_other = jax.value_and_grad(other_energy, argnums=(0, 1), has_aux=True)
    grad_other_f = jax.grad(other_energy, argnums=0, has_aux=True)

    def force_fn(x, box, lam, nlist: ClusterPairlist,
                 feplist: Optional[FepPairlist] = None, prep=None,
                 need_energy: bool = True, need_virial: bool = False,
                 recip_scale: float = 1.0, skip_recip: bool = False,
                 pme_blocks=None):
        """need_energy=False runs the force-only kernel flavor and skips
        the dV/dlambda backward pass (the reference computes energies only
        at nstcalcenergy steps; F vs VF kernels in nbnxm_cuda.cu).

        recip_scale/skip_recip implement multiple time stepping for the
        PME reciprocal force (reference: mdlib MTS, mts-level2-forces =
        longrange-nonbonded): off-steps skip the recip evaluation, on-
        steps apply the recip FORCE scaled by the factor (impulse); the
        recip energy/dvdl stay unscaled instantaneous values.  Only
        meaningful on the hand-written-gather recip path
        (pme_recip_force_fn).

        need_virial=True additionally fills terms.vir_diag with the
        diagonal potential virial, assembled as kernel-accumulated pair
        sums for the NB loop plus a strain gradient of the cheap terms
        (reference: sim_util.cpp calc_virial from the same force pass) —
        NPT then needs no second full force evaluation.  Supported on
        the XLA cluster kernel and the v2u Pallas path."""
        nb_vir = jnp.zeros((3,), x.dtype)
        if nb_kernel_override is not None:
            f_sorted, e_coul, e_lj = nb_kernel_override(
                x, box, nlist, prep=prep, need_energy=need_energy)
        elif use_pallas:
            if isinstance(prep, PallasPrepV2U):
                out = pallas_cluster_forces_v2u(
                    x, box, nlist, system.nbfp, params, beta,
                    interpret=pallas_interpret, prep=prep,
                    compute_energy=need_energy,
                    compute_virial=need_virial)
                if need_virial:
                    f_sorted, e_coul, e_lj, nb_vir = out
                else:
                    f_sorted, e_coul, e_lj = out
            elif isinstance(prep, PallasPrepV2) or (prep is None
                                                    and nlist.nbr_shift
                                                    is not None):
                f_sorted, e_coul, e_lj = pallas_cluster_forces_v2(
                    x, box, nlist, system.nbfp, params, beta,
                    interpret=pallas_interpret, prep=prep,
                    compute_energy=need_energy)
            elif prep is None or isinstance(prep, PallasPrepCl):
                f_sorted, e_coul, e_lj = pallas_cluster_forces_cl(
                    x, box, nlist, system.nbfp, params, beta,
                    interpret=pallas_interpret, prep=prep,
                    compute_energy=need_energy)
            else:
                f_sorted, e_coul, e_lj = pallas_cluster_forces(
                    x, box, nlist, system.nbfp, params, beta,
                    interpret=pallas_interpret, prep=prep,
                    compute_energy=need_energy)
        else:
            out = cluster_nb_kernel(
                x, box, nlist, system.nbfp, params, beta, block,
                lj_mode=lj_mode, compute_virial=need_virial)
            if need_virial:
                f_sorted, e_coul, e_lj, nb_vir = out
            else:
                f_sorted, e_coul, e_lj = out
        f_cluster = f_sorted[nlist.inv_perm]                  # gather, no scatter

        if need_energy:
            (_, terms), (gx, glam) = grad_other(x, lam, box, feplist)
        else:
            gx, terms = grad_other_f(x, lam, box, feplist)
            glam = jnp.full((int(FepCoupling.COUNT),), jnp.nan, x.dtype)
        f = f_cluster - gx
        if need_virial:
            # strain gradient of everything outside the NB kernel: FEP
            # pairs, bonded, 1-4, and the reciprocal sum (cheap next to
            # the NB loop; exact, including explicit box dependence)
            def u_cheap(eps):
                s = (1.0 + eps)[None, :]
                e_o, _ = other_energy(x * s, lam, box * s, feplist)
                if pme_recip_force_fn is not None and pme_recip_fn is not None:
                    # recip rides the hand-written gather in the force
                    # path; its virial comes from the AD-able energy fn
                    e_o = e_o + pme_recip_fn(x * s, box * s,
                                             lam[FepCoupling.COUL])
                return e_o

            dude = jax.grad(u_cheap)(jnp.zeros(3, x.dtype))
            vir_total = nb_vir + 0.5 * dude
            terms = terms.replace(vir_diag=vir_total)
        if pme_recip_force_fn is not None and not skip_recip:
            # PME reciprocal via the hand-written gather pass (energy,
            # force, dvdl together) instead of AD through the spread;
            # pme_blocks (rebuild-cadence atom bucketing) routes it
            # through the locality-blocked spread/gather at large scale
            if pme_blocks is not None:
                e_rec, f_rec, dvdl_rec = pme_recip_force_fn(
                    x, box, lam[FepCoupling.COUL], blocks=pme_blocks)
            else:
                e_rec, f_rec, dvdl_rec = pme_recip_force_fn(
                    x, box, lam[FepCoupling.COUL])
            f = f + recip_scale * f_rec
            terms = terms.replace(coul_recip=e_rec)
            if need_energy:
                glam = glam.at[FepCoupling.COUL].add(dvdl_rec)
        terms = terms.replace(coulomb=terms.coulomb + e_coul,
                              lj=terms.lj + e_lj,
                              dvdl=glam)
        if disp_e_fn is not None:
            e_dc, dvdl_dc = disp_e_fn(box, lam[FepCoupling.VDW])
            terms = terms.replace(
                dispcorr=e_dc,
                dvdl=(terms.dvdl if not need_energy
                      else terms.dvdl.at[FepCoupling.VDW].add(dvdl_dc)))
        return f, terms

    return force_fn
