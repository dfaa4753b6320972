"""Pallas TPU cluster-pair nonbonded kernel — the hot-loop analogue of the
reference's CUDA kernel (nbnxm/cuda/nbnxm_cuda_kernel.cuh:141-713).

Mapping of the CUDA design onto TPU (see SURVEY.md §2.6 translation
notes):
 - thread block per i-supercluster (8 clusters / 64 atoms)
     -> one grid program per supercluster; the i-atom tile arrives as a
        streamed (8, 8) BlockSpec block and stays resident for the j loop
 - shared-memory xq staging
     -> j-side data (coordinates, charges, sqrt-LJ params, masks, ids) is
        PRE-GATHERED per supercluster outside the kernel (one XLA row
        gather per rebuild for static data, per step for coordinates) and
        streamed into VMEM as (1, n_groups, 128) blocks, so per-program
        VMEM is O(list length), independent of system size
 - warp loop over packed j-groups with interaction masks
     -> fori_loop over groups of GJ=16 j-clusters, each iteration forming
        a dense (8, 8, 128) pair tile (sublane x lane = 8 x 128 on the
        VPU); masks are computed arithmetically — TPU prefers computing
        masked zeros over divergent skips
 - atomic force scatter + warp shuffles
     -> nothing: the FULL list form accumulates i-forces only
 - exclusion bitmasks -> per-i-atom exclusion-id lists (k-major packed so
   each k-slice is a contiguous (8,8) tile) compared against j ids
   in-register

LJ parameters use the geometric-combination fast path (per-atom sqrt(c6),
sqrt(c12)); general tables route through the XLA kernel instead.
Energies accumulate per program and are summed by the caller.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct as _struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import pbc as pbc_mod
from ..core.types import CoulombType, MdParams
from ..core.units import ONE_4PI_EPS0
from .nonbonded_ref import rf_constants
from .pairlist import CLUSTER, ClusterPairlist

R2_FLOOR = 1e-6
TWO_OVER_SQRT_PI = 1.1283791670955126
BI = 8          # i-clusters per supercluster/program (64 atoms)
GJ = 64         # j-clusters per inner iteration (512 lanes = 4 vregs per op)
GJC = 16        # v2 kernel: j-clusters per i-cluster per group (128 lanes)


def _erfc_poly(x):
    """erfc for x >= 0, Abramowitz & Stegun 7.1.26 (|err| < 1.5e-7) —
    Mosaic has no erfc primitive; the reference GPU kernels use the same
    class of polynomial/tabulated approximation (pmecorrF,
    nbnxm_cuda_kernel_utils.cuh)."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return poly * jnp.exp(-x * x)


def _pmecorr_f(z2):
    """Rational fit of the Ewald force correction
    d/dr[-erf(br)/r] expressed so that F/r = qq (1/r^3 + b^3 pmecorrF(b^2 r^2));
    coefficients from the reference's analytical Ewald kernels
    (nbnxm_cuda_kernel_utils.cuh pmecorrF) — one polynomial replaces
    erfc + exp in the force-only kernel flavor."""
    FN = (-1.7357322914161492954e-8, 1.4703624142580877519e-6,
          -0.000053401640219807709149, 0.0010054721316683106153,
          -0.019278317264888380590, 0.069670166153766424023,
          -0.75225204789749321333)
    FD = (0.0011193462567257629232, 0.014866955030185295499,
          0.11583842382862377919, 0.50736591960530292870, 1.0)
    z4 = z2 * z2
    poly_fd0 = FD[0] * z4 + FD[2]
    poly_fd1 = FD[1] * z4 + FD[3]
    poly_fd0 = poly_fd0 * z4 + FD[4]
    poly_fd0 = poly_fd1 * z2 + poly_fd0
    poly_fn0 = FN[0] * z4 + FN[2]
    poly_fn1 = FN[1] * z4 + FN[3]
    poly_fn0 = poly_fn0 * z4 + FN[4]
    poly_fn1 = poly_fn1 * z4 + FN[5]
    poly_fn0 = poly_fn0 * z4 + FN[6]
    poly_fn0 = poly_fn1 * z2 + poly_fn0
    return poly_fn0 / poly_fd0


def _make_kernel(n_groups: int, n_excl: int, params: MdParams, beta,
                 epsfac: float, bi: int = BI, compute_energy: bool = True):
    """compute_energy=False builds the force-only flavor (the reference's
    F vs VF CUDA kernel split, nbnxm_cuda.cu kernel tables): energies and
    the erfc/exp evaluations drop out of the hot loop; the Ewald force
    uses the pmecorrF rational polynomial instead."""
    rc2 = params.rcoulomb ** 2
    rv2 = params.rvdw ** 2
    rcinv6 = 1.0 / params.rvdw ** 6
    if params.coulomb == CoulombType.REACTION_FIELD:
        krf, crf = rf_constants(params)

    def kernel(box_ref,                      # SMEM (1, 3) f32 box diagonal
               ng_ref,                       # SMEM (1, 1, 1) i32 group count
               ix_ref, iy_ref, iz_ref,       # VMEM (BI, 8) i-atom blocks
               iq_ref, is6_ref, is12_ref,    # VMEM (BI, 8)
               ipv_ref,                      # VMEM (BI, 8) valid*(1-pert)
               iex_ref,                      # VMEM (BI, K*8) i32, k-major
               jx_ref, jy_ref, jz_ref,       # VMEM (1, n_groups, 128)
               jq_ref, js6_ref, js12_ref,    # VMEM (1, n_groups, 128)
               jpv_ref, jid_ref,             # VMEM (1, n_groups, 128) i32
               fx_ref, fy_ref, fz_ref,       # out VMEM (BI, 8)
               e_ref):                       # out SMEM (1, 1, 2)
        pid = pl.program_id(0)
        c0 = pid * bi

        def col(ref):
            return ref[...][0][:, :, None]              # (bi, 8, 1)

        xi_x = col(ix_ref)
        xi_y = col(iy_ref)
        xi_z = col(iz_ref)
        qi = col(iq_ref)
        s6i = col(is6_ref)
        s12i = col(is12_ref)
        pvi = col(ipv_ref)
        iid = (c0 * CLUSTER
               + jax.lax.broadcasted_iota(jnp.int32, (bi, CLUSTER, 1), 0)
               * CLUSTER
               + jax.lax.broadcasted_iota(jnp.int32, (bi, CLUSTER, 1), 1))

        bx = box_ref[0, 0]
        by = box_ref[0, 1]
        bz = box_ref[0, 2]
        ibx = 1.0 / bx
        iby = 1.0 / by
        ibz = 1.0 / bz

        def j_group(g, acc):
            fx, fy, fz, e_c, e_lj = acc
            # everything j-side streams as row g of (1, n_groups, 128)
            xj = jx_ref[0:1, pl.ds(g, 1), :]
            yj = jy_ref[0:1, pl.ds(g, 1), :]
            zj = jz_ref[0:1, pl.ds(g, 1), :]
            qj = jq_ref[0:1, pl.ds(g, 1), :]
            s6j = js6_ref[0:1, pl.ds(g, 1), :]
            s12j = js12_ref[0:1, pl.ds(g, 1), :]
            pvj = jpv_ref[0:1, pl.ds(g, 1), :]
            jid = jid_ref[0:1, pl.ds(g, 1), :]

            # rectangular minimum image (triclinic uses the XLA kernel)
            dx = xi_x - xj
            dy = xi_y - yj
            dz = xi_z - zj
            dx = dx - jnp.floor(dx * ibx + 0.5) * bx
            dy = dy - jnp.floor(dy * iby + 0.5) * by
            dz = dz - jnp.floor(dz * ibz + 0.5) * bz
            r2 = jnp.maximum(dx * dx + dy * dy + dz * dz, R2_FLOOR)
            rinv = jax.lax.rsqrt(r2)
            rinv2 = rinv * rinv

            pairm = pvi * pvj * (iid != jid)
            exm = jnp.zeros(r2.shape, jnp.bool_)
            for k in range(n_excl):
                ei_k = iex_ref[0, :, k * CLUSTER:(k + 1) * CLUSTER][:, :, None]
                exm = exm | (ei_k == jid)
            incl = 1.0 - exm.astype(r2.dtype)
            in_c = jnp.where(r2 < rc2, pairm, 0.0)
            in_v = jnp.where(r2 < rv2, pairm * incl, 0.0)

            c6 = s6i * s6j
            c12 = s12i * s12j
            rinv6 = jnp.minimum(rinv2 * rinv2 * rinv2, 1e15)
            rinv12 = rinv6 * rinv6
            f_lj = (12.0 * c12 * rinv12 - 6.0 * c6 * rinv6) * rinv2 * in_v
            if compute_energy:
                e_lj_pair = (c12 * rinv12 - c6 * rinv6
                             - (c12 * rcinv6 * rcinv6 - c6 * rcinv6)) * in_v

            qq = epsfac * qi * qj
            if params.coulomb == CoulombType.REACTION_FIELD:
                f_c = qq * (incl * rinv2 * rinv - 2.0 * krf) * in_c
                if compute_energy:
                    e_c_pair = qq * (incl * rinv + krf * r2 - crf) * in_c
            elif params.coulomb == CoulombType.PME:
                if compute_energy:
                    br = beta * (r2 * rinv)
                    erfc_t = _erfc_poly(br)
                    gauss = jnp.exp(-br * br)
                    e_c_pair = qq * rinv * (erfc_t - (1.0 - incl)) * in_c
                    f_c = (qq * rinv2 * ((incl - (1.0 - erfc_t)) * rinv
                                         + beta * TWO_OVER_SQRT_PI * gauss)
                           * in_c)
                else:
                    # force-only: one rational polynomial, no erfc/exp
                    f_c = (qq * (incl * rinv2 * rinv
                                 + (beta * beta * beta)
                                 * _pmecorr_f((beta * beta) * r2))
                           * in_c)
            else:
                f_c = qq * incl * rinv2 * rinv * in_c
                if compute_energy:
                    e_c_pair = qq * incl * (rinv - 1.0 / params.rcoulomb) * in_c

            fscal = f_lj + f_c
            fx = fx + jnp.sum(fscal * dx, axis=2)
            fy = fy + jnp.sum(fscal * dy, axis=2)
            fz = fz + jnp.sum(fscal * dz, axis=2)
            if compute_energy:
                e_c = e_c + jnp.sum(e_c_pair)
                e_lj = e_lj + jnp.sum(e_lj_pair)
            return fx, fy, fz, e_c, e_lj

        z = jnp.zeros((bi, CLUSTER), jnp.float32)
        # dynamic trip count: padded j-groups (all-dummy) are skipped
        fx, fy, fz, e_c, e_lj = jax.lax.fori_loop(
            0, jnp.minimum(ng_ref[0, 0, 0], n_groups), j_group,
            (z, z, z, jnp.float32(0.0), jnp.float32(0.0)))
        fx_ref[...] = fx[None]
        fy_ref[...] = fy[None]
        fz_ref[...] = fz[None]
        e_ref[0, 0, 0] = e_c
        e_ref[0, 0, 1] = e_lj

    return kernel


def _make_kernel_cl(n_groups: int, n_excl: int, params: MdParams, beta,
                    epsfac: float, compute_energy: bool = True):
    """Packed per-i-cluster j-stream kernel with a 2D (supercluster,
    j-group) grid: each grid step works on one (8 i-atoms x 8 clusters x
    128 j-atoms) tile whose j lanes are each i-CLUSTER's own next 16
    j-clusters — per-cluster list tightness at full VPU tile shape, with
    Pallas double-buffering the j streams across grid steps.  The TPU
    equivalent of the reference's per-i-cluster imask pruning
    (nbnxm_cuda_kernel.cuh:415-417): far tiles are never in the stream.
    Groups beyond a supercluster's count are skipped via pl.when."""
    rc2 = params.rcoulomb ** 2
    rv2 = params.rvdw ** 2
    rcinv6 = 1.0 / params.rvdw ** 6
    if params.coulomb == CoulombType.REACTION_FIELD:
        krf, crf = rf_constants(params)
    SB = 8

    def kernel(box_ref,                      # SMEM (1, 3) box diagonal
               ng_ref,                       # SMEM (1, 1, 1) i32 max groups
               ix_ref, iy_ref, iz_ref,       # VMEM (1, 8, SB) [atom, cluster]
               iq_ref, is6_ref, is12_ref,    # VMEM (1, 8, SB)
               ipv_ref,                      # VMEM (1, 8, SB)
               iex_ref,                      # VMEM (1, 8, K*SB) i32 k-major
               jx_ref, jy_ref, jz_ref,       # VMEM (1, 1, SB, 128) group block
               jq_ref, js6_ref, js12_ref,    # VMEM (1, 1, SB, 128)
               jpv_ref, jid_ref,             # VMEM (1, 1, SB, 128)
               fx_ref, fy_ref, fz_ref,       # out VMEM (1, 8, SB) accum
               e_ref):                       # out SMEM (1, 1, 2) accum
        pid = pl.program_id(0)
        g = pl.program_id(1)
        c0 = pid * SB

        @pl.when(g == 0)
        def _init():
            z = jnp.zeros((1, CLUSTER, SB), jnp.float32)
            fx_ref[...] = z
            fy_ref[...] = z
            fz_ref[...] = z
            e_ref[0, 0, 0] = 0.0
            e_ref[0, 0, 1] = 0.0

        @pl.when(g < ng_ref[0, 0, 0])
        def _body():
            def col(ref):
                return ref[0, :, :][:, :, None]          # (8, SB, 1)

            xi_x = col(ix_ref)
            xi_y = col(iy_ref)
            xi_z = col(iz_ref)
            qi = col(iq_ref)
            s6i = col(is6_ref)
            s12i = col(is12_ref)
            pvi = col(ipv_ref)
            iid = (c0 * CLUSTER
                   + jax.lax.broadcasted_iota(jnp.int32, (CLUSTER, SB, 1), 1)
                   * CLUSTER
                   + jax.lax.broadcasted_iota(jnp.int32, (CLUSTER, SB, 1), 0))

            bx = box_ref[0, 0]
            by = box_ref[0, 1]
            bz = box_ref[0, 2]

            xj = jx_ref[0]                                # (1, SB, 128)
            yj = jy_ref[0]
            zj = jz_ref[0]
            qj = jq_ref[0]
            s6j = js6_ref[0]
            s12j = js12_ref[0]
            pvj = jpv_ref[0]
            jid = jid_ref[0]

            dx = xi_x - xj
            dy = xi_y - yj
            dz = xi_z - zj
            dx = dx - jnp.floor(dx * (1.0 / bx) + 0.5) * bx
            dy = dy - jnp.floor(dy * (1.0 / by) + 0.5) * by
            dz = dz - jnp.floor(dz * (1.0 / bz) + 0.5) * bz
            r2 = jnp.maximum(dx * dx + dy * dy + dz * dz, R2_FLOOR)
            rinv = jax.lax.rsqrt(r2)
            rinv2 = rinv * rinv

            pairm = pvi * pvj * (iid != jid)
            exm = jnp.zeros(r2.shape, jnp.bool_)
            for k in range(n_excl):
                ei_k = iex_ref[0, :, k * SB:(k + 1) * SB][:, :, None]
                exm = exm | (ei_k == jid)
            incl = 1.0 - exm.astype(r2.dtype)
            in_c = jnp.where(r2 < rc2, pairm, 0.0)
            in_v = jnp.where(r2 < rv2, pairm * incl, 0.0)

            c6 = s6i * s6j
            c12 = s12i * s12j
            rinv6 = jnp.minimum(rinv2 * rinv2 * rinv2, 1e15)
            rinv12 = rinv6 * rinv6
            f_lj = (12.0 * c12 * rinv12 - 6.0 * c6 * rinv6) * rinv2 * in_v

            qq = epsfac * qi * qj
            if params.coulomb == CoulombType.REACTION_FIELD:
                f_c = qq * (incl * rinv2 * rinv - 2.0 * krf) * in_c
            elif params.coulomb == CoulombType.PME:
                if compute_energy:
                    br = beta * (r2 * rinv)
                    erfc_t = _erfc_poly(br)
                    gauss = jnp.exp(-br * br)
                    f_c = (qq * rinv2
                           * ((incl - (1.0 - erfc_t)) * rinv
                              + beta * TWO_OVER_SQRT_PI * gauss) * in_c)
                else:
                    f_c = (qq * (incl * rinv2 * rinv
                                 + (beta * beta * beta)
                                 * _pmecorr_f((beta * beta) * r2))
                           * in_c)
            else:
                f_c = qq * incl * rinv2 * rinv * in_c

            fscal = f_lj + f_c
            fx_ref[...] += jnp.sum(fscal * dx, axis=2)[None]
            fy_ref[...] += jnp.sum(fscal * dy, axis=2)[None]
            fz_ref[...] += jnp.sum(fscal * dz, axis=2)[None]
            if compute_energy:
                e_lj_pair = (c12 * rinv12 - c6 * rinv6
                             - (c12 * rcinv6 * rcinv6 - c6 * rcinv6)) * in_v
                if params.coulomb == CoulombType.REACTION_FIELD:
                    e_c_pair = qq * (incl * rinv + krf * r2 - crf) * in_c
                elif params.coulomb == CoulombType.PME:
                    e_c_pair = qq * rinv * (erfc_t - (1.0 - incl)) * in_c
                else:
                    e_c_pair = (qq * incl
                                * (rinv - 1.0 / params.rcoulomb) * in_c)
                e_ref[0, 0, 0] += jnp.sum(e_c_pair)
                e_ref[0, 0, 1] += jnp.sum(e_lj_pair)

    return kernel


@_struct.dataclass
class PallasPrepCl:
    """Per-rebuild data for the packed per-cluster-stream kernel."""
    iq: jnp.ndarray       # (S, 8, 8)
    is6: jnp.ndarray
    is12: jnp.ndarray
    ipv: jnp.ndarray
    iex: jnp.ndarray      # (S, 8, K*8) i32
    nbr2: jnp.ndarray     # (S, n_groups, 8, 16) i32 j-cluster ids
    ng: jnp.ndarray       # (S, 1, 1) i32 max group count in the program
    jq: jnp.ndarray       # (S, n_groups*8, 128)
    js6: jnp.ndarray
    js12: jnp.ndarray
    jpv: jnp.ndarray
    jid: jnp.ndarray


def pallas_prepare_cl(nlist: ClusterPairlist, nbfp) -> PallasPrepCl:
    """Build the packed per-cluster streams from the per-cluster lists."""
    from .cluster_nb import lj_table_mode
    import numpy as _np
    if not isinstance(nbfp, jax.core.Tracer):
        assert lj_table_mode(_np.asarray(nbfp)) == "geometric", (
            "Pallas kernel requires a geometric-combination LJ table")
    SB = 8
    n = nlist.inv_perm.shape[0]
    n_pad = nlist.n_pad
    C = nlist.n_clusters
    S = -(-C // SB)
    C_pad = S * SB
    nnbr = nlist.nbr.shape[1]
    K = nlist.excl.shape[1]
    ncl = C_pad + 1   # trailing dummy cluster for padded neighbour id C
    extra = ncl * CLUSTER - n_pad
    nnbr_pad = -(-nnbr // GJ) * GJ
    n_groups = nnbr_pad // GJ

    def plane(a, fill=0.0):
        pad = jnp.full((extra,), fill, a.dtype)
        return jnp.concatenate([a, pad]).reshape(ncl, CLUSTER)

    diag6 = jnp.sqrt(jnp.maximum(jnp.diagonal(nbfp[:, :, 0]), 0.0))
    diag12 = jnp.sqrt(jnp.maximum(jnp.diagonal(nbfp[:, :, 1]), 0.0))
    valid = (nlist.perm < n).astype(jnp.float32)
    pv = valid * (1.0 - nlist.pert)

    q = plane(nlist.q_a)
    s6 = plane(diag6[nlist.t_a])
    s12 = plane(diag12[nlist.t_a])
    pvp = plane(pv)
    excl = jnp.concatenate(
        [nlist.excl, jnp.full((extra, K), -1, jnp.int32)])
    # k-major with clusters on lanes: (S, 8_atom, K*SB_cluster)
    iex = (excl[:C_pad * CLUSTER]
           .reshape(S, SB, CLUSTER, K)
           .transpose(0, 2, 3, 1)
           .reshape(S, CLUSTER, K * SB))

    # (C_pad, nnbr_pad) padded ids -> packed (S, n_groups, SB, GJ)
    nbr_p = jnp.pad(jnp.where(nlist.nbr >= 0, nlist.nbr, C),
                    ((0, C_pad - C), (0, nnbr_pad - nnbr)),
                    constant_values=C)
    count = jnp.sum(nbr_p != C, axis=1)                      # (C_pad,)
    ng = jnp.max((-(-count // GJ)).reshape(S, SB),
                 axis=1).astype(jnp.int32).reshape(S, 1, 1)
    nbr2 = nbr_p.reshape(S, SB, n_groups, GJ).transpose(0, 2, 1, 3)

    def jgather(pl2d):
        return pl2d[nbr2].reshape(S, n_groups * SB, GJ * CLUSTER)

    jid = (nbr2[..., None] * CLUSTER
           + jnp.arange(CLUSTER, dtype=jnp.int32)
           ).reshape(S, n_groups * SB, GJ * CLUSTER)

    def i3(a):
        # (1, 8_atom, SB_cluster): atoms on sublanes, clusters on lanes
        return a[:C_pad].reshape(S, SB, CLUSTER).transpose(0, 2, 1)

    return PallasPrepCl(iq=i3(q), is6=i3(s6), is12=i3(s12), ipv=i3(pvp),
                        iex=iex, nbr2=nbr2, ng=ng,
                        jq=jgather(q), js6=jgather(s6), js12=jgather(s12),
                        jpv=jgather(pvp), jid=jid)


def pallas_cluster_forces_cl(x, box, nlist: ClusterPairlist, nbfp,
                             params: MdParams, beta,
                             prep: Optional[PallasPrepCl] = None,
                             interpret: bool = False,
                             compute_energy: bool = True):
    """(f_sorted (n_pad, 3), e_coul, e_lj) via the packed
    per-cluster-stream kernel (tight lists, full (8,8,128) tiles)."""
    if prep is None:
        prep = pallas_prepare_cl(nlist, nbfp)
    SB = 8
    n = nlist.inv_perm.shape[0]
    n_pad = nlist.n_pad
    C = nlist.n_clusters
    S = prep.iq.shape[0]
    C_pad = S * SB
    K = nlist.excl.shape[1]
    ncl = C_pad + 1
    extra = ncl * CLUSTER - n_pad
    n_groups = prep.jq.shape[1] // SB

    xs = jnp.where((nlist.perm < n)[:, None],
                   x[jnp.minimum(nlist.perm, n - 1)],
                   1e4 + jnp.arange(n_pad, dtype=x.dtype)[:, None])
    dummy = 2e4 + jnp.arange(extra, dtype=x.dtype)[:, None] * jnp.ones(3)
    xs = jnp.concatenate([xs, dummy])
    xx = xs[:, 0].reshape(ncl, CLUSTER)
    xy = xs[:, 1].reshape(ncl, CLUSTER)
    xz = xs[:, 2].reshape(ncl, CLUSTER)

    def jgather(pl2d):
        return pl2d[prep.nbr2].reshape(S, n_groups * SB, GJ * CLUSTER)

    jx = jgather(xx)
    jy = jgather(xy)
    jz = jgather(xz)
    box_diag = jnp.stack([box[0, 0], box[1, 1], box[2, 2]]).reshape(1, 3)

    epsfac = float(ONE_4PI_EPS0 / params.epsilon_r)
    kernel = _make_kernel_cl(n_groups, K, params, beta, epsfac,
                             compute_energy=compute_energy)

    iblk = lambda w: pl.BlockSpec((1, CLUSTER, w), lambda i, g: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
    jrow = lambda: pl.BlockSpec((1, 1, SB, GJ * CLUSTER),
                                lambda i, g: (i, g, 0, 0),
                                memory_space=pltpu.VMEM)

    def i3x(a):
        return a[:C_pad].reshape(S, SB, CLUSTER).transpose(0, 2, 1)

    fx, fy, fz, e = pl.pallas_call(
        kernel,
        grid=(S, n_groups),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i, g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i, g: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            iblk(SB), iblk(SB), iblk(SB),
            iblk(SB), iblk(SB), iblk(SB),
            iblk(SB),
            iblk(K * SB),
            jrow(), jrow(), jrow(),
            jrow(), jrow(), jrow(), jrow(), jrow(),
        ],
        out_specs=[
            iblk(SB), iblk(SB), iblk(SB),
            pl.BlockSpec((1, 1, 2), lambda i, g: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, CLUSTER, SB), jnp.float32),
            jax.ShapeDtypeStruct((S, CLUSTER, SB), jnp.float32),
            jax.ShapeDtypeStruct((S, CLUSTER, SB), jnp.float32),
            jax.ShapeDtypeStruct((S, 1, 2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(box_diag, prep.ng,
      i3x(xx), i3x(xy), i3x(xz),
      prep.iq, prep.is6, prep.is12, prep.ipv, prep.iex,
      jx.reshape(S, n_groups, SB, GJ * CLUSTER),
      jy.reshape(S, n_groups, SB, GJ * CLUSTER),
      jz.reshape(S, n_groups, SB, GJ * CLUSTER),
      prep.jq.reshape(S, n_groups, SB, GJ * CLUSTER),
      prep.js6.reshape(S, n_groups, SB, GJ * CLUSTER),
      prep.js12.reshape(S, n_groups, SB, GJ * CLUSTER),
      prep.jpv.reshape(S, n_groups, SB, GJ * CLUSTER),
      prep.jid.reshape(S, n_groups, SB, GJ * CLUSTER))

    # outputs are (S, 8_atom, SB_cluster): untranspose to atom-major order
    def unt(a):
        return a.transpose(0, 2, 1).reshape(-1)[:n_pad]

    f_sorted = jnp.stack([unt(fx), unt(fy), unt(fz)], axis=-1)
    return f_sorted, 0.5 * jnp.sum(e[:, 0, 0]), 0.5 * jnp.sum(e[:, 0, 1])


@_struct.dataclass
class PallasPrep:
    """Static per-rebuild data for the Pallas kernel: i-side per-atom data
    in (S*BI, 8) cluster rows plus the pre-gathered j-side streams.
    Compute once per pair-list rebuild (md/runner.py) so the per-step work
    is only the coordinate gathers + the kernel itself."""
    iq: jnp.ndarray       # (S*bi, 8)
    is6: jnp.ndarray
    is12: jnp.ndarray
    ipv: jnp.ndarray
    iex: jnp.ndarray      # (S*bi, K*8) i32, k-major
    nbr2: jnp.ndarray     # (S, nnbr_pad)
    ng: jnp.ndarray       # (S, 1, 1) i32 — valid j-group count per program
    jq: jnp.ndarray       # (S, n_groups, 128)
    js6: jnp.ndarray
    js12: jnp.ndarray
    jpv: jnp.ndarray
    jid: jnp.ndarray
    bi: int = _struct.field(pytree_node=False, default=8)


def _dims(nlist: ClusterPairlist, bi: int):
    n = nlist.inv_perm.shape[0]
    n_pad = nlist.n_pad
    C = nlist.n_clusters
    src = nlist.nbr if bi == 1 else nlist.nbr_super
    S = -(-C // bi)
    nnbr_b = src.shape[1]
    K = nlist.excl.shape[1]
    ncl = S * bi + 1     # trailing dummy cluster for padded neighbour id C
    extra = ncl * CLUSTER - n_pad
    nnbr_pad = -(-nnbr_b // GJ) * GJ
    return n, n_pad, C, S, nnbr_b, K, ncl, extra, nnbr_pad


def pallas_prepare(nlist: ClusterPairlist, nbfp, bi: int = 8) -> PallasPrep:
    """bi=1: per-cluster lists ((8,128) tiles, ~3x fewer padded pair
    slots); bi=8: supercluster lists (j loads amortized over 64 i-atoms,
    needs nbr_super)."""
    if bi != 1:
        assert nlist.nbr_super is not None, "build pair list with super_nnbr"
    from .cluster_nb import lj_table_mode
    import numpy as _np
    if not isinstance(nbfp, jax.core.Tracer):
        assert lj_table_mode(_np.asarray(nbfp)) == "geometric", (
            "Pallas kernel requires a geometric-combination LJ table "
            "(comb rule 1/3); LB tables must use the XLA kernel")
    n, n_pad, C, S, nnbr_b, K, ncl, extra, nnbr_pad = _dims(nlist, bi)
    nbr_src = nlist.nbr if bi == 1 else nlist.nbr_super

    def plane(a, fill=0.0):
        pad = jnp.full((extra,), fill, a.dtype)
        return jnp.concatenate([a, pad]).reshape(ncl, CLUSTER)

    diag6 = jnp.sqrt(jnp.maximum(jnp.diagonal(nbfp[:, :, 0]), 0.0))
    diag12 = jnp.sqrt(jnp.maximum(jnp.diagonal(nbfp[:, :, 1]), 0.0))
    valid = (nlist.perm < n).astype(jnp.float32)
    pv = valid * (1.0 - nlist.pert)

    q = plane(nlist.q_a)
    s6 = plane(diag6[nlist.t_a])
    s12 = plane(diag12[nlist.t_a])
    pvp = plane(pv)
    # exclusions: (ncl*8, K) -> k-major (S*BI, K*8) so each k is a
    # contiguous (BI, 8) tile inside the kernel
    excl = jnp.concatenate(
        [nlist.excl, jnp.full((extra, K), -1, jnp.int32)])
    iex = excl.reshape(ncl, CLUSTER, K).transpose(0, 2, 1).reshape(
        ncl, K * CLUSTER)[:S * bi]

    nbr2 = jnp.pad(jnp.where(nbr_src >= 0, nbr_src, C),
                   ((0, 0), (0, nnbr_pad - nnbr_b)), constant_values=C)
    n_groups = nnbr_pad // GJ
    # valid entries are contiguous at the front (top_k order); padded = C
    count = jnp.sum(nbr2 != C, axis=1)
    ng = (-(-count // GJ)).astype(jnp.int32).reshape(S, 1, 1)

    def jgather(pl2d):
        return pl2d[nbr2].reshape(S, n_groups, GJ * CLUSTER)

    jid = (nbr2[:, :, None] * CLUSTER
           + jnp.arange(CLUSTER, dtype=jnp.int32)[None, None, :]
           ).reshape(S, n_groups, GJ * CLUSTER)
    return PallasPrep(iq=q[:S * bi], is6=s6[:S * bi], is12=s12[:S * bi],
                      ipv=pvp[:S * bi], iex=iex, nbr2=nbr2, ng=ng,
                      jq=jgather(q), js6=jgather(s6), js12=jgather(s12),
                      jpv=jgather(pvp), jid=jid, bi=bi)


def pallas_cluster_forces(x, box, nlist: ClusterPairlist, nbfp,
                          params: MdParams, beta: Optional[float],
                          interpret: bool = False,
                          prep: Optional[PallasPrep] = None,
                          compute_energy: bool = True):
    """(f_sorted (n_pad, 3), e_coul, e_lj) via the Pallas supercluster
    kernel.  Requires nlist built with super_nnbr and a geometric LJ
    table; energies use the 0.5 full-list convention like the XLA twin.
    compute_energy=False runs the cheaper force-only kernel flavor and
    returns zero energies (the reference's F kernels)."""
    if prep is None:
        prep = pallas_prepare(nlist, nbfp)
    bi = prep.bi
    n, n_pad, C, S, nnbr_b, K, ncl, extra, nnbr_pad = _dims(nlist, bi)
    n_groups = prep.jq.shape[1]

    xs = jnp.where((nlist.perm < n)[:, None],
                   x[jnp.minimum(nlist.perm, n - 1)],
                   1e4 + jnp.arange(n_pad, dtype=x.dtype)[:, None])
    dummy = 2e4 + jnp.arange(extra, dtype=x.dtype)[:, None] * jnp.ones(3)
    xs = jnp.concatenate([xs, dummy])
    xx = xs[:, 0].reshape(ncl, CLUSTER)
    xy = xs[:, 1].reshape(ncl, CLUSTER)
    xz = xs[:, 2].reshape(ncl, CLUSTER)

    # ONE packed row-gather for all three coordinate planes: the gather
    # cost is per-ROW (measured ~0.26 ns/element for 32-byte rows), so
    # packing x|y|z into 96-byte rows cuts the per-step gather time 3x
    packed = jnp.concatenate([xx, xy, xz], axis=1)        # (ncl, 24)
    gathered = packed[prep.nbr2]                          # (S, nnbr_pad, 24)

    def plane(d):
        return gathered[:, :, d * CLUSTER:(d + 1) * CLUSTER].reshape(
            S, n_groups, GJ * CLUSTER)

    jx = plane(0)
    jy = plane(1)
    jz = plane(2)
    box_diag = jnp.stack([box[0, 0], box[1, 1], box[2, 2]]).reshape(1, 3)

    epsfac = float(ONE_4PI_EPS0 / params.epsilon_r)
    kernel = _make_kernel(n_groups, K, params, beta, epsfac, bi=bi,
                          compute_energy=compute_energy)

    iblk = lambda w: pl.BlockSpec((1, bi, w), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)

    def i3(a, w):
        return a.reshape(S, bi, w)
    jrow = lambda: pl.BlockSpec((1, n_groups, GJ * CLUSTER),
                                lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)

    fx, fy, fz, e = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            iblk(CLUSTER), iblk(CLUSTER), iblk(CLUSTER),
            iblk(CLUSTER), iblk(CLUSTER), iblk(CLUSTER),
            iblk(CLUSTER),
            iblk(K * CLUSTER),
            jrow(), jrow(), jrow(),
            jrow(), jrow(), jrow(), jrow(), jrow(),
        ],
        out_specs=[
            iblk(CLUSTER), iblk(CLUSTER), iblk(CLUSTER),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, bi, CLUSTER), jnp.float32),
            jax.ShapeDtypeStruct((S, bi, CLUSTER), jnp.float32),
            jax.ShapeDtypeStruct((S, bi, CLUSTER), jnp.float32),
            jax.ShapeDtypeStruct((S, 1, 2), jnp.float32),
        ],
        interpret=interpret,
    )(box_diag, prep.ng,
      i3(xx[:S * bi], CLUSTER), i3(xy[:S * bi], CLUSTER),
      i3(xz[:S * bi], CLUSTER),
      i3(prep.iq, CLUSTER), i3(prep.is6, CLUSTER), i3(prep.is12, CLUSTER),
      i3(prep.ipv, CLUSTER), i3(prep.iex, K * CLUSTER),
      jx, jy, jz, prep.jq, prep.js6, prep.js12, prep.jpv, prep.jid)

    f_sorted = jnp.stack([fx.reshape(-1)[:n_pad], fy.reshape(-1)[:n_pad],
                          fz.reshape(-1)[:n_pad]], axis=-1)
    return f_sorted, 0.5 * jnp.sum(e[:, 0, 0]), 0.5 * jnp.sum(e[:, 0, 1])


# ---------------------------------------------------------------------------
# v2 kernel: per-cluster tight j-streams inside supercluster programs.
#
# The supercluster union lists (above) process every j-cluster against all
# 64 i-atoms of the program — measured ~11% pair hit rate at 12k atoms.
# This kernel keeps the 64-atom program granularity but gives each of its
# 8 i-clusters its OWN distance-sorted j-stream in GJC=16-cluster groups
# (128 lanes), roughly halving the processed pair slots.  Further hot-loop
# cuts vs the v1 kernels:
#  - periodic shifts are resolved at build time per (i-cluster, j-entry)
#    and folded into the gathered j coordinates — no floor()/round() in
#    the inner loop (the reference stores the same thing as a shift-vector
#    index per list entry, nbnxm/pairlist.h nbnxn_ci_t::shift);
#  - validity (dummy/perturbed/self) and exclusion masks are precomputed
#    per pair as a 16-bit field in an int32 stream (8 pair bits + 8
#    exclusion bits addressed by the i-atom sublane) — the analogue of the
#    CUDA kernel's imask/exclusion bit pools (nbnxm_cuda_kernel.cuh:415,
#    gpu_types_common.h:307-326);
#  - the Ewald force-only flavor uses an approximate reciprocal for the
#    rational polynomial's divide.
# ---------------------------------------------------------------------------


def _make_kernel_v2(n_groups: int, params: MdParams, beta, epsfac: float,
                    compute_energy: bool = True):
    rc2 = params.rcoulomb ** 2
    rv2 = params.rvdw ** 2
    rcinv6 = 1.0 / params.rvdw ** 6
    if params.coulomb == CoulombType.REACTION_FIELD:
        krf, crf = rf_constants(params)
    SB = 8

    def kernel(ng_ref,                       # SMEM (1, 1, 1) i32 trip count
               ix_ref, iy_ref, iz_ref,       # VMEM (1, 8_atom, 8_cluster)
               iq_ref, is6_ref, is12_ref,    # VMEM (1, 8, 8)
               jx_ref, jy_ref, jz_ref,       # VMEM (1, G, 8, 128) per-step
               jq_ref, js6_ref, js12_ref,    # VMEM (1, G, 8, 128) static
               jm_ref,                       # VMEM (1, G, 8, 128) i32 bits
               fx_ref, fy_ref, fz_ref,       # out VMEM (1, 8, 8)
               e_ref):                       # out SMEM (1, 1, 2)
        def col(ref):
            return ref[0][:, :, None]                   # (8, 8, 1)

        xi_x = col(ix_ref)
        xi_y = col(iy_ref)
        xi_z = col(iz_ref)
        qi = col(iq_ref) * epsfac
        s6i = col(is6_ref)
        s12i = col(is12_ref)
        # i-atom sublane index selects this atom's bits in the mask stream
        a_sub = jax.lax.broadcasted_iota(jnp.int32, (CLUSTER, 1, 1), 0)

        def j_group(g, acc):
            fx, fy, fz, e_c, e_lj = acc
            xj = jx_ref[0, pl.ds(g, 1)][0]               # (8, 128)
            yj = jy_ref[0, pl.ds(g, 1)][0]
            zj = jz_ref[0, pl.ds(g, 1)][0]
            qj = jq_ref[0, pl.ds(g, 1)][0]
            s6j = js6_ref[0, pl.ds(g, 1)][0]
            s12j = js12_ref[0, pl.ds(g, 1)][0]
            m = jm_ref[0, pl.ds(g, 1)][0]

            pairb = ((m >> a_sub) & 1).astype(jnp.float32)        # (8,8,128)
            inclb = ((m >> (a_sub + 8)) & 1).astype(jnp.float32)

            # shifts are baked into xj: plain differences, no minimum image.
            # shifts are baked into xj: plain differences, no minimum image.
            # The upper clamp bounds padding-lane distances (dummy atoms sit
            # at ~1e4) so the Ewald polynomial can't overflow fp32; every
            # clamped pair is beyond the cutoff and fully masked anyway.
            dx = xi_x - xj
            dy = xi_y - yj
            dz = xi_z - zj
            r2 = jnp.clip(dx * dx + dy * dy + dz * dz, R2_FLOOR, 1e6)
            rinv = jax.lax.rsqrt(r2)
            rinv2 = rinv * rinv

            in_c = jnp.where(r2 < rc2, pairb, 0.0)
            in_v = jnp.where(r2 < rv2, pairb * inclb, 0.0)

            c6 = s6i * s6j
            c12 = s12i * s12j
            rinv6 = jnp.minimum(rinv2 * rinv2 * rinv2, 1e15)
            rinv12 = rinv6 * rinv6
            f_lj = (12.0 * c12 * rinv12 - 6.0 * c6 * rinv6) * rinv2 * in_v

            qq = qi * qj
            if params.coulomb == CoulombType.REACTION_FIELD:
                f_c = qq * (inclb * rinv2 * rinv - 2.0 * krf) * in_c
            elif params.coulomb == CoulombType.PME:
                if compute_energy:
                    br = beta * (r2 * rinv)
                    erfc_t = _erfc_poly(br)
                    gauss = jnp.exp(-br * br)
                    f_c = (qq * rinv2
                           * ((inclb - (1.0 - erfc_t)) * rinv
                              + beta * TWO_OVER_SQRT_PI * gauss) * in_c)
                else:
                    f_c = (qq * (inclb * rinv2 * rinv
                                 + (beta * beta * beta)
                                 * _pmecorr_f_recip((beta * beta) * r2))
                           * in_c)
            else:
                f_c = qq * inclb * rinv2 * rinv * in_c

            fscal = f_lj + f_c
            fx = fx + jnp.sum(fscal * dx, axis=2)
            fy = fy + jnp.sum(fscal * dy, axis=2)
            fz = fz + jnp.sum(fscal * dz, axis=2)
            if compute_energy:
                e_lj_pair = (c12 * rinv12 - c6 * rinv6
                             - (c12 * rcinv6 * rcinv6 - c6 * rcinv6)) * in_v
                if params.coulomb == CoulombType.REACTION_FIELD:
                    e_c_pair = qq * (inclb * rinv + krf * r2 - crf) * in_c
                elif params.coulomb == CoulombType.PME:
                    e_c_pair = qq * rinv * (erfc_t - (1.0 - inclb)) * in_c
                else:
                    e_c_pair = (qq * inclb
                                * (rinv - 1.0 / params.rcoulomb) * in_c)
                e_c = e_c + jnp.sum(e_c_pair)
                e_lj = e_lj + jnp.sum(e_lj_pair)
            return fx, fy, fz, e_c, e_lj

        z = jnp.zeros((CLUSTER, SB), jnp.float32)
        fx, fy, fz, e_c, e_lj = jax.lax.fori_loop(
            0, jnp.minimum(ng_ref[0, 0, 0], n_groups), j_group,
            (z, z, z, jnp.float32(0.0), jnp.float32(0.0)))
        fx_ref[...] = fx[None]
        fy_ref[...] = fy[None]
        fz_ref[...] = fz[None]
        e_ref[0, 0, 0] = e_c
        e_ref[0, 0, 1] = e_lj

    return kernel


def _pmecorr_f_recip(z2):
    """_pmecorr_f with the divide replaced by an approximate reciprocal +
    one Newton-Raphson step (the polynomial itself is a ~1e-7 fit, so the
    ~1e-7 refined reciprocal loses nothing)."""
    FN = (-1.7357322914161492954e-8, 1.4703624142580877519e-6,
          -0.000053401640219807709149, 0.0010054721316683106153,
          -0.019278317264888380590, 0.069670166153766424023,
          -0.75225204789749321333)
    FD = (0.0011193462567257629232, 0.014866955030185295499,
          0.11583842382862377919, 0.50736591960530292870, 1.0)
    z4 = z2 * z2
    poly_fd0 = FD[0] * z4 + FD[2]
    poly_fd1 = FD[1] * z4 + FD[3]
    poly_fd0 = poly_fd0 * z4 + FD[4]
    poly_fd0 = poly_fd1 * z2 + poly_fd0
    poly_fn0 = FN[0] * z4 + FN[2]
    poly_fn1 = FN[1] * z4 + FN[3]
    poly_fn0 = poly_fn0 * z4 + FN[4]
    poly_fn1 = poly_fn1 * z4 + FN[5]
    poly_fn0 = poly_fn0 * z4 + FN[6]
    poly_fn0 = poly_fn1 * z2 + poly_fn0
    r = pl.reciprocal(poly_fd0, approx=True)
    r = r * (2.0 - poly_fd0 * r)                  # one NR refinement
    return poly_fn0 * r


@_struct.dataclass
class PallasPrepV2:
    """Per-rebuild data for the v2 per-cluster-stream kernel."""
    iq: jnp.ndarray       # (S, 8_atom, 8_cluster)
    is6: jnp.ndarray
    is12: jnp.ndarray
    ng: jnp.ndarray       # (S, 1, 1) i32 trip count (max over clusters)
    nbr2: jnp.ndarray     # (S, G, 8, GJC) i32 j-cluster ids (pad = C)
    sx: jnp.ndarray       # (S, G, 8, GJC) f32 integer shift counts
    sy: jnp.ndarray
    sz: jnp.ndarray
    jq: jnp.ndarray       # (S, G, 8, 128)
    js6: jnp.ndarray
    js12: jnp.ndarray
    jmask: jnp.ndarray    # (S, G, 8, 128) i32: bit a = pair valid for
    #                       i-atom a, bit 8+a = not excluded against i-atom a
    img: jnp.ndarray      # (n_pad, 3) f32 rebuild-time image counts (sorted)


def pallas_prepare_v2(nlist: ClusterPairlist, nbfp) -> PallasPrepV2:
    """Pack per-cluster lists + shifts + pair bitmasks for the v2 kernel.
    Requires nlist built with compute_shifts=True (nbr_shift, img set)."""
    from .cluster_nb import lj_table_mode
    import numpy as _np
    if not isinstance(nbfp, jax.core.Tracer):
        assert lj_table_mode(_np.asarray(nbfp)) == "geometric", (
            "Pallas kernel requires a geometric-combination LJ table")
    assert nlist.nbr_shift is not None, (
        "build pair list with compute_shifts=True for the v2 kernel")
    SB = 8
    n = nlist.inv_perm.shape[0]
    n_pad = nlist.n_pad
    C = nlist.n_clusters
    S = -(-C // SB)
    C_pad = S * SB
    nnbr = nlist.nbr.shape[1]
    K = nlist.excl.shape[1]
    ncl = C_pad + 1   # trailing dummy cluster for padded neighbour id C
    extra = ncl * CLUSTER - n_pad
    nnbr_pad = -(-nnbr // GJC) * GJC
    G = nnbr_pad // GJC

    def plane(a, fill=0.0):
        pad = jnp.full((extra,), fill, a.dtype)
        return jnp.concatenate([a, pad]).reshape(ncl, CLUSTER)

    diag6 = jnp.sqrt(jnp.maximum(jnp.diagonal(nbfp[:, :, 0]), 0.0))
    diag12 = jnp.sqrt(jnp.maximum(jnp.diagonal(nbfp[:, :, 1]), 0.0))
    valid = (nlist.perm < n).astype(jnp.float32)
    pv = valid * (1.0 - nlist.pert)

    q = plane(nlist.q_a)
    s6 = plane(diag6[nlist.t_a])
    s12 = plane(diag12[nlist.t_a])
    pvp = plane(pv)

    # (C_pad, nnbr_pad) padded neighbour ids and shifts
    nbr_p = jnp.pad(jnp.where(nlist.nbr >= 0, nlist.nbr, C),
                    ((0, C_pad - C), (0, nnbr_pad - nnbr)),
                    constant_values=C)
    sh_p = jnp.pad(nlist.nbr_shift.astype(jnp.float32),
                   ((0, C_pad - C), (0, nnbr_pad - nnbr), (0, 0)))
    count = jnp.sum(nbr_p != C, axis=1)                       # (C_pad,)
    ng = jnp.max((-(-count // GJC)).reshape(S, SB),
                 axis=1).astype(jnp.int32).reshape(S, 1, 1)
    nbr2 = nbr_p.reshape(S, SB, G, GJC).transpose(0, 2, 1, 3)
    sh2 = sh_p.reshape(S, SB, G, GJC, 3).transpose(0, 2, 1, 3, 4)

    def jgather(pl2d):
        return pl2d[nbr2].reshape(S, G, SB, GJC * CLUSTER)

    # pair validity + exclusion bits, packed per j-atom lane
    jid = nbr2[..., None] * CLUSTER + jnp.arange(CLUSTER, dtype=jnp.int32)
    #     (S, G, 8c, GJC, 8a)
    iid = (jnp.arange(C_pad, dtype=jnp.int32)[:, None] * CLUSTER
           + jnp.arange(CLUSTER, dtype=jnp.int32)
           ).reshape(S, SB, CLUSTER)                          # (S, 8c, 8i)
    pvj = jgather(pvp).reshape(S, G, SB, GJC, CLUSTER)
    pvi = pvp[:C_pad].reshape(S, SB, CLUSTER)
    excl = jnp.concatenate(
        [nlist.excl, jnp.full((extra, K), -1, jnp.int32)])
    ei = excl[:C_pad * CLUSTER].reshape(S, SB, CLUSTER, K)

    # pair bit: pv_i * pv_j * (iid != jid); excl bit: jid not in excl_i
    pair_bits = jnp.zeros((S, G, SB, GJC * CLUSTER), jnp.int32)
    excl_bits = jnp.zeros((S, G, SB, GJC * CLUSTER), jnp.int32)
    jid_f = jid.reshape(S, G, SB, GJC * CLUSTER)
    pvj_f = pvj.reshape(S, G, SB, GJC * CLUSTER)
    for a in range(CLUSTER):
        pv_ia = pvi[:, :, a][:, None, :, None]                # (S,1,8c,1)
        iid_a = iid[:, :, a][:, None, :, None]
        pair_a = ((pvj_f > 0) & (pv_ia > 0) & (jid_f != iid_a))
        pair_bits = pair_bits | (pair_a.astype(jnp.int32) << a)
        exm = jnp.zeros(jid_f.shape, bool)
        for k in range(K):
            ei_ak = ei[:, :, a, k][:, None, :, None]
            exm = exm | (jid_f == ei_ak)
        excl_bits = excl_bits | ((~exm).astype(jnp.int32) << (8 + a))
    jmask = pair_bits | excl_bits

    def i3(a):
        # (S, 8_atom, 8_cluster)
        return a[:C_pad].reshape(S, SB, CLUSTER).transpose(0, 2, 1)

    return PallasPrepV2(
        iq=i3(q), is6=i3(s6), is12=i3(s12), ng=ng, nbr2=nbr2,
        sx=sh2[..., 0], sy=sh2[..., 1], sz=sh2[..., 2],
        jq=jgather(q), js6=jgather(s6), js12=jgather(s12), jmask=jmask,
        img=nlist.img)


def pallas_cluster_forces_v2(x, box, nlist: ClusterPairlist, nbfp,
                             params: MdParams, beta,
                             prep: Optional[PallasPrepV2] = None,
                             interpret: bool = False,
                             compute_energy: bool = True):
    """(f_sorted (n_pad, 3), e_coul, e_lj) via the v2 per-cluster-stream
    kernel (requires nlist built with compute_shifts=True)."""
    if prep is None:
        prep = pallas_prepare_v2(nlist, nbfp)
    SB = 8
    n = nlist.inv_perm.shape[0]
    n_pad = nlist.n_pad
    C = nlist.n_clusters
    S = prep.iq.shape[0]
    C_pad = S * SB
    ncl = C_pad + 1
    extra = ncl * CLUSTER - n_pad
    G = prep.nbr2.shape[1]

    # continuous rebuild-frame coordinates: raw positions minus the
    # rebuild-time image counts (so the build-time shifts stay exact for
    # the whole nstlist window even if an atom wanders across the box)
    bd = jnp.stack([box[0, 0], box[1, 1], box[2, 2]])
    xw = x[jnp.minimum(nlist.perm, n - 1)] - prep.img * bd[None, :]
    xs = jnp.where((nlist.perm < n)[:, None], xw,
                   1e4 + jnp.arange(n_pad, dtype=x.dtype)[:, None])
    dummy = 2e4 + jnp.arange(extra, dtype=x.dtype)[:, None] * jnp.ones(3)
    xs = jnp.concatenate([xs, dummy])
    xx = xs[:, 0].reshape(ncl, CLUSTER)
    xy = xs[:, 1].reshape(ncl, CLUSTER)
    xz = xs[:, 2].reshape(ncl, CLUSTER)

    packed = jnp.concatenate([xx, xy, xz], axis=1)            # (ncl, 24)
    g = packed[prep.nbr2]                                     # (S,G,8,GJC,24)
    jx = (g[..., 0:CLUSTER] + (prep.sx * box[0, 0])[..., None]).reshape(
        S, G, SB, GJC * CLUSTER)
    jy = (g[..., CLUSTER:2 * CLUSTER]
          + (prep.sy * box[1, 1])[..., None]).reshape(S, G, SB,
                                                      GJC * CLUSTER)
    jz = (g[..., 2 * CLUSTER:] + (prep.sz * box[2, 2])[..., None]).reshape(
        S, G, SB, GJC * CLUSTER)

    epsfac = float(ONE_4PI_EPS0 / params.epsilon_r)
    kernel = _make_kernel_v2(G, params, beta, epsfac,
                             compute_energy=compute_energy)

    iblk = pl.BlockSpec((1, CLUSTER, SB), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    jrow = pl.BlockSpec((1, G, SB, GJC * CLUSTER), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)

    def i3x(a):
        return a[:C_pad].reshape(S, SB, CLUSTER).transpose(0, 2, 1)

    fx, fy, fz, e = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            iblk, iblk, iblk,
            iblk, iblk, iblk,
            jrow, jrow, jrow,
            jrow, jrow, jrow, jrow,
        ],
        out_specs=[
            iblk, iblk, iblk,
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, CLUSTER, SB), jnp.float32),
            jax.ShapeDtypeStruct((S, CLUSTER, SB), jnp.float32),
            jax.ShapeDtypeStruct((S, CLUSTER, SB), jnp.float32),
            jax.ShapeDtypeStruct((S, 1, 2), jnp.float32),
        ],
        interpret=interpret,
    )(prep.ng,
      i3x(xx), i3x(xy), i3x(xz),
      prep.iq, prep.is6, prep.is12,
      jx, jy, jz, prep.jq, prep.js6, prep.js12, prep.jmask)

    # outputs are (S, 8_atom, 8_cluster): untranspose to atom-major order
    def unt(a):
        return a.transpose(0, 2, 1).reshape(-1)[:n_pad]

    f_sorted = jnp.stack([unt(fx), unt(fy), unt(fz)], axis=-1)
    return f_sorted, 0.5 * jnp.sum(e[:, 0, 0]), 0.5 * jnp.sum(e[:, 0, 1])


# ---------------------------------------------------------------------------
# v2u kernel: union j-streams shared by 4-cluster i-blocks.
#
# Profiling the v2 kernel showed the per-step XLA j-gather dominating
# (~6 ns per gathered row, one row per (i-cluster, j-entry)).  Sharing one
# distance-sorted union stream among a block of 4 i-clusters cuts gathered
# rows ~2.8x while growing pair slots only ~25% vs per-cluster lists
# (union-of-4 lists average ~1.4x a single cluster's list).  The pair tile
# is (4 i-clusters, 8 i-atoms, 256 j-lanes) — the last two dims tile
# (8, 128) vregs exactly — with both validity and exclusion masks
# precomputed as 32-bit fields (bit c*8+a) in two int32 streams.
# Shifts/bitmasks/trip-counts work as in v2.
# ---------------------------------------------------------------------------

BU = 4          # i-clusters per union block (32 atoms)
GJU = 32        # j-clusters per group in the union stream (256 lanes)
DJU = 16        # duo mode: 2-cluster rows per group (16 x 16 = 256 lanes)


def _make_kernel_v2u(n_groups: int, params: MdParams, beta, epsfac: float,
                     compute_energy: bool = True,
                     baked_shifts: bool = False,
                     compute_virial: bool = False,
                     bu: int = BU):
    """baked_shifts: j coordinates arrive pre-shifted to the i-block's
    periodic image (rebuild-time shifts folded in by the caller, the
    reference's per-entry shift-vector index, nbnxm/pairlist.h) — the
    in-loop floor minimum-image folds (15 VPU ops per tile) drop out.
    The force accumulators stay at full (BU, 8, 256) tile shape through
    the j loop and are lane-reduced once at the end (the CUDA kernel's
    end-of-kernel i-force reduction, nbnxm_cuda_kernel.cuh:688)."""
    rc2 = params.rcoulomb ** 2
    rv2 = params.rvdw ** 2
    same_cut = rc2 == rv2
    rcinv6 = 1.0 / params.rvdw ** 6
    if params.coulomb == CoulombType.REACTION_FIELD:
        krf, crf = rf_constants(params)
    L = GJU * CLUSTER
    if compute_virial:
        assert compute_energy, "virial rides the energy kernel flavor"

    def kernel(box_ref,                      # SMEM (1, 3) box diagonal
               ng_ref,                       # SMEM (1, 1, 1) i32 trip count
               ix_ref, iy_ref, iz_ref,       # VMEM (1, BU, 8) [cluster, atom]
               iq_ref, is6_ref, is12_ref,    # VMEM (1, BU, 8)
               jx_ref, jy_ref, jz_ref,       # VMEM (1, G, 256) per-step
               jq_ref, js6_ref, js12_ref,    # VMEM (1, G, 256) static
               pm_ref, em_ref,               # VMEM (1, G, 256) i32 bit fields
               fx_ref, fy_ref, fz_ref,       # out VMEM (1, BU, 8)
               e_ref):                       # out SMEM (1, 1, 2)
        bx = box_ref[0, 0]
        by = box_ref[0, 1]
        bz = box_ref[0, 2]
        ibx = 1.0 / bx
        iby = 1.0 / by
        ibz = 1.0 / bz

        def col(ref):
            return ref[0][:, :, None]                   # (BU, 8, 1)

        xi_x = col(ix_ref)
        xi_y = col(iy_ref)
        xi_z = col(iz_ref)
        qi = col(iq_ref) * epsfac
        if compute_energy:
            s6i = col(is6_ref)
            s12i = col(is12_ref)
        else:
            # force-only flavor: fold the 6/12 prefactors into the i-side
            # LJ streams once per program instead of per pair
            s6i = col(is6_ref) * 6.0
            s12i = col(is12_ref) * 12.0
        # bit index c*8 + a for the (cluster, atom) sublane pair
        sh = (jax.lax.broadcasted_iota(jnp.int32, (bu, CLUSTER, 1), 0)
              * CLUSTER
              + jax.lax.broadcasted_iota(jnp.int32, (bu, CLUSTER, 1), 1))

        def j_group(g, acc):
            fx, fy, fz, e_c, e_lj, vxx, vyy, vzz = acc
            xj = jx_ref[0, pl.ds(g, 1)]                  # (1, 256)
            yj = jy_ref[0, pl.ds(g, 1)]
            zj = jz_ref[0, pl.ds(g, 1)]
            qj = jq_ref[0, pl.ds(g, 1)]
            s6j = js6_ref[0, pl.ds(g, 1)]
            s12j = js12_ref[0, pl.ds(g, 1)]
            pm = pm_ref[0, pl.ds(g, 1)]
            em = em_ref[0, pl.ds(g, 1)]

            pairb = ((pm >> sh) & 1).astype(jnp.float32)     # (BU, 8, 256)
            inclb = ((em >> sh) & 1).astype(jnp.float32)

            dx = xi_x - xj
            dy = xi_y - yj
            dz = xi_z - zj
            if not baked_shifts:
                # rectangular minimum image resolved in-loop
                dx = dx - jnp.floor(dx * ibx + 0.5) * bx
                dy = dy - jnp.floor(dy * iby + 0.5) * by
                dz = dz - jnp.floor(dz * ibz + 0.5) * bz
            # upper clamp bounds padding-lane distances (dummy atoms sit
            # far away) so the Ewald polynomial can't overflow fp32
            r2 = jnp.clip(dx * dx + dy * dy + dz * dz, R2_FLOOR, 1e6)
            rinv = jax.lax.rsqrt(r2)
            rinv2 = rinv * rinv

            in_c = jnp.where(r2 < rc2, pairb, 0.0)
            # shared-cutoff fast path (the common production setup):
            # reuse the coulomb mask instead of a second compare+select
            in_v = (in_c * inclb if same_cut
                    else jnp.where(r2 < rv2, pairb * inclb, 0.0))

            c6 = s6i * s6j
            c12 = s12i * s12j
            rinv6 = jnp.minimum(rinv2 * rinv2 * rinv2, 1e15)
            rinv12 = rinv6 * rinv6
            if compute_energy:
                f_lj = (12.0 * c12 * rinv12 - 6.0 * c6 * rinv6) * rinv2 * in_v
            else:
                f_lj = (c12 * rinv12 - c6 * rinv6) * rinv2 * in_v

            qq = qi * qj
            if params.coulomb == CoulombType.REACTION_FIELD:
                f_c = qq * (inclb * rinv2 * rinv - 2.0 * krf) * in_c
            elif params.coulomb == CoulombType.PME:
                if compute_energy:
                    br = beta * (r2 * rinv)
                    erfc_t = _erfc_poly(br)
                    gauss = jnp.exp(-br * br)
                    f_c = (qq * rinv2
                           * ((inclb - (1.0 - erfc_t)) * rinv
                              + beta * TWO_OVER_SQRT_PI * gauss) * in_c)
                else:
                    f_c = (qq * (inclb * rinv2 * rinv
                                 + (beta * beta * beta)
                                 * _pmecorr_f_recip((beta * beta) * r2))
                           * in_c)
            else:
                f_c = qq * inclb * rinv2 * rinv * in_c

            fscal = f_lj + f_c
            fx = fx + fscal * dx
            fy = fy + fscal * dy
            fz = fz + fscal * dz
            if compute_energy:
                e_lj_pair = (c12 * rinv12 - c6 * rinv6
                             - (c12 * rcinv6 * rcinv6 - c6 * rcinv6)) * in_v
                if params.coulomb == CoulombType.REACTION_FIELD:
                    e_c_pair = qq * (inclb * rinv + krf * r2 - crf) * in_c
                elif params.coulomb == CoulombType.PME:
                    e_c_pair = qq * rinv * (erfc_t - (1.0 - inclb)) * in_c
                else:
                    e_c_pair = (qq * inclb
                                * (rinv - 1.0 / params.rcoulomb) * in_c)
                e_c = e_c + jnp.sum(e_c_pair)
                e_lj = e_lj + jnp.sum(e_lj_pair)
            if compute_virial:
                # diagonal pair virial: fscal*dx already in registers
                vxx = vxx + jnp.sum(fscal * dx * dx)
                vyy = vyy + jnp.sum(fscal * dy * dy)
                vzz = vzz + jnp.sum(fscal * dz * dz)
            return fx, fy, fz, e_c, e_lj, vxx, vyy, vzz

        z = jnp.zeros((bu, CLUSTER, L), jnp.float32)
        zs = jnp.float32(0.0)
        fx, fy, fz, e_c, e_lj, vxx, vyy, vzz = jax.lax.fori_loop(
            0, jnp.minimum(ng_ref[0, 0, 0], n_groups), j_group,
            (z, z, z, zs, zs, zs, zs, zs))
        fx_ref[...] = jnp.sum(fx, axis=2)[None]
        fy_ref[...] = jnp.sum(fy, axis=2)[None]
        fz_ref[...] = jnp.sum(fz, axis=2)[None]
        e_ref[0, 0, 0] = e_c
        e_ref[0, 0, 1] = e_lj
        if compute_virial:
            e_ref[0, 0, 2] = vxx
            e_ref[0, 0, 3] = vyy
            e_ref[0, 0, 4] = vzz

    return kernel


@_struct.dataclass
class PallasPrepV2U:
    """Per-rebuild data for the v2u union-stream kernel."""
    iq: jnp.ndarray       # (S, BU, 8) [block, cluster, atom]
    is6: jnp.ndarray
    is12: jnp.ndarray
    ng: jnp.ndarray       # (S, 1, 1) i32 j-group trip count
    nbr2: jnp.ndarray     # (S, G, GJU) i32 union j-cluster ids (pad C)
    jq: jnp.ndarray       # (S, G, 256)
    js6: jnp.ndarray
    js12: jnp.ndarray
    pair_m: jnp.ndarray   # (S, G, 256) i32, bit c*8+a = pair (c,a)-(lane) valid
    excl_m: jnp.ndarray   # (S, G, 256) i32, bit c*8+a = not excluded
    # build-time periodic shift per union entry in box-vector counts
    # (reference: nbnxn_ci_t::shift, nbnxm/pairlist.h) — when present the
    # caller folds shift*L into the gathered j coordinates and the kernel
    # skips the in-loop minimum-image folds
    shift: Optional[jnp.ndarray] = None   # (S, G, GJU, 3) int8
    # duo mode: j-stream entries are 2-cluster rows (16 atoms) instead of
    # single clusters.  The union list is deduplicated onto cluster-id
    # duos (id >> 1): adjacent Hilbert-sorted clusters usually co-occur
    # in a block's list, so entries shrink ~1.77x while masked inflation
    # lanes (a duo member NOT in the list) cost ~+13% kernel lanes.
    # Momentum caveat: an inflation lane evaluates its pair one-sidedly —
    # if an unlisted pair drifts inside the cutoff during the nstlist
    # window, the reverse block has no matching lane, slightly breaking
    # Newton's third law.  The error class (and magnitude bound) is the
    # same as an ordinary missing-pair drift event, covered by the
    # verlet-buffer drift tolerance (md/verletbuf.py).
    # The per-step coordinate gather fetches half the rows at twice the
    # width — row gathers serialize per row on TPU, so this halves the
    # dominant per-step gather cost.  nbr2 is then (S, G, DJU) duo ids,
    # shift is (S, G, DJU*2, 3) per-member shifts, and the j planes are
    # 16 atoms wide.  The kernel itself is unchanged (256-lane groups).
    duo: bool = _struct.field(pytree_node=False, default=False)
    duo_ovf: Optional[jnp.ndarray] = None   # () i32: a block overflowed W
    duo_max: Optional[jnp.ndarray] = None   # () i32: max duo count seen


def pallas_prepare_v2u(nlist: ClusterPairlist, nbfp,
                       g_cap: Optional[int] = None,
                       duo: bool = False,
                       duo_g: Optional[int] = None,
                       bu: int = BU) -> PallasPrepV2U:
    """Pack the union-of-4 lists (+shifts, bitmasks) for the v2u kernel.
    Requires nlist built with super_nnbr=..., super_block=4 and
    compute_shifts=True.

    duo: pack the stream as deduplicated 2-cluster rows (see
    PallasPrepV2U.duo).  duo_g caps the packed width in DJU-row groups
    (maintained by the runner from the duo_max flag, like super_g)."""
    from .cluster_nb import lj_table_mode
    import numpy as _np
    if not isinstance(nbfp, jax.core.Tracer):
        assert lj_table_mode(_np.asarray(nbfp)) == "geometric", (
            "Pallas kernel requires a geometric-combination LJ table")
    assert nlist.nbr_super is not None, (
        "build pair list with super_nnbr and super_block=4")
    n = nlist.inv_perm.shape[0]
    n_pad = nlist.n_pad
    C = nlist.n_clusters
    S = nlist.nbr_super.shape[0]
    assert S * bu >= C, "pair list super_block does not match bu"
    assert bu * CLUSTER <= 32, "pair/exclusion bitmasks hold <= 32 bits"
    C_pad = S * bu
    nnbr = nlist.nbr_super.shape[1]
    K = nlist.excl.shape[1]
    ncl = C_pad + 1
    extra = ncl * CLUSTER - n_pad
    nnbr_pad = -(-nnbr // GJU) * GJU
    G = nnbr_pad // GJU
    if g_cap is not None and g_cap < G:
        # cap the packed stream at g_cap j-groups: the union stream is
        # distance-ordered with all in-range entries first, so this
        # drops only the farthest entries.  EVERY per-step cost of the
        # kernel (j-coordinate gather, shift fold, VMEM staging) and
        # this pack itself scale with G, while list CAPACITY is sized
        # for the worst block ever seen (x1.25 growth headroom) — at
        # 81k that meant G=23 staged for a max ng of 13.  The runner
        # validates via the s_max flag and rolls back + regrows if a
        # rebuild actually needs more (same contract as the top-k
        # capacity truncation itself).
        nnbr_pad = g_cap * GJU
        nnbr = min(nnbr, nnbr_pad)
        G = g_cap

    def plane(a, fill=0.0):
        pad = jnp.full((extra,), fill, a.dtype)
        return jnp.concatenate([a, pad]).reshape(ncl, CLUSTER)

    diag6 = jnp.sqrt(jnp.maximum(jnp.diagonal(nbfp[:, :, 0]), 0.0))
    diag12 = jnp.sqrt(jnp.maximum(jnp.diagonal(nbfp[:, :, 1]), 0.0))
    valid = (nlist.perm < n).astype(jnp.float32)
    pv = valid * (1.0 - nlist.pert)

    q = plane(nlist.q_a)
    s6 = plane(diag6[nlist.t_a])
    s12 = plane(diag12[nlist.t_a])
    pvp = plane(pv)

    duo_ovf = duo_max = None
    shift = None
    if duo:
        from .pairlist import _pack_valid
        EW = 2 * CLUSTER                       # atoms per duo row
        ND = C_pad // 2                        # duo count (even C_pad)
        full = nlist.nbr_super.shape[1]
        ids0 = jnp.where(nlist.nbr_super >= 0, nlist.nbr_super, C)
        # the composite key packs the cluster id above 12 shift bits;
        # ids must fit the remaining int32 headroom (2^19 clusters =
        # ~4.2M atoms — far above any single-chip system)
        assert C < (1 << 19), "duo sort key overflows int32 at C >= 2^19"
        if nlist.super_shift is not None:
            # composite sort key carries the per-entry shift through the
            # id sort (shifts are small box-vector counts; |s| <= 7 holds
            # for any in-cutoff pair — ambiguity fails hard at rebuild)
            shm = jnp.clip(nlist.super_shift.astype(jnp.int32), -7, 7)
            keys = jnp.sort(ids0 * 4096 + (shm[..., 0] + 8) * 256
                            + (shm[..., 1] + 8) * 16 + (shm[..., 2] + 8),
                            axis=1)
            ids_s = keys >> 12
            sh_s = jnp.stack([((keys >> 8) & 15) - 8,
                              ((keys >> 4) & 15) - 8,
                              (keys & 15) - 8], axis=-1)     # (S, full, 3)
        else:
            ids_s = jnp.sort(ids0, axis=1)
            sh_s = None
        duo_id = ids_s >> 1
        prev = jnp.concatenate(
            [jnp.full((S, 1), -1, duo_id.dtype), duo_id[:, :-1]], axis=1)
        keep = (ids_s < C) & (duo_id != prev)
        count_d = jnp.sum(keep, axis=1)
        G = duo_g if duo_g is not None else -(-full // DJU)
        W = G * DJU
        pos, vmask = _pack_valid(keep, W)
        nbr2 = jnp.where(vmask, jnp.take_along_axis(duo_id, pos, axis=1),
                         ND).reshape(S, G, DJU)
        duo_max = jnp.max(count_d).astype(jnp.int32)
        duo_ovf = (duo_max > W).astype(jnp.int32)
        ng = (-(-jnp.minimum(count_d, W) // DJU)
              ).astype(jnp.int32).reshape(S, 1, 1)
        if sh_s is not None:
            # per-member shifts: the sorted order puts a duo's two
            # clusters adjacent, so the dropped partner's shift is read
            # from the next sorted entry.  Only sentinel rows
            # (vmask=false) have pair_m=0/arbitrary shift; an ABSENT duo
            # member (partner not in the union list) keeps pair_m=1 and
            # is suppressed by the cutoff alone, so its inherited shift
            # must be a genuine periodic image — the duo's two clusters
            # are spatially adjacent, so the partner's shift is the
            # correct image for both members
            nxt_id = jnp.concatenate(
                [ids_s[:, 1:], jnp.full((S, 1), -1, ids_s.dtype)], axis=1)
            nxt_sh = jnp.concatenate(
                [sh_s[:, 1:], jnp.zeros((S, 1, 3), sh_s.dtype)], axis=1)
            pair_next = (((ids_s & 1) == 0)
                         & (nxt_id == ids_s + 1))[..., None]
            s_hi = jnp.where(pair_next, nxt_sh, sh_s)
            shp = jnp.stack(
                [jnp.take_along_axis(sh_s, pos[..., None], axis=1),
                 jnp.take_along_axis(s_hi, pos[..., None], axis=1)],
                axis=2)                                      # (S, W, 2, 3)
            shp = jnp.where(vmask[..., None, None], shp, 0)
            shift = shp.reshape(S, G, DJU * 2, 3).astype(jnp.int8)

        ncl_j = ND + 1
        extra_j = ncl_j * EW - n_pad

        def plane_j(a, fill=0.0):
            pad = jnp.full((extra_j,), fill, a.dtype)
            return jnp.concatenate([a, pad]).reshape(ncl_j, EW)

        def jgather(pl1d):
            return plane_j(pl1d)[nbr2].reshape(S, G, DJU * EW)

        jid = (nbr2[..., None] * EW
               + jnp.arange(EW, dtype=jnp.int32)).reshape(S, G, DJU * EW)
        pvj = jgather(pv)
        jq = jgather(nlist.q_a)
        js6 = jgather(diag6[nlist.t_a])
        js12 = jgather(diag12[nlist.t_a])
    else:
        nbr_src = nlist.nbr_super[:, :nnbr]
        nbr_p = jnp.pad(jnp.where(nbr_src >= 0, nbr_src, C),
                        ((0, 0), (0, nnbr_pad - nnbr)), constant_values=C)
        count = jnp.sum(nbr_p != C, axis=1)
        ng = (-(-count // GJU)).astype(jnp.int32).reshape(S, 1, 1)
        nbr2 = nbr_p.reshape(S, G, GJU)

        def jgather(pl1d):
            return plane(pl1d)[nbr2].reshape(S, G, GJU * CLUSTER)

        jid = (nbr2[..., None] * CLUSTER
               + jnp.arange(CLUSTER, dtype=jnp.int32)).reshape(
                   S, G, GJU * CLUSTER)
        pvj = jgather(pv)
        jq = jgather(nlist.q_a)
        js6 = jgather(diag6[nlist.t_a])
        js12 = jgather(diag12[nlist.t_a])
        if nlist.super_shift is not None:
            shift = jnp.pad(nlist.super_shift[:, :nnbr],
                            ((0, 0), (0, nnbr_pad - nnbr), (0, 0))
                            ).reshape(S, G, GJU, 3)
    pvi = pvp[:C_pad].reshape(S, bu, CLUSTER)
    iid = (jnp.arange(C_pad, dtype=jnp.int32)[:, None] * CLUSTER
           + jnp.arange(CLUSTER, dtype=jnp.int32)
           ).reshape(S, bu, CLUSTER)
    excl = jnp.concatenate(
        [nlist.excl, jnp.full((extra, K), -1, jnp.int32)])
    ei = excl[:C_pad * CLUSTER].reshape(S, bu, CLUSTER, K)

    pair_m = jnp.zeros((S, G, GJU * CLUSTER), jnp.int32)
    excl_m = jnp.zeros((S, G, GJU * CLUSTER), jnp.int32)
    for c in range(bu):
        for a in range(CLUSTER):
            b = c * CLUSTER + a
            pv_ia = pvi[:, c, a][:, None, None]
            iid_a = iid[:, c, a][:, None, None]
            pair = ((pvj > 0) & (pv_ia > 0) & (jid != iid_a))
            pair_m = pair_m | (pair.astype(jnp.int32) << b)
            exm = jnp.zeros(jid.shape, bool)
            for k in range(K):
                ei_k = ei[:, c, a, k][:, None, None]
                exm = exm | (jid == ei_k)
            excl_m = excl_m | ((~exm).astype(jnp.int32) << b)

    def i3(a):
        return a[:C_pad].reshape(S, bu, CLUSTER)

    return PallasPrepV2U(
        iq=i3(q), is6=i3(s6), is12=i3(s12), ng=ng, nbr2=nbr2,
        jq=jq, js6=js6, js12=js12,
        pair_m=pair_m, excl_m=excl_m, shift=shift,
        duo=duo, duo_ovf=duo_ovf, duo_max=duo_max)


def pallas_cluster_forces_v2u(x, box, nlist: ClusterPairlist, nbfp,
                              params: MdParams, beta,
                              prep: Optional[PallasPrepV2U] = None,
                              interpret: bool = False,
                              compute_energy: bool = True,
                              compute_virial: bool = False):
    """(f_sorted (n_pad, 3), e_coul, e_lj) via the v2u union-stream
    kernel."""
    if prep is None:
        prep = pallas_prepare_v2u(nlist, nbfp)
    n = nlist.inv_perm.shape[0]
    n_pad = nlist.n_pad
    S = prep.iq.shape[0]
    bu = prep.iq.shape[1]
    C_pad = S * bu
    ncl = C_pad + 1
    extra = ncl * CLUSTER - n_pad
    G = prep.nbr2.shape[1]
    L = GJU * CLUSTER

    valid_atom = nlist.perm < n
    n_rows = (C_pad // 2 + 1) * 2 * CLUSTER if prep.duo else ncl * CLUSTER
    xs = jnp.where(valid_atom[:, None],
                   x[jnp.minimum(nlist.perm, n - 1)],
                   1e4 + jnp.arange(n_pad, dtype=x.dtype)[:, None])
    if prep.shift is not None:
        # the build-time shifts live in the WRAPPED frame of the rebuild
        # (the list builder wraps coordinates); subtract each atom's
        # rebuild image count so raw drifted coordinates re-enter that
        # frame (same convention as the v2 kernel's img consumption).
        # img are box-VECTOR counts, so the box-row expansion covers
        # triclinic cells too (elementwise: a matmul would ride the MXU
        # at bf16 input precision and misplace atoms)
        xs = xs - (nlist.img[:, 0:1] * box[0] + nlist.img[:, 1:2] * box[1]
                   + nlist.img[:, 2:3] * box[2])
    dummy = (2e4 + jnp.arange(n_rows - n_pad, dtype=x.dtype)[:, None]
             * jnp.ones(3))
    xs = jnp.concatenate([xs, dummy])
    xx = xs[:ncl * CLUSTER, 0].reshape(ncl, CLUSTER)
    xy = xs[:ncl * CLUSTER, 1].reshape(ncl, CLUSTER)
    xz = xs[:ncl * CLUSTER, 2].reshape(ncl, CLUSTER)

    if prep.duo:
        # duo rows: 16 atoms / 48 lanes per gathered row — half the rows
        # of the per-cluster gather at twice the width (row gathers
        # serialize per row on TPU, so rows are the cost)
        EW = 2 * CLUSTER
        ncl_j = C_pad // 2 + 1
        xj3 = xs[:, 0].reshape(ncl_j, EW), xs[:, 1].reshape(ncl_j, EW), \
            xs[:, 2].reshape(ncl_j, EW)
        packed = jnp.concatenate(xj3, axis=1)                 # (ncl_j, 48)
        g = packed[prep.nbr2]                                 # (S,G,DJU,48)
        if prep.shift is not None:
            # per-member shifts (a duo's two clusters can sit in
            # different periodic images of the i-block)
            sh = prep.shift.reshape(S, G, DJU, 2, 3).astype(x.dtype)
            sL = (sh[..., 0:1] * box[0] + sh[..., 1:2] * box[1]
                  + sh[..., 2:3] * box[2])                  # (S,G,DJU,2,3)
            add = jnp.concatenate(
                [jnp.repeat(sL[..., d], CLUSTER, axis=-1) for d in range(3)],
                axis=-1)                                    # (S,G,DJU,48)
            g = g + add
        jx = g[..., 0:EW].reshape(S, G, L)
        jy = g[..., EW:2 * EW].reshape(S, G, L)
        jz = g[..., 2 * EW:].reshape(S, G, L)
    else:
        packed = jnp.concatenate([xx, xy, xz], axis=1)        # (ncl, 24)
        g = packed[prep.nbr2]                                 # (S,G,GJU,24)
        if prep.shift is not None:
            # fold the build-time periodic shift into the j coordinates so
            # the kernel's per-pair minimum-image folds drop out; integer
            # box-vector counts x box rows handles triclinic cells exactly
            # (elementwise expansion — not a matmul — to stay off the bf16
            # MXU path for coordinates)
            sh = prep.shift.astype(x.dtype)
            sL = (sh[..., 0:1] * box[0] + sh[..., 1:2] * box[1]
                  + sh[..., 2:3] * box[2])                    # (S,G,GJU,3)
            g = g + jnp.repeat(sL, CLUSTER, axis=-1)          # 3*8 lanes
        jx = g[..., 0:CLUSTER].reshape(S, G, L)
        jy = g[..., CLUSTER:2 * CLUSTER].reshape(S, G, L)
        jz = g[..., 2 * CLUSTER:].reshape(S, G, L)
    box_diag = jnp.stack([box[0, 0], box[1, 1], box[2, 2]]).reshape(1, 3)

    ng = prep.ng

    epsfac = float(ONE_4PI_EPS0 / params.epsilon_r)
    kernel = _make_kernel_v2u(G, params, beta, epsfac,
                              compute_energy=compute_energy,
                              baked_shifts=prep.shift is not None,
                              compute_virial=compute_virial, bu=bu)

    iblk = pl.BlockSpec((1, bu, CLUSTER), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    jrow = pl.BlockSpec((1, G, L), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)

    def i3x(a):
        return a[:C_pad].reshape(S, bu, CLUSTER)

    ne = 5 if compute_virial else 2
    fx, fy, fz, e = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            iblk, iblk, iblk,
            iblk, iblk, iblk,
            jrow, jrow, jrow,
            jrow, jrow, jrow,
            jrow, jrow,
        ],
        out_specs=[
            iblk, iblk, iblk,
            pl.BlockSpec((1, 1, ne), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, bu, CLUSTER), jnp.float32),
            jax.ShapeDtypeStruct((S, bu, CLUSTER), jnp.float32),
            jax.ShapeDtypeStruct((S, bu, CLUSTER), jnp.float32),
            jax.ShapeDtypeStruct((S, 1, ne), jnp.float32),
        ],
        interpret=interpret,
    )(box_diag, ng,
      i3x(xx), i3x(xy), i3x(xz),
      prep.iq, prep.is6, prep.is12,
      jx, jy, jz, prep.jq, prep.js6, prep.js12,
      prep.pair_m, prep.excl_m)

    f_sorted = jnp.stack([fx.reshape(-1)[:n_pad], fy.reshape(-1)[:n_pad],
                          fz.reshape(-1)[:n_pad]], axis=-1)
    out = (f_sorted, 0.5 * jnp.sum(e[:, 0, 0]), 0.5 * jnp.sum(e[:, 0, 1]))
    if compute_virial:
        # Xi_aa = -1/2 sum_unique fscal dx_a^2; pairs counted twice
        return out + (-0.25 * jnp.sum(e[:, 0, 2:5], axis=0),)
    return out
