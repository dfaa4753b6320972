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

from ..core.types import CoulombType, MdParams
from ..core.units import ONE_4PI_EPS0
from .nonbonded_ref import rf_constants
from .pairlist import CLUSTER, ClusterPairlist

R2_FLOOR = 1e-6
TWO_OVER_SQRT_PI = 1.1283791670955126
BI = 8          # i-clusters per supercluster/program (64 atoms)
GJ = 16         # j-clusters per inner iteration (128 atoms -> lane dim)


def _erfc_poly(x):
    """erfc for x >= 0, Abramowitz & Stegun 7.1.26 (|err| < 1.5e-7) —
    Mosaic has no erfc primitive; the reference GPU kernels use the same
    class of polynomial/tabulated approximation (pmecorrF,
    nbnxm_cuda_kernel_utils.cuh)."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return poly * jnp.exp(-x * x)


def _make_kernel(n_groups: int, n_excl: int, params: MdParams, beta,
                 epsfac: float, bi: int = BI):
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
            dx = dx - jnp.floor(dx / bx + 0.5) * bx
            dy = dy - jnp.floor(dy / by + 0.5) * by
            dz = dz - jnp.floor(dz / bz + 0.5) * bz
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
            e_lj_pair = (c12 * rinv12 - c6 * rinv6
                         - (c12 * rcinv6 * rcinv6 - c6 * rcinv6)) * in_v
            f_lj = (12.0 * c12 * rinv12 - 6.0 * c6 * rinv6) * rinv2 * in_v

            qq = epsfac * qi * qj
            if params.coulomb == CoulombType.REACTION_FIELD:
                e_c_pair = qq * (incl * rinv + krf * r2 - crf) * in_c
                f_c = qq * (incl * rinv2 * rinv - 2.0 * krf) * in_c
            elif params.coulomb == CoulombType.PME:
                br = beta * (r2 * rinv)
                erfc_t = _erfc_poly(br)
                gauss = jnp.exp(-br * br)
                e_c_pair = qq * rinv * (erfc_t - (1.0 - incl)) * in_c
                f_c = (qq * rinv2 * ((incl - (1.0 - erfc_t)) * rinv
                                     + beta * TWO_OVER_SQRT_PI * gauss)
                       * in_c)
            else:
                e_c_pair = qq * incl * (rinv - 1.0 / params.rcoulomb) * in_c
                f_c = qq * incl * rinv2 * rinv * in_c

            fscal = f_lj + f_c
            fx = fx + jnp.sum(fscal * dx, axis=2)
            fy = fy + jnp.sum(fscal * dy, axis=2)
            fz = fz + jnp.sum(fscal * dz, axis=2)
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
                          prep: Optional[PallasPrep] = None):
    """(f_sorted (n_pad, 3), e_coul, e_lj) via the Pallas supercluster
    kernel.  Requires nlist built with super_nnbr and a geometric LJ
    table; energies use the 0.5 full-list convention like the XLA twin."""
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

    def jgather(pl2d):
        return pl2d[prep.nbr2].reshape(S, n_groups, GJ * CLUSTER)

    jx = jgather(xx)
    jy = jgather(xy)
    jz = jgather(xz)
    box_diag = jnp.stack([box[0, 0], box[1, 1], box[2, 2]]).reshape(1, 3)

    epsfac = float(ONE_4PI_EPS0 / params.epsilon_r)
    kernel = _make_kernel(n_groups, K, params, beta, epsfac, bi=bi)

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
