"""Spatial (domain) parallelism over the mesh 'spatial' axis.

The domain-decomposition analogue (reference: src/gromacs/domdec/
domdec.cpp:263 dd_move_x / :357 dd_move_f halo exchange): atoms are
Morton-sorted into clusters (already spatially compact), each device owns
a contiguous block range of i-clusters and computes the forces on its own
atoms from the FULL pair list — the full-list design means each device
needs neighbour *positions* but never writes remote forces, so the
per-step communication is one positions broadcast in and a sharded force
out (energies psum over ICI).  This replaces the reference's 8th-shell
halo + force reduce-halo with collectives XLA schedules itself.

Round-1 scope: positions are replicated across the spatial axis (fine up
to ~1M atoms: 12 MB); a ppermute ring halo for huge systems is the
round-2 upgrade path.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.types import MdParams, System
from ..ops.cluster_nb import (CLUSTER, cluster_nb_kernel,
                              cluster_nb_kernel_core)
from ..ops.pairlist import ClusterPairlist
from .mesh import SPATIAL_AXIS


def make_spatial_cluster_force(system: System, params: MdParams, mesh: Mesh,
                               beta, block: int = 16):
    """Returns f(x, box, nlist) -> (f_sorted, e_coul, e_lj) with the cluster
    block range sharded over the 'spatial' mesh axis."""
    import numpy as _np
    from ..ops.cluster_nb import lj_table_mode
    nsh = mesh.shape[SPATIAL_AXIS]
    lj_mode = lj_table_mode(_np.asarray(system.nbfp))

    def sharded(x, box, nlist: ClusterPairlist):
        C = nlist.n_clusters
        blk = max(1, min(block, C))
        Cb = (C + blk - 1) // blk
        per_shard = (Cb + nsh - 1) // nsh
        total_blocks = per_shard * nsh

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(), P(), P()),
                 out_specs=(P(SPATIAL_AXIS), P(), P()),
                 check_vma=False)
        def run(xx, bb, nl):
            shard_id = jax.lax.axis_index(SPATIAL_AXIS)
            f_rows, e_c, e_lj = cluster_nb_kernel(
                xx, bb, nl, system.nbfp, params, beta, blk,
                block_offset=shard_id * per_shard, n_blocks=per_shard,
                total_blocks=total_blocks, lj_mode=lj_mode)
            e_c = jax.lax.psum(e_c, SPATIAL_AXIS)
            e_lj = jax.lax.psum(e_lj, SPATIAL_AXIS)
            return f_rows, e_c, e_lj

        f_all, e_c, e_lj = run(x, box, nlist)
        f_sorted = f_all[: nlist.n_pad]
        return f_sorted, e_c, e_lj

    return sharded


# ---------------------------------------------------------------------------
# Real halo exchange: positions sharded over an N-D device grid, one
# ppermute sweep per decomposed axis per step (dd_move_x analogue,
# domdec.cpp:263; the N-D cell grid mirrors domdec_setup.cpp).  With
# the full (symmetric) pair list every device accumulates only its own
# atoms' forces, so no reverse force halo (dd_move_f) is needed.
# Atom "migration" between devices happens at every NS rebuild via the
# hierarchical equal-count re-sort (ops/pairlist.py sort_atoms_dd —
# the redistribute.cpp analogue).
# ---------------------------------------------------------------------------

def _as_grid(grid_or_nsh):
    """Accept a device count (1-D ring) or an explicit (P0, P1, P2)."""
    if isinstance(grid_or_nsh, int):
        return (grid_or_nsh, 1, 1)
    g = tuple(int(p) for p in grid_or_nsh)
    return g + (1,) * (3 - len(g))


def _grid_nsh(grid):
    import numpy as _np
    return int(_np.prod(grid))


def _axis_offsets(grid):
    """Per-axis halo offsets: {-1, 0, +1} on decomposed axes, {0} on
    trivial ones (block factor 3 vs 1 in the cat layout)."""
    return [([-1, 0, 1] if p > 1 else [0]) for p in grid]


def halo_shard_geometry(nlist: ClusterPairlist, grid_or_nsh, block: int):
    """(per_shard, c_pad): clusters per shard (multiple of `block`) and the
    padded cluster count c_pad = per_shard * prod(grid)."""
    nsh = _grid_nsh(_as_grid(grid_or_nsh))
    C = nlist.n_clusters
    per_shard = -(-C // nsh)
    per_shard = -(-per_shard // block) * block
    return per_shard, per_shard * nsh


def _dev_offset_bad(ci_dev, oj_dev, grid):
    """Per-entry flag: j's owner device is beyond the +-1 halo of i's on
    any decomposed axis.  ci_dev: (rows,), oj_dev: (rows, width)."""
    P0, P1, P2 = grid
    bad = jnp.zeros(oj_dev.shape, bool)
    for axis, P in enumerate(grid):
        if P <= 1:
            continue
        div = {0: P1 * P2, 1: P2, 2: 1}[axis]
        gi = (ci_dev[:, None] // div) % P
        gj = (oj_dev // div) % P
        bad |= jnp.mod(gj - gi + 1, P) >= 3
    return bad


def halo_violations(nlist: ClusterPairlist, grid_or_nsh, block: int):
    """Number of listed pairs whose j-cluster lies outside the i-cluster's
    halo neighbourhood (offset beyond +-1 on any decomposed axis) —
    nonzero means a DD cell is thinner than the list cutoff and the halo
    path would MISS interactions (the runner must abort).  The reference
    errors out the same way when a DD cell shrinks below the cutoff
    (domdec.cpp check_grid_jump).  Checks the per-cluster lists and, when
    present, the v2u union (super) lists the Pallas DD path consumes."""
    grid = _as_grid(grid_or_nsh)
    ps, c_pad = halo_shard_geometry(nlist, grid, block)
    total = jnp.zeros((), jnp.int32)
    C = nlist.n_clusters
    if nlist.nbr.shape[1] > 0:
        ci = jnp.arange(nlist.nbr.shape[0], dtype=jnp.int32) // ps
        bad = _dev_offset_bad(ci, nlist.nbr // ps, grid)
        total += jnp.sum((bad & (nlist.nbr_mask > 0)).astype(jnp.int32))
    if nlist.nbr_super is not None:
        S = nlist.nbr_super.shape[0]
        sbu = -(-C // S)                      # clusters per union block
        ci = (jnp.arange(S, dtype=jnp.int32) * sbu) // ps
        oj = jnp.minimum(nlist.nbr_super, C - 1) // ps
        bad = _dev_offset_bad(ci, oj, grid)
        total += jnp.sum((bad & (nlist.nbr_super < C)).astype(jnp.int32))
    return total


def sort_state_arrays(x, nlist: ClusterPairlist, c_pad: int):
    """Global positions -> cluster-sorted rows padded to c_pad clusters
    (dummy rows far away), the layout make_halo_cluster_force shards."""
    n = nlist.inv_perm.shape[0]
    n_pad = nlist.n_pad
    xs = jnp.where((nlist.perm < n)[:, None],
                   x[jnp.minimum(nlist.perm, n - 1)],
                   1e4 + jnp.arange(n_pad, dtype=x.dtype)[:, None])
    extra = c_pad * CLUSTER - n_pad
    dummy = (2e4 + jnp.arange(extra, dtype=x.dtype)[:, None]
             * jnp.ones(3, x.dtype))
    return jnp.concatenate([xs, dummy])


def make_halo_cluster_force(system: System, params: MdParams, mesh: Mesh,
                            beta, nlist: ClusterPairlist, block: int = 8,
                            grid=None):
    """Returns halo_force(xs_sorted, box) -> (f_sorted, e_coul, e_lj).

    xs_sorted: (c_pad*CLUSTER, 3) cluster-sorted padded positions (from
    sort_state_arrays), sharded P('spatial') over rows.  Each device owns
    a contiguous block of clusters forming an N-D cell (grid = (P0, P1,
    P2) devices per axis; 1-D ring when grid is None) and receives only
    its halo neighbours' blocks via jax.lax.ppermute sweeps — one +-1
    exchange per decomposed axis, each sweep forwarding the strip
    assembled by the previous axis (the 8th-shell dimension-sweep trick,
    domdec.cpp dd_move_x / dd_sandwich comm order).  Communication is
    2 strips per decomposed axis per step over ICI instead of a full
    allgather.  Requires halo_violations() == 0 for this nlist/grid.

    Static per-rebuild data (charges, types, exclusions, neighbour ids)
    is replicated; only positions move per step."""
    import numpy as _np
    from ..ops.cluster_nb import lj_table_mode
    lj_mode = lj_table_mode(_np.asarray(system.nbfp))
    grid = _as_grid(grid if grid is not None
                    else mesh.shape[SPATIAL_AXIS])
    P0, P1, P2 = grid
    nsh = _grid_nsh(grid)
    assert mesh.shape[SPATIAL_AXIS] == nsh
    ps, c_pad = halo_shard_geometry(nlist, grid, block)
    C = nlist.n_clusters
    n_pad = nlist.n_pad
    n = nlist.inv_perm.shape[0]
    extra = c_pad * CLUSTER - n_pad
    nnbr = nlist.nbr.shape[1]
    offs = _axis_offsets(grid)
    b0, b1, b2 = (len(o) for o in offs)
    B = b0 * b1 * b2                   # cat-space blocks
    own_blk = ((1 if P0 > 1 else 0) * b1 + (1 if P1 > 1 else 0)) * b2 \
        + (1 if P2 > 1 else 0)
    dummy_cl = B * ps                  # cat-space dummy cluster index

    zpad = jnp.zeros(extra, jnp.float32)
    qs_pad = jnp.concatenate([nlist.q_a, zpad])
    ts_pad = jnp.concatenate([nlist.t_a, jnp.zeros(extra, jnp.int32)])
    pert_pad = jnp.concatenate([nlist.pert, zpad])
    valid_pad = jnp.concatenate(
        [(nlist.perm < n).astype(jnp.float32), zpad])
    excl_pad = jnp.concatenate(
        [nlist.excl, jnp.full((extra, nlist.excl.shape[1]), -1, jnp.int32)])
    # nbr padded rows point at the (globally) out-of-range marker c_pad,
    # masked off below via nbr_mask padding = 0
    nbr_p = jnp.pad(nlist.nbr, ((0, c_pad - C), (0, 0)),
                    constant_values=c_pad)
    nbrm_p = jnp.pad(nlist.nbr_mask, ((0, c_pad - C), (0, 0)))

    def _compose(g):
        return (g[0] * P1 + g[1]) * P2 + g[2]

    def _decompose_py(s):
        return (s // (P1 * P2), (s // P2) % P1, s % P2)

    def _shift_perm(axis, d):
        """Device s sends to the device at +d along `axis` (so every
        device receives its -d neighbour's strip)."""
        pairs = []
        for s in range(nsh):
            g = list(_decompose_py(s))
            g[axis] = (g[axis] + d) % grid[axis]
            pairs.append((s, _compose(g)))
        return pairs

    def cat_remap(ids_cl, g_dev):
        """Global cluster ids -> cat-space ids for device g_dev =
        (g0, g1, g2) traced scalars; out-of-halo ids -> dummy."""
        owner = ids_cl // ps
        ok = ids_cl < c_pad
        blk = jnp.zeros_like(ids_cl)
        for axis, P in enumerate(grid):
            div = {0: P1 * P2, 1: P2, 2: 1}[axis]
            bfac = {0: b1 * b2, 1: b2, 2: 1}[axis]
            if P <= 1:
                continue
            ds = jnp.mod((owner // div) % P - g_dev[axis] + 1, P)
            ok &= ds < 3
            blk = blk + jnp.minimum(ds, 2) * bfac
        return jnp.where(ok, blk * ps + jnp.mod(ids_cl, ps), dummy_cl)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(SPATIAL_AXIS), P()),
             out_specs=(P(SPATIAL_AXIS), P(), P()),
             check_vma=False)
    def halo_force(xs, box):
        sid = jax.lax.axis_index(SPATIAL_AXIS)
        g_dev = (sid // (P1 * P2), (sid // P2) % P1, sid % P2)

        # dimension-sweep halo: axes processed 2 -> 0 so the cat layout
        # is row-major over (slot0, slot1, slot2)
        strip = xs
        for axis in (2, 1, 0):
            if grid[axis] <= 1:
                continue
            minus = jax.lax.ppermute(strip, SPATIAL_AXIS,
                                     _shift_perm(axis, +1))
            plus = jax.lax.ppermute(strip, SPATIAL_AXIS,
                                    _shift_perm(axis, -1))
            strip = jnp.concatenate([minus, strip, plus])
        dummy = (3e4 + jnp.arange(CLUSTER, dtype=xs.dtype)[:, None]
                 * jnp.ones(3, xs.dtype))
        xcat = jnp.concatenate([strip, dummy])

        def cat_rows(arr, fill):
            """Static per-atom rows assembled in cat order: one slice of
            the global sorted layout per halo block."""
            parts = []
            for o0 in offs[0]:
                for o1 in offs[1]:
                    for o2 in offs[2]:
                        src = (jnp.mod(g_dev[0] + o0, P0) * P1
                               + jnp.mod(g_dev[1] + o1, P1)) * P2 \
                            + jnp.mod(g_dev[2] + o2, P2)
                        parts.append(jax.lax.dynamic_slice(
                            arr, (src * ps * CLUSTER,)
                            + (0,) * (arr.ndim - 1),
                            (ps * CLUSTER,) + arr.shape[1:]))
            tail = jnp.full((CLUSTER,) + arr.shape[1:], fill, arr.dtype)
            return jnp.concatenate(parts + [tail])

        q_cat = cat_rows(qs_pad, 0.0)
        t_cat = cat_rows(ts_pad, 0)
        p_cat = cat_rows(pert_pad, 0.0)
        v_cat = cat_rows(valid_pad, 0.0)

        # own block's neighbour list and exclusions, remapped to cat space
        nbr_own = jax.lax.dynamic_slice(nbr_p, (sid * ps, 0), (ps, nnbr))
        nbrm_own = jax.lax.dynamic_slice(nbrm_p, (sid * ps, 0), (ps, nnbr))
        nbr_cat_own = cat_remap(nbr_own, g_dev)
        excl_own = jax.lax.dynamic_slice(
            excl_pad, (sid * ps * CLUSTER, 0),
            (ps * CLUSTER, excl_pad.shape[1]))
        e_ok = excl_own >= 0
        e_cl = cat_remap(jnp.where(e_ok, excl_own, 0) // CLUSTER, g_dev)
        excl_cat_own = jnp.where(
            e_ok & (e_cl != dummy_cl),
            e_cl * CLUSTER + jnp.mod(excl_own, CLUSTER), -1)

        # place own rows at the own-block position of a cat-sized frame
        # for the core's block indexing
        filler_pre = jnp.full((own_blk * ps, nnbr), dummy_cl, jnp.int32)
        filler_post = jnp.full(((B - own_blk - 1) * ps, nnbr), dummy_cl,
                               jnp.int32)
        nbr_cat = jnp.concatenate([filler_pre, nbr_cat_own, filler_post])
        nbrm_cat = jnp.concatenate(
            [jnp.zeros((own_blk * ps, nnbr), nbrm_own.dtype), nbrm_own,
             jnp.zeros(((B - own_blk - 1) * ps, nnbr), nbrm_own.dtype)])
        ne = excl_pad.shape[1]
        excl_cat = jnp.concatenate(
            [jnp.full((own_blk * ps * CLUSTER, ne), -1, jnp.int32),
             excl_cat_own,
             jnp.full(((B - own_blk - 1) * ps * CLUSTER + CLUSTER, ne),
                      -1, jnp.int32)])

        f_rows, e_c, e_lj = cluster_nb_kernel_core(
            xcat, q_cat, t_cat, p_cat, v_cat, excl_cat,
            nbr_cat, nbrm_cat, box, system.nbfp, params, beta,
            block=block, block_offset=own_blk * ps // block,
            n_blocks=ps // block, lj_mode=lj_mode)
        e_c = jax.lax.psum(e_c, SPATIAL_AXIS)
        e_lj = jax.lax.psum(e_lj, SPATIAL_AXIS)
        return f_rows, e_c, e_lj

    return halo_force


def make_dd_v2u_override(system: System, params: MdParams, mesh: Mesh,
                         beta, block: int = 8, grid=None,
                         interpret: bool = False):
    """nb_kernel_override routing the v2u Pallas union-stream kernel
    through the ppermute halo: each device owns a contiguous range of
    4-cluster i-blocks (the DD sort makes block ranges spatial cells),
    receives only its halo neighbours' position strips, gathers its own
    blocks' j-streams from the halo-extended plane and runs the SAME
    production Pallas kernel on its slice.  The reference runs its
    fastest CUDA kernels under DD exactly like this
    (nbnxm/cuda/nbnxm_cuda.cu:642 + domdec/gpuhaloexchange_impl_gpu.cpp:
    277 — fast kernels + device-direct halo coexist).

    Requires: pair list built with the DD sort + super_block=4 +
    compute_shifts (or not — min-image kernel flavor), prep =
    PallasPrepV2U from the same rebuild, halo_violations(nlist) == 0
    (checked per rebuild by the runner)."""
    import numpy as _np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..core.units import ONE_4PI_EPS0
    from ..ops.pallas_nb import (BU, GJU, PallasPrepV2U, _make_kernel_v2u)
    from ..ops.pairlist import CLUSTER as CL

    grid = _as_grid(grid if grid is not None
                    else mesh.shape[SPATIAL_AXIS])
    P0, P1, P2 = grid
    nsh = _grid_nsh(grid)
    assert mesh.shape[SPATIAL_AXIS] == nsh
    offs = _axis_offsets(grid)
    b0, b1, b2 = (len(o) for o in offs)
    B = b0 * b1 * b2
    own_blk = ((1 if P0 > 1 else 0) * b1 + (1 if P1 > 1 else 0)) * b2 \
        + (1 if P2 > 1 else 0)
    epsfac = float(ONE_4PI_EPS0 / params.epsilon_r)

    def _compose(g):
        return (g[0] * P1 + g[1]) * P2 + g[2]

    def _decompose_py(s):
        return (s // (P1 * P2), (s // P2) % P1, s % P2)

    def _shift_perm(axis, d):
        pairs = []
        for s in range(nsh):
            g = list(_decompose_py(s))
            g[axis] = (g[axis] + d) % grid[axis]
            pairs.append((s, _compose(g)))
        return pairs

    def nb(x, box, nlist: ClusterPairlist, prep: PallasPrepV2U,
           need_energy: bool = True):
        ps, c_pad = halo_shard_geometry(nlist, grid, block)
        assert ps % BU == 0, "DD cell size must align to 4-cluster blocks"
        sps = ps // BU                      # v2u blocks per device
        Sp = c_pad // BU                    # padded total blocks
        n = nlist.inv_perm.shape[0]
        n_pad = nlist.n_pad
        S = prep.nbr2.shape[0]
        G = prep.nbr2.shape[1]
        L = GJU * CL
        dummy_cl = B * ps                   # cat-space dummy cluster id

        # global sorted rows in the rebuild frame (img-adjusted when the
        # kernel uses baked shifts), padded to c_pad clusters
        xs = jnp.where((nlist.perm < n)[:, None],
                       x[jnp.minimum(nlist.perm, n - 1)],
                       1e4 + jnp.arange(n_pad, dtype=x.dtype)[:, None])
        if prep.shift is not None:
            diag0 = jnp.stack([box[0, 0], box[1, 1], box[2, 2]])
            xs = xs - nlist.img * diag0
        extra = c_pad * CL - n_pad
        xs = jnp.concatenate(
            [xs, 2e4 + jnp.arange(extra, dtype=x.dtype)[:, None]
             * jnp.ones(3, x.dtype)])

        # prep arrays padded to the full device-aligned block count
        def padb(a, fill=0):
            if a.shape[0] == Sp:
                return a
            pad = [(0, Sp - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, pad, constant_values=fill)

        C = nlist.n_clusters
        iq_p = padb(prep.iq)
        is6_p = padb(prep.is6)
        is12_p = padb(prep.is12)
        ng_p = padb(prep.ng)
        nbr2_p = padb(prep.nbr2, C)
        jq_p = padb(prep.jq)
        js6_p = padb(prep.js6)
        js12_p = padb(prep.js12)
        pm_p = padb(prep.pair_m)
        em_p = padb(prep.excl_m)
        sh_p = padb(prep.shift) if prep.shift is not None else None

        kernel = _make_kernel_v2u(G, params, beta, epsfac,
                                  compute_energy=need_energy,
                                  baked_shifts=prep.shift is not None)

        in_specs = [P(SPATIAL_AXIS), P(),
                    P(SPATIAL_AXIS), P(SPATIAL_AXIS), P(SPATIAL_AXIS),
                    P(SPATIAL_AXIS), P(SPATIAL_AXIS), P(SPATIAL_AXIS),
                    P(SPATIAL_AXIS), P(SPATIAL_AXIS), P(SPATIAL_AXIS),
                    P(SPATIAL_AXIS)]
        args = [xs, box, iq_p, is6_p, is12_p, ng_p, nbr2_p,
                jq_p, js6_p, js12_p, pm_p, em_p]
        if sh_p is not None:
            in_specs.append(P(SPATIAL_AXIS))
            args.append(sh_p)

        @partial(shard_map, mesh=mesh, in_specs=tuple(in_specs),
                 out_specs=(P(SPATIAL_AXIS), P(), P()),
                 check_vma=False)
        def run(xs_d, bb, iq, is6, is12, ng, nbr2, jq, js6, js12, pm, em,
                *rest):
            sh = rest[0] if rest else None
            sid = jax.lax.axis_index(SPATIAL_AXIS)
            g_dev = (sid // (P1 * P2), (sid // P2) % P1, sid % P2)

            # dimension-sweep ppermute halo (dd_move_x analogue)
            strip = xs_d
            for axis in (2, 1, 0):
                if grid[axis] <= 1:
                    continue
                minus = jax.lax.ppermute(strip, SPATIAL_AXIS,
                                         _shift_perm(axis, +1))
                plus = jax.lax.ppermute(strip, SPATIAL_AXIS,
                                        _shift_perm(axis, -1))
                strip = jnp.concatenate([minus, strip, plus])
            dummy = (3e4 + jnp.arange(CL, dtype=xs_d.dtype)[:, None]
                     * jnp.ones(3, xs_d.dtype))
            xcat = jnp.concatenate([strip, dummy])
            ncl_cat = B * ps + 1

            # remap this device's union stream to cat-space cluster ids
            owner = nbr2 // ps
            ok = nbr2 < c_pad
            blk = jnp.zeros_like(nbr2)
            for axis, Pg in enumerate(grid):
                div = {0: P1 * P2, 1: P2, 2: 1}[axis]
                bfac = {0: b1 * b2, 1: b2, 2: 1}[axis]
                if Pg <= 1:
                    continue
                ds = jnp.mod((owner // div) % Pg - g_dev[axis] + 1, Pg)
                ok &= ds < 3
                blk = blk + jnp.minimum(ds, 2) * bfac
            nbr_cat = jnp.where(ok, blk * ps + jnp.mod(nbr2, ps), dummy_cl)

            xx = xcat[:, 0].reshape(ncl_cat, CL)
            xy = xcat[:, 1].reshape(ncl_cat, CL)
            xz = xcat[:, 2].reshape(ncl_cat, CL)
            packed = jnp.concatenate([xx, xy, xz], axis=1)
            gth = packed[nbr_cat]                      # (sps, G, GJU, 24)
            if sh is not None:
                diag = jnp.stack([bb[0, 0], bb[1, 1], bb[2, 2]])
                sL = sh.astype(xs_d.dtype) * diag
                gth = gth + jnp.repeat(sL, CL, axis=-1)
            jx = gth[..., 0:CL].reshape(sps, G, L)
            jy = gth[..., CL:2 * CL].reshape(sps, G, L)
            jz = gth[..., 2 * CL:].reshape(sps, G, L)

            # own i-block coordinates from the own cat region
            own = jax.lax.dynamic_slice(
                packed, (own_blk * ps, 0), (ps, 3 * CL))
            ixx = own[:, 0:CL].reshape(sps, BU, CL)
            ixy = own[:, CL:2 * CL].reshape(sps, BU, CL)
            ixz = own[:, 2 * CL:].reshape(sps, BU, CL)

            box_diag = jnp.stack([bb[0, 0], bb[1, 1],
                                  bb[2, 2]]).reshape(1, 3)
            iblk = pl.BlockSpec((1, BU, CL), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
            jrow = pl.BlockSpec((1, G, L), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
            fx, fy, fz, e = pl.pallas_call(
                kernel, grid=(sps,),
                in_specs=[
                    pl.BlockSpec((1, 3), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                                 memory_space=pltpu.SMEM),
                    iblk, iblk, iblk, iblk, iblk, iblk,
                    jrow, jrow, jrow, jrow, jrow, jrow, jrow, jrow],
                out_specs=[
                    iblk, iblk, iblk,
                    pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                                 memory_space=pltpu.SMEM)],
                out_shape=[
                    jax.ShapeDtypeStruct((sps, BU, CL), jnp.float32),
                    jax.ShapeDtypeStruct((sps, BU, CL), jnp.float32),
                    jax.ShapeDtypeStruct((sps, BU, CL), jnp.float32),
                    jax.ShapeDtypeStruct((sps, 1, 2), jnp.float32)],
                interpret=interpret,
            )(box_diag, ng, ixx, ixy, ixz, iq, is6, is12,
              jx, jy, jz, jq, js6, js12, pm, em)
            f_rows = jnp.stack(
                [fx.reshape(-1), fy.reshape(-1), fz.reshape(-1)], axis=-1)
            e_c = jax.lax.psum(jnp.sum(e[:, 0, 0]), SPATIAL_AXIS)
            e_lj = jax.lax.psum(jnp.sum(e[:, 0, 1]), SPATIAL_AXIS)
            return f_rows, e_c, e_lj

        f_all, e_c, e_lj = run(*args)
        return f_all[: n_pad], 0.5 * e_c, 0.5 * e_lj

    return nb


def make_dd_nb_override(system: System, params: MdParams, mesh: Mesh,
                        beta, block: int = 8, grid=None):
    """nb_kernel_override for make_cluster_force_fn: routes the plain NB
    cluster kernel through the ppermute halo (each device owns a
    contiguous cluster block forming an N-D cell; positions move to halo
    neighbours only).  Requires the pair list built with the matching
    sort (slab_axis=0 for 1-D, sort_atoms_dd for N-D) and
    halo_violations(nlist, grid, block) == 0 — the DD runner checks that
    at every rebuild and fails hard (reference: domdec.cpp
    check_grid_jump / dd cell-size-vs-cutoff error)."""
    grid = _as_grid(grid if grid is not None
                    else mesh.shape[SPATIAL_AXIS])

    def nb(x, box, nlist: ClusterPairlist, prep=None, need_energy=True):
        _, c_pad = halo_shard_geometry(nlist, grid, block)
        xs = sort_state_arrays(x, nlist, c_pad)
        halo = make_halo_cluster_force(system, params, mesh, beta, nlist,
                                       block=block, grid=grid)
        f_rows, e_c, e_lj = halo(xs, box)
        return f_rows[: nlist.n_pad], e_c, e_lj

    return nb


def make_sharded_pme(system: System, params: MdParams, mesh: Mesh,
                     grid_shape=None):
    """Sharded PME reciprocal: pme_fn(x, box, lam_c) -> (E, F, dvdl_c).

    Fully decomposed pipeline (the fft5d / cuFFTMp pencil analogue,
    reference: fft/fft5d.cpp, fft/gpu_3dfft_cufftmp.cpp, pme grid overlap
    reduction pme_gpu_internal.cpp):

      1. each device spreads its own atom block to a local partial grid,
      2. psum_scatter reduces+slabs it along grid axis 0 (dd_move/grid
         overlap analogue, half the bytes of a full-grid psum),
      3. axis-1/2 DFTs run on the local slab (1/nsh of the matmul work),
      4. one all_to_all transposes slabs -> axis-1 pencils,
      5. the axis-0 DFT, influence multiply and energy partial run on the
         pencil (the k-space solve is sharded too),
      6. the inverse transforms retrace the same path back,
      7. all_gather rebuilds the potential grid for the local force
         gather.

    All collectives ride ICI inside shard_map; padding to multiples of
    nsh is absorbed into zero rows/columns of the transform matrices
    (ops/pme.py make_pencil_dft)."""
    import numpy as _np
    from ..core import pbc as pbc_mod
    from ..ops import pme as pme_mod
    from ..ops.nonbonded_ref import ewald_beta

    beta = ewald_beta(params.rcoulomb, params.ewald_rtol)
    if grid_shape is None:
        grid_shape = params.pme_grid
    order = params.pme_order
    K1, K2, K3 = grid_shape
    influence = pme_mod.make_influence_function(grid_shape, order)
    nsh = mesh.shape[SPATIAL_AXIS]
    pencil = pme_mod.make_pencil_dft(grid_shape, nsh)
    S1, K1p = pencil["S1"], pencil["K1p"]
    S2, K2p = pencil["S2"], pencil["K2p"]
    n = int(system.n_atoms)
    chunk = -(-n // nsh)
    n_pad = chunk * nsh
    qa = jnp.pad(jnp.asarray(system.charge_a), (0, n_pad - n))
    qb = jnp.pad(jnp.asarray(system.charge_b), (0, n_pad - n))
    dq_np = _np.asarray(system.charge_b) - _np.asarray(system.charge_a)
    pert = _np.nonzero(dq_np != 0.0)[0]
    fep_q = pert.size > 0
    pert_idx = jnp.asarray(pert, jnp.int32)
    dq_pert = jnp.asarray(dq_np[pert], jnp.float32)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(SPATIAL_AXIS), P(), P()),
             out_specs=(P(), P(SPATIAL_AXIS)),
             check_vma=False)
    def grid_part(x_blk, box, lam_c):
        sid = jax.lax.axis_index(SPATIAL_AXIS)
        qa_blk = jax.lax.dynamic_slice(qa, (sid * chunk,), (chunk,))
        if fep_q:
            qb_blk = jax.lax.dynamic_slice(qb, (sid * chunk,), (chunk,))
            q_blk = (1.0 - lam_c) * qa_blk + lam_c * qb_blk
        else:
            q_blk = qa_blk
        grid_local = pme_mod.spread_charges(x_blk, box, q_blk, grid_shape,
                                            order)
        # reduce the partial grids AND slab them along axis 0 in one
        # collective (grid overlap reduction)
        grid_p = jnp.pad(grid_local, ((0, K1p - K1), (0, 0), (0, 0)))
        slab = jax.lax.psum_scatter(grid_p, SPATIAL_AXIS,
                                    scatter_dimension=0, tiled=True)
        # local axis-1/2 transforms on the slab (square matrices)
        re, im = pme_mod._axis_dft(slab, None, *pencil["fwd1"], 1)
        re, im = pme_mod._axis_dft(re, im, *pencil["fwd2"], 2)
        # transpose: axis-0 slabs -> axis-1 pencils
        re = jnp.pad(re, ((0, 0), (0, K2p - K2), (0, 0)))
        im = jnp.pad(im, ((0, 0), (0, K2p - K2), (0, 0)))
        re = jax.lax.all_to_all(re, SPATIAL_AXIS, split_axis=1,
                                concat_axis=0, tiled=True)
        im = jax.lax.all_to_all(im, SPATIAL_AXIS, split_axis=1,
                                concat_axis=0, tiled=True)
        # axis-0 transform (padded input columns) -> (K1, S2, K3)
        q_re, q_im = pme_mod._axis_dft(re, im, *pencil["fwd0"], 0)
        # sharded solve: this device's y-pencil of the influence function
        G, scale = pme_mod._influence_scaled(box, influence, beta,
                                             x_blk.dtype)
        G_pad = jnp.pad(G, ((0, 0), (0, K2p - K2), (0, 0)))
        G_sh = jax.lax.dynamic_slice(G_pad, (0, sid * S2, 0), (K1, S2, K3))
        energy = jax.lax.psum(
            scale * jnp.sum(G_sh * (q_re * q_re + q_im * q_im)),
            SPATIAL_AXIS)
        rr, ii = G_sh * q_re, -(G_sh * q_im)
        # inverse: axis-0 back to the padded slab axis, transpose back,
        # then the axis-1 (padded) and axis-2 inverses on the slab
        rr, ii = pme_mod._axis_dft(rr, ii, *pencil["inv0"], 0)
        rr = jax.lax.all_to_all(rr, SPATIAL_AXIS, split_axis=0,
                                concat_axis=1, tiled=True)
        ii = jax.lax.all_to_all(ii, SPATIAL_AXIS, split_axis=0,
                                concat_axis=1, tiled=True)
        rr, ii = pme_mod._axis_dft(rr, ii, *pencil["inv1"], 1)
        rr, _ = pme_mod._axis_dft(rr, ii, *pencil["fwd2"], 2)
        phi_slab = 2.0 * scale * rr                    # (S1, K2, K3)
        phi = jax.lax.all_gather(phi_slab, SPATIAL_AXIS, axis=0,
                                 tiled=True)[:K1]
        f_blk, dEdq_blk = pme_mod.phi_gather(x_blk, box, q_blk, phi,
                                             grid_shape, order)
        return energy, jnp.concatenate([f_blk, dEdq_blk[:, None]], axis=1)

    def pme_fn(x, box, lam_c):
        x_pad = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        energy, fq = grid_part(x_pad, box, lam_c)
        f_grid = fq[:n, :3]
        dEdq = fq[:n, 3]
        vol = pbc_mod.box_volume(box)
        if not fep_q:
            e = (energy + pme_mod.self_energy(qa[:n], beta)
                 + pme_mod.net_charge_energy(qa[:n], beta, vol))
            return e, f_grid, jnp.zeros((), x.dtype)
        qmix = (1.0 - lam_c) * qa[:n] + lam_c * qb[:n]
        e = (energy + pme_mod.self_energy(qmix, beta)
             + pme_mod.net_charge_energy(qmix, beta, vol))
        dq = dq_pert.astype(x.dtype)
        # mesh functional for E[dq] (see make_pme_recip_fn: reproduces
        # the reference's dual-grid dvdl to mesh precision)
        dft_full = pme_mod.make_dft_matrices(grid_shape)
        e_kk, g_kk = jax.value_and_grad(
            lambda xp: pme_mod.reciprocal_energy(
                xp, box, dq, grid_shape, beta, order, influence,
                dft_full))(x[pert_idx])
        e_dd = (e_kk + pme_mod.self_energy(dq, beta)
                + pme_mod.net_charge_energy(dq, beta, vol))
        e = e + lam_c * (1.0 - lam_c) * e_dd
        f = f_grid.at[pert_idx].add(-lam_c * (1.0 - lam_c) * g_kk)
        from ..core.units import ONE_4PI_EPS0
        dvdl = jnp.sum(dEdq[pert_idx] * dq)
        dvdl = dvdl - 2.0 * ONE_4PI_EPS0 * beta / jnp.sqrt(jnp.pi) * jnp.sum(
            qmix[pert_idx] * dq)
        dvdl = dvdl - ONE_4PI_EPS0 * jnp.pi / (beta ** 2 * vol) * (
            jnp.sum(qmix) * jnp.sum(dq))
        dvdl = dvdl + (1.0 - 2.0 * lam_c) * e_dd
        return e, f, dvdl

    return pme_fn
