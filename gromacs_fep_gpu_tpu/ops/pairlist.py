"""Cluster pair-list construction — the nbnxm pair-search analogue.

Replaces the reference's grid/cluster search
(reference: src/gromacs/nbnxm/grid.cpp, pairlist.cpp:997/3128,
pairsearch.cpp) with a TPU-shaped design:

 - atoms are Morton-sorted by spatial cell and grouped into clusters of
   CLUSTER=8 (one VPU sublane row per i-atom; j runs along lanes),
 - each i-cluster gets a fixed-capacity list of j-cluster indices within
   rlist (computed from cluster bounding spheres, conservative),
 - the list is FULL (both (i,j) and (j,i) present) so the force kernel
   accumulates only into its own i-atoms — no scatter in the hot path,
   which replaces the reference GPU kernel's atomics
   (nbnxm_cuda_kernel_utils.cuh staggeredAtomicAddForce),
 - perturbed atoms get a separate flat FEP pair list, the analogue of the
   fork's gpu_feplist (reference: nbnxm/pairlist.cpp:1544 make_fep_list,
   gpu_types_common.h:343-356), which also carries the excluded perturbed
   pairs needed for Ewald/RF corrections.

Everything is fixed-shape and jit-safe; capacity overflow is reported via
flags so the host can rebuild with a larger capacity (the reference
resizes its lists dynamically on the host too).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core import pbc as pbc_mod
from ..core.types import System

CLUSTER = 8


@struct.dataclass
class ClusterPairlist:
    perm: jnp.ndarray        # (n_pad,) sorted-order -> original atom id (n = dummy)
    inv_perm: jnp.ndarray    # (n,) original -> sorted position
    nbr: jnp.ndarray         # (C, NNBR) j-cluster ids (C = dummy/pad)
    nbr_mask: jnp.ndarray    # (C, NNBR) 1.0 valid
    n_overflow: jnp.ndarray  # () int32: clusters whose neighbours exceeded NNBR
    max_count: jnp.ndarray   # () int32: max neighbours any cluster needed
    # sorted static atom data (rebuilt when the sort changes)
    q_a: jnp.ndarray         # (n_pad,)
    q_b: jnp.ndarray
    t_a: jnp.ndarray         # (n_pad,) int32
    t_b: jnp.ndarray
    pert: jnp.ndarray        # (n_pad,) float 1.0 if atom perturbed
    excl: jnp.ndarray        # (n_pad, K) exclusion partners in SORTED ids (-1 pad)
    # supercluster (8-cluster / 64-atom i-block) list for the Pallas kernel
    # (reference analogue: the 8x8x8 supercluster sci list, pairlist.cpp:3128)
    nbr_super: Optional[jnp.ndarray] = None       # (S, NNBR_B)
    super_overflow: Optional[jnp.ndarray] = None  # ()
    super_max_count: Optional[jnp.ndarray] = None
    # build-time periodic shifts per (i-cluster, j-entry), in box-vector
    # counts (the reference's shift-vector index, nbnxm/pairlist.h
    # nbnxn_ci_t::shift), and per-atom image counts of the rebuild frame —
    # consumed by the v2 Pallas kernel to avoid in-loop minimum-image math
    nbr_shift: Optional[jnp.ndarray] = None       # (C, NNBR, 3) int8
    super_shift: Optional[jnp.ndarray] = None     # (S, NNBR_B, 3) int8
    img: Optional[jnp.ndarray] = None             # (n_pad, 3) f32 (sorted)
    # listed pairs whose cluster extents are so large relative to the box
    # that a center-based shift might misclassify an in-range atom pair
    # (only possible for gas-density systems or tiny boxes) — nonzero
    # means the v2 kernel may not be used
    shift_overflow: Optional[jnp.ndarray] = None  # () int32
    # two-level search candidate-TILE capacity diagnostics (decoupled
    # from the list capacity so the runner can grow the right knob)
    tile_overflow: Optional[jnp.ndarray] = None   # () int32
    tile_max: Optional[jnp.ndarray] = None        # () int32

    @property
    def n_clusters(self) -> int:
        return self.nbr.shape[0]

    @property
    def n_pad(self) -> int:
        return self.perm.shape[0]


@struct.dataclass
class FepPairlist:
    """Flat half list of perturbed atom pairs (original atom ids)."""
    iidx: jnp.ndarray       # (P,)
    jidx: jnp.ndarray       # (P,)
    included: jnp.ndarray   # (P,) 1.0 = interacting (non-excluded) pair
    excluded: jnp.ndarray   # (P,) 1.0 = excluded pair (corrections only)
    n_overflow: jnp.ndarray


def _morton3(ix, iy, iz, bits=8):
    key = jnp.zeros_like(ix)
    for b in range(bits):
        key = (key
               | (((ix >> b) & 1) << (3 * b + 2))
               | (((iy >> b) & 1) << (3 * b + 1))
               | (((iz >> b) & 1) << (3 * b)))
    return key


def _hilbert3(ix, iy, iz, bits=8):
    """3D Hilbert index (Skilling's transpose algorithm, vectorized).

    Unlike the Morton/Z curve, the Hilbert curve has no discontinuities,
    so consecutive atoms along it — and hence the 8-atom clusters cut from
    the sorted order — stay spatially compact, which directly bounds the
    cluster bounding boxes the pair search prunes with.
    """
    X = [ix.astype(jnp.int32), iy.astype(jnp.int32), iz.astype(jnp.int32)]
    M = 1 << (bits - 1)
    Q = M
    while Q > 1:
        P = Q - 1
        for i in range(3):
            cond = (X[i] & Q) != 0
            x0_if = X[0] ^ P
            t = (X[0] ^ X[i]) & P
            x0_else = X[0] ^ t
            xi_else = X[i] ^ t
            X0_new = jnp.where(cond, x0_if, x0_else)
            Xi_new = jnp.where(cond, X[i], xi_else)
            X[0] = X0_new
            if i != 0:
                X[i] = Xi_new
        Q >>= 1
    X[1] = X[1] ^ X[0]
    X[2] = X[2] ^ X[1]
    t = jnp.zeros_like(X[0])
    Q = M
    while Q > 1:
        t = jnp.where((X[2] & Q) != 0, t ^ (Q - 1), t)
        Q >>= 1
    X = [xi ^ t for xi in X]
    # interleave transpose-form bits, MSB first, dim 0 highest
    key = jnp.zeros_like(X[0])
    for b in range(bits - 1, -1, -1):
        for i in range(3):
            key = (key << 1) | ((X[i] >> b) & 1)
    return key


def sort_atoms_by_cell(x, box, cell_size: float,
                       slab_axis: Optional[int] = None):
    """Morton ordering of atoms (reference: nbnxm/grid.cpp cell sorting).

    slab_axis: when set, that axis becomes the primary sort key (slab-major
    order) so contiguous cluster ranges form spatial slabs — required by
    the ring-halo spatial decomposition (parallel/spatial.py), mirroring
    the reference DD's per-dimension cell grids (domdec_setup.cpp)."""
    n = x.shape[0]
    diag = jnp.diag(box)
    # ONE power-of-two cell count for all dims: the Hilbert curve is
    # built on a 2^b cube, and per-dim counts would leave unoccupied
    # coordinate ranges the curve jumps across (holes -> consecutive
    # occupied cells far apart -> bloated cluster bboxes, measured on
    # anisotropic/triclinic cells).  Fractional space is fully occupied,
    # so a uniform grid has no holes; cells are merely box-shaped.
    # One extra refinement level over the ~cluster-sized target measurably
    # tightens the cluster-extent tail (finer keys only refine the order).
    raw = jnp.clip(jnp.exp(jnp.mean(jnp.log(
        jnp.clip(diag / cell_size, 1.0, 255.0)))), 1.0, 127.0)
    ncell = (2 * jnp.exp2(jnp.ceil(jnp.log2(raw)))).astype(jnp.int32)
    # fractional modulo — NOT frac(wrap_into_box(x)): the Cartesian-brick
    # wrap leaves triclinic fractional coords outside [0,1) and the clip
    # would lump distant atoms into boundary cells
    frac = pbc_mod.frac_coords(x, box)
    frac = frac - jnp.floor(frac)
    ic = jnp.clip((frac * ncell).astype(jnp.int32), 0, ncell - 1)
    if slab_axis is None:
        key = _hilbert3(ic[:, 0], ic[:, 1], ic[:, 2])
    else:
        oth = [d for d in range(3) if d != slab_axis]
        a, b = ic[:, oth[0]], ic[:, oth[1]]
        m2 = jnp.zeros_like(a)
        for bit in range(7, -1, -1):  # 2D Morton of the in-slab dims
            m2 = (m2 << 2) | (((a >> bit) & 1) << 1) | ((b >> bit) & 1)
        key = (ic[:, slab_axis] << 16) | m2
    perm = jnp.argsort(key)
    return perm


def dd_geometry(n_atoms: int, grid, block: int):
    """(ps, c_pad): clusters per device for an N-D DD grid, aligned to
    the kernel block, and the padded total cluster count.  Shared by the
    hierarchical sort below and the halo machinery
    (parallel/spatial.py) so device ownership boundaries agree."""
    import numpy as _np
    C = (n_atoms + CLUSTER - 1) // CLUSTER
    nsh = int(_np.prod(grid))
    ps = -(-C // nsh)
    ps = -(-ps // block) * block
    return ps, ps * nsh


def sort_atoms_dd(x, box, cell_size: float, grid, ps: int):
    """Hierarchical equal-count sort for an N-D domain-decomposition
    grid (reference: domdec_setup.cpp per-dimension cell grids +
    redistribute.cpp atom migration — here migration IS the re-sort at
    every NS rebuild).

    grid = (P0, P1, P2) devices per axis (row-major device ids); ps =
    clusters per device (dd_geometry).  Axis 0 is split into P0
    equal-atom-count groups by rank, each group is re-ranked along axis
    1 and split into P1 chunks, and so on — so device d's clusters
    [d*ps, (d+1)*ps) form a spatially compact box with exactly equal
    load (static load balance; the reference's DLB adjusts cell sizes
    for the same goal, dlb.cpp)."""
    n = x.shape[0]
    diag = jnp.diag(box)
    raw = jnp.clip(diag / cell_size, 1.0, 255.0)
    ncell = jnp.exp2(jnp.ceil(jnp.log2(raw))).astype(jnp.int32)
    frac = pbc_mod.frac_coords(x, box)
    frac = frac - jnp.floor(frac)   # true fractional cell, triclinic-safe
    ic = jnp.clip((frac * ncell).astype(jnp.int32), 0, ncell - 1)

    P0, P1, P2 = grid
    if P0 * P1 * P2 > 127:
        raise ValueError("sort_atoms_dd int32 key packing supports up "
                         "to 127 devices per spatial grid")
    # atoms per group at each level (cluster-aligned by construction)
    a0 = ps * P1 * P2 * CLUSTER
    a1 = ps * P2 * CLUSTER

    def ranks(key):
        order = jnp.argsort(key)
        r = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
        return r

    # int32 key packing: cells are 8-bit (ncell clipped to 255) and the
    # group/device prefixes get the high bits; everything stays < 2^31
    i0, i1, i2 = (ic[:, d].astype(jnp.int32) for d in range(3))
    # level 0: rank along axis 0 (cell, then in-cell morton tiebreak)
    r0 = ranks((i0 << 16) | _morton2(i1, i2))
    g0 = jnp.minimum(r0 // a0, P0 - 1)
    # level 1: within the axis-0 group, rank along axis 1
    r1 = ranks((g0 << 16) | (i1 << 8) | i2)
    g1 = jnp.minimum((r1 - g0 * a0) // a1, P1 - 1)
    # level 2: within the (axis-0, axis-1) chunk, rank along axis 2
    a2 = ps * CLUSTER
    g01 = g0 * P1 + g1
    r2 = ranks((g01 << 24) | (i2 << 16) | _morton2(i0, i1))
    g2 = jnp.minimum((r2 - g01 * a1) // a2, P2 - 1)
    dev = g01 * P2 + g2
    # final order: device-major, then spatial cells for cluster
    # compactness within each device box
    key3 = (dev << 24) | (i2 << 16) | (i1 << 8) | i0
    return jnp.argsort(key3).astype(jnp.int32)


def _morton2(a, b):
    m2 = jnp.zeros_like(a)
    for bit in range(7, -1, -1):
        m2 = (m2 << 2) | (((a >> bit) & 1) << 1) | ((b >> bit) & 1)
    return m2


def _pack_valid(ok, k: int):
    """Stable front-compaction of a boolean lane mask without a sort.

    ok: (rows, E) validity.  Returns (pos, valid): pos[r, p] = lane index
    of the (p+1)-th True entry of row r (clipped to E-1 when p >= count),
    valid[r, p] = p < count.  Mechanism: cumsum gives each True entry its
    output rank; the inverse map is a searchsorted expressed as a
    compare-and-reduce (the cumsum is sorted), which vectorizes on the
    VPU instead of lowering to XLA's variadic sort like lax.top_k — the
    pair-list stream needs only *front-packed valid entries*, order
    among them is irrelevant (padding is masked in the kernels), so the
    distance sort the old top_k build paid for was pure overhead
    (reference analogue: pairlist.cpp:3128 emits j-groups in raw grid
    order too, no sorting).  p is swept in chunks so the (rows, E, Pc)
    compare never materializes at full k width."""
    E = ok.shape[-1]
    cs = jnp.cumsum(ok.astype(jnp.int32), axis=-1)            # (rows, E)
    count = cs[..., -1]
    chunk = 128
    outs = []
    for p0 in range(0, k, chunk):
        pr = jnp.arange(p0, min(p0 + chunk, k), dtype=jnp.int32)
        outs.append(jnp.sum(
            (cs[..., :, None] <= pr).astype(jnp.int32), axis=-2))
    pos = jnp.concatenate(outs, axis=-1)                      # (rows, k)
    valid = jnp.arange(k, dtype=jnp.int32) < count[..., None]
    return jnp.minimum(pos, E - 1), valid


def _as_members(lo, hi):
    """Normalize query boxes to (Ci, M, 3) member form."""
    if lo.ndim == 2:
        return lo[:, None, :], hi[:, None, :]
    return lo, hi


@partial(jax.jit, static_argnames=("nnbr", "block"))
def _cluster_neighbors(bb_lo_i, bb_hi_i, bb_lo, bb_hi, box, rlist2, nnbr: int,
                       block: int = 256):
    """For each i-query, up to nnbr j-clusters whose axis-aligned bounding
    boxes come within rlist (exact bbox-bbox lower bound, much tighter
    than bounding spheres for ragged clusters; same role as the
    reference's SIMD-packed cluster bounds, nbnxm/boundingboxes.h).
    bb_lo_i/bb_hi_i: (Ci, 3) query boxes, or (Ci, M, 3) per-MEMBER boxes
    of multi-cluster query blocks — the per-member test keeps a block
    that straddles a sort-order jump from matching the whole corridor
    between its members (union-of-members, not bbox-of-union);
    bb_lo/bb_hi: (C, 3) j-cluster boxes."""
    bb_lo_i, bb_hi_i = _as_members(bb_lo_i, bb_hi_i)
    Ci, M = bb_lo_i.shape[0], bb_lo_i.shape[1]
    C = bb_lo.shape[0]
    Cp = ((Ci + block - 1) // block) * block
    pad = Cp - Ci
    lo_p = jnp.pad(bb_lo_i, ((0, pad), (0, 0), (0, 0)),
                   constant_values=1e6)
    hi_p = jnp.pad(bb_hi_i, ((0, pad), (0, 0), (0, 0)),
                   constant_values=1e6)
    centers = 0.5 * (bb_lo + bb_hi)
    half = 0.5 * (bb_hi - bb_lo)

    def one_block(cb):
        lo = jax.lax.dynamic_slice(lo_p, (cb * block, 0, 0), (block, M, 3))
        hi = jax.lax.dynamic_slice(hi_p, (cb * block, 0, 0), (block, M, 3))
        cen_i = 0.5 * (lo + hi)
        half_i = 0.5 * (hi - lo)
        dc = pbc_mod.pbc_dx(
            cen_i[:, :, None, :] - centers[None, None, :, :], box)
        gap = jnp.abs(dc) - (half_i[:, :, None, :] + half[None, None, :, :])
        gap = jnp.maximum(gap, 0.0)
        lb2 = jnp.min(jnp.sum(gap * gap, -1), axis=1)    # min over members
        cand = lb2 < rlist2
        count = jnp.sum(cand, axis=1)
        score = jnp.where(cand, -lb2, -jnp.inf)
        k = min(nnbr, C)
        top_scores, top_idx = jax.lax.top_k(score, k)
        mask = jnp.isfinite(top_scores)
        idx = jnp.where(mask, top_idx, C)
        if k < nnbr:
            idx = jnp.pad(idx, ((0, 0), (0, nnbr - k)), constant_values=C)
            mask = jnp.pad(mask, ((0, 0), (0, nnbr - k)))
        return idx.astype(jnp.int32), mask.astype(jnp.float32), count

    nblocks = Cp // block
    idx, mask, count = jax.lax.map(one_block, jnp.arange(nblocks))
    idx = idx.reshape(Cp, nnbr)[:Ci]
    mask = mask.reshape(Cp, nnbr)[:Ci]
    count = count.reshape(Cp)[:Ci]
    n_overflow = jnp.sum(count > nnbr)
    max_count = jnp.max(count)
    return idx, mask, n_overflow, max_count


def _cluster_neighbors_2level(bb_lo_i, bb_hi_i, bb_lo, bb_hi, box, rlist2,
                              nnbr: int, tile: int = 32,
                              block: int = 128, ordered: bool = False,
                              tile_cap: Optional[int] = None):
    """Two-level variant of _cluster_neighbors for large C: j-clusters
    are grouped into Hilbert-contiguous tiles (a reshape, no gather)
    with their own bounding boxes; each i-box first selects candidate
    TILES within rlist, then runs the exact bbox test against only those
    tiles' members.  Work drops from O(Ci*C) to O(Ci*tcap*tile) — the
    reference gets the same effect from its cell grid (grid.cpp: only
    neighbouring columns are scanned).

    ordered=False (default) packs the in-range clusters to the front
    with the sort-free compaction (_pack_valid) — 4x+ cheaper than the
    distance top_k, which only the dynamic-prune path needs (its trip
    counts assume a distance-ordered stream); ordered=True keeps it.

    Tile-capacity overflow is folded into n_overflow so the runner's
    grow-and-retry loop covers it (tcap scales with nnbr)."""
    bb_lo_i, bb_hi_i = _as_members(bb_lo_i, bb_hi_i)
    Ci, M = bb_lo_i.shape[0], bb_lo_i.shape[1]
    C = bb_lo.shape[0]
    nt = -(-C // tile)
    padj = nt * tile - C
    lo_t = jnp.pad(bb_lo, ((0, padj), (0, 0)),
                   constant_values=1e6).reshape(nt, tile, 3)
    hi_t = jnp.pad(bb_hi, ((0, padj), (0, 0)),
                   constant_values=-1e6).reshape(nt, tile, 3)
    t_lo = jnp.min(lo_t, axis=1)
    t_hi = jnp.max(hi_t, axis=1)
    cen_t = 0.5 * (t_lo + t_hi)
    half_t = 0.5 * (t_hi - t_lo)          # empty tiles: negative-huge

    # candidate-tile capacity: enough tiles to hold ~nnbr in-range
    # clusters plus a surface allowance; the runner tracks the observed
    # need and passes tile_cap explicitly (its own knob — deriving it
    # from nnbr made capacity-shrink and tile-growth fight each other)
    tcap = min(nt, tile_cap if tile_cap is not None
               else max(8, 2 * nnbr // tile + 8))

    cenj = 0.5 * (bb_lo + bb_hi)
    halfj = 0.5 * (bb_hi - bb_lo)
    # per-tile slab rows [cen(3) | half(3) | valid | pad] so stage 2
    # gathers tcap 256-byte tile rows per i-box instead of tcap*tile
    # per-cluster rows (whole-row gathers are the cheap shape on TPU)
    slab = jnp.concatenate(
        [cenj, halfj,
         jnp.ones((C, 1), cenj.dtype), jnp.zeros((C, 1), cenj.dtype)],
        axis=1)
    slab = jnp.pad(slab, ((0, padj), (0, 0)))                 # valid=0 pad
    slab_t = slab.reshape(nt, tile * 8)

    Cp = ((Ci + block - 1) // block) * block
    pad = Cp - Ci
    lo_p = jnp.pad(bb_lo_i, ((0, pad), (0, 0), (0, 0)),
                   constant_values=1e6)
    hi_p = jnp.pad(bb_hi_i, ((0, pad), (0, 0), (0, 0)),
                   constant_values=1e6)

    def one_block(cb):
        lo = jax.lax.dynamic_slice(lo_p, (cb * block, 0, 0), (block, M, 3))
        hi = jax.lax.dynamic_slice(hi_p, (cb * block, 0, 0), (block, M, 3))
        cen_i = 0.5 * (lo + hi)                          # (block, M, 3)
        half_i = 0.5 * (hi - lo)
        # stage 1: tiles within rlist of any member box
        dct = pbc_mod.pbc_dx(
            cen_i[:, :, None, :] - cen_t[None, None, :, :], box)
        gap_t = jnp.maximum(
            jnp.abs(dct) - (half_i[:, :, None, :]
                            + half_t[None, None, :, :]), 0.0)
        lbt = jnp.min(jnp.sum(gap_t * gap_t, -1), axis=1)
        cand_t = lbt < rlist2
        t_count = jnp.sum(cand_t, axis=1)
        if ordered:
            t_sc, t_idx = jax.lax.top_k(jnp.where(cand_t, -lbt, -jnp.inf),
                                        tcap)
            t_ok = jnp.isfinite(t_sc)                   # (block, tcap)
        else:
            t_pos, t_ok = _pack_valid(cand_t, tcap)
            t_idx = t_pos
        # stage 2: exact bbox test against candidate tiles' members,
        # slab-gathered whole tiles at a time
        g = slab_t[t_idx].reshape(block, tcap * tile, 8)
        cj = g[..., 0:3]
        hj = g[..., 3:6]
        ok_j = (g[..., 6] > 0.5) & jnp.repeat(t_ok, tile, axis=1)
        dc = pbc_mod.pbc_dx(
            cen_i[:, :, None, :] - cj[:, None, :, :], box)
        gap = jnp.maximum(
            jnp.abs(dc) - (half_i[:, :, None, :] + hj[:, None, :, :]), 0.0)
        lb2 = jnp.min(jnp.sum(gap * gap, -1), axis=1)
        ok = (lb2 < rlist2) & ok_j
        count = jnp.sum(ok, axis=1)
        k = min(nnbr, tcap * tile)
        if ordered:
            cand = (t_idx[:, :, None] * tile
                    + jnp.arange(tile)[None, None, :]).reshape(
                        block, tcap * tile)             # (block, E)
            top_sc, top_e = jax.lax.top_k(jnp.where(ok, -lb2, -jnp.inf), k)
            mask = jnp.isfinite(top_sc)
            idx = jnp.where(mask,
                            jnp.take_along_axis(cand, top_e, axis=1), C)
        else:
            pos, mask = _pack_valid(ok, k)              # (block, k)
            t_sel = jnp.take_along_axis(t_idx, pos // tile, axis=1)
            idx = jnp.where(mask, t_sel * tile + pos % tile, C)
        if k < nnbr:
            idx = jnp.pad(idx, ((0, 0), (0, nnbr - k)), constant_values=C)
            mask = jnp.pad(mask, ((0, 0), (0, nnbr - k)))
        return (idx.astype(jnp.int32), mask.astype(jnp.float32),
                count, t_count)

    nblocks = Cp // block
    idx, mask, count, t_count = jax.lax.map(one_block, jnp.arange(nblocks))
    idx = idx.reshape(Cp, nnbr)[:Ci]
    mask = mask.reshape(Cp, nnbr)[:Ci]
    count = count.reshape(Cp)[:Ci]
    t_count = t_count.reshape(Cp)[:Ci]
    # reported separately: when tiles overflow, counts are
    # underestimates and the whole rebuild is invalid — but the runner
    # must grow the TILE knob, not the list width
    t_overflow = jnp.sum(t_count > tcap)
    n_overflow = jnp.sum(count > nnbr)
    max_count = jnp.max(count)
    return (idx, mask, n_overflow, max_count,
            t_overflow, jnp.max(t_count))


def _total_image_counts(x, box, perm, n, n_pad, xs, xref, dloc, valid_lane):
    """Per-SORTED-atom periodic image counts of the rebuild's cluster
    LOCAL frame (pad rows 0): x[perm] - img @ box lands each atom exactly
    where the build-time bounding boxes / shifts modelled it — the
    rebuild-frame wrap PLUS the per-cluster local fold.  The local fold
    matters for clusters spanning a sort-order jump (Morton octant
    crossings): their wrapped coordinates sit a full period away from
    the periodic-compact hull the shifts were derived from, which the
    in-loop minimum image hides but baked shifts must account for.
    Counts are integer box-VECTOR multiples (fractional-space), so the
    same machinery covers triclinic cells."""
    C = xs.shape[0] // CLUSTER
    frac = pbc_mod.frac_coords(x, box)
    img_wrap = jnp.concatenate(
        [jnp.floor(frac)[perm[:n]].astype(x.dtype),
         jnp.zeros((n_pad - n, 3), x.dtype)])
    # local-frame fold counts: xs (wrapped) -> xref + dloc
    local_pos = (xref + dloc).reshape(n_pad, 3)
    k = jnp.round(pbc_mod.frac_coords(xs - local_pos, box))
    k = jnp.where(valid_lane.reshape(n_pad, 1), k, 0.0)
    return img_wrap + k.astype(x.dtype)


def build_cluster_pairlist(x, box, system: System, rlist: float,
                           nnbr: int = 64,
                           cell_size: Optional[float] = None,
                           super_nnbr: Optional[int] = None,
                           slab_axis: Optional[int] = None,
                           compute_shifts: bool = False,
                           super_block: int = 8,
                           dd_sort=None,
                           ordered_super: bool = False,
                           triclinic: bool = False,
                           tile_cap: Optional[int] = None,
                           member_queries: bool = False) -> ClusterPairlist:
    """Rebuild the cluster pair list (NS step analogue).

    super_block: i-clusters per block for the union (super) list — 8 for
    the v1 supercluster kernel, 4 for the v2u union-stream kernel.
    dd_sort: ((P0, P1, P2), ps) — N-D DD hierarchical equal-count sort
    (sort_atoms_dd) instead of the Hilbert/slab order; device d owns
    clusters [d*ps, (d+1)*ps)."""
    n = system.n_atoms
    C = (n + CLUSTER - 1) // CLUSTER
    n_pad = C * CLUSTER
    if cell_size is None:
        # aim for ~one cluster per sort cell (tight clusters; reference
        # grid.cpp sizes cells to the cluster size the same way).  Needs a
        # concrete box — under jit pass cell_size explicitly.
        import numpy as _np
        vol = float(_np.prod(_np.diagonal(_np.asarray(box))))
        cell_size = max((CLUSTER * vol / max(n, 1)) ** (1.0 / 3.0), 0.15)

    if dd_sort is not None:
        perm = sort_atoms_dd(x, box, cell_size, dd_sort[0], dd_sort[1])
    else:
        perm = sort_atoms_by_cell(x, box, cell_size, slab_axis=slab_axis)
    perm = jnp.concatenate([perm, jnp.full((n_pad - n,), n, jnp.int32)])
    inv_perm = jnp.zeros((n,), jnp.int32).at[perm[:n]].set(
        jnp.arange(n, dtype=jnp.int32))

    # padded sorted coordinates; dummies parked far away and spread out
    dummy = 1e4 + jnp.arange(n_pad - n, dtype=x.dtype)[:, None] * jnp.ones(3)
    # fractional-cell wrap (== wrap_into_box for rect boxes): keeps the
    # members of a frac-compact cluster block in ONE lattice image so the
    # shared baked shifts are well-defined on triclinic cells
    xs = jnp.concatenate([pbc_mod.wrap_frac_cell(x, box)[perm[:n]], dummy])
    xc = xs.reshape(C, CLUSTER, 3)
    # Bounding boxes in a per-cluster local frame: clusters straddling the
    # periodic boundary would otherwise span the whole box and match every
    # other cluster.  Wrap each atom's offset to the cluster's first atom.
    xref = xc[:, 0:1, :]
    dloc = pbc_mod.pbc_dx(xc - xref, box)
    # padding atoms must not inflate the bbox (sorted order puts real atoms
    # first, so atom 0 of a partially-filled cluster is always real)
    valid_lane = (perm < n).reshape(C, CLUSTER, 1)
    dloc = jnp.where(valid_lane, dloc, 0.0)
    bb_lo = xref[:, 0] + jnp.min(dloc, axis=1)
    bb_hi = xref[:, 0] + jnp.max(dloc, axis=1)

    if nnbr == 0:
        # the v2u kernel consumes only the union (superblock) list; skip
        # the O(C^2) per-cluster pass entirely
        nbr = jnp.zeros((C, 0), jnp.int32)
        nbr_mask = jnp.zeros((C, 0), x.dtype)
        n_overflow = jnp.zeros((), jnp.int32)
        max_count = jnp.zeros((), jnp.int32)
    else:
        nbr, nbr_mask, n_overflow, max_count = _cluster_neighbors(
            bb_lo, bb_hi, bb_lo, bb_hi, box,
            jnp.asarray(rlist**2, x.dtype), nnbr)

    nbr_super = super_overflow = super_max = super_shift = None
    tile_overflow = tile_max = None
    if super_nnbr is not None:
        SB = super_block  # clusters per supercluster block
        S = (C + SB - 1) // SB
        pad_s = S * SB - C
        # per-MEMBER query boxes: a block straddling a Hilbert jump must
        # match the union of its members' neighbourhoods, not the whole
        # corridor its union bbox spans (keeps list capacity tight).
        # The member test costs ~2.5x the block-bbox test (measured 48 vs
        # 19 ms at 81k), so it is opt-in: mandatory for triclinic cells
        # (whose skewed frac wrap makes jump corridors explode), optional
        # elsewhere.
        lo_s = jnp.pad(bb_lo, ((0, pad_s), (0, 0)),
                       constant_values=1e6).reshape(S, SB, 3)
        hi_s = jnp.pad(bb_hi, ((0, pad_s), (0, 0)),
                       constant_values=1e6).reshape(S, SB, 3)
        if not (member_queries or triclinic):
            lo_s = jnp.min(lo_s, axis=1)
            hi_s = jnp.max(jnp.where(hi_s > 5e5, -1e6, hi_s), axis=1)
        if C >= 4096:
            (nbr_s, _, super_overflow, super_max,
             tile_overflow, tile_max) = _cluster_neighbors_2level(
                lo_s, hi_s, bb_lo, bb_hi, box,
                jnp.asarray(rlist**2, x.dtype), super_nnbr,
                ordered=ordered_super, tile_cap=tile_cap)
        else:
            nbr_s, _, super_overflow, super_max = _cluster_neighbors(
                lo_s, hi_s, bb_lo, bb_hi, box,
                jnp.asarray(rlist**2, x.dtype), super_nnbr)
            tile_overflow = tile_max = None
        nbr_super = nbr_s

    nbr_shift = img = shift_overflow = None
    if compute_shifts and nbr_super is not None:
        # union-block shifts for the v2u kernel: one shift per
        # (i-block, union entry) from the block's bbox center
        SBu = super_block
        Su = nbr_super.shape[0]
        pad_u = Su * SBu - C
        lo_u = jnp.pad(bb_lo, ((0, pad_u), (0, 0)),
                       constant_values=1e6).reshape(Su, SBu, 3)
        hi_u = jnp.pad(bb_hi, ((0, pad_u), (0, 0)),
                       constant_values=1e6).reshape(Su, SBu, 3)
        blk_lo = jnp.min(lo_u, axis=1)
        blk_hi = jnp.max(jnp.where(hi_u > 5e5, -1e6, hi_u), axis=1)
        cen_b = 0.5 * (blk_lo + blk_hi)
        cen_c = 0.5 * (bb_lo + bb_hi)
        he_c = 0.5 * (bb_hi - bb_lo)
        nbr_u = jnp.minimum(nbr_super, C - 1)
        cen_d = cen_b[:, None, :] - cen_c[nbr_u]          # (Su, nnbr, 3)
        valid_u = nbr_super < C
        if not triclinic:
            rel_u = pbc_mod.frac_coords(cen_d, box)
            super_shift = jnp.round(rel_u).astype(jnp.int8)
            diag = jnp.diag(box)
            # validity per member i-cluster: |cen_c - cen_j - s L| +
            # he_c + he_j must stay below L - rlist per component for the
            # block shift to give every member's pairs their true minimum
            # image
            cen_m = jnp.pad(cen_c, ((0, pad_u), (0, 0))).reshape(Su, SBu, 3)
            he_m = jnp.pad(he_c, ((0, pad_u), (0, 0))).reshape(Su, SBu, 3)
            valid_m = (jnp.arange(Su * SBu).reshape(Su, SBu) < C)
            sL = super_shift.astype(x.dtype) * diag
            # (Su, SBu, nnbr, 3)
            d_m = jnp.abs(cen_m[:, :, None, :]
                          - cen_c[nbr_u][:, None, :, :]
                          - sL[:, None, :, :]) + he_m[:, :, None, :] \
                + he_c[nbr_u][:, None, :, :]
            bad_m = (jnp.any(d_m > (diag - rlist), axis=-1)
                     & valid_m[:, :, None])
            bad_u = jnp.any(bad_m, axis=1)
        else:
            # triclinic (reference: pbcutil/pbc.cpp triclinic shift
            # search): pick the Cartesian-nearest of the 27 integer
            # lattice shifts around the fractional rounding, and flag
            # any entry where a SECOND image could also interact
            # (|d - tB| <= rlist + extents for t != chosen) — then the
            # per-entry baked shift is exact for every member pair.
            base = jnp.round(pbc_mod.frac_coords(cen_d, box))
            cen_m = jnp.pad(cen_c, ((0, pad_u), (0, 0))).reshape(Su, SBu, 3)
            he_m = jnp.pad(he_c, ((0, pad_u), (0, 0))).reshape(Su, SBu, 3)
            valid_m = (jnp.arange(Su * SBu).reshape(Su, SBu) < C)
            he_sum_m = he_m[:, :, None, :] + he_c[nbr_u][:, None, :, :]
            dm = (cen_m[:, :, None, :]
                  - cen_c[nbr_u][:, None, :, :])          # (Su,SBu,nnbr,3)
            r2s = []          # block-center distance (image selection)
            lb2s = []         # per-MEMBER bbox-gap pair lower bounds
            cands = []
            for dx_ in (-1.0, 0.0, 1.0):
                for dy_ in (-1.0, 0.0, 1.0):
                    for dz_ in (-1.0, 0.0, 1.0):
                        t = base + jnp.array([dx_, dy_, dz_], x.dtype)
                        # elementwise box-row expansion (a matmul would
                        # ride the bf16 MXU and misplace shifts)
                        tL = (t[..., 0:1] * box[0] + t[..., 1:2] * box[1]
                              + t[..., 2:3] * box[2])
                        d = cen_d - tL
                        r2s.append(jnp.sum(d * d, -1))
                        gm = jnp.maximum(
                            jnp.abs(dm - tL[:, None, :, :]) - he_sum_m, 0.0)
                        lb2s.append(jnp.sum(gm * gm, -1))
                        cands.append(t)
            r2s = jnp.stack(r2s, -1)                      # (Su, nnbr, 27)
            lb2s = jnp.stack(lb2s, -1)               # (Su, SBu, nnbr, 27)
            best = jnp.argmin(r2s, -1)
            cand_arr = jnp.stack(cands, -2)               # (Su, nnbr, 27, 3)
            super_shift = jnp.take_along_axis(
                cand_arr, best[..., None, None], axis=-2
            )[..., 0, :].astype(jnp.int8)
            # a baked shift is exact iff, for every member cluster, NO
            # image other than the chosen one can bring a pair within
            # rlist (bbox-gap lower bound per candidate image).  With
            # GROMACS-legal boxes (rlist < half the minimal cell height)
            # true ambiguity is impossible; flags arise only from bbox
            # slack on near-degenerate cells and route to the XLA kernel.
            in_reach = lb2s <= jnp.asarray(rlist * rlist, x.dtype)
            not_chosen = (jnp.arange(27) != best[:, None, :, None])
            bad_m = jnp.any(in_reach & not_chosen, axis=-1) \
                & valid_m[:, :, None]
            bad_u = jnp.any(bad_m, axis=1)
        shift_overflow = jnp.sum((bad_u & valid_u).astype(jnp.int32))
        img = _total_image_counts(x, box, perm, n, n_pad, xs, xref, dloc,
                                  valid_lane)
    elif compute_shifts:
        # periodic shift per (i-cluster, j-entry) from cluster centers,
        # valid for the whole nstlist window (the buffer bounds motion);
        # the v2 Pallas kernel folds these into the gathered j coordinates
        cen = 0.5 * (bb_lo + bb_hi)                       # (C, 3)
        he = 0.5 * (bb_hi - bb_lo)                        # half extents
        nbr_c = jnp.minimum(nbr, C - 1)
        cj = cen[nbr_c]                                   # (C, nnbr, 3)
        rel = pbc_mod.frac_coords(cen[:, None, :] - cj, box)
        nbr_shift = jnp.round(rel).astype(jnp.int8)
        # validity: after the center shift, the largest possible atom-pair
        # displacement per component must stay below L - rlist, else a
        # different periodic image of the pair could be the interacting
        # one (only happens when cluster extents ~ box size)
        diag = jnp.diag(box)
        dmax = (jnp.abs(rel - jnp.round(rel)) * diag
                + he[:, None, :] + he[nbr_c])             # (C, nnbr, 3)
        bad = jnp.any(dmax > (diag - rlist)[None, None, :], axis=-1)
        shift_overflow = jnp.sum(
            (bad & (nbr_mask > 0)).astype(jnp.int32))
        img = _total_image_counts(x, box, perm, n, n_pad, xs, xref, dloc,
                                  valid_lane)

    # sorted static atom data
    def gather_pad(a, fill):
        return jnp.concatenate(
            [a[perm[:n]], jnp.full((n_pad - n,), fill, a.dtype)])

    q_a = gather_pad(system.charge_a, 0.0)
    q_b = gather_pad(system.charge_b, 0.0)
    t_a = gather_pad(system.type_a, 0)
    t_b = gather_pad(system.type_b, 0)
    pert = gather_pad(system.perturbed.astype(x.dtype), 0.0)

    # remap exclusion partners to sorted ids; invalid -> -1
    K = system.exclusions.idx.shape[1]
    ex = system.exclusions.idx  # (n, K), original ids
    valid = ex >= 0
    ex_sorted_partner = jnp.where(valid, inv_perm[jnp.where(valid, ex, 0)], -1)
    excl = jnp.concatenate(
        [ex_sorted_partner[perm[:n]], jnp.full((n_pad - n, K), -1, jnp.int32)])

    return ClusterPairlist(perm=perm, inv_perm=inv_perm, nbr=nbr,
                           nbr_mask=nbr_mask, n_overflow=n_overflow,
                           max_count=max_count,
                           q_a=q_a, q_b=q_b, t_a=t_a, t_b=t_b, pert=pert,
                           excl=excl,
                           nbr_super=nbr_super, super_overflow=super_overflow,
                           super_max_count=super_max,
                           nbr_shift=nbr_shift, super_shift=super_shift,
                           img=img, shift_overflow=shift_overflow,
                           tile_overflow=tile_overflow, tile_max=tile_max)


def check_exclusions(x, box, system: System, rlist: float,
                     skip_perturbed: bool = False):
    """Number of excluded pairs beyond rlist — such pairs would silently
    lose their RF/Ewald exclusion corrections (the reference fails hard on
    this; nbnxm/exclusionchecker.cpp, pairlist.cpp:4456-4466).

    skip_perturbed: ignore pairs involving perturbed atoms — the FEP pair
    list carries ALL their excluded partners at any distance, so those
    corrections are never lost."""
    ex = system.exclusions.idx
    valid = ex >= 0
    partner = jnp.where(valid, ex, 0)
    if skip_perturbed:
        pert = jnp.asarray(system.perturbed)
        valid = valid & ~pert[:, None] & ~pert[partner]
    d = pbc_mod.pbc_dx(x[:, None, :] - x[partner], box)
    r2 = jnp.sum(d * d, -1)
    return jnp.sum((r2 > rlist * rlist) & valid)


def build_fep_pairlist(x, box, system: System, rlist: float,
                       pert_idx: np.ndarray, max_nbr: int = 512
                       ) -> FepPairlist:
    """Pairs involving perturbed atoms (reference: make_fep_list,
    pairlist.cpp:1544).  pert_idx: static array of perturbed atom indices.

    Emits, per perturbed atom, up to max_nbr partners within rlist plus
    ALL its excluded partners (needed for reciprocal-space corrections at
    any distance).  Pert-pert pairs are deduplicated by keeping i<j.
    """
    n = system.n_atoms
    npert = pert_idx.shape[0]
    pert_idx = jnp.asarray(pert_idx, jnp.int32)
    is_pert = jnp.zeros((n,), bool).at[pert_idx].set(True)

    xp = x[pert_idx]
    dx = pbc_mod.pbc_dx(xp[:, None, :] - x[None, :, :], box)
    r2 = jnp.sum(dx * dx, -1)

    ids = jnp.arange(n, dtype=jnp.int32)
    excl_mat_rows = system.exclusions.idx[pert_idx]             # (npert, K)
    is_excl = jnp.zeros((npert, n), bool)
    rowk = jnp.broadcast_to(jnp.arange(npert)[:, None], excl_mat_rows.shape)
    vmask = excl_mat_rows >= 0
    is_excl = is_excl.at[rowk, jnp.where(vmask, excl_mat_rows, 0)].max(vmask)

    within = r2 < rlist * rlist
    notself = ids[None, :] != pert_idx[:, None]
    # dedupe pert-pert: keep only j>i for pairs of two perturbed atoms
    dup = is_pert[None, :] & (ids[None, :] < pert_idx[:, None])
    cand = (within | is_excl) & notself & (~dup)

    # select up to max_nbr per perturbed atom
    max_nbr = min(max_nbr, n)
    score = jnp.where(cand, -r2, -jnp.inf)
    top_s, top_j = jax.lax.top_k(score, max_nbr)
    sel_mask = jnp.isfinite(top_s)
    count = jnp.sum(cand, 1)
    n_overflow = jnp.sum(count > max_nbr)

    ii = jnp.broadcast_to(pert_idx[:, None], top_j.shape)
    row = jnp.broadcast_to(jnp.arange(npert)[:, None], top_j.shape)
    exc = is_excl[row, top_j] & sel_mask
    inc = sel_mask & (~exc)
    return FepPairlist(
        iidx=ii.reshape(-1), jidx=top_j.reshape(-1).astype(jnp.int32),
        included=inc.reshape(-1).astype(x.dtype),
        excluded=exc.reshape(-1).astype(x.dtype),
        n_overflow=n_overflow)
