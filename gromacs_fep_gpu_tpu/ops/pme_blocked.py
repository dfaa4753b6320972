"""Locality-blocked PME spread/gather for large systems.

The dense MXU spread/gather formulations (ops/pme.py spread_charges,
phi_gather; ops/pme_pallas.py) cost O(N * K^3) FLOPs / O(N * K3) HBM
reads — fine at 12k atoms / 42^3, catastrophic at the 81k-atom headline
scale / 80^3 (measured 7.1 ms spread + 4.2 ms gather per step on TPU
v5e).  This module tiles the box into a regular (nb1, nb2, nb3) grid of
coarse blocks, buckets atoms by block once per pair-list rebuild, and
runs the one-hot spline contractions against each block's (s1, s2, s3)
LOCAL subgrid window only: cost O(N * s^3) with s ~ K/nb + order.

Reference analogue: pme_spread.cu / pme_gather.cu operate on exactly the
order^3 local support via shared-memory atomics; the TPU equivalent is
dense einsums over per-block subgrids (static shapes, static window
origins, overlap-add with static slices — no scatters anywhere on the
per-step path).

The bucket assignment (build_pme_blocks) is the only scatter and runs at
rebuild cadence; per-block capacity overflow is reported like the pair
list's and handled by the runner's grow-and-roll-back machinery.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core import pbc as pbc_mod
from .pme import _prec, bspline_dweights, bspline_weights

MARGIN = 2          # cells of drift headroom between rebuilds


@struct.dataclass
class PmeBlocks:
    """Atom bucketing onto the coarse block grid (one per rebuild)."""
    idx: jnp.ndarray         # (NB, Amax) i32 atom ids; n (=invalid) padded
    valid: jnp.ndarray       # (NB, Amax) f32 1/0
    n_overflow: jnp.ndarray  # scalar i32: blocks whose count > Amax
    # inverse of idx: atom -> block*Amax + rank.  The bucketing is a
    # disjoint partition, so the gather-side "scatter-add" of per-block
    # results is really an inverse permutation — a row GATHER per atom
    # (measured 1.6 ms/step cheaper than .at[].add at 81k on TPU v5e).
    # Overflow-dropped atoms point at slot 0 (garbage values — the
    # overflow flag already forces a rollback+regrow in the runner).
    inv_pos: jnp.ndarray     # (n,) i32
    nb: Tuple[int, int, int] = struct.field(pytree_node=False)


def choose_blocks(grid_shape, n_atoms: int,
                  order: int = 4) -> Tuple[Tuple[int, int, int], int]:
    """(nb, amax): coarse-block grid for the Pallas spread/gather.

    Selection is shape-driven, not flop-driven: a TPU v5e sweep at
    80^3/81k measured the gather near-flat across geometries
    (3.4-4.0 ms) while the spread varied 0.77-3.6 ms with NO flop/
    element model predicting it (e.g. s=(23,23,17) ran 3.1 ms while the
    strictly-larger (27,23,17) ran 0.77 ms — Mosaic layout effects).
    The one robust pattern: near-CUBIC local windows were always fast
    (s=23^3 -> 0.82 ms, s=17^3 -> 1.23 ms) and every slow geometry was
    non-cubic.  So: minimise the window aspect ratio, tie-break by
    larger per-block atom tiles (fewer grid programs amortise the
    per-program constant: 125x23^3 beat 512x17^3), under a VMEM guard
    for the gather kernel's ~4 live (s2*s3, Apad) f32 products.

    Env override for hand tuning: TPUMD_PME_BLOCKS="nb1,nb2,nb3"."""
    import os
    ov = os.environ.get("TPUMD_PME_BLOCKS")
    if ov:
        nbs = tuple(int(v) for v in ov.split(","))
        return nbs, _amax_for(n_atoms, int(np.prod(nbs)))
    halo = order - 1 + 2 * MARGIN
    best = None
    for nbs in _divisor_triples(grid_shape):
        NB = int(np.prod(nbs))
        amax = _amax_for(n_atoms, NB)
        apad = -(-amax // 128) * 128
        s = [grid_shape[d] // nbs[d] + halo for d in range(3)]
        # gather-kernel live VMEM (hard scoped-vmem limit is 16M; leave
        # headroom for the phi window and accumulators)
        if 4 * s[1] * s[2] * apad * 4 > 12 << 20:
            continue
        if apad > 1152:
            continue
        aspect = max(s) / min(s)
        key = (round(aspect, 3), -amax, NB)
        if best is None or key < best[0]:
            best = (key, nbs, amax)
    if best is None:        # tiny grids: fall back to the flop model
        for nbs in _divisor_triples(grid_shape):
            NB = int(np.prod(nbs))
            amax = _amax_for(n_atoms, NB)
            s = [grid_shape[d] // nbs[d] + halo for d in range(3)]
            cost = NB * amax * s[0] * s[1] * s[2]
            if best is None or cost < best[0]:
                best = (cost, nbs, amax)
    return best[1], best[2]


def _amax_for(n_atoms: int, NB: int) -> int:
    # mean + 6*sqrt(mean) headroom: empirical block-count spread scales
    # ~sqrt(mean) (widest observed: 1.4x mean = +2.6 sigma at 12k/294
    # blocks during lattice-melt equilibration), so a relative factor
    # wastes lanes at large blocks — at 81k/125 blocks the old 1.6x
    # padded 648-atom means to 1088 slots while mean+6*sqrt covers the
    # same tail at 832.  EVERY per-lane op in the spread/gather kernels
    # scales with this capacity.  The overflow flag + runner growth
    # (1.5x rollback-and-recompile) covers anything beyond.
    mean = n_atoms / NB
    amax = int(mean + max(6.0 * mean ** 0.5, 24.0))
    return max(64, -(-amax // 64) * 64)


def _divisor_triples(grid_shape):
    outs = []
    divs = []
    for K in grid_shape:
        ds = [d for d in range(2, K + 1)
              if K % d == 0 and K // d >= 4]
        divs.append(ds or [1])
    for d0 in divs[0]:
        for d1 in divs[1]:
            for d2 in divs[2]:
                if d0 * d1 * d2 >= 8:
                    outs.append((d0, d1, d2))
    return outs or [(1, 1, 1)]


def build_pme_blocks(x, box, grid_shape, nb, amax: int) -> PmeBlocks:
    """Bucket atoms by coarse block (runs once per pair-list rebuild)."""
    n = x.shape[0]
    NB = int(np.prod(nb))
    s = pbc_mod.frac_coords(x, box)
    s = s - jnp.floor(s)
    nbv = jnp.array(nb)
    b3 = jnp.clip((s * nbv).astype(jnp.int32), 0, nbv - 1)
    bid = (b3[:, 0] * nb[1] + b3[:, 1]) * nb[2] + b3[:, 2]

    order = jnp.argsort(bid)
    bs = bid[order]
    counts = jnp.zeros((NB,), jnp.int32).at[bid].add(1)
    start = jnp.cumsum(counts) - counts
    rank = jnp.arange(n, dtype=jnp.int32) - start[bs]
    ok = rank < amax
    rows = jnp.where(ok, bs, NB)          # out of bounds -> dropped
    idx = jnp.full((NB, amax), n, jnp.int32)
    idx = idx.at[rows, jnp.where(ok, rank, 0)].set(
        order.astype(jnp.int32), mode="drop")
    valid = (idx < n).astype(jnp.float32)
    n_overflow = jnp.sum((counts > amax).astype(jnp.int32))
    pos = jnp.where(ok, rows * amax + rank, 0)
    inv_pos = jnp.zeros((n,), jnp.int32).at[order].set(
        pos.astype(jnp.int32))
    return PmeBlocks(idx=idx, valid=valid, n_overflow=n_overflow,
                     inv_pos=inv_pos, nb=nb)


def _local_splines(xg, box, grid_shape, nb, order, derivatives: bool):
    """Per-block-atom local spline one-hots.

    xg: (NB, Amax, 3) gathered coordinates.  Returns (oh, doh, bad) with
    oh[d]: (NB, Amax, s_d) one-hot-weighted rows on the block's local
    window, and bad: count of atoms outside their window (drift beyond
    MARGIN since the rebuild)."""
    NB, A, _ = xg.shape
    K = jnp.array(grid_shape)
    halo_lo = order - 1 + MARGIN
    sfrac = pbc_mod.frac_coords(xg, box)
    sfrac = sfrac - jnp.floor(sfrac)
    u = sfrac * K.astype(xg.dtype)
    gi = jnp.floor(u).astype(jnp.int32)
    w = u - gi.astype(xg.dtype)

    cdim = [grid_shape[d] // nb[d] for d in range(3)]
    s_dim = [cdim[d] + order - 1 + 2 * MARGIN for d in range(3)]
    b3 = jnp.stack(jnp.unravel_index(jnp.arange(NB), nb), axis=1)
    o_b = b3 * jnp.array(cdim) - halo_lo                  # (NB, 3)
    # local cell, with the mod representative chosen in
    # [order-1, K+order-1): a box-edge wrap must land at rel ~ K (the
    # window's high side), never at rel ~ 0 where the spline support
    # rel-j would go negative and silently drop weight
    lo = order - 1
    rel = jnp.mod(gi - o_b[:, None, :] - lo, K) + lo      # (NB, A, 3)
    bad = (rel >= jnp.array(s_dim)).any(-1)

    jj = np.arange(order)
    oh, doh = [], []
    for d in range(3):
        ws = bspline_weights(w[..., d], order)            # (NB, A, order)
        cells = jnp.arange(s_dim[d], dtype=jnp.int32)
        # spread cells rel-j, j = 0..order-1
        tgt = rel[..., d:d + 1] - jnp.asarray(jj)         # (NB, A, order)
        sel = (tgt[..., None] == cells).astype(xg.dtype)  # (NB,A,o,s_d)
        oh.append(jnp.einsum('bao,baos->bas', ws, sel,
                     precision=_prec()))
        if derivatives:
            dws = bspline_dweights(w[..., d], order)
            doh.append(jnp.einsum('bao,baos->bas', dws, sel,
                      precision=_prec()))
    return oh, (doh if derivatives else None), bad, s_dim, cdim


def _fold_blocks_axis(a, nb_d: int, cdim_d: int, halo_lo: int):
    """Periodic overlap-add of one block axis.

    a: (nb_d, T, rest...) per-block windows whose local index t maps to
    global cell (b*cdim + t - halo_lo) mod K.  Returns (K, rest...).
    Splitting t - halo_lo = m*cdim + u turns the scatter into <= 3
    block-axis rolls + static slice-adds — O(1) ops per axis instead of
    O(NB) update-slices."""
    T = a.shape[1]
    K = nb_d * cdim_d
    out = jnp.zeros((nb_d, cdim_d) + a.shape[2:], a.dtype)
    m_min = -((halo_lo + cdim_d - 1) // cdim_d)
    m_max = (T - 1 - halo_lo) // cdim_d
    for m in range(m_min, m_max + 1):
        t0 = halo_lo + m * cdim_d
        tt0, tt1 = max(t0, 0), min(t0 + cdim_d, T)
        if tt0 >= tt1:
            continue
        u0 = tt0 - t0
        piece = jnp.roll(a[:, tt0:tt1], m, axis=0)
        out = out.at[:, u0:u0 + (tt1 - tt0)].add(piece)
    return out.reshape((K,) + a.shape[2:])


def _window_blocks_axis(g, nb_d: int, cdim_d: int, halo_lo: int, T: int):
    """Inverse of _fold_blocks_axis (read instead of accumulate):
    g: (K, rest...) -> (nb_d, T, rest...) with
    w[b, t] = g[(b*cdim + t - halo_lo) mod K]."""
    gb = g.reshape((nb_d, cdim_d) + g.shape[1:])
    pieces = []
    m_min = -((halo_lo + cdim_d - 1) // cdim_d)
    m_max = (T - 1 - halo_lo) // cdim_d
    for m in range(m_min, m_max + 1):
        t0 = halo_lo + m * cdim_d
        tt0, tt1 = max(t0, 0), min(t0 + cdim_d, T)
        if tt0 >= tt1:
            continue
        u0 = tt0 - t0
        pieces.append(jnp.roll(gb, -m, axis=0)[:, u0:u0 + (tt1 - tt0)])
    return jnp.concatenate(pieces, axis=1)


def blocked_spread(x, box, charges, grid_shape, blocks: PmeBlocks,
                   order: int = 4):
    """Charge spread via per-block local subgrids; twin of
    ops/pme.spread_charges."""
    n = x.shape[0]
    nb = blocks.nb
    halo_lo = order - 1 + MARGIN
    xg = jnp.concatenate([x, jnp.zeros((1, 3), x.dtype)])[blocks.idx]
    qg = (jnp.concatenate([charges, jnp.zeros((1,), charges.dtype)]
                          )[blocks.idx] * blocks.valid)
    oh, _, bad, s_dim, cdim = _local_splines(xg, box, grid_shape, nb,
                                             order, False)
    # a REAL atom outside its drift window means the rebuild-time
    # bucketing is stale beyond MARGIN cells: poison the grid with NaN
    # (fail hard, like the exclusion checker) rather than silently
    # dropping its charge
    bad = bad & (blocks.valid > 0)
    qg = jnp.where(bad, jnp.nan, qg)
    hi = _prec()
    # z-last contraction: (q wx)(x)wy -> (NB, A, s1*s2), then one einsum
    # against the z one-hots gives each block's local subgrid
    sxy = jnp.einsum('bax,bay->baxy', oh[0] * qg[..., None], oh[1],
                     precision=hi)
    NB, A = xg.shape[0], xg.shape[1]
    sxy = sxy.reshape(NB, A, s_dim[0] * s_dim[1])
    qloc = jnp.einsum('bap,baz->bpz', sxy, oh[2], precision=hi)
    # (nb1, nb2, nb3, s1, s2, s3) -> fold each block axis in turn
    g = qloc.reshape(tuple(nb) + tuple(s_dim))
    # axis 0: (nb1, s1, rest) with rest = (nb2, nb3, s2, s3)
    g = jnp.moveaxis(g, 3, 1)                     # nb1, s1, nb2, nb3, s2, s3
    g = _fold_blocks_axis(g, nb[0], cdim[0], halo_lo)   # K1, nb2, nb3, s2, s3
    g = jnp.moveaxis(jnp.moveaxis(g, 1, 0), 3, 1)       # nb2, s2, K1, nb3, s3
    g = _fold_blocks_axis(g, nb[1], cdim[1], halo_lo)   # K2, K1, nb3, s3
    g = jnp.moveaxis(jnp.moveaxis(g, 2, 0), 3, 1)       # nb3, s3, K2, K1
    g = _fold_blocks_axis(g, nb[2], cdim[2], halo_lo)   # K3, K2, K1
    return jnp.transpose(g, (2, 1, 0))


def blocked_phi_gather(x, box, charges, phi, grid_shape,
                       blocks: PmeBlocks, order: int = 4):
    """(forces, dEdq) from the potential grid; twin of
    ops/pme.phi_gather, reading only each block's local window."""
    n = x.shape[0]
    nb = blocks.nb
    halo_lo = order - 1 + MARGIN
    xg = jnp.concatenate([x, jnp.zeros((1, 3), x.dtype)])[blocks.idx]
    qg = (jnp.concatenate([charges, jnp.zeros((1,), charges.dtype)]
                          )[blocks.idx] * blocks.valid)
    oh, doh, bad, s_dim, cdim = _local_splines(xg, box, grid_shape, nb,
                                               order, True)
    bad = bad & (blocks.valid > 0)
    qg = jnp.where(bad, jnp.nan, qg)
    hi = _prec()
    NB, A = xg.shape[0], xg.shape[1]

    # per-block windows of phi via the inverse block fold (O(1) rolls
    # per axis, no per-block slicing)
    w = _window_blocks_axis(phi, nb[0], cdim[0], halo_lo, s_dim[0])
    # (nb1, s1, K2, K3) -> axis 1 next
    w = jnp.moveaxis(w, 2, 0)                           # K2, nb1, s1, K3
    w = _window_blocks_axis(w, nb[1], cdim[1], halo_lo, s_dim[1])
    # (nb2, s2, nb1, s1, K3)
    w = jnp.moveaxis(w, 4, 0)                           # K3, nb2, s2, nb1, s1
    w = _window_blocks_axis(w, nb[2], cdim[2], halo_lo, s_dim[2])
    # (nb3, s3, nb2, s2, nb1, s1) -> (nb1, nb2, nb3, s1, s2, s3)
    w = jnp.transpose(w, (4, 2, 0, 5, 3, 1))
    ploc = w.reshape(NB, s_dim[0], s_dim[1], s_dim[2])

    p2 = ploc.reshape(NB, s_dim[0] * s_dim[1], s_dim[2])
    # Pz[b, a, (x,y)] = sum_z ohz * phi ; Pdz with d/dz weights
    pz = jnp.einsum('baz,bpz->bap', oh[2], p2, precision=hi)
    pdz = jnp.einsum('baz,bpz->bap', doh[2], p2, precision=hi)
    pz = pz.reshape(NB, A, s_dim[0], s_dim[1])
    pdz = pdz.reshape(NB, A, s_dim[0], s_dim[1])

    def xy(oha, ohb, P):
        return jnp.einsum('bax,bay,baxy->ba', oha, ohb, P, precision=hi)

    pw = xy(oh[0], oh[1], pz)
    dEdu = jnp.stack([xy(doh[0], oh[1], pz),
                      xy(oh[0], doh[1], pz),
                      xy(oh[0], oh[1], pdz)], axis=-1) * qg[..., None]
    dEdq_blocks = pw * blocks.valid

    # back to original atom order: inverse-permutation row gather
    Kv = jnp.array(grid_shape)
    binv = pbc_mod.inv3(box)
    dEdu_at = dEdu.reshape(-1, 3)[blocks.inv_pos]
    dEdq = dEdq_blocks.reshape(-1)[blocks.inv_pos]
    forces = -jnp.einsum('nd,ed->ne', dEdu_at * Kv.astype(x.dtype),
                         binv, precision=jax.lax.Precision.HIGHEST)
    return forces, dEdq


# ---------------------------------------------------------------------------
# Pallas kernels: the per-step path.  Each block's subgrid window lives in
# VMEM (~50-250 KB) and the whole block's atoms are processed in one shot
# with atoms riding the 128-wide LANE dimension: one-hot spline rows are
# (s_d, A) tiles (full VPU lanes), the spread/gather contractions over
# atoms run on the MXU.  The first version of these kernels put atoms on
# sublanes and the tiny (11-15) window dims on lanes — ~12% lane
# utilization, measured 2x SLOWER than the einsum path; this transposed
# layout is ~10x faster than the einsums at the 81k/80^3 scale.
# ---------------------------------------------------------------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ALIGN = 128         # atom padding per block (lane dimension)


def _w4(w):
    """Closed-form order-4 cardinal B-spline weights M4(w+j), j=0..3,
    identical to pme.bspline_weights(w, 4) (Essmann recursion)."""
    m2_0, m2_1 = w, 1.0 - w
    m3_0 = 0.5 * w * m2_0
    m3_1 = 0.5 * ((w + 1.0) * m2_1 + (2.0 - w) * m2_0)
    m3_2 = 0.5 * (1.0 - w) * m2_1
    m4_0 = (w * m3_0) / 3.0
    m4_1 = ((w + 1.0) * m3_1 + (3.0 - w) * m3_0) / 3.0
    m4_2 = ((w + 2.0) * m3_2 + (2.0 - w) * m3_1) / 3.0
    m4_3 = ((1.0 - w) * m3_2) / 3.0
    return (m4_0, m4_1, m4_2, m4_3), (m3_0, m3_1, m3_2)


def _onehots_lanes(u, s_d: int, derivatives: bool):
    """u: (1, A) local window coordinates -> one-hot-weighted rows
    (s_d, A): row r of column a is M4 weight of atom a at window cell r
    (dM4 rows when derivatives).  dM4(j) = M3(j) - M3(j-1)."""
    li = jnp.floor(u)
    w = u - li
    (m40, m41, m42, m43), (m30, m31, m32) = _w4(w)
    taps = (m40, m41, m42, m43)
    dtaps = (m30, m31 - m30, m32 - m31, -m32)
    A = u.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (s_d, A), 0)
    lii = li.astype(jnp.int32)
    oh = jnp.zeros((s_d, A), jnp.float32)
    doh = jnp.zeros((s_d, A), jnp.float32)
    for j in range(4):
        sel = (rows == (lii - j)).astype(jnp.float32)
        oh = oh + taps[j] * sel
        if derivatives:
            doh = doh + dtaps[j] * sel
    return oh, (doh if derivatives else None)


def _spread_kernel(u_ref, q_ref, out_ref, s_dim):
    s1, s2, s3 = s_dim
    u = u_ref[0]                                   # (3, A)
    q = q_ref[0]                                   # (1, A)
    ohx, _ = _onehots_lanes(u[0:1], s1, False)
    ohy, _ = _onehots_lanes(u[1:2], s2, False)
    ohz, _ = _onehots_lanes(u[2:3], s3, False)
    # uu row y*s3+z = ohy[y] * ohz[z]  -> (s2*s3, A)
    uu = jnp.concatenate([ohy[y:y + 1] * ohz for y in range(s2)], axis=0)
    qwx = ohx * q                                  # (s1, A)
    out_ref[0] = jax.lax.dot_general(
        qwx, uu, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def blocked_spread_pallas(x, box, charges, grid_shape, blocks: PmeBlocks,
                          order: int = 4, interpret: bool = False):
    """Pallas twin of blocked_spread (order 4 only)."""
    assert order == 4
    nb = blocks.nb
    u_loc, q_loc, s_dim, cdim = _pallas_inputs(x, box, charges,
                                               grid_shape, blocks)
    NB, A = q_loc.shape[0], q_loc.shape[2]
    s1, s2, s3 = s_dim
    qloc = pl.pallas_call(
        lambda u_ref, q_ref, out_ref: _spread_kernel(
            u_ref, q_ref, out_ref, s_dim),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, 3, A), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, A), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s1, s2 * s3), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, s1, s2 * s3), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(u_loc, q_loc)
    halo_lo = order - 1 + MARGIN
    g = qloc.reshape(tuple(nb) + (s1, s2, s3))
    g = jnp.moveaxis(g, 3, 1)
    g = _fold_blocks_axis(g, nb[0], cdim[0], halo_lo)
    g = jnp.moveaxis(jnp.moveaxis(g, 1, 0), 3, 1)
    g = _fold_blocks_axis(g, nb[1], cdim[1], halo_lo)
    g = jnp.moveaxis(jnp.moveaxis(g, 2, 0), 3, 1)
    g = _fold_blocks_axis(g, nb[2], cdim[2], halo_lo)
    return jnp.transpose(g, (2, 1, 0))


def _gather_kernel(phi_ref, u_ref, q_ref, out_ref, s_dim):
    s1, s2, s3 = s_dim
    u = u_ref[0]                                   # (3, A)
    q = q_ref[0]                                   # (1, A)
    ohx, dohx = _onehots_lanes(u[0:1], s1, True)
    ohy, dohy = _onehots_lanes(u[1:2], s2, True)
    ohz, dohz = _onehots_lanes(u[2:3], s3, True)
    phi2 = phi_ref[0]                              # (s1, s2*s3)

    def yz(a, b):
        # outer-product rows (s2*s3, A): row y*s3+z = a[y] * b[z]
        return jnp.concatenate([a[y:y + 1] * b for y in range(s2)], axis=0)

    def dot(m, w):
        # (s1, s2*s3) @ (s2*s3, A) on the MXU — full-width contraction
        return jax.lax.dot_general(
            m, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    G = dot(phi2, yz(ohy, ohz))                    # (s1, A)
    Gdy = dot(phi2, yz(dohy, ohz))
    Gdz = dot(phi2, yz(ohy, dohz))
    pw = jnp.zeros((1, G.shape[1]), jnp.float32)
    fxu = jnp.zeros((1, G.shape[1]), jnp.float32)
    fyu = jnp.zeros((1, G.shape[1]), jnp.float32)
    fzu = jnp.zeros((1, G.shape[1]), jnp.float32)
    for xx in range(s1):
        wx = ohx[xx:xx + 1]
        dwx = dohx[xx:xx + 1]
        pw = pw + G[xx:xx + 1] * wx
        fxu = fxu + G[xx:xx + 1] * dwx
        fyu = fyu + Gdy[xx:xx + 1] * wx
        fzu = fzu + Gdz[xx:xx + 1] * wx
    out_ref[0] = jnp.concatenate([q * fxu, q * fyu, q * fzu, pw], axis=0)


def blocked_phi_gather_pallas(x, box, charges, phi, grid_shape,
                              blocks: PmeBlocks, order: int = 4,
                              interpret: bool = False):
    """Pallas twin of blocked_phi_gather (order 4 only)."""
    assert order == 4
    n = x.shape[0]
    nb = blocks.nb
    u_loc, q_loc, s_dim, cdim = _pallas_inputs(x, box, charges,
                                               grid_shape, blocks)
    NB, A = q_loc.shape[0], q_loc.shape[2]
    s1, s2, s3 = s_dim
    halo_lo = order - 1 + MARGIN

    # per-block windows of phi via static one-hot SELECTION MATMULS
    # (W_d[b*s+t, (b*cdim+t-halo) mod K] = 1): three MXU contractions
    # replace the roll/moveaxis chains, which dominated the gather cost
    # at 80^3 (XLA transposes of awkward 6-D shapes); W entries are
    # exact 0/1 so 3-pass bf16 keeps phi at f32 accuracy
    hi = _prec()
    Ws = []
    for d in range(3):
        t = np.arange(nb[d] * s_dim[d])
        src = (t // s_dim[d] * cdim[d] + t % s_dim[d] - halo_lo) \
            % grid_shape[d]
        W = np.zeros((nb[d] * s_dim[d], grid_shape[d]), np.float32)
        W[t, src] = 1.0
        Ws.append(jnp.asarray(W))
    p = jnp.einsum('xi,ijk->xjk', Ws[0], phi, precision=hi)
    p = jnp.einsum('yj,xjk->xyk', Ws[1], p, precision=hi)
    p = jnp.einsum('zk,xyk->xyz', Ws[2], p, precision=hi)
    ploc = p.reshape(nb[0], s1, nb[1], s2, nb[2], s3).transpose(
        0, 2, 4, 1, 3, 5).reshape(NB, s1, s2 * s3)

    outs = pl.pallas_call(
        lambda phi_ref, u_ref, q_ref, out_ref: _gather_kernel(
            phi_ref, u_ref, q_ref, out_ref, s_dim),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, s1, s2 * s3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, A), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, A), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, A), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, 4, A), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(ploc, u_loc, q_loc)

    Kv = jnp.array(grid_shape)
    binv = pbc_mod.inv3(box)
    # back to original atom order: the bucketing is a disjoint partition,
    # so this is an inverse-permutation row gather, not a scatter-add
    # (the .at[].add tail alone measured 1.6 ms/step at 81k).  outs rows
    # are (NB, 4, Apad): per-atom flat position = block * Apad + rank.
    Apad = outs.shape[2]
    amax = blocks.idx.shape[1]
    pos = (blocks.inv_pos // amax) * Apad + blocks.inv_pos % amax
    fq = outs.transpose(0, 2, 1).reshape(-1, 4)[pos]      # (n, 4)
    forces = -jnp.einsum('nd,ed->ne', fq[:, :3] * Kv.astype(x.dtype),
                         binv, precision=jax.lax.Precision.HIGHEST)
    return forces, fq[:, 3]


def _pallas_inputs(x, box, charges, grid_shape, blocks: PmeBlocks,
                   order: int = 4):
    """Shared prelude: per-block-atom local coordinates (window frame,
    integer part = local cell) and NaN-poisoned charges, transposed to
    (NB, 3, A) / (NB, 1, A) with A padded to the 128-lane alignment."""
    nb = blocks.nb
    NB = int(np.prod(nb))
    halo_lo = order - 1 + MARGIN
    xg = jnp.concatenate([x, jnp.zeros((1, 3), x.dtype)])[blocks.idx]
    qg = (jnp.concatenate([charges, jnp.zeros((1,), charges.dtype)]
                          )[blocks.idx] * blocks.valid)
    K = jnp.array(grid_shape)
    sfrac = pbc_mod.frac_coords(xg, box)
    sfrac = sfrac - jnp.floor(sfrac)
    u = sfrac * K.astype(x.dtype)
    gi = jnp.floor(u).astype(jnp.int32)
    wfrac = u - gi.astype(x.dtype)
    cdim = [grid_shape[d] // nb[d] for d in range(3)]
    s_dim = [cdim[d] + order - 1 + 2 * MARGIN for d in range(3)]
    b3 = jnp.stack(jnp.unravel_index(jnp.arange(NB), nb), axis=1)
    o_b = b3 * jnp.array(cdim) - halo_lo
    lo = order - 1
    rel = jnp.mod(gi - o_b[:, None, :] - lo, K) + lo
    bad = (rel >= jnp.array(s_dim)).any(-1) & (blocks.valid > 0)
    qg = jnp.where(bad, jnp.nan, qg)
    # invalid (padding) atoms: park mid-window so weights stay finite
    u_loc = jnp.where((blocks.valid > 0)[..., None],
                      rel.astype(x.dtype) + wfrac,
                      jnp.float32(halo_lo) + 0.5)
    A = u_loc.shape[1]
    Ap = -(-A // _ALIGN) * _ALIGN
    if Ap != A:
        u_loc = jnp.pad(u_loc, ((0, 0), (0, Ap - A), (0, 0)),
                        constant_values=halo_lo + 0.5)
        qg = jnp.pad(qg, ((0, 0), (0, Ap - A)))
    return (u_loc.transpose(0, 2, 1), qg[:, None, :], s_dim, cdim)
