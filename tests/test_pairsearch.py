"""Two-level pair search vs the exact single-level reference.

The 2-level tile search (ops/pairlist._cluster_neighbors_2level) is the
production path at C >= 4096 (reference analogue: grid-column scanning,
nbnxm/grid.cpp); the compaction variant (ordered=False) must find the
same neighbor SET as the top_k variant — order is irrelevant to the
kernels, membership is not.
"""
import jax
import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.ops.pairlist import (_cluster_neighbors,
                                              _cluster_neighbors_2level,
                                              _pack_valid)


def _random_boxes(C, box_l, seed=0):
    """Jittered-lattice cluster boxes, spatially sorted like a real build
    (the 2-level tiles assume Hilbert locality of consecutive ids)."""
    rng = np.random.default_rng(seed)
    m = int(round(C ** (1.0 / 3.0)))
    while m * m * m < C:
        m += 1
    g = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                 axis=-1).reshape(-1, 3)[:C]
    cen = ((g + 0.5) / m * box_l
           + rng.uniform(-0.2, 0.2, size=(C, 3)) * box_l / m
           ).astype(np.float32)
    from gromacs_fep_gpu_tpu.ops.pairlist import _hilbert3
    ic = jnp.asarray(np.clip((cen / box_l * 256).astype(np.int32), 0, 255))
    key = np.asarray(_hilbert3(ic[:, 0], ic[:, 1], ic[:, 2]))
    cen = cen[np.argsort(key)]
    half = rng.uniform(0.02, 0.08, size=(C, 3)).astype(np.float32)
    return jnp.asarray(cen - half), jnp.asarray(cen + half)


def _rowsets(idx, C):
    return [set(int(v) for v in row if v < C) for v in [None]
            for row in np.asarray(idx)]


def test_pack_valid_matches_mask():
    rng = np.random.default_rng(3)
    ok = jnp.asarray(rng.random((17, 300)) < 0.3)
    pos, valid = _pack_valid(ok, 128)
    pos = np.asarray(pos)
    valid = np.asarray(valid)
    okn = np.asarray(ok)
    for r in range(ok.shape[0]):
        want = np.nonzero(okn[r])[0]
        got = pos[r][valid[r]]
        assert list(got) == list(want[:128])
        assert valid[r].sum() == min(len(want), 128)


def test_2level_matches_single_level():
    C = 4608                       # big enough for tile structure
    box_l = 6.0
    box = jnp.eye(3) * box_l
    bb_lo, bb_hi = _random_boxes(C, box_l)
    rl2 = jnp.float32(1.0)

    # block (4-cluster) query boxes like the v2u build
    S = C // 4
    lo_s = jnp.min(bb_lo.reshape(S, 4, 3), axis=1)
    hi_s = jnp.max(bb_hi.reshape(S, 4, 3), axis=1)

    nnbr = 768
    ref_idx, _, ref_ovf, ref_max = _cluster_neighbors(
        lo_s, hi_s, bb_lo, bb_hi, box, rl2, nnbr)
    assert int(ref_ovf) == 0

    for ordered in (False, True):
        idx, _, ovf, mx, t_ovf, _tm = _cluster_neighbors_2level(
            lo_s, hi_s, bb_lo, bb_hi, box, rl2, nnbr, ordered=ordered)
        assert int(ovf) == 0 and int(t_ovf) == 0, f"ordered={ordered}"
        assert int(mx) == int(ref_max)
        got = [set(int(v) for v in row if v < C) for row in np.asarray(idx)]
        want = [set(int(v) for v in row if v < C)
                for row in np.asarray(ref_idx)]
        assert got == want, f"ordered={ordered}"


def test_2level_overflow_flags():
    # tiny capacity must flag overflow rather than silently truncate
    C = 4608
    box = jnp.eye(3) * 4.0        # dense: every block overflows nnbr=32
    bb_lo, bb_hi = _random_boxes(C, 4.0, seed=1)
    S = C // 4
    lo_s = jnp.min(bb_lo.reshape(S, 4, 3), axis=1)
    hi_s = jnp.max(bb_hi.reshape(S, 4, 3), axis=1)
    _, _, ovf, mx, t_ovf, _tm = _cluster_neighbors_2level(
        lo_s, hi_s, bb_lo, bb_hi, box, jnp.float32(1.0), 32)
    assert int(ovf) + int(t_ovf) > 0
    assert int(mx) > 32 or int(t_ovf) > 0
