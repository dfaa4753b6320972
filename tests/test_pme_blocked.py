"""Blocked (locality-tiled) PME spread/gather vs the dense MXU oracles.

The blocked path must reproduce ops/pme.spread_charges / phi_gather
exactly (same splines, same precision settings), including under
positions drifted since the rebuild-time bucketing — the production
cadence (reference: pme_spread.cu operates on the order^3 local support;
here the support is a per-block subgrid window)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gromacs_fep_gpu_tpu.ops import pme as pme_mod
from gromacs_fep_gpu_tpu.ops import pme_blocked as pb


def _setup(n=500, K=(16, 16, 16), L=2.4, seed=0):
    rng = np.random.RandomState(seed)
    box = jnp.eye(3, dtype=jnp.float32) * L
    x = jnp.asarray(rng.uniform(0, L, (n, 3)), jnp.float32)
    q = rng.uniform(-1, 1, n)
    q -= q.mean()
    q = jnp.asarray(q, jnp.float32)
    nb, amax = pb.choose_blocks(K, n)
    blocks = pb.build_pme_blocks(x, box, K, nb, amax)
    assert int(blocks.n_overflow) == 0
    return x, box, q, K, blocks


def test_blocked_spread_matches_dense():
    x, box, q, K, blocks = _setup()
    g_ref = pme_mod.spread_charges(x, box, q, K)
    g_blk = pb.blocked_spread(x, box, q, K, blocks)
    np.testing.assert_allclose(np.asarray(g_blk), np.asarray(g_ref),
                               atol=5e-6 * float(jnp.abs(g_ref).max()))


def test_blocked_gather_matches_dense():
    x, box, q, K, blocks = _setup(seed=1)
    rng = np.random.RandomState(2)
    phi = jnp.asarray(rng.normal(size=K), jnp.float32)
    f_ref, d_ref = pme_mod.phi_gather(x, box, q, phi, K)
    f_blk, d_blk = pb.blocked_phi_gather(x, box, q, phi, K, blocks)
    scale = float(jnp.abs(f_ref).max())
    np.testing.assert_allclose(np.asarray(f_blk), np.asarray(f_ref),
                               atol=5e-6 * scale)
    np.testing.assert_allclose(np.asarray(d_blk), np.asarray(d_ref),
                               atol=5e-6 * float(jnp.abs(d_ref).max()))


def test_blocked_spread_under_drift():
    """Bucketing is per-rebuild; positions drift between rebuilds.  Up to
    MARGIN cells of drift must stay exact."""
    x, box, q, K, blocks = _setup(seed=3)
    cell = 2.4 / 16.0
    rng = np.random.RandomState(4)
    xd = x + jnp.asarray(
        rng.uniform(-0.9 * pb.MARGIN * cell, 0.9 * pb.MARGIN * cell,
                    x.shape), jnp.float32)
    g_ref = pme_mod.spread_charges(xd, box, q, K)
    g_blk = pb.blocked_spread(xd, box, q, K, blocks)
    np.testing.assert_allclose(np.asarray(g_blk), np.asarray(g_ref),
                               atol=5e-6 * float(jnp.abs(g_ref).max()))
    phi = jnp.asarray(rng.normal(size=K), jnp.float32)
    f_ref, _ = pme_mod.phi_gather(xd, box, q, phi, K)
    f_blk, _ = pb.blocked_phi_gather(xd, box, q, phi, K, blocks)
    np.testing.assert_allclose(np.asarray(f_blk), np.asarray(f_ref),
                               atol=5e-6 * float(jnp.abs(f_ref).max()))


def test_blocked_spread_poisons_on_excess_drift():
    """An atom that left its drift window must poison the grid (NaN),
    never silently drop charge — same fail-hard contract as the
    exclusion checker."""
    x, box, q, K, blocks = _setup(seed=5)
    cell = 2.4 / 16.0
    # move one atom by half a box: far outside any window
    xd = x.at[7].add(jnp.asarray([1.2, 0.0, 0.0], jnp.float32))
    g_blk = pb.blocked_spread(xd, box, q, K, blocks)
    assert bool(jnp.isnan(g_blk).any())
    del cell


def test_blocked_overflow_flag():
    n = 256
    rng = np.random.RandomState(6)
    box = jnp.eye(3, dtype=jnp.float32) * 2.0
    # everything in one corner -> one block overflows its capacity
    x = jnp.asarray(rng.uniform(0, 0.2, (n, 3)), jnp.float32)
    K = (16, 16, 16)
    blocks = pb.build_pme_blocks(x, box, K, (2, 2, 2), 64)
    assert int(blocks.n_overflow) >= 1


@pytest.mark.parametrize("seed", [7, 8])
def test_pallas_spread_matches_einsum(seed):
    x, box, q, K, blocks = _setup(seed=seed)
    g_ref = pb.blocked_spread(x, box, q, K, blocks)
    g_pl = pb.blocked_spread_pallas(x, box, q, K, blocks, interpret=True)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               atol=5e-6 * float(jnp.abs(g_ref).max()))


def test_pallas_gather_matches_einsum():
    x, box, q, K, blocks = _setup(seed=9)
    rng = np.random.RandomState(10)
    phi = jnp.asarray(rng.normal(size=K), jnp.float32)
    f_ref, d_ref = pb.blocked_phi_gather(x, box, q, phi, K, blocks)
    f_pl, d_pl = pb.blocked_phi_gather_pallas(x, box, q, phi, K, blocks,
                                              interpret=True)
    np.testing.assert_allclose(np.asarray(f_pl), np.asarray(f_ref),
                               atol=5e-6 * float(jnp.abs(f_ref).max()))
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                               atol=5e-6 * float(jnp.abs(d_ref).max()))


def test_pallas_spread_under_drift():
    x, box, q, K, blocks = _setup(seed=11)
    cell = 2.4 / 16.0
    rng = np.random.RandomState(12)
    xd = x + jnp.asarray(
        rng.uniform(-0.9 * pb.MARGIN * cell, 0.9 * pb.MARGIN * cell,
                    x.shape), jnp.float32)
    g_ref = pme_mod.spread_charges(xd, box, q, K)
    g_pl = pb.blocked_spread_pallas(xd, box, q, K, blocks, interpret=True)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               atol=5e-6 * float(jnp.abs(g_ref).max()))
    phi = jnp.asarray(rng.normal(size=K), jnp.float32)
    f_ref, _ = pme_mod.phi_gather(xd, box, q, phi, K)
    f_pl, _ = pb.blocked_phi_gather_pallas(xd, box, q, phi, K, blocks,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(f_pl), np.asarray(f_ref),
                               atol=5e-6 * float(jnp.abs(f_ref).max()))


def test_runner_blocked_pme_matches_dense_path():
    """Production wiring: a PME run with blocked_pme=True forced must
    track the default (dense spread/gather) run step for step —
    pme_blocks rebuilt at NS cadence, overflow flag surfaced through the
    runner (reference acceptance: GPU-path == CPU-path trajectories,
    freeenergy.cpp:159-165)."""
    from gromacs_fep_gpu_tpu.core.types import (CoulombType, MdParams,
                                                TcouplType)
    from gromacs_fep_gpu_tpu.md.runner import (MdRunner, RunnerConfig,
                                               concat_logs)
    from gromacs_fep_gpu_tpu.models.water import water_box
    from gromacs_fep_gpu_tpu.ops.pme import pme_grid_size

    box_l = 3 * 0.4
    params = MdParams(dt=0.001, nstlist=5, coulomb=CoulombType.PME,
                      rcoulomb=0.55, rvdw=0.55, rlist=0.62,
                      pme_grid=pme_grid_size((box_l,) * 3, 0.08),
                      tcoupl=TcouplType.V_RESCALE, ref_t=300.0,
                      nsttcouple=1, nstcomm=0, nstcalcenergy=1)
    system, state = water_box(3, spacing=0.4, temperature=300.0, seed=5)

    r_blk = MdRunner(system, params, RunnerConfig(blocked_pme=True))
    assert r_blk._pme_nb is not None
    f_b, logs_b = r_blk.run(state, 20)
    r_ref = MdRunner(system, params, RunnerConfig(blocked_pme=False))
    assert r_ref._pme_nb is None
    f_r, logs_r = r_ref.run(state, 20)

    lb, lr = concat_logs(logs_b), concat_logs(logs_r)
    np.testing.assert_allclose(lb.epot, lr.epot, rtol=2e-4, atol=5e-2)
    np.testing.assert_allclose(np.asarray(f_b.x), np.asarray(f_r.x),
                               atol=5e-4)
