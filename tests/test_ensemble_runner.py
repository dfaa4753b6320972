"""Ensemble FEP driver test: 4 windows on the 8-device CPU mesh, with
replica exchange and a BAR estimate at the end (config #4 of
BASELINE.json)."""
import jax
import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.analysis.bar import bar_profile
from gromacs_fep_gpu_tpu.core.types import (CoulombType, FepParams, MdParams,
                                            TcouplType)
from gromacs_fep_gpu_tpu.md.ensemble_runner import (EnsembleConfig,
                                                    EnsembleRunner)
from gromacs_fep_gpu_tpu.models.solvation import solvation_system
from gromacs_fep_gpu_tpu.parallel.ensemble import lambda_schedule, stack_states
from gromacs_fep_gpu_tpu.parallel.mesh import make_mesh


def test_ensemble_fep_run_with_exchange():
    L = 4
    all_lambda = lambda_schedule(L)
    params = MdParams(dt=0.002, nstlist=10, coulomb=CoulombType.REACTION_FIELD,
                      rcoulomb=0.58, rvdw=0.58, rlist=0.64, nstcomm=0,
                      tcoupl=TcouplType.V_RESCALE, ref_t=300.0, nsttcouple=1,
                      tau_t=0.2,
                      fep=FepParams(enabled=True, sc_alpha=0.5, sc_coul=True,
                                    nstdhdl=5))
    system, state0 = solvation_system(n_side=3, spacing=0.4, seed=17,
                                      temperature=300.0)
    mesh = make_mesh(n_ens=4, n_spatial=2)
    runner = EnsembleRunner(system, params, all_lambda, mesh=mesh,
                            config=EnsembleConfig(nstexchange=20, nnbr=96,
                                                  fep_max_nbr=128))
    states = stack_states(state0, all_lambda, seed=5)
    states, logs, n_acc = runner.run(states, 60)

    assert states.x.shape[0] == L
    ep = np.asarray(logs[-1].epot)
    assert np.isfinite(ep).all()

    # collect Delta H rows and run BAR
    dh_rows, idx_rows = [], []
    for log in logs:
        dh = np.asarray(log.delta_h)       # (L, seg, L)
        for w in range(L):
            keep = ~np.isnan(dh[w, :, 0])
            dh_rows.append(dh[w, keep])
            idx_rows.append(np.full(keep.sum(), w))
    delta_h = np.concatenate(dh_rows)
    lam_idx = np.concatenate(idx_rows)
    legs, total, err = bar_profile(delta_h, lam_idx, 300.0, skip_frac=0.0)
    assert np.isfinite(total)


def test_temperature_replica_exchange():
    """T-RE: per-replica thermostat temperatures, beta-difference
    Metropolis, velocity rescale on swap (reference:
    replicaexchange.cpp:867 T branch + scale_velocities)."""
    L = 4
    temps = np.array([300.0, 330.0, 363.0, 400.0])
    all_lambda = lambda_schedule(L) * 0.0     # no FEP ladder
    params = MdParams(dt=0.002, nstlist=10,
                      coulomb=CoulombType.REACTION_FIELD,
                      rcoulomb=0.58, rvdw=0.58, rlist=0.64, nstcomm=0,
                      tcoupl=TcouplType.V_RESCALE, ref_t=300.0,
                      nsttcouple=1, tau_t=0.2,
                      fep=FepParams(enabled=False))
    system, state0 = solvation_system(n_side=3, spacing=0.4, seed=11,
                                      temperature=300.0, decouple=False)
    runner = EnsembleRunner(system, params, all_lambda,
                            config=EnsembleConfig(nstexchange=20, nnbr=96,
                                                  fep_max_nbr=128),
                            temperatures=temps)
    states = stack_states(state0, all_lambda, seed=9)
    # replica index drives the per-window thermostat temperature
    states = states.replace(
        fep_state=jnp.arange(L, dtype=states.fep_state.dtype))
    states, logs, n_acc = runner.run(states, 80)
    assert np.isfinite(np.asarray(logs[-1].epot)).all()
    # hot replicas must thermalize hotter than cold ones
    t_end = np.asarray(logs[-1].temp)[:, -1]
    assert t_end[-1] > t_end[0]


def test_ensemble_ep_x_dd_sharding():
    """EP x DD composition: each lambda window's atom arrays shard over
    the 'spatial' mesh axis inside the vmapped ensemble step (GSPMD
    partitioning — the TPU analogue of multisim composed with DD,
    reference: mdrunutility/multisim.h:81 + domdec/partition.cpp:2746).
    Asserts actual per-device shard shapes and trajectory parity with
    the ens-only-sharded run."""
    from gromacs_fep_gpu_tpu.models.water import water_box
    L = 4
    all_lambda = lambda_schedule(L)
    params = MdParams(dt=0.001, nstlist=10,
                      coulomb=CoulombType.REACTION_FIELD,
                      rcoulomb=0.5, rvdw=0.5, rlist=0.55, nstcomm=0,
                      tcoupl=TcouplType.V_RESCALE, ref_t=300.0,
                      nsttcouple=1, tau_t=0.2)
    system, state0 = water_box(4, spacing=0.4, seed=9, temperature=300.0)
    n = system.n_atoms
    assert n % 2 == 0

    mesh = make_mesh(n_ens=4, n_spatial=2)
    runner = EnsembleRunner(system, params, all_lambda, mesh=mesh,
                            config=EnsembleConfig(nstexchange=0, nnbr=96,
                                                  exchange=False))
    states = stack_states(state0, all_lambda, seed=5)
    out, logs, _ = runner.run(states, 20)

    # per-device shards: (L/4 windows, n/2 atoms, 3)
    shard_shapes = {s.data.shape for s in out.x.addressable_shards}
    assert shard_shapes == {(1, n // 2, 3)}, shard_shapes
    assert len(out.x.addressable_shards) == 8

    mesh1 = make_mesh(n_ens=8, n_spatial=1)
    runner1 = EnsembleRunner(system, params, all_lambda[:4], mesh=None,
                             config=EnsembleConfig(nstexchange=0, nnbr=96,
                                                   exchange=False))
    out1, logs1, _ = runner1.run(stack_states(state0, all_lambda, seed=5),
                                 20)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(out1.x),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(logs[-1].epot),
                               np.asarray(logs1[-1].epot), rtol=2e-5)
