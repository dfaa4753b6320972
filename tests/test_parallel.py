"""Multi-device tests on the 8-way virtual CPU mesh (TPU analogue of the
reference's thread-MPI rank tests, testutils/mpitest.h)."""
import jax
import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.core.types import (CoulombType, FepCoupling,
                                            FepParams, MdParams)
from gromacs_fep_gpu_tpu.md.simulator import make_step_fn
from gromacs_fep_gpu_tpu.models.water import water_box
from gromacs_fep_gpu_tpu.ops.cluster_nb import make_cluster_force_fn
from gromacs_fep_gpu_tpu.ops.forces import make_dense_force_fn, get_beta
from gromacs_fep_gpu_tpu.ops.pairlist import build_cluster_pairlist
from gromacs_fep_gpu_tpu.parallel import ensemble as ens_mod
from gromacs_fep_gpu_tpu.parallel.mesh import make_mesh
from gromacs_fep_gpu_tpu.parallel.spatial import make_spatial_cluster_force


def test_spatial_sharded_forces_match_single():
    assert len(jax.devices()) == 8
    params = MdParams(rcoulomb=0.55, rvdw=0.55, rlist=0.6,
                      coulomb=CoulombType.REACTION_FIELD)
    system, state = water_box(3, spacing=0.4, seed=20)
    nlist = build_cluster_pairlist(state.x, state.box, system, params.rlist,
                                   nnbr=96)
    from gromacs_fep_gpu_tpu.ops.cluster_nb import cluster_nb_kernel
    f_ref, ec_ref, el_ref = cluster_nb_kernel(
        state.x, state.box, nlist, system.nbfp, params, None, block=16)

    mesh = make_mesh(n_ens=1, n_spatial=8)
    sharded = make_spatial_cluster_force(system, params, mesh, None, block=16)
    f_sh, ec_sh, el_sh = jax.jit(sharded)(state.x, state.box, nlist)
    np.testing.assert_allclose(float(ec_sh), float(ec_ref), rtol=1e-5)
    np.testing.assert_allclose(float(el_sh), float(el_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(f_sh), np.asarray(f_ref), atol=1e-4)


def test_halo_exchange_forces_match_single():
    """Real ppermute halo: sharded positions, ring neighbour exchange, per
    -slab kernel — must reproduce the single-device kernel bit-for-bit-ish
    (reference: domdec dd_move_x + nonbonded local/non-local split)."""
    from gromacs_fep_gpu_tpu.ops.cluster_nb import cluster_nb_kernel
    from gromacs_fep_gpu_tpu.parallel.spatial import (
        halo_shard_geometry, halo_violations, make_halo_cluster_force,
        sort_state_arrays)

    assert len(jax.devices()) == 8
    # slab thickness (box/8 = 0.4 nm) must exceed rlist for the ring halo
    params = MdParams(rcoulomb=0.25, rvdw=0.25, rlist=0.3,
                      coulomb=CoulombType.REACTION_FIELD)
    system, state = water_box(8, spacing=0.4, seed=23)
    nlist = build_cluster_pairlist(state.x, state.box, system, params.rlist,
                                   nnbr=64, slab_axis=0)
    mesh = make_mesh(n_ens=1, n_spatial=8)
    block = 2
    assert int(halo_violations(nlist, 8, block)) == 0
    ps, c_pad = halo_shard_geometry(nlist, 8, block)
    xs = sort_state_arrays(state.x, nlist, c_pad)

    halo = make_halo_cluster_force(system, params, mesh, None, nlist,
                                   block=block)
    f_sh, ec_sh, el_sh = jax.jit(halo)(xs, state.box)

    f_ref, ec_ref, el_ref = cluster_nb_kernel(
        state.x, state.box, nlist, system.nbfp, params, None, block=block)
    np.testing.assert_allclose(float(ec_sh), float(ec_ref), rtol=1e-5)
    np.testing.assert_allclose(float(el_sh), float(el_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(f_sh)[: nlist.n_pad],
                               np.asarray(f_ref), atol=1e-4)


def test_halo_violations_flags_thin_slabs():
    """A big cutoff vs a thin slab must be detected, not silently wrong."""
    from gromacs_fep_gpu_tpu.parallel.spatial import halo_violations
    params = MdParams(rcoulomb=0.75, rvdw=0.75, rlist=0.8,
                      coulomb=CoulombType.REACTION_FIELD)
    system, state = water_box(3, spacing=0.4, seed=24)
    nlist = build_cluster_pairlist(state.x, state.box, system, params.rlist,
                                   nnbr=96)
    # 8 slabs over a 1.2 nm box -> 0.15 nm slabs << rlist: must flag
    assert int(halo_violations(nlist, 8, 2)) > 0


def test_sharded_pme_matches_single_device():
    from gromacs_fep_gpu_tpu.ops.pme import make_pme_recip_pair, pme_grid_size
    from gromacs_fep_gpu_tpu.parallel.spatial import make_sharded_pme
    from gromacs_fep_gpu_tpu.models.solvation import solvation_system

    system, state = solvation_system(n_side=4, spacing=0.35, seed=5,
                                     temperature=300.0)
    box_l = 4 * 0.35
    grid = pme_grid_size((box_l,) * 3, 0.12)
    params = MdParams(coulomb=CoulombType.PME, rcoulomb=0.6, rvdw=0.6,
                      rlist=0.65, pme_grid=grid,
                      fep=FepParams(enabled=True, sc_alpha=0.5, sc_coul=True))
    lam_c = jnp.float32(0.3)
    _, force_fn = make_pme_recip_pair(system, params)
    e_ref, f_ref, dvdl_ref = force_fn(state.x, state.box, lam_c)

    mesh = make_mesh(n_ens=1, n_spatial=8)
    pme_sh = make_sharded_pme(system, params, mesh)
    e_sh, f_sh, dvdl_sh = jax.jit(pme_sh)(state.x, state.box, lam_c)
    np.testing.assert_allclose(float(e_sh), float(e_ref), rtol=2e-5)
    np.testing.assert_allclose(float(dvdl_sh), float(dvdl_ref),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(f_sh), np.asarray(f_ref),
                               atol=2e-3)


def test_ensemble_vmap_step_sharded():
    params = MdParams(dt=0.001, coulomb=CoulombType.REACTION_FIELD,
                      rcoulomb=0.55, rvdw=0.55, nstcomm=0,
                      fep=FepParams(enabled=True, sc_alpha=0.5, sc_coul=True))
    system, state = water_box(2, spacing=0.42, temperature=250.0, seed=21)
    force_fn = make_dense_force_fn(system, params)
    step_fn = make_step_fn(system, params, force_fn)

    lambdas = ens_mod.lambda_schedule(8)
    states = ens_mod.stack_states(state, lambdas)
    mesh = make_mesh(n_ens=8, n_spatial=1)
    ens_step = ens_mod.make_ensemble_step(step_fn, mesh)
    new_states, logs = ens_step(states, None)
    assert new_states.x.shape[0] == 8
    # each window advanced with its own lambda
    assert np.asarray(logs.lam)[:, int(FepCoupling.COUL)].tolist() == \
        np.linspace(0, 1, 8, dtype=np.float32).tolist()
    assert np.isfinite(np.asarray(logs.epot)).all()


def test_replica_exchange_detailed_swap():
    params = MdParams(coulomb=CoulombType.REACTION_FIELD, rcoulomb=0.55,
                      rvdw=0.55,
                      fep=FepParams(enabled=True, sc_alpha=0.5, sc_coul=True))
    system, state = water_box(2, spacing=0.42, temperature=300.0, seed=22)
    from gromacs_fep_gpu_tpu.ops.forces import dense_energy

    def epot_fn(x, box, lam):
        return dense_energy(x, box, lam, system, params).epot

    lambdas = ens_mod.lambda_schedule(4)
    states = ens_mod.stack_states(state, lambdas, seed=3)
    # perturb coordinates so replicas differ
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    xs = jnp.stack([states.x[i] + 0.001 * jax.random.normal(keys[i],
                    states.x[i].shape) for i in range(4)])
    states = states.replace(x=xs)
    new_states, n_acc = ens_mod.replica_exchange_step(
        states, epot_fn, lambdas, 300.0, jax.random.PRNGKey(7), parity=0)
    assert new_states.x.shape == states.x.shape
    assert 0 <= int(n_acc) <= 2


def test_dd_runner_matches_single_device():
    """Full MdRunner with mesh=8-way spatial DD: ppermute halo NB +
    sharded PME inside the fused rebuild+scan chunks, 60 NVT steps, must
    match the single-device runner frame by frame (reference acceptance:
    domain_decomposition.cpp / simulatorcomparison.cpp)."""
    from gromacs_fep_gpu_tpu.core.types import TcouplType
    from gromacs_fep_gpu_tpu.md.runner import MdRunner, RunnerConfig
    from gromacs_fep_gpu_tpu.md.runner import concat_logs
    from gromacs_fep_gpu_tpu.ops.pme import pme_grid_size

    assert len(jax.devices()) == 8
    system, state = water_box(8, spacing=0.4, seed=31, temperature=300.0)
    box_l = 8 * 0.4
    params = MdParams(
        dt=0.001, nstlist=20, coulomb=CoulombType.PME,
        rcoulomb=0.35, rvdw=0.35, rlist=0.4,
        pme_grid=pme_grid_size((box_l,) * 3, 0.12),
        tcoupl=TcouplType.V_RESCALE, ref_t=300.0, nsttcouple=10,
        nstcomm=0)

    r1 = MdRunner(system, params, RunnerConfig(nnbr=96))
    s1, logs1 = r1.run(state, 60)
    l1 = concat_logs(logs1)

    mesh = make_mesh(n_ens=1, n_spatial=8)
    r2 = MdRunner(system, params, RunnerConfig(nnbr=96, mesh=mesh,
                                               dd_block=2))
    s2, logs2 = r2.run(state, 60)
    l2 = concat_logs(logs2)

    e1, e2 = np.asarray(l1.epot), np.asarray(l2.epot)
    assert np.isfinite(e2).all()
    # same physics, different reduction orders: fp32 trajectory-level gate
    np.testing.assert_allclose(e2, e1, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(s2.x), np.asarray(s1.x),
                               atol=5e-3)


def test_dd_runner_nd_grids_match_single_device():
    """2-D (4x2) and 3-D (2x2x2) decompositions: hierarchical
    equal-count sort + per-axis ppermute halo sweeps must reproduce the
    single-device trajectory (reference: domdec_setup.cpp rank grids,
    domain_decomposition.cpp acceptance)."""
    from gromacs_fep_gpu_tpu.core.types import TcouplType
    from gromacs_fep_gpu_tpu.md.runner import MdRunner, RunnerConfig
    from gromacs_fep_gpu_tpu.md.runner import concat_logs
    from gromacs_fep_gpu_tpu.ops.pme import pme_grid_size

    assert len(jax.devices()) == 8
    system, state = water_box(8, spacing=0.4, seed=31, temperature=300.0)
    box_l = 8 * 0.4
    params = MdParams(
        dt=0.001, nstlist=20, coulomb=CoulombType.PME,
        rcoulomb=0.35, rvdw=0.35, rlist=0.4,
        pme_grid=pme_grid_size((box_l,) * 3, 0.12),
        tcoupl=TcouplType.V_RESCALE, ref_t=300.0, nsttcouple=10,
        nstcomm=0)

    r1 = MdRunner(system, params, RunnerConfig(nnbr=96))
    s1, logs1 = r1.run(state, 40)
    l1 = concat_logs(logs1)
    e1 = np.asarray(l1.epot)

    for grid in ((4, 2, 1), (2, 2, 2)):
        mesh = make_mesh(n_ens=1, n_spatial=8)
        r2 = MdRunner(system, params,
                      RunnerConfig(nnbr=96, mesh=mesh, dd_block=2,
                                   dd_grid=grid))
        s2, logs2 = r2.run(state, 40)
        l2 = concat_logs(logs2)
        e2 = np.asarray(l2.epot)
        assert np.isfinite(e2).all(), grid
        np.testing.assert_allclose(e2, e1, rtol=5e-4, err_msg=str(grid))
        np.testing.assert_allclose(np.asarray(s2.x), np.asarray(s1.x),
                                   atol=5e-3, err_msg=str(grid))


def test_dd_runner_fails_hard_on_thin_slabs():
    """Cutoff larger than the slab must abort, not drop interactions."""
    from gromacs_fep_gpu_tpu.md.runner import MdRunner, RunnerConfig
    import pytest

    system, state = water_box(4, spacing=0.4, seed=32, temperature=300.0)
    params = MdParams(dt=0.001, nstlist=10,
                      coulomb=CoulombType.REACTION_FIELD,
                      rcoulomb=0.55, rvdw=0.55, rlist=0.6, nstcomm=0)
    mesh = make_mesh(n_ens=1, n_spatial=8)
    r = MdRunner(system, params, RunnerConfig(nnbr=96, mesh=mesh,
                                              dd_block=2))
    with pytest.raises(RuntimeError, match="halo|slab"):
        r.run(state, 10)


def test_dd_pallas_v2u_matches_single_device():
    """Production (Pallas v2u) kernels under spatial DD: the union-stream
    kernel runs per-device on the ppermute-halo-extended plane and must
    reproduce the single-device Pallas trajectory (reference: the CUDA
    kernels run under DD as a matter of course, nbnxm_cuda.cu:642 +
    gpuhaloexchange_impl_gpu.cpp:277).  Interpret mode on the virtual
    CPU mesh."""
    from gromacs_fep_gpu_tpu.core.types import TcouplType
    from gromacs_fep_gpu_tpu.md.runner import MdRunner, RunnerConfig
    from gromacs_fep_gpu_tpu.md.runner import concat_logs
    from gromacs_fep_gpu_tpu.ops.pme import pme_grid_size

    assert len(jax.devices()) == 8
    system, state = water_box(8, spacing=0.4, seed=31, temperature=300.0)
    box_l = 8 * 0.4
    params = MdParams(
        dt=0.001, nstlist=10, coulomb=CoulombType.PME,
        rcoulomb=0.35, rvdw=0.35, rlist=0.4,
        pme_grid=pme_grid_size((box_l,) * 3, 0.12),
        tcoupl=TcouplType.V_RESCALE, ref_t=300.0, nsttcouple=10,
        nstcomm=0)

    r1 = MdRunner(system, params, RunnerConfig(
        use_pallas=True, pallas_interpret=True, super_nnbr=192))
    s1, logs1 = r1.run(state, 20)
    l1 = concat_logs(logs1)

    mesh = make_mesh(n_ens=1, n_spatial=8)
    r2 = MdRunner(system, params, RunnerConfig(
        use_pallas=True, pallas_interpret=True, super_nnbr=192,
        mesh=mesh, dd_block=4))
    assert r2.config.use_pallas, "DD must keep the v2u Pallas path"
    s2, logs2 = r2.run(state, 20)
    l2 = concat_logs(logs2)

    e1, e2 = np.asarray(l1.epot), np.asarray(l2.epot)
    assert np.isfinite(e2).all()
    np.testing.assert_allclose(e2, e1, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(s2.x), np.asarray(s1.x),
                               atol=2e-3)


def test_dd_fep_matches_single_device():
    """FEP under spatial DD (the flagship workload under the flagship
    parallelism): perturbed solvation box on the 8-device mesh, per-step
    energies AND dvdl must match the single-device runner to 1e-4
    (reference acceptance: freeenergy.cpp:100-102 runs FEP under
    multiple ranks)."""
    from gromacs_fep_gpu_tpu.core.types import FepParams, TcouplType
    from gromacs_fep_gpu_tpu.md.runner import MdRunner, RunnerConfig
    from gromacs_fep_gpu_tpu.md.runner import concat_logs
    from gromacs_fep_gpu_tpu.models.solvation import solvation_system
    from gromacs_fep_gpu_tpu.ops.pme import pme_grid_size

    assert len(jax.devices()) == 8
    system, state = solvation_system(n_side=8, spacing=0.31, seed=3,
                                     temperature=300.0)
    box_l = 8 * 0.31
    params = MdParams(
        dt=0.001, nstlist=10, coulomb=CoulombType.PME,
        rcoulomb=0.28, rvdw=0.28, rlist=0.3,
        pme_grid=pme_grid_size((box_l,) * 3, 0.12),
        tcoupl=TcouplType.V_RESCALE, ref_t=300.0, nsttcouple=10,
        nstcomm=0,
        fep=FepParams(enabled=True, sc_alpha=0.5, sc_coul=True,
                      sc_sigma=0.3))
    state = state.replace(lam=state.lam.at[2].set(0.5).at[3].set(0.5))

    r1 = MdRunner(system, params, RunnerConfig(nnbr=96))
    s1, logs1 = r1.run(state, 20)
    l1 = concat_logs(logs1)

    mesh = make_mesh(n_ens=1, n_spatial=8)
    r2 = MdRunner(system, params, RunnerConfig(nnbr=96, mesh=mesh,
                                               dd_block=4,
                                               dd_grid=(2, 2, 2)))
    s2, logs2 = r2.run(state, 20)
    l2 = concat_logs(logs2)

    assert np.isfinite(np.asarray(l2.epot)).all()
    np.testing.assert_allclose(np.asarray(l2.epot), np.asarray(l1.epot),
                               rtol=1e-4)
    d1 = np.asarray(l1.dvdl)[:, 2:4]     # coul, vdw channels
    d2 = np.asarray(l2.dvdl)[:, 2:4]
    # at matched positions (step 0) dvdl must match at the reference's
    # dhdl tolerance; later steps drift via fp32 reduction-order
    # trajectory divergence (chaotic, same physics — GROMACS DD vs
    # single-rank shows the same lsb-level force differences)
    np.testing.assert_allclose(d2[0], d1[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(d2[:3], d1[:3], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(d2, d1, rtol=1e-2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(s2.x), np.asarray(s1.x),
                               atol=2e-3)
