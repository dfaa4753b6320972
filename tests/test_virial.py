"""In-force virial tests: the decomposed diagonal virial (NB-kernel pair
sums + cheap-term strain gradient) must equal the strain-gradient oracle
of the total potential (reference: sim_util.cpp calc_virial vs the
numerically equivalent full dU/d-strain)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gromacs_fep_gpu_tpu.core.types import (CoulombType, FepCoupling,
                                            MdParams, PcouplType,
                                            TcouplType)
from gromacs_fep_gpu_tpu.md.runner import MdRunner, RunnerConfig, concat_logs
from gromacs_fep_gpu_tpu.models.water import water_box
from gromacs_fep_gpu_tpu.ops.cluster_nb import make_cluster_force_fn
from gromacs_fep_gpu_tpu.ops.pairlist import build_cluster_pairlist


def _setup(coulomb):
    params = MdParams(rcoulomb=0.55, rvdw=0.55, rlist=0.7, coulomb=coulomb,
                      pme_grid=(16, 16, 16))
    system, state = water_box(8, spacing=0.31, seed=11, temperature=300.0)
    nlist = build_cluster_pairlist(state.x, state.box, system, params.rlist,
                                   nnbr=96)
    return params, system, state, nlist


@pytest.mark.parametrize("coulomb", [CoulombType.REACTION_FIELD,
                                     CoulombType.PME])
def test_inforce_virial_matches_strain_gradient(coulomb):
    params, system, state, nlist = _setup(coulomb)
    recip_fn = None
    if coulomb == CoulombType.PME:
        from gromacs_fep_gpu_tpu.ops.pme import make_pme_recip_fn
        recip_fn = make_pme_recip_fn(system, params)
    force_fn = make_cluster_force_fn(system, params, recip_fn,
                                     has_fep=False, block=16)
    lam = jnp.zeros((int(FepCoupling.COUNT),), jnp.float32)
    _, terms = force_fn(state.x, state.box, lam, nlist, need_virial=True)

    def epot(eps):
        s = (1.0 + eps)[None, :]
        _, t = force_fn(state.x * s, state.box * s, lam, nlist)
        return t.epot

    vir_oracle = 0.5 * jax.grad(epot)(jnp.zeros(3, jnp.float32))
    scale = float(jnp.abs(vir_oracle).max())
    np.testing.assert_allclose(np.asarray(terms.vir_diag),
                               np.asarray(vir_oracle),
                               atol=2e-4 * max(scale, 1.0))


def test_v2u_pallas_virial_matches_xla(monkeypatch):
    """The v2u kernel's in-register virial accumulators (interpret mode)
    must match the XLA kernel's."""
    from gromacs_fep_gpu_tpu.ops.pallas_nb import (pallas_cluster_forces_v2u,
                                                   pallas_prepare_v2u)
    params = MdParams(rcoulomb=0.55, rvdw=0.55, rlist=0.7,
                      coulomb=CoulombType.REACTION_FIELD)
    system, state = water_box(8, spacing=0.31, seed=11, temperature=300.0)
    nlist = build_cluster_pairlist(state.x, state.box, system, params.rlist,
                                   nnbr=96, super_nnbr=256, super_block=4)
    prep = pallas_prepare_v2u(nlist, system.nbfp)
    f_p, ec_p, el_p, vir_p = pallas_cluster_forces_v2u(
        state.x, state.box, nlist, system.nbfp, params, None, prep=prep,
        interpret=True, compute_virial=True)
    from gromacs_fep_gpu_tpu.ops.cluster_nb import cluster_nb_kernel
    f_r, ec_r, el_r, vir_r = cluster_nb_kernel(
        state.x, state.box, nlist, system.nbfp, params, None, block=16,
        lj_mode="geometric", compute_virial=True)
    scale = float(jnp.abs(vir_r).max())
    np.testing.assert_allclose(np.asarray(vir_p), np.asarray(vir_r),
                               atol=1e-4 * max(scale, 1.0))
    np.testing.assert_allclose(float(ec_p), float(ec_r), rtol=1e-5)


def test_npt_cluster_path_uses_inforce_virial():
    """NPT through the production (cluster, non-dense) path: the
    decomposed virial drives the barostat; box responds and stays sane."""
    params = MdParams(dt=0.002, coulomb=CoulombType.REACTION_FIELD,
                      rcoulomb=0.58, rvdw=0.58, rlist=0.66, nstcomm=0,
                      tcoupl=TcouplType.V_RESCALE, ref_t=300.0, nsttcouple=1,
                      tau_t=0.2, pcoupl=PcouplType.BERENDSEN, ref_p=1.0,
                      tau_p=1.0, nstpcouple=2, dispcorr=True,
                      nstcalcenergy=1)
    system, state = water_box(3, spacing=0.34, temperature=300.0, seed=41)
    runner = MdRunner(system, params, RunnerConfig(use_dense=False, nnbr=96))
    v0 = float(jnp.linalg.det(state.box))
    final, logs = runner.run(state, 60)
    log = concat_logs(logs)
    v1 = float(jnp.linalg.det(final.box))
    assert np.isfinite(np.asarray(log.epot)).all()
    pres = np.asarray(log.pres)
    # pressure logged at pcouple steps, NaN between (epot convention)
    assert np.isfinite(pres[::2]).all()
    assert v1 < v0, (v0, v1)

    # decomposed-virial NPT must track the dense strain-grad-oracle NPT
    runner_o = MdRunner(system, params, RunnerConfig(use_dense=True))
    final_o, _ = runner_o.run(state, 60)
    v1_o = float(jnp.linalg.det(final_o.box))
    assert abs(v1 - v1_o) < 0.02 * v0, (v1, v1_o)
