"""Virtual-site tests: construction geometry, force spreading (Newton's
third law + zero vsite force), and TIP4P NVT stability."""
import jax
import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.core.types import (CoulombType, MdParams,
                                            TcouplType)
from gromacs_fep_gpu_tpu.md.runner import MdRunner, RunnerConfig, concat_logs
from gromacs_fep_gpu_tpu.md.vsites import construct_vsites, spread_vsite_forces
from gromacs_fep_gpu_tpu.models.tip4p import D_OM, tip4p_box


def test_construct_places_m_site():
    system, state = tip4p_box(2, spacing=0.5)
    x = construct_vsites(state.x, system.vsites)
    at = np.asarray(system.vsites.atoms)
    xm = np.asarray(x)[at[:, 0]]
    xo = np.asarray(x)[at[:, 1]]
    xh1 = np.asarray(x)[at[:, 2]]
    xh2 = np.asarray(x)[at[:, 3]]
    d_om = np.linalg.norm(xm - xo, axis=1)
    np.testing.assert_allclose(d_om, D_OM, rtol=1e-4)
    # M on the bisector: distance to both H equal
    np.testing.assert_allclose(np.linalg.norm(xm - xh1, axis=1),
                               np.linalg.norm(xm - xh2, axis=1), rtol=1e-4)


def test_force_spreading_conserves_total():
    system, state = tip4p_box(2, spacing=0.5, seed=3)
    x = construct_vsites(state.x, system.vsites)
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.randn(*x.shape).astype(np.float32))
    fs = spread_vsite_forces(x, f, system.vsites)
    at = np.asarray(system.vsites.atoms)
    # vsite rows zeroed, total force conserved
    assert np.abs(np.asarray(fs)[at[:, 0]]).max() < 1e-6
    np.testing.assert_allclose(np.asarray(fs).sum(0), np.asarray(f).sum(0),
                               atol=1e-3)


def test_tip4p_nvt_runs_stable():
    params = MdParams(dt=0.001, nstlist=10, coulomb=CoulombType.REACTION_FIELD,
                      rcoulomb=0.55, rvdw=0.55, rlist=0.62, nstcomm=0,
                      tcoupl=TcouplType.V_RESCALE, ref_t=300.0, nsttcouple=1,
                      tau_t=0.2)
    system, state = tip4p_box(3, spacing=0.4, temperature=250.0, seed=4)
    runner = MdRunner(system, params)
    final, logs = runner.run(state, 40)
    log = concat_logs(logs)
    assert np.isfinite(np.asarray(log.epot)).all()
    # M sites still exactly on geometry after the run
    xc = np.asarray(final.x)
    at = np.asarray(system.vsites.atoms)
    d_om = np.linalg.norm(xc[at[:, 0]] - xc[at[:, 1]], axis=1)
    np.testing.assert_allclose(d_om, D_OM, rtol=1e-3)
    # no explosion (lattice start releases PE, so T runs warm but bounded)
    assert 100 < np.asarray(log.temp)[-10:].mean() < 1200
