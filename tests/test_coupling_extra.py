"""NH chains (md-vv) and Andersen-massive thermostat tests
(reference: coupling.cpp NHC_trotter / andersen_tcoupl)."""
import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.core.types import (CoulombType, IntegratorType,
                                            MdParams, TcouplType)
from gromacs_fep_gpu_tpu.core.units import BOLTZ
from gromacs_fep_gpu_tpu.md.runner import MdRunner, RunnerConfig, concat_logs
from gromacs_fep_gpu_tpu.models.water import water_box


def _run(tcoupl, integrator, nsteps=400, nhlen=10, seed=11):
    params = MdParams(dt=0.001, coulomb=CoulombType.REACTION_FIELD,
                      rcoulomb=0.55, rvdw=0.55, rlist=0.62, nstcomm=0,
                      integrator=integrator, tcoupl=tcoupl, ref_t=300.0,
                      nsttcouple=1, tau_t=0.1, nhchainlength=nhlen,
                      nstlist=10)
    system, state = water_box(3, spacing=0.31, seed=seed,
                              temperature=360.0)   # hot start
    runner = MdRunner(system, params, RunnerConfig(use_dense=True))
    final, logs = runner.run(state, nsteps)
    return final, concat_logs(logs)


def test_nhc_vv_thermostats_to_reference_temperature():
    final, log = _run(TcouplType.NOSE_HOOVER, IntegratorType.MD_VV)
    t = np.asarray(log.temp)
    assert np.isfinite(t).all()
    assert abs(t[-150:].mean() - 300.0) < 40.0
    # the chain state actually evolved
    assert final.coupling.xi.shape == (10,)
    assert np.abs(np.asarray(final.coupling.vxi)).max() > 0.0


def test_andersen_massive_thermostats():
    final, log = _run(TcouplType.ANDERSEN_MASSIVE, IntegratorType.MD,
                      nsteps=300)
    t = np.asarray(log.temp)
    assert np.isfinite(t).all()
    assert abs(t[-100:].mean() - 300.0) < 45.0


def test_single_link_nh_leapfrog_unchanged():
    final, log = _run(TcouplType.NOSE_HOOVER, IntegratorType.MD,
                      nsteps=300)
    t = np.asarray(log.temp)
    assert np.isfinite(t).all()
    assert final.coupling.xi.shape == (1,)
    assert abs(t[-100:].mean() - 300.0) < 60.0   # NH oscillates
