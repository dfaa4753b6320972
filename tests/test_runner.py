"""End-to-end runner tests: cluster path + rebuilds + thermostat (the
minimum-slice-A acceptance: TIP3P box, RF, NVE/NVT)."""
import numpy as np
import pytest

from gromacs_fep_gpu_tpu.core.types import (CoulombType, MdParams,
                                            TcouplType)
from gromacs_fep_gpu_tpu.md.runner import MdRunner, RunnerConfig, concat_logs
from gromacs_fep_gpu_tpu.models.water import water_box, D_OH


def test_water_nve_cluster_path():
    params = MdParams(dt=0.001, nstlist=10, coulomb=CoulombType.REACTION_FIELD,
                      rcoulomb=0.55, rvdw=0.55, rlist=0.62, nstcomm=0)
    system, state = water_box(3, spacing=0.4, temperature=250.0, seed=11)
    runner = MdRunner(system, params)
    final, logs = runner.run(state, 60)
    log = concat_logs(logs)
    etot = log.epot + log.ekin
    drift = abs(etot[-10:].mean() - etot[:10].mean())
    assert drift / max(abs(etot.mean()), 1.0) < 2e-2, drift
    # constraints held through rebuilds
    xc = np.asarray(final.x)
    at = np.asarray(system.settle.atoms)
    d = np.linalg.norm(xc[at[:, 0]] - xc[at[:, 1]], axis=1)
    np.testing.assert_allclose(d, D_OH, rtol=1e-4)


def test_water_nvt_cluster_matches_dense():
    params = MdParams(dt=0.001, nstlist=5, coulomb=CoulombType.REACTION_FIELD,
                      rcoulomb=0.55, rvdw=0.55, rlist=0.62,
                      tcoupl=TcouplType.BERENDSEN, ref_t=300.0, nsttcouple=1,
                      nstcomm=0)
    system, state = water_box(2, spacing=0.42, temperature=300.0, seed=12)

    r_cluster = MdRunner(system, params)
    f_c, logs_c = r_cluster.run(state, 20)
    r_dense = MdRunner(system, params, RunnerConfig(use_dense=True))
    f_d, logs_d = r_dense.run(state, 20)

    lc, ld = concat_logs(logs_c), concat_logs(logs_d)
    # identical trajectories while the pair lists are exact
    np.testing.assert_allclose(lc.epot, ld.epot, rtol=5e-4, atol=5e-2)
    np.testing.assert_allclose(np.asarray(f_c.x), np.asarray(f_d.x),
                               atol=5e-4)
