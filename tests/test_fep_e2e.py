"""End-to-end solvation-FEP: run lambda windows, collect dH/dl + Delta H,
write dhdl.xvg, estimate dG with BAR (the 20-step FEP acceptance style of
reference programs/mdrun/tests/freeenergy.cpp, plus gmx bar closure)."""
import os

import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.analysis.bar import bar_profile
from gromacs_fep_gpu_tpu.core.types import (CoulombType, FepParams, MdParams,
                                            TcouplType)
from gromacs_fep_gpu_tpu.io.xvgio import read_xvg, write_dhdl_xvg
from gromacs_fep_gpu_tpu.md.runner import MdRunner, RunnerConfig, concat_logs
from gromacs_fep_gpu_tpu.models.solvation import solvation_system
from gromacs_fep_gpu_tpu.parallel.ensemble import lambda_schedule


def run_window(system, state0, params, all_lambda, window, nsteps):
    lam = all_lambda[window]
    state = state0.replace(lam=lam, fep_state=jnp.asarray(window, jnp.int32))
    runner = MdRunner(system, params, RunnerConfig(use_dense=True),
                      all_lambda=all_lambda)
    final, logs = runner.run(state, nsteps)
    return concat_logs(logs)


def test_solvation_fep_windows_and_bar(tmp_path):
    L = 4
    all_lambda = lambda_schedule(L)
    params = MdParams(
        dt=0.002, coulomb=CoulombType.REACTION_FIELD,
        rcoulomb=0.58, rvdw=0.58, nstcomm=0,
        tcoupl=TcouplType.V_RESCALE, ref_t=300.0, nsttcouple=1, tau_t=0.2,
        fep=FepParams(enabled=True, sc_alpha=0.5, sc_coul=True, sc_sigma=0.3,
                      nstdhdl=2))
    system, state0 = solvation_system(n_side=3, spacing=0.4, seed=13,
                                      temperature=300.0)

    nsteps = 40
    dh_rows, idx_rows, dvdl_rows = [], [], []
    for w in range(L):
        log = run_window(system, state0, params, all_lambda, w, nsteps)
        dh = np.asarray(log.delta_h)
        keep = ~np.isnan(dh[:, 0])
        dh_rows.append(dh[keep])
        idx_rows.append(np.full(keep.sum(), w))
        dvdl_rows.append(np.asarray(log.dvdl))
        assert np.isfinite(np.asarray(log.epot)).all()
        # own-window Delta H must be ~0
        np.testing.assert_allclose(dh[keep][:, w], 0.0, atol=1e-3)

    delta_h = np.concatenate(dh_rows)
    lam_idx = np.concatenate(idx_rows)
    legs, total, err = bar_profile(delta_h, lam_idx, 300.0, skip_frac=0.2)
    assert np.isfinite(total), legs
    # decoupling a small ligand: |dG| should be modest but nonzero
    assert 0.001 < abs(total) < 500.0, total

    # dhdl.xvg round-trip
    path = os.path.join(tmp_path, "dhdl.xvg")
    times = np.arange(nsteps) * params.dt
    write_dhdl_xvg(path, times, dvdl_rows[0], None, np.asarray(all_lambda), 0)
    data, legends = read_xvg(path)
    assert data.shape[0] == nsteps
    assert any("dH/dcoul" in l for l in legends)
