"""Kinetic-theory Verlet buffer + runtime exclusion checks.

The buffer numbers are validated against GROMACS 2023.3 double-precision
grompp output for the identical water system (recorded values; reference:
mdlib/calc_verletbuf.cpp calcVerletBufferSize, printed by grompp as
"Calculated rlist for 1x1 atom pair-list").
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gromacs_fep_gpu_tpu.core.types import CoulombType, MdParams, TcouplType
from gromacs_fep_gpu_tpu.md.runner import MdRunner, RunnerConfig, concat_logs
from gromacs_fep_gpu_tpu.md.verletbuf import calc_verlet_buffer, effective_rlist
from gromacs_fep_gpu_tpu.models.water import water_box


def _water_setup():
    system, state = water_box(6, spacing=0.31, seed=0)
    vol = float(np.prod(np.diag(np.asarray(state.box))))
    return system, state, vol


# (nstlist, gmx 1x1 buffer nm) from gmx_d grompp on this exact system
GMX_BUFFERS = [(10, 0.036), (20, 0.102), (40, 0.211)]


@pytest.mark.parametrize("nstlist,gmx_buf", GMX_BUFFERS)
def test_buffer_matches_gromacs_1x1(nstlist, gmx_buf):
    system, state, vol = _water_setup()
    params = MdParams(dt=0.002, nstlist=nstlist, coulomb=CoulombType.PME,
                      rcoulomb=0.9, rvdw=0.9, ref_t=300.0)
    buf = calc_verlet_buffer(system, params, vol, cluster_i=1, cluster_j=1)
    # ours is slightly conservative (simple mean density vs the
    # reference's cell-weighted effective density)
    assert gmx_buf - 0.002 <= buf <= gmx_buf + 0.02


def test_buffer_cluster_reduction_and_effective_rlist():
    system, state, vol = _water_setup()
    params = MdParams(dt=0.002, nstlist=20, coulomb=CoulombType.PME,
                      rcoulomb=0.9, rvdw=0.9, ref_t=300.0)
    b11 = calc_verlet_buffer(system, params, vol, cluster_i=1, cluster_j=1)
    b44 = calc_verlet_buffer(system, params, vol, cluster_i=4, cluster_j=4)
    assert b44 < b11      # cluster pair lists miss fewer pairs
    rl = effective_rlist(params.replace(rlist=0.9), system=system,
                         volume=vol)
    assert 0.9 < rl <= 0.9 + b44 + 1e-9
    # explicit rlist larger than cutoff wins
    assert effective_rlist(params.replace(rlist=1.1)) == 1.1


def test_exclusion_check_fails_hard_on_broken_geometry():
    """An excluded pair driven beyond rlist must abort the run, not
    silently drop its RF exclusion correction."""
    system, state = water_box(3, spacing=0.4, seed=1)
    params = MdParams(dt=0.002, nstlist=5, rcoulomb=0.55, rvdw=0.55,
                      rlist=0.6, coulomb=CoulombType.REACTION_FIELD,
                      nstcomm=0)
    # stretch one water: move H1 diagonally so the min-image O-H distance
    # (0.64 nm) exceeds rlist without wrapping in any single component
    x = np.asarray(state.x).copy()
    x[1] = x[0] + np.array([0.45, 0.45, 0.0])
    state = state.replace(x=jnp.asarray(x))
    runner = MdRunner(system, params, RunnerConfig(nnbr=96))
    with pytest.raises(RuntimeError, match="excluded atom pair"):
        runner.run(state, 5)


def test_nve_energy_drift_within_buffer_tolerance():
    """NVE with the kinetic-theory buffer: total-energy drift per atom per
    ps must stay near the 0.005 kJ/mol/ps tolerance the buffer was sized
    for (fp32 + settle add noise; bound is 20x the target)."""
    system, state = water_box(4, spacing=0.31, seed=3, temperature=300.0)
    params = MdParams(dt=0.001, nstlist=10, rcoulomb=0.8, rvdw=0.8,
                      coulomb=CoulombType.REACTION_FIELD,
                      tcoupl=TcouplType.NO, nstcomm=0)
    # equilibrate the lattice start with a tight thermostat first so the
    # NVE window measures integrator+buffer drift, not relaxation
    eq_params = params.replace(dt=0.0005, tcoupl=TcouplType.V_RESCALE,
                               tau_t=0.1, nsttcouple=1, ref_t=300.0)
    eq = MdRunner(system, eq_params, RunnerConfig(nnbr=160))
    state, _ = eq.run(state, 600)

    runner = MdRunner(system, params, RunnerConfig(nnbr=eq.config.nnbr))
    state, logs = runner.run(state, 400)
    log = concat_logs(logs)
    etot = np.asarray(log.epot) + np.asarray(log.ekin)
    t = np.arange(len(etot)) * params.dt
    slope = np.polyfit(t[50:], etot[50:], 1)[0]   # kJ/mol per ps
    drift_per_atom = abs(slope) / system.n_atoms
    assert drift_per_atom < 0.1, drift_per_atom
