"""Integrator/constraint tests (mirrors reference mdlib/tests/leapfrog.cpp,
settle.cpp, and the NVE-drift acceptance style of the regression suite)."""
import jax
import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.core.types import (CoulombType, IntegratorType,
                                            MdParams, TcouplType, VdwModifier)
from gromacs_fep_gpu_tpu.md import constraints as constr_mod
from gromacs_fep_gpu_tpu.md.simulator import make_step_fn, run
from gromacs_fep_gpu_tpu.models.argon import argon_box
from gromacs_fep_gpu_tpu.models.water import water_box, D_OH, D_HH
from gromacs_fep_gpu_tpu.ops.forces import make_dense_force_fn


def test_argon_nve_energy_conservation():
    params = MdParams(dt=0.002, coulomb=CoulombType.CUTOFF,
                      rcoulomb=0.8, rvdw=0.8, nstcomm=0,
                      vdw_modifier=VdwModifier.POTENTIAL_SHIFT)
    system, state = argon_box(3, spacing=0.42, temperature=120.0, seed=3)
    force_fn = make_dense_force_fn(system, params)
    step_fn = make_step_fn(system, params, force_fn)
    final, log = run(state, step_fn, 200)
    etot = np.asarray(log.epot) + np.asarray(log.ekin)
    drift = abs(etot[-20:].mean() - etot[:20].mean())
    scale = max(abs(np.asarray(log.ekin)).max(), 1.0)
    assert drift / scale < 5e-3, (drift, scale)


def test_settle_preserves_geometry():
    system, state = water_box(2, spacing=0.4, temperature=300.0, seed=1)
    invm = 1.0 / np.asarray(system.mass_a)
    # random displacement then constrain
    key = jax.random.PRNGKey(0)
    x1 = state.x + 0.005 * jax.random.normal(key, state.x.shape)
    xc = constr_mod.settle_positions(state.x, x1, state.box, system.settle,
                                     jnp.asarray(invm))
    xc = np.asarray(xc)
    at = np.asarray(system.settle.atoms)
    d_oh1 = np.linalg.norm(xc[at[:, 0]] - xc[at[:, 1]], axis=1)
    d_oh2 = np.linalg.norm(xc[at[:, 0]] - xc[at[:, 2]], axis=1)
    d_hh = np.linalg.norm(xc[at[:, 1]] - xc[at[:, 2]], axis=1)
    np.testing.assert_allclose(d_oh1, D_OH, rtol=1e-5)
    np.testing.assert_allclose(d_oh2, D_OH, rtol=1e-5)
    np.testing.assert_allclose(d_hh, D_HH, rtol=1e-5)


def test_water_nve_with_settle():
    params = MdParams(dt=0.001, coulomb=CoulombType.REACTION_FIELD,
                      rcoulomb=0.55, rvdw=0.55, nstcomm=0)
    system, state = water_box(3, spacing=0.4, temperature=250.0, seed=2)
    force_fn = make_dense_force_fn(system, params)
    step_fn = make_step_fn(system, params, force_fn)
    final, log = run(state, step_fn, 100)
    # geometry maintained through the run
    xc = np.asarray(final.x)
    at = np.asarray(system.settle.atoms)
    d_oh1 = np.linalg.norm(xc[at[:, 0]] - xc[at[:, 1]], axis=1)
    np.testing.assert_allclose(d_oh1, D_OH, rtol=1e-4)
    etot = np.asarray(log.epot) + np.asarray(log.ekin)
    drift = abs(etot[-10:].mean() - etot[:10].mean())
    assert drift / max(abs(etot.mean()), 1.0) < 2e-2, drift


def test_vrescale_thermostat_reaches_target():
    params = MdParams(dt=0.002, coulomb=CoulombType.CUTOFF, rcoulomb=0.8,
                      rvdw=0.8, tcoupl=TcouplType.V_RESCALE, ref_t=120.0,
                      tau_t=0.2, nsttcouple=1, nstcomm=10)
    system, state = argon_box(4, spacing=0.42, temperature=60.0, seed=5)
    force_fn = make_dense_force_fn(system, params)
    step_fn = make_step_fn(system, params, force_fn)
    final, log = run(state, step_fn, 400)
    t_late = np.asarray(log.temp)[-100:].mean()
    assert abs(t_late - 120.0) < 25.0, t_late


def test_langevin_sd_thermalizes():
    params = MdParams(dt=0.002, coulomb=CoulombType.CUTOFF, rcoulomb=0.8,
                      rvdw=0.8, integrator=IntegratorType.SD, ref_t=120.0,
                      tau_t=0.5, nstcomm=0)
    system, state = argon_box(4, spacing=0.42, seed=6)  # starts at 0 K
    force_fn = make_dense_force_fn(system, params)
    step_fn = make_step_fn(system, params, force_fn)
    final, log = run(state, step_fn, 500)
    t_late = np.asarray(log.temp)[-150:].mean()
    assert abs(t_late - 120.0) < 30.0, t_late
