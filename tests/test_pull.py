"""COM pulling tests: umbrella force against analytic expectation."""
import jax
import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.md.pull import (PullCoord, PullType,
                                         make_pull_force_fn, pull_distance)


def test_umbrella_pull_force_analytic():
    mass = np.array([12.0, 12.0, 1.0])
    x = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [5.0, 5.0, 5.0]])
    box = jnp.eye(3) * 10.0
    coord = PullCoord(group0=(0,), group1=(1,), init=0.8, k=100.0)
    pull_fn = make_pull_force_fn([coord], mass)
    f, e, d, fs = pull_fn(x, box, 0.0)
    np.testing.assert_allclose(float(d[0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(e), 0.5 * 100 * 0.2**2, rtol=1e-5)
    # force pulls group1 toward group0 with magnitude k*(r-r0)
    np.testing.assert_allclose(float(f[1, 0]), -100 * 0.2, rtol=1e-4)
    np.testing.assert_allclose(float(f[0, 0]), 100 * 0.2, rtol=1e-4)
    np.testing.assert_allclose(float(fs[0]), -100 * 0.2, rtol=1e-4)
    assert abs(float(f[2].sum())) < 1e-6


def test_steered_reference_moves():
    mass = np.array([1.0, 1.0])
    x = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    box = jnp.eye(3) * 10.0
    coord = PullCoord(group0=(0,), group1=(1,), init=1.0, rate=0.1, k=50.0)
    pull_fn = make_pull_force_fn([coord], mass)
    f0, e0, _, _ = pull_fn(x, box, 0.0)
    f1, e1, _, _ = pull_fn(x, box, 2.0)   # ref now 1.2 -> pulled outward
    assert float(e0) < 1e-6
    assert float(f1[1, 0]) > 0


def test_pull_wired_into_step():
    """End-to-end wiring: an umbrella on the O-O distance of two waters
    relaxes the distance toward the restraint minimum during MD
    (computeSpecialForces slot, reference: sim_util.cpp:624)."""
    from gromacs_fep_gpu_tpu.core.types import CoulombType, MdParams
    from gromacs_fep_gpu_tpu.md.runner import MdRunner, RunnerConfig
    from gromacs_fep_gpu_tpu.models.water import water_box
    system, state = water_box(2, spacing=0.8, seed=4, temperature=None)
    coord = PullCoord(group0=(0,), group1=(3,), init=0.5, k=5000.0)
    params = MdParams(dt=0.001, nstlist=10, rcoulomb=0.7, rvdw=0.7,
                      rlist=0.75, coulomb=CoulombType.REACTION_FIELD,
                      pull=(coord,), nstcomm=0)
    runner = MdRunner(system, params, RunnerConfig(use_dense=True))
    mass = np.asarray(system.mass_a)
    d0 = float(pull_distance(state.x, state.box, jnp.asarray(mass), coord))
    state2, logs = runner.run(state, 200)
    from gromacs_fep_gpu_tpu.md.runner import concat_logs
    log = concat_logs(logs)
    d_end = float(np.asarray(log.pull_x)[-1, 0])
    assert abs(d_end - 0.5) < abs(d0 - 0.5)
    assert np.isfinite(np.asarray(log.pull_f)).all()
