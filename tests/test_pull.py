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
    f, e, d = pull_fn(x, box, 0.0)
    np.testing.assert_allclose(float(d[0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(e), 0.5 * 100 * 0.2**2, rtol=1e-5)
    # force pulls group1 toward group0 with magnitude k*(r-r0)
    np.testing.assert_allclose(float(f[1, 0]), -100 * 0.2, rtol=1e-4)
    np.testing.assert_allclose(float(f[0, 0]), 100 * 0.2, rtol=1e-4)
    assert abs(float(f[2].sum())) < 1e-6


def test_steered_reference_moves():
    mass = np.array([1.0, 1.0])
    x = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    box = jnp.eye(3) * 10.0
    coord = PullCoord(group0=(0,), group1=(1,), init=1.0, rate=0.1, k=50.0)
    pull_fn = make_pull_force_fn([coord], mass)
    f0, e0, _ = pull_fn(x, box, 0.0)
    f1, e1, _ = pull_fn(x, box, 2.0)   # ref now 1.2 -> pulled outward
    assert float(e0) < 1e-6
    assert float(f1[1, 0]) > 0
