"""Expanded-ensemble lambda-MC tests against analytic weights."""
import jax
import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.core.units import BOLTZ
from gromacs_fep_gpu_tpu.md.expanded import (DfHistory, LmcMove,
                                             expanded_step,
                                             free_energy_estimate)


def run_mc(u_levels, nsteps, move, temperature=300.0, seed=0):
    L = len(u_levels)
    u_all = jnp.asarray(u_levels)
    hist = DfHistory.init(L, wl_delta=2.0)
    state = jnp.asarray(0, jnp.int32)

    def body(carry, key):
        st, h = carry
        st, h = expanded_step(st, u_all, h, temperature, key, move)
        return (st, h), st

    keys = jax.random.split(jax.random.PRNGKey(seed), nsteps)
    (state, hist), visits = jax.lax.scan(body, (state, hist), keys)
    return hist, np.asarray(visits)


def test_wang_landau_converges_to_energy_gaps():
    # constant-energy states: free energy difference == energy difference
    kt = BOLTZ * 300.0
    u = [0.0, 1.5 * kt, 3.0 * kt, 1.0 * kt]
    hist, visits = run_mc(u, 6000, LmcMove.GIBBS)
    dg = np.asarray(free_energy_estimate(hist, 300.0))
    np.testing.assert_allclose(dg - dg[0], np.asarray(u) - u[0],
                               atol=0.8 * kt)
    # WL increment must have shrunk substantially
    assert float(hist.wl_delta) < 0.5
    # all states visited
    assert (np.asarray(hist.counts) > 0).all()


def test_metropolis_moves_sample_all_states():
    kt = BOLTZ * 300.0
    u = [0.0, 0.5 * kt, 1.0 * kt]
    hist, visits = run_mc(u, 4000, LmcMove.METROPOLIS)
    assert set(np.unique(visits)) == {0, 1, 2}
