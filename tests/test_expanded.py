"""Expanded-ensemble lambda-MC tests: GROMACS RNG bit-compatibility and
Wang-Landau convergence to analytic weights."""
import jax
import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.core.units import BOLTZ
from gromacs_fep_gpu_tpu.md.expanded import (DfHist, expanded_step_gmx,
                                             free_energy_estimate)
from gromacs_fep_gpu_tpu.utils.gmx_rng import (DOMAIN_EXPANDED_ENSEMBLE,
                                               gmx_uniform_pair)


def test_threefry_matches_reference_stream():
    # Reference values from gmx::ThreeFry2x64<0>(1993,
    # RandomDomain::ExpandedEnsemble).restart(step, 0) +
    # UniformRealDistribution<double>, compiled from the reference headers.
    expect = {
        5: (0.28176084339421759, 0.36727622122405684),
        10: (0.380446127969924, 0.80260441114844694),
        15: (0.80379595119802583, 0.55195562538935361),
    }
    for step, (r1e, r2e) in expect.items():
        r1, r2 = gmx_uniform_pair(1993, DOMAIN_EXPANDED_ENSEMBLE, step)
        # fp32 default mode: bits beyond the mantissa are lost
        assert abs(float(r1) - r1e) < 1e-6
        assert abs(float(r2) - r2e) < 1e-6


def run_mc(u_levels, nsteps, move, temperature=300.0, wl_delta=2.0):
    L = len(u_levels)
    u_all = jnp.asarray(u_levels)
    hist = DfHist.init(L, wl_delta)
    state = jnp.asarray(0, jnp.int32)
    visits = []
    step_jit = jax.jit(
        lambda st, h, step: expanded_step_gmx(
            st, h, u_all - u_all[st], jnp.zeros(()), step,
            lmc_seed=17, lmc_move=move, lmc_stats="wang-landau",
            wl_scale=0.8, wl_ratio=0.8, weight_equil_wl_delta=-1.0,
            mc_temp=temperature))
    for t in range(nsteps):
        state, hist = step_jit(state, hist, jnp.asarray(t))
        visits.append(int(state))
    return hist, np.asarray(visits)


def test_wang_landau_converges_to_energy_gaps():
    # constant-energy states: free-energy difference == energy difference
    kt = BOLTZ * 300.0
    u = [0.0, 1.5 * kt, 3.0 * kt, 1.0 * kt]
    hist, visits = run_mc(u, 3000, "metropolized-gibbs")
    dg = np.asarray(free_energy_estimate(hist, 300.0))
    np.testing.assert_allclose(dg - dg[0], np.asarray(u) - u[0],
                               atol=0.8 * kt)
    # WL increment must have shrunk substantially
    assert float(hist.wl_delta) < 0.5
    # all states visited
    assert (np.asarray(hist.n_at_lam) > 0).all()


def test_gibbs_moves_sample_all_states():
    kt = BOLTZ * 300.0
    u = [0.0, 0.5 * kt, 1.0 * kt]
    hist, visits = run_mc(u, 600, "gibbs")
    assert set(np.unique(visits)) == {0, 1, 2}
