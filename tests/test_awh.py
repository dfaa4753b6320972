"""AWH-FEP tests (reference: applied_forces/awh; Lindahl, Lidmar &
Hess 2014).  The discrete-lambda AWH must converge its bias to the true
free-energy profile and leave the initial stage after covering."""
import jax
import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.core.units import BOLTZ
from gromacs_fep_gpu_tpu.md.awh import (AwhParams, AwhState, awh_fep_step,
                                        awh_free_energy, awh_pmf)

T = 300.0
KT = BOLTZ * T


def run_awh(u_levels, nsteps, params=None):
    """Constant-energy toy: U(m) - U(cur) is state-independent of x, so
    DeltaG_m == u_levels[m] exactly and AWH must recover it."""
    params = params or AwhParams(nstsample=1, n_samples_update=5,
                                 error_init=5.0)
    u = jnp.asarray(u_levels)
    L = len(u_levels)
    awh = AwhState.init(L, params.error_init / KT)
    state = jnp.asarray(0, jnp.int32)
    step_jit = jax.jit(lambda s, a, t: awh_fep_step(
        s, a, u - u[s], t, params, T))
    visits = []
    for t in range(nsteps):
        state, awh = step_jit(state, awh, jnp.asarray(t))
        visits.append(int(state))
    return awh, np.asarray(visits)


def test_awh_converges_to_energy_gaps():
    u = [0.0, 1.5 * KT, 3.0 * KT, 1.0 * KT]
    awh, visits = run_awh(u, 4000)
    dg = np.asarray(awh_free_energy(awh, T))
    np.testing.assert_allclose(dg - dg[0], np.asarray(u) - u[0],
                               atol=0.6 * KT)
    # PMF estimate agrees with the bias estimate at convergence
    pmf = np.asarray(awh_pmf(awh, T))
    np.testing.assert_allclose(pmf - pmf[0], np.asarray(u) - u[0],
                               atol=0.8 * KT)
    # all states visited; sampling roughly uniform at convergence
    counts = np.bincount(visits[-2000:], minlength=4)
    assert (counts > 100).all()


def test_awh_leaves_initial_stage():
    u = [0.0, 0.5 * KT, 1.0 * KT]
    awh, _ = run_awh(u, 3000)
    assert not bool(awh.initial_stage)
    # histogram grew beyond its initial size
    assert float(awh.hist_size) > 1.0 / (5.0 / KT) ** 2 + 1


def test_awh_histogram_growth_monotone():
    u = [0.0, 2.0 * KT]
    params = AwhParams(nstsample=1, n_samples_update=4, error_init=8.0)
    awh = AwhState.init(2, params.error_init / KT)
    sizes = [float(awh.hist_size)]
    state = jnp.asarray(0, jnp.int32)
    uj = jnp.asarray(u)
    for t in range(400):
        state, awh = awh_fep_step(state, awh, uj - uj[state],
                                  jnp.asarray(t), params, T)
        sizes.append(float(awh.hist_size))
    assert all(b >= a for a, b in zip(sizes, sizes[1:]))


def test_awh_cli_end_to_end(tmp_path):
    """grompp + mdrun with awh mdp keys produce an awh.xvg profile."""
    import os
    from gromacs_fep_gpu_tpu.cli import main as cli_main
    from tests.test_cli import MDP, TOP, make_water_gro
    os.chdir(tmp_path)
    make_water_gro("conf.gro")
    with open("topol.top", "w") as f:
        f.write(TOP)
    with open("md.mdp", "w") as f:
        f.write(MDP.replace("nsteps = 30", "nsteps = 60") + """
awh = yes
awh-nstsample = 5
awh-nsamples-update = 3
awh1-dim1-coord-provider = fep-lambda
awh1-error-init = 20
""")
    cli_main(["grompp", "-f", "md.mdp", "-p", "topol.top", "-c", "conf.gro",
              "-o", "topol.tpz"])
    cli_main(["mdrun", "-s", "topol.tpz", "-deffnm", "aw", "-fep", "cpu"])
    assert os.path.exists("aw.awh.xvg")
    rows = [l.split() for l in open("aw.awh.xvg") if not l.startswith("@")]
    assert len(rows) == 3          # 3 lambda windows
    vals = np.asarray([[float(v) for v in r] for r in rows])
    assert np.isfinite(vals).all()


def test_awh_mdrun_end_to_end():
    """AWH on a real FEP system through MdRunner: lambda must move and
    the bias must become nontrivial."""
    from gromacs_fep_gpu_tpu.core.types import (CoulombType, FepParams,
                                                MdParams)
    from gromacs_fep_gpu_tpu.md.runner import MdRunner, RunnerConfig
    from gromacs_fep_gpu_tpu.models.solvation import solvation_system
    from gromacs_fep_gpu_tpu.parallel.ensemble import lambda_schedule

    system, state = solvation_system(n_side=4, spacing=0.31, seed=0,
                                     temperature=300.0)
    all_lambda = lambda_schedule(5)
    params = MdParams(
        dt=0.001, nstlist=10, coulomb=CoulombType.REACTION_FIELD,
        rcoulomb=0.55, rvdw=0.55, rlist=0.6,
        fep=FepParams(enabled=True, sc_alpha=0.5, sc_coul=True,
                      init_lambda_state=0),
        awh=AwhParams(nstsample=5, n_samples_update=4, error_init=20.0),
    )
    runner = MdRunner(system, params, RunnerConfig(use_dense=True),
                      all_lambda=all_lambda)
    state = state.replace(lam=all_lambda[0],
                          fep_state=jnp.asarray(0, jnp.int32))
    state, logs = runner.run(state, 200)
    assert state.dfhist is not None
    f = np.asarray(state.dfhist.f)
    assert f.shape == (5,)
    assert np.isfinite(f).all()
    assert float(state.dfhist.n_total) > 0
    # the bias moved off zero (free-energy differences are real here)
    assert np.abs(f - f[0]).max() > 1e-3


def test_awh_pull_linear_potential_estimator():
    """Continuous-coordinate AWH on an analytic landscape: sample xi
    from the EXACT umbrella-biased Boltzmann distribution of a linear
    potential U(xi) = a*xi (a Gaussian, so no MD needed) and check the
    bias converges to the analytic free-energy profile
    dG_m = a*(xi_m - xi_0) (reference: bias.cpp moveUmbrella +
    pointstate.h updateFreeEnergy, coord-provider = pull)."""
    from gromacs_fep_gpu_tpu.md.awh import awh_pull_step

    a = 6.0          # kJ/mol/nm
    k = 2000.0       # umbrella, kJ/mol/nm^2
    n_pts = 6
    centers = jnp.linspace(0.2, 0.7, n_pts)
    params = AwhParams(nstsample=1, n_samples_update=5, error_init=5.0,
                       coord_provider="pull", force_constant=k,
                       coord_min=0.2, coord_max=0.7, n_points=n_pts)
    awh = AwhState.init(n_pts, params.error_init / KT)
    m = jnp.asarray(0, jnp.int32)
    rng = np.random.RandomState(7)
    sigma = np.sqrt(KT / k)
    step_jit = jax.jit(lambda aw, xi, t: awh_pull_step(
        aw, xi, centers, k, t, params, T))
    for t in range(4000):
        # xi | umbrella m  ~  N(xi_m - a/k, kT/k) for U = a*xi
        mu = float(centers[int(m)]) - a / k
        xi = jnp.asarray(rng.normal(mu, sigma), jnp.float32)
        m_new, awh = step_jit(awh, xi, jnp.asarray(t))
        m = m_new
    dg = np.asarray(awh_free_energy(awh, T))
    expect = a * (np.asarray(centers) - float(centers[0]))
    assert np.isfinite(dg).all()
    np.testing.assert_allclose(dg, expect, atol=0.8)   # ~0.3 kT


def test_awh_pull_mdrun_end_to_end(tmp_path):
    """AWH biasing a pull distance through grompp+mdrun: the umbrella
    center must move across the grid and the PMF must be finite."""
    import os
    from gromacs_fep_gpu_tpu.cli import main as cli_main
    from gromacs_fep_gpu_tpu.io.xvgio import read_xvg
    from tests.test_cli import MDP, TOP, make_water_gro
    os.chdir(tmp_path)
    make_water_gro("conf.gro")
    with open("topol.top", "w") as f:
        f.write(TOP)
    mdp = MDP.replace("nsteps = 30", "nsteps = 120") + """
pull = yes
pull-ngroups = 2
pull-ncoords = 1
pull-group1-atoms = 1
pull-group2-atoms = 4
pull-coord1-groups = 1 2
pull-coord1-type = umbrella
pull-coord1-k = 2000
pull-coord1-init = 0.4
awh = yes
awh-nstsample = 2
awh-nsamples-update = 3
awh1-dim1-coord-provider = pull
awh1-dim1-coord-index = 1
awh1-dim1-start = 0.25
awh1-dim1-end = 0.55
awh1-dim1-grid-points = 7
awh1-dim1-force-constant = 2000
awh1-error-init = 20
"""
    with open("md.mdp", "w") as f:
        f.write(mdp)
    cli_main(["grompp", "-f", "md.mdp", "-p", "topol.top", "-c", "conf.gro",
              "-o", "topol.tpz"])
    cli_main(["mdrun", "-s", "topol.tpz", "-deffnm", "awp", "-fep", "cpu"])
    assert os.path.exists("awp.awh.xvg")
    data, _ = read_xvg("awp.awh.xvg")
    assert data.shape == (7, 3)
    assert np.isfinite(data).all()
    # x axis is the coordinate grid in nm, not lambda indices
    np.testing.assert_allclose(data[0, 0], 0.25, atol=1e-4)
    np.testing.assert_allclose(data[-1, 0], 0.55, atol=1e-4)
    # restart from checkpoint preserves the AWH state
    cli_main(["mdrun", "-s", "topol.tpz", "-deffnm", "awp2",
              "-cpi", "awp.cpt", "-fep", "cpu"])
    assert os.path.exists("awp2.awh.xvg")
