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
