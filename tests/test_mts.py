"""Multiple time stepping (reference: mdtypes/multipletimestepping.h,
mdlib MTS force combination; mdp keys mts / mts-level2-forces /
mts-level2-factor)."""
import jax.numpy as jnp
import numpy as np
import pytest

from gromacs_fep_gpu_tpu.core.types import CoulombType, MdParams, TcouplType
from gromacs_fep_gpu_tpu.md.runner import MdRunner, RunnerConfig
from gromacs_fep_gpu_tpu.models.water import water_box
from gromacs_fep_gpu_tpu.ops.cluster_nb import make_cluster_force_fn
from gromacs_fep_gpu_tpu.ops.pairlist import build_cluster_pairlist
from gromacs_fep_gpu_tpu.ops.pme import make_pme_recip_pair, pme_grid_size


def _setup():
    system, state = water_box(5, spacing=0.35, seed=11)
    box_l = 5 * 0.35
    grid = pme_grid_size((box_l,) * 3, 0.12)
    params = MdParams(dt=0.001, nstlist=10, coulomb=CoulombType.PME,
                      rcoulomb=0.7, rvdw=0.7, rlist=0.8, pme_grid=grid,
                      nstcalcenergy=10, mts=True, mts_factor=2)
    return system, state, params


def test_mts_force_composition():
    """skip_recip drops exactly the recip force; recip_scale applies the
    impulse factor to exactly the recip force."""
    system, state, params = _setup()
    recip_fn, recip_force_fn = make_pme_recip_pair(system, params,
                                                   params.pme_grid)
    force_fn = make_cluster_force_fn(system, params, recip_fn,
                                     pme_recip_force_fn=recip_force_fn)
    nlist = build_cluster_pairlist(state.x, state.box, system, params.rlist,
                                   nnbr=96)
    lam = state.lam
    f_on, t_on = force_fn(state.x, state.box, lam, nlist)
    f_off, t_off = force_fn(state.x, state.box, lam, nlist,
                            need_energy=False, skip_recip=True)
    f_imp, t_imp = force_fn(state.x, state.box, lam, nlist,
                            need_energy=False, recip_scale=2.0)
    _, f_rec, _ = recip_force_fn(state.x, state.box, lam[2])

    scale = float(jnp.abs(f_on).max())
    np.testing.assert_allclose(np.asarray(f_off + f_rec), np.asarray(f_on),
                               atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(f_imp), np.asarray(f_on + f_rec),
                               atol=1e-5 * scale)
    # energies are unscaled instantaneous values on impulse steps
    np.testing.assert_allclose(float(t_imp.coul_recip),
                               float(t_on.coul_recip), rtol=1e-6)
    assert float(t_off.coul_recip) == 0.0


def test_mts_run_tracks_full_integration():
    """A short MTS run stays close to the every-step-recip run and keeps
    finite energies at energy steps (the recip force is a smooth, small
    component: factor-2 impulse integration is stable at dt=1 fs)."""
    system, state, params = _setup()
    r_full = MdRunner(system, params.replace(mts=False), RunnerConfig())
    r_mts = MdRunner(system, params, RunnerConfig())
    s1, logs1 = r_full.run(state, 40)
    s2, logs2 = r_mts.run(state, 40)
    # same energy-step schedule; recip included in both reports
    e1 = np.asarray(jnp.concatenate([l.epot for l in logs1]))
    e2 = np.asarray(jnp.concatenate([l.epot for l in logs2]))
    m1, m2 = np.isfinite(e1), np.isfinite(e2)
    assert (m1 == m2).all()
    assert np.isfinite(e1[m1]).all()
    # trajectories agree closely over a short horizon
    d = float(jnp.abs(s2.x - s1.x).max())
    assert d < 5e-3, d
    # and the energies track each other (loose: the lattice start is a
    # fast-relaxing transient, so trajectory differences amplify)
    np.testing.assert_allclose(e2[m2], e1[m1], rtol=5e-2)


def test_mts_misalignment_rejected():
    system, state, params = _setup()
    bad = params.replace(nstcalcenergy=5, mts_factor=2)
    r = MdRunner(system, bad, RunnerConfig())
    with pytest.raises(ValueError, match="multiple"):
        r.run(state, 10)


def test_mts_mdp_keys(tmp_path):
    from gromacs_fep_gpu_tpu.io.mdpio import mdp_to_params
    p = mdp_to_params("integrator = md\nmts = yes\nmts-level2-factor = 4\n"
                      "mts-level2-forces = longrange-nonbonded\n")[0]
    assert p.mts and p.mts_factor == 4
    assert p.mts_forces == "longrange-nonbonded"


def test_mts_nve_drift():
    """NVE energy conservation under the MTS impulse scheme (the
    production FEP config benchmarks with): drift must stay within the
    same verlet-buffer-tolerance budget as the every-step integrator
    (reference: the MTS validation bound discussed in
    mdtypes/multipletimestepping.h — factor-2 recip impulses at dt=1 fs
    are well inside the resonance limit)."""
    from gromacs_fep_gpu_tpu.md.runner import concat_logs
    system, state = water_box(5, spacing=0.31, seed=12, temperature=300.0)
    n = system.n_atoms
    box_l = 5 * 0.31
    grid = pme_grid_size((box_l,) * 3, 0.12)
    params = MdParams(dt=0.001, nstlist=10, coulomb=CoulombType.PME,
                      rcoulomb=0.62, rvdw=0.62, rlist=0.7, pme_grid=grid,
                      nstcomm=0, nstcalcenergy=2, mts=True, mts_factor=2)
    eq_params = params.replace(tcoupl=TcouplType.V_RESCALE, ref_t=300.0,
                               tau_t=0.1, nsttcouple=2, dt=0.0005)
    eq = MdRunner(system, eq_params, RunnerConfig(nnbr=128))
    state, _ = eq.run(state, 400)

    runner = MdRunner(system, params, RunnerConfig(nnbr=128))
    state, logs = runner.run(state, 1000)
    log = concat_logs(logs)
    etot = np.asarray(log.epot) + np.asarray(log.ekin)
    m = np.isfinite(etot)
    etot = etot[m]
    assert etot.size >= 400 and np.isfinite(etot).all()
    t = np.arange(etot.size) * params.dt * 2   # energy every 2 steps
    slope = np.polyfit(t, etot, 1)[0]
    per_atom = abs(slope) / n
    assert per_atom < 0.02, f"MTS NVE drift {per_atom:.4f} kJ/mol/ps/atom"


def test_mts_dhdl_matches_plain_on_energy_steps():
    """dhdl/foreign-lambda output on MTS energy steps must equal the
    every-step-recip run exactly at step 0 (identical state, full-recip
    forces on impulse steps): MTS must not change the FEP estimator,
    only the integration schedule (reference: dhdl is assembled from
    full-potential energies at nstcalcenergy steps,
    mdlib/sim_util.cpp energy steps)."""
    from gromacs_fep_gpu_tpu.core.types import FepParams
    from gromacs_fep_gpu_tpu.models.solvation import solvation_system
    from gromacs_fep_gpu_tpu.parallel.ensemble import lambda_schedule
    system, state = solvation_system(n_side=5, spacing=0.31, seed=3,
                                     temperature=300.0)
    state = state.replace(lam=state.lam.at[2].set(0.5).at[3].set(0.5))
    box_l = 5 * 0.31
    grid = pme_grid_size((box_l,) * 3, 0.12)
    fep = FepParams(enabled=True, sc_alpha=0.5, sc_coul=True, sc_sigma=0.3)
    params = MdParams(dt=0.001, nstlist=10, coulomb=CoulombType.PME,
                      rcoulomb=0.62, rvdw=0.62, rlist=0.7, pme_grid=grid,
                      nstcalcenergy=2, fep=fep)
    ladder = lambda_schedule(5)        # (5, 7) foreign-lambda ladder
    r_plain = MdRunner(system, params, RunnerConfig(fep_max_nbr=256),
                       all_lambda=ladder)
    r_mts = MdRunner(system, params.replace(mts=True, mts_factor=2),
                     RunnerConfig(fep_max_nbr=256), all_lambda=ladder)
    _, logs_p = r_plain.run(state, 10)
    _, logs_m = r_mts.run(state, 10)
    from gromacs_fep_gpu_tpu.md.runner import concat_logs
    lp, lm = concat_logs(logs_p), concat_logs(logs_m)
    dv_p = np.asarray(lp.dvdl)
    dv_m = np.asarray(lm.dvdl)
    fin = np.isfinite(dv_p[:, 3])
    # step 0: identical state -> identical dvdl and foreign-lambda dH
    np.testing.assert_allclose(dv_m[fin][0], dv_p[fin][0],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lm.delta_h)[fin][0],
                               np.asarray(lp.delta_h)[fin][0],
                               rtol=1e-6, atol=1e-5)
    # later energy steps stay close (trajectories diverge slowly)
    np.testing.assert_allclose(dv_m[fin], dv_p[fin], rtol=5e-2, atol=5.0)
