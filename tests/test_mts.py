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
