"""IO (gro/mdp/checkpoint/xvg) and minimizer tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.core.types import (CoulombType, IntegratorType,
                                            MdParams, TcouplType)
from gromacs_fep_gpu_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from gromacs_fep_gpu_tpu.io.groio import read_gro, write_gro
from gromacs_fep_gpu_tpu.io.mdpio import mdp_to_params
from gromacs_fep_gpu_tpu.md.minimize import steepest_descent
from gromacs_fep_gpu_tpu.models.argon import argon_box
from gromacs_fep_gpu_tpu.models.water import water_box
from gromacs_fep_gpu_tpu.ops.forces import make_dense_force_fn


def test_gro_roundtrip(tmp_path):
    system, state = water_box(2, spacing=0.4, temperature=100.0)
    n = system.n_atoms
    names = ["OW", "HW1", "HW2"] * (n // 3)
    resnames = ["SOL"] * n
    p = os.path.join(tmp_path, "conf.gro")
    write_gro(p, "test box", names, resnames, np.asarray(state.x),
              np.asarray(state.v), np.asarray(state.box))
    nm, rn, x, v, box = read_gro(p)
    assert nm[:3] == ["OW", "HW1", "HW2"]
    np.testing.assert_allclose(x, np.asarray(state.x), atol=1e-3)
    np.testing.assert_allclose(v, np.asarray(state.v), atol=1e-4)
    np.testing.assert_allclose(box, np.asarray(state.box), atol=1e-5)


MDP = """
integrator = sd
dt = 0.002
nsteps = 5000
coulombtype = PME
rcoulomb = 1.0
rvdw = 1.0
vdw-modifier = potential-shift
tcoupl = v-rescale
ref-t = 298.0 298.0
tau-t = 0.5 0.5
free-energy = yes
init-lambda-state = 3
sc-alpha = 0.5
sc-coul = yes
sc-power = 1
nstdhdl = 50
fep-lambdas = 0.0 0.25 0.5 0.75 1.0
coul-lambdas = 0.0 0.5 1.0 1.0 1.0
vdw-lambdas  = 0.0 0.0 0.5 0.75 1.0
; a comment
unknownkey = whatever
"""


def test_mdp_parse():
    params, all_lambda = mdp_to_params(MDP)
    assert params.integrator == IntegratorType.SD
    assert params.dt == 0.002
    assert params.coulomb == CoulombType.PME
    assert params.tcoupl == TcouplType.V_RESCALE
    assert params.ref_t == 298.0
    assert params.fep.enabled and params.fep.sc_coul
    assert params.fep.init_lambda_state == 3
    assert all_lambda.shape == (7, 5)
    np.testing.assert_allclose(all_lambda[2], [0, 0.5, 1, 1, 1])
    np.testing.assert_allclose(all_lambda[3], [0, 0, 0.5, 0.75, 1])
    np.testing.assert_allclose(all_lambda[0], [0, 0.25, 0.5, 0.75, 1])


def test_checkpoint_roundtrip(tmp_path):
    system, state = water_box(2, spacing=0.4, temperature=150.0, seed=5)
    state = state.replace(step=jnp.asarray(1234, jnp.int32))
    p = os.path.join(tmp_path, "state.cpt")
    save_checkpoint(p, state, extra={"nnbr": 96})
    state2, extra = load_checkpoint(p, state)
    np.testing.assert_array_equal(np.asarray(state2.x), np.asarray(state.x))
    np.testing.assert_array_equal(np.asarray(state2.rng), np.asarray(state.rng))
    assert int(state2.step) == 1234
    assert int(extra["nnbr"]) == 96


def test_steepest_descent_reduces_energy():
    params = MdParams(coulomb=CoulombType.CUTOFF, rcoulomb=0.8, rvdw=0.8)
    system, state = argon_box(3, spacing=0.36, seed=2)  # compressed lattice
    # random perturbation to create overlaps
    key = jax.random.PRNGKey(0)
    x0 = state.x + 0.02 * jax.random.normal(key, state.x.shape)
    force_fn = make_dense_force_fn(system, params)
    e_start = force_fn(x0, state.box, state.lam)[1].epot
    res = jax.jit(lambda x: steepest_descent(
        x, state.box, state.lam, force_fn, nsteps=150, emtol=50.0))(x0)
    assert float(res.epot) < float(e_start)
    assert float(res.fmax) < 1e4
