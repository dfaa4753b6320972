"""Oracle-layer tests: dense nonbonded/bonded energies vs analytic values
(mirrors the role of reference gmxlib/nonbonded/tests + listed_forces/tests)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gromacs_fep_gpu_tpu.core.topology import (MoleculeType, build_system,
                                               lj_table_from_sigma_eps)
from gromacs_fep_gpu_tpu.core.types import (CoulombType, FepCoupling,
                                            MdParams, VdwModifier, make_state)
from gromacs_fep_gpu_tpu.core.units import ONE_4PI_EPS0
from gromacs_fep_gpu_tpu.ops.forces import dense_energy, make_dense_force_fn
from gromacs_fep_gpu_tpu.models.argon import AR_EPS, AR_SIGMA, argon_box


def lj_pot(r, sigma, eps):
    s6 = (sigma / r) ** 6
    return 4 * eps * (s6 * s6 - s6)


def two_atom_system(charge=0.0):
    nbfp = lj_table_from_sigma_eps([AR_SIGMA], [AR_EPS])
    mol = MoleculeType(name="AR", types_a=[0], charges_a=[charge],
                       masses_a=[39.948])
    return build_system([(mol, 2)], nbfp)


PARAMS = MdParams(rcoulomb=1.0, rvdw=1.0, rlist=1.0,
                  coulomb=CoulombType.CUTOFF,
                  vdw_modifier=VdwModifier.POTENTIAL_SHIFT)


def test_lj_pair_energy_analytic():
    system = two_atom_system()
    box = jnp.eye(3) * 5.0
    r = 0.38
    x = jnp.array([[1.0, 1.0, 1.0], [1.0 + r, 1.0, 1.0]])
    lam = jnp.zeros(7)
    terms = dense_energy(x, box, lam, system, PARAMS)
    expected = lj_pot(r, AR_SIGMA, AR_EPS) - lj_pot(1.0, AR_SIGMA, AR_EPS)
    np.testing.assert_allclose(terms.lj, expected, rtol=1e-5)
    assert float(terms.coulomb) == 0.0


def test_lj_force_matches_derivative():
    system = two_atom_system()
    box = jnp.eye(3) * 5.0
    force_fn = make_dense_force_fn(system, PARAMS)

    def e_of_r(r):
        x = jnp.array([[1.0, 1.0, 1.0], [1.0 + r, 1.0, 1.0]])
        return dense_energy(x, box, jnp.zeros(7), system, PARAMS).epot

    r0 = 0.41
    dEdr = jax.grad(e_of_r)(r0)
    x = jnp.array([[1.0, 1.0, 1.0], [1.0 + r0, 1.0, 1.0]])
    f, terms = force_fn(x, box, jnp.zeros(7))
    np.testing.assert_allclose(f[1, 0], -dEdr, rtol=1e-4)
    np.testing.assert_allclose(f[0, 0], dEdr, rtol=1e-4)
    # Newton's third law
    np.testing.assert_allclose(np.asarray(f).sum(0), 0.0, atol=1e-4)


def test_coulomb_rf_energy():
    system = two_atom_system(charge=0.5)
    box = jnp.eye(3) * 5.0
    params = PARAMS.replace(coulomb=CoulombType.REACTION_FIELD,
                            epsilon_rf=0.0)
    r = 0.5
    x = jnp.array([[1.0, 1.0, 1.0], [1.0 + r, 1.0, 1.0]])
    terms = dense_energy(x, box, jnp.zeros(7), system, params)
    qq = ONE_4PI_EPS0 * 0.25
    rc = params.rcoulomb
    krf = 1.0 / (2 * rc**3)
    crf = 1.0 / rc + krf * rc**2
    expected = qq * (1.0 / r + krf * r * r - crf)
    np.testing.assert_allclose(terms.coulomb, expected, rtol=1e-5)


def test_minimum_image():
    system = two_atom_system()
    box = jnp.eye(3) * 2.0
    # atoms 1.9 apart -> image distance 0.1... use LJ at r=0.35 via wrap
    x = jnp.array([[0.05, 0.5, 0.5], [1.70, 0.5, 0.5]])
    terms = dense_energy(x, box, jnp.zeros(7), system, PARAMS)
    r = 0.35
    expected = lj_pot(r, AR_SIGMA, AR_EPS) - lj_pot(1.0, AR_SIGMA, AR_EPS)
    np.testing.assert_allclose(terms.lj, expected, rtol=1e-5)


def test_exclusions_remove_lj():
    nbfp = lj_table_from_sigma_eps([AR_SIGMA], [AR_EPS])
    mol = MoleculeType(name="D2", types_a=[0, 0], charges_a=[0.0, 0.0],
                       masses_a=[1.0, 1.0],
                       extra_exclusions=[(0, 1)])
    system = build_system([(mol, 1)], nbfp)
    box = jnp.eye(3) * 5.0
    x = jnp.array([[1.0, 1.0, 1.0], [1.4, 1.0, 1.0]])
    terms = dense_energy(x, box, jnp.zeros(7), system, PARAMS)
    assert float(terms.lj) == 0.0


def test_bonded_terms_analytic():
    nbfp = lj_table_from_sigma_eps([0.3], [0.1])
    mol = MoleculeType(
        name="TRI", types_a=[0, 0, 0], charges_a=[0.0] * 3,
        masses_a=[1.0] * 3,
        bonds=[((0, 1), (0.1, 1000.0))],
        angles=[((0, 1, 2), (90.0, 100.0))],
    )
    system = build_system([(mol, 1)], nbfp)
    box = jnp.eye(3) * 5.0
    # bond stretched to 0.12; angle at 120 deg
    x = jnp.array([[0.12, 0.0, 0.0],
                   [0.0, 0.0, 0.0],
                   [-0.05, 0.05 * np.sqrt(3), 0.0]]) + 1.0
    terms = dense_energy(x, box, jnp.zeros(7), system, PARAMS)
    np.testing.assert_allclose(terms.bonds, 0.5 * 1000 * 0.02**2, rtol=1e-4)
    np.testing.assert_allclose(
        terms.angles, 0.5 * 100 * np.deg2rad(30.0)**2, rtol=1e-4)


def test_dihedral_energy():
    nbfp = lj_table_from_sigma_eps([0.3], [0.1])
    mol = MoleculeType(
        name="BU", types_a=[0] * 4, charges_a=[0.0] * 4, masses_a=[1.0] * 4,
        pdihs=[((0, 1, 2, 3), (0.0, 10.0, 3))],
    )
    system = build_system([(mol, 1)], nbfp)
    box = jnp.eye(3) * 5.0
    # construct phi = 90 degrees
    x = jnp.array([[0.1, 0.0, 0.0],
                   [0.0, 0.0, 0.0],
                   [0.0, 0.0, 0.15],
                   [0.0, 0.1, 0.15],
                   ]) + 1.0
    terms = dense_energy(x, box, jnp.zeros(7), system, PARAMS)
    # V = k(1 + cos(3*phi - 0)), phi = -90 or 90 -> cos(270)=0
    np.testing.assert_allclose(terms.dihedrals, 10.0, rtol=1e-4)


def test_argon_box_runs_and_forces_sum_zero():
    system, state = argon_box(3, spacing=0.4)
    force_fn = make_dense_force_fn(system, PARAMS)
    f, terms = jax.jit(force_fn)(state.x, state.box, state.lam)
    assert np.isfinite(float(terms.epot))
    np.testing.assert_allclose(np.asarray(f).sum(0), 0.0, atol=1e-3)
