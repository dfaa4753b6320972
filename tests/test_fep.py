"""FEP correctness tests (mirrors reference
gmxlib/nonbonded/tests/nb_free_energy.cpp:497-527 parameterization over
softcore alpha x sc-coul x RF/PME, plus dvdl-vs-finite-difference and
end-state consistency checks)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gromacs_fep_gpu_tpu.core.topology import (MoleculeType, build_system,
                                               lj_table_from_sigma_eps)
from gromacs_fep_gpu_tpu.core.types import (CoulombType, FepCoupling,
                                            FepParams, MdParams, VdwModifier)
from gromacs_fep_gpu_tpu.ops.forces import (dense_energy, get_beta,
                                            make_dense_force_fn)

LAM = FepCoupling


def perturbed_dimer_system(q_a=0.4, q_b=0.0, vanish_lj_b=True):
    """Two-atom molecule where atom 1 is decoupled in state B, in a bath of
    normal atoms."""
    # types: 0 = normal LJ, 1 = dummy (no LJ)
    nbfp = lj_table_from_sigma_eps([0.31, 0.0015], [0.65, 0.0])
    nbfp[1, :, :] = 0.0
    nbfp[:, 1, :] = 0.0
    pert = MoleculeType(
        name="PERT", types_a=[0, 0], charges_a=[-q_a, q_a],
        masses_a=[16.0, 16.0],
        types_b=[0, 1 if vanish_lj_b else 0], charges_b=[-q_b, q_b],
        masses_b=[16.0, 16.0],
        bonds=[((0, 1), (0.15, 20000.0))],
    )
    bath = MoleculeType(name="BATH", types_a=[0], charges_a=[0.0],
                        masses_a=[40.0])
    system = build_system([(pert, 1), (bath, 6)], nbfp)
    rng = np.random.RandomState(4)
    x = np.array([[0.9, 1.0, 1.0], [1.05, 1.0, 1.0]])
    bath_x = rng.uniform(0.3, 1.7, (6, 3))
    # keep bath atoms off the dimer
    for i in range(6):
        while min(np.linalg.norm(bath_x[i] - x[0]),
                  np.linalg.norm(bath_x[i] - x[1])) < 0.3:
            bath_x[i] = rng.uniform(0.3, 1.7, 3)
    x = jnp.asarray(np.concatenate([x, bath_x]), jnp.float32)
    box = jnp.eye(3, dtype=jnp.float32) * 2.0
    return system, x, box


def make_params(coulomb=CoulombType.REACTION_FIELD, sc_alpha=0.5,
                sc_power=1, sc_coul=True):
    fep = FepParams(enabled=True, sc_alpha=sc_alpha, sc_power=sc_power,
                    sc_sigma=0.3, sc_coul=sc_coul)
    return MdParams(rcoulomb=0.9, rvdw=0.9, coulomb=coulomb,
                    pme_grid=(20, 20, 20), fep=fep)


@pytest.mark.parametrize("sc_alpha,sc_power,sc_coul,coulomb", [
    (0.0, 1, False, CoulombType.REACTION_FIELD),
    (0.5, 1, False, CoulombType.REACTION_FIELD),
    (0.5, 1, True, CoulombType.REACTION_FIELD),
    (0.85, 2, True, CoulombType.REACTION_FIELD),
    (0.5, 1, True, CoulombType.PME),
])
def test_dvdl_matches_finite_difference(sc_alpha, sc_power, sc_coul, coulomb):
    system, x, box = perturbed_dimer_system()
    params = make_params(coulomb, sc_alpha, sc_power, sc_coul)
    beta = get_beta(params)

    recip_fn = None
    if coulomb == CoulombType.PME:
        from gromacs_fep_gpu_tpu.ops.pme import make_pme_recip_fn
        recip_fn = make_pme_recip_fn(system, params)

    def epot(lam_scalar):
        lam = jnp.zeros(7).at[LAM.COUL].set(lam_scalar).at[LAM.VDW].set(
            lam_scalar).at[LAM.BONDED].set(lam_scalar)
        return dense_energy(x, box, lam, system, params, beta,
                            recip_fn).epot

    for lam0 in (0.2, 0.5, 0.8):
        dvdl_ad = jax.grad(epot)(jnp.float32(lam0))
        h = 1e-3
        dvdl_fd = (epot(jnp.float32(lam0 + h)) - epot(jnp.float32(lam0 - h))) / (2 * h)
        np.testing.assert_allclose(float(dvdl_ad), float(dvdl_fd),
                                   rtol=2e-2, atol=5e-2)


def test_end_states_match_unperturbed_topologies():
    """E(lambda=0) must equal the pure-A topology energy; same for B.

    This is the core acceptance criterion of the reference's FEP tests
    (programs/mdrun/tests/freeenergy.cpp)."""
    system, x, box = perturbed_dimer_system()
    params = make_params(sc_alpha=0.6, sc_coul=True)

    lam0 = jnp.zeros(7)
    lam1 = jnp.ones(7)
    e0 = dense_energy(x, box, lam0, system, params).epot
    e1 = dense_energy(x, box, lam1, system, params).epot

    # pure-A topology: copy A into both states
    sys_a = system.replace(charge_b=system.charge_a, type_b=system.type_a,
                           mass_b=system.mass_a,
                           perturbed=jnp.zeros_like(system.perturbed))
    e_a = dense_energy(x, box, lam0, sys_a, params).epot
    np.testing.assert_allclose(float(e0), float(e_a), rtol=1e-5)

    sys_b = system.replace(charge_a=system.charge_b, type_a=system.type_b,
                           mass_a=system.mass_b,
                           perturbed=jnp.zeros_like(system.perturbed))
    e_b = dense_energy(x, box, lam1, sys_b, params).epot
    np.testing.assert_allclose(float(e1), float(e_b), rtol=1e-5)


def test_softcore_removes_singularity():
    """With soft-core, the decoupled end state stays finite even at r=0."""
    system, x, box = perturbed_dimer_system()
    params = make_params(sc_alpha=0.5, sc_coul=True)
    # overlap a bath atom with the perturbed atom
    x = x.at[2].set(x[1] + jnp.asarray([1e-4, 0, 0]))
    lam = jnp.zeros(7).at[LAM.COUL].set(0.9).at[LAM.VDW].set(0.9)
    e = dense_energy(x, box, lam, system, params).epot
    dvdl = jax.grad(lambda l: dense_energy(
        x, box, jnp.zeros(7).at[LAM.VDW].set(l).at[LAM.COUL].set(l),
        system, params).epot)(jnp.float32(0.9))
    assert np.isfinite(float(e))
    assert np.isfinite(float(dvdl))


def test_foreign_lambda_energies_vmap():
    """The foreign-lambda energy sweep is a vmap over the energy fn —
    the TPU answer to the fork's sequential foreign-lambda CUDA kernel
    (nbnxm_foreign_fep_cuda_kernel.cuh)."""
    system, x, box = perturbed_dimer_system()
    params = make_params(sc_alpha=0.5, sc_coul=True)

    lams = jnp.linspace(0.0, 1.0, 5)

    def e_at(lam_scalar):
        lam = jnp.zeros(7).at[LAM.COUL].set(lam_scalar).at[LAM.VDW].set(lam_scalar)
        return dense_energy(x, box, lam, system, params).epot

    e_vmap = jax.vmap(e_at)(lams)
    e_seq = jnp.stack([e_at(l) for l in lams])
    np.testing.assert_allclose(np.asarray(e_vmap), np.asarray(e_seq),
                               rtol=1e-6)
    # energies vary monotonically-ish across lambda for this system; at
    # least they must differ
    assert float(jnp.abs(e_vmap[0] - e_vmap[-1])) > 1e-3


from gromacs_fep_gpu_tpu.core.types import SoftcoreType


@pytest.mark.parametrize("lam0", [0.2, 0.5, 0.9])
def test_gapsys_dvdl_matches_finite_difference(lam0):
    system, x, box = perturbed_dimer_system()
    fep = FepParams(enabled=True, sc_alpha=0.5, sc_coul=True,
                    softcore=SoftcoreType.GAPSYS)
    params = MdParams(rcoulomb=0.9, rvdw=0.9,
                      coulomb=CoulombType.REACTION_FIELD, fep=fep)
    # overlap a bath atom with the perturbed atom so the linearized region
    # is actually exercised
    x = x.at[2].set(x[1] + jnp.asarray([0.05, 0.0, 0.0]))

    def epot(l):
        lam = jnp.zeros(7).at[LAM.COUL].set(l).at[LAM.VDW].set(l)
        return dense_energy(x, box, lam, system, params).epot

    dvdl_ad = jax.grad(epot)(jnp.float32(lam0))
    h = 1e-3
    dvdl_fd = (epot(jnp.float32(lam0 + h)) - epot(jnp.float32(lam0 - h))) / (2 * h)
    assert np.isfinite(float(dvdl_ad))
    np.testing.assert_allclose(float(dvdl_ad), float(dvdl_fd),
                               rtol=3e-2, atol=0.1)


def test_gapsys_end_states_match_plain():
    """At lambda=0 the Gapsys potential must equal the unperturbed-A
    energy (linearization only affects the vanishing state)."""
    system, x, box = perturbed_dimer_system()
    fep_g = FepParams(enabled=True, sc_alpha=0.5, sc_coul=True,
                      softcore=SoftcoreType.GAPSYS)
    fep_b = FepParams(enabled=True, sc_alpha=0.0, sc_coul=False)
    pg = MdParams(rcoulomb=0.9, rvdw=0.9,
                  coulomb=CoulombType.REACTION_FIELD, fep=fep_g)
    pb = MdParams(rcoulomb=0.9, rvdw=0.9,
                  coulomb=CoulombType.REACTION_FIELD, fep=fep_b)
    lam0 = jnp.zeros(7)
    e_g = dense_energy(x, box, lam0, system, pg).epot
    e_b = dense_energy(x, box, lam0, system, pb).epot
    np.testing.assert_allclose(float(e_g), float(e_b), rtol=1e-5)


def test_gapsys_removes_singularity():
    system, x, box = perturbed_dimer_system()
    fep = FepParams(enabled=True, sc_alpha=0.5, sc_coul=True,
                    softcore=SoftcoreType.GAPSYS)
    params = MdParams(rcoulomb=0.9, rvdw=0.9,
                      coulomb=CoulombType.REACTION_FIELD, fep=fep)
    x = x.at[2].set(x[1] + jnp.asarray([1e-4, 0, 0]))
    lam = jnp.zeros(7).at[LAM.COUL].set(0.9).at[LAM.VDW].set(0.9)
    e = dense_energy(x, box, lam, system, params).epot
    g = jax.grad(lambda l: dense_energy(
        x, box, jnp.zeros(7).at[LAM.VDW].set(l).at[LAM.COUL].set(l),
        system, params).epot)(jnp.float32(0.9))
    assert np.isfinite(float(e))
    assert np.isfinite(float(g))
