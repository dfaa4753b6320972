"""LJ-PME tests (reference: ewald/pme_solve.cpp solve_pme_lj_yzx +
nbnxm LJ-PME real-space kernels)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gromacs_fep_gpu_tpu.core import pbc as pbc_mod
from gromacs_fep_gpu_tpu.core.types import CoulombType, MdParams
from gromacs_fep_gpu_tpu.ops.ljpme import (dispersion_g,
                                           ewald_dispersion_exact,
                                           ljpme_excluded_correction,
                                           ljpme_reciprocal_energy,
                                           ljpme_self_energy)


def test_decomposition_matches_bruteforce_lattice_sum():
    """real(g-switched, cutoff) + recip + self == the absolutely
    convergent dispersion lattice sum, to grid accuracy."""
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(0)
        n, L = 24, 2.2
        x = jnp.asarray(rng.uniform(0, L, (n, 3)), jnp.float64)
        box = jnp.eye(3, dtype=jnp.float64) * L
        c6 = 2.5e-3
        b6 = jnp.full((n,), np.sqrt(c6), jnp.float64)
        beta = 3.0

        d = pbc_mod.pbc_dx(x[:, None, :] - x[None, :, :], box)
        r2 = jnp.sum(d * d, -1) + jnp.eye(n) * 1e10
        rc = L / 2 * 0.999
        mask = r2 < rc * rc
        inv6 = 1.0 / r2 ** 3
        e_real = -0.5 * float(jnp.sum(jnp.where(
            mask, c6 * dispersion_g(beta * beta * r2) * inv6, 0.0)))
        e_recip = float(ljpme_reciprocal_energy(x, box, b6, (32, 32, 32),
                                                beta, order=6))
        e_self = float(ljpme_self_energy(b6, beta))
        exact = ewald_dispersion_exact(x, box, np.array([[c6]]),
                                       np.zeros(n, np.int32), n_images=3)
        np.testing.assert_allclose(e_real + e_recip + e_self, exact,
                                   rtol=2e-4)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_excluded_correction_cancels_grid_pair():
    """For a single excluded pair, recip + excluded-correction + self
    leaves exactly the real part missing (total == 0 interaction)."""
    jax.config.update("jax_enable_x64", True)
    try:
        L = 3.0
        box = jnp.eye(3, dtype=jnp.float64) * L
        x = jnp.asarray([[1.0, 1.0, 1.0], [1.35, 1.0, 1.0]], jnp.float64)
        c6 = 1e-3
        b6 = jnp.full((2,), np.sqrt(c6), jnp.float64)
        beta = 3.0
        excl = jnp.asarray([[1], [0]], jnp.int32)
        e_recip = float(ljpme_reciprocal_energy(x, box, b6, (32, 32, 32),
                                                beta, order=6))
        e_self = float(ljpme_self_energy(b6, beta))
        e_excl = float(ljpme_excluded_correction(x, box, b6, excl, beta))
        # the real-space part of every non-minimum-image pair is
        # negligible at beta=3 (nearest image >= 2.65 nm), so the
        # decomposed total with the pair excluded must equal the
        # brute-force sum minus the min-image pair term
        r = 0.35
        total = e_recip + e_self + e_excl
        exact_all = ewald_dispersion_exact(x, box, np.array([[c6]]),
                                           np.zeros(2, np.int32), 4)
        exact_wo_pair = exact_all - (-c6 / r ** 6)
        np.testing.assert_allclose(total, exact_wo_pair, atol=5e-6)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_dense_path_ljpme_total():
    """vdwtype=pme through dense_energy: real + lj_recip matches the
    brute-force dispersion sum plus the plain repulsion."""
    from gromacs_fep_gpu_tpu.core.topology import MoleculeType, build_system
    from gromacs_fep_gpu_tpu.core.types import VdwModifier
    from gromacs_fep_gpu_tpu.ops.forces import dense_energy

    rng = np.random.default_rng(2)
    n, L = 16, 2.4
    mol = MoleculeType(name="A", types_a=[0], charges_a=[0.0],
                       masses_a=[39.9])
    c6, c12 = 6.2e-3, 9.7e-6
    nbfp = np.array([[[c6, c12]]], np.float32)
    system = build_system([(mol, n)], nbfp)
    x = jnp.asarray(rng.uniform(0, L, (n, 3)), jnp.float32)
    box = jnp.eye(3, dtype=jnp.float32) * L
    params = MdParams(coulomb=CoulombType.CUTOFF, rcoulomb=1.1, rvdw=1.1,
                      rlist=1.15, vdw_type="pme", ewald_rtol_lj=1e-5,
                      pme_grid=(24, 24, 24),
                      vdw_modifier=VdwModifier.NONE
                      if hasattr(VdwModifier, "NONE")
                      else VdwModifier.POTENTIAL_SHIFT)
    lam = jnp.zeros((7,), jnp.float32)
    terms = dense_energy(x, box, lam, system, params, None, None)

    # expected: brute-force dispersion + min-image repulsion (cutoff rvdw)
    exact_disp = ewald_dispersion_exact(x, box, np.array([[c6]]),
                                        np.zeros(n, np.int32), 3)
    d = pbc_mod.pbc_dx(x[:, None, :] - x[None, :, :], box)
    r2 = np.asarray(jnp.sum(d * d, -1)) + np.eye(n) * 1e10
    rep = 0.5 * (c12 / r2 ** 6)[r2 < params.rvdw ** 2].sum()
    got = float(terms.lj + terms.lj_recip)
    # remove the potential-shift constant if the modifier applied one
    if params.vdw_modifier == VdwModifier.POTENTIAL_SHIFT:
        from gromacs_fep_gpu_tpu.ops.nonbonded_ref import ewald_beta
        b6v = ewald_beta(params.rvdw, params.ewald_rtol_lj)
        rc2 = params.rvdw ** 2
        u_c = b6v ** 2 * rc2
        g_c = np.exp(-u_c) * (1 + u_c + 0.5 * u_c ** 2)
        npairs = int((r2 < rc2).sum() // 2)
        shift = (c12 / rc2 ** 6 - c6 * g_c / rc2 ** 3) * npairs
        got = got + shift
    expect = exact_disp + rep
    np.testing.assert_allclose(got, expect,
                               rtol=2e-3, atol=2e-3 * abs(expect))


def test_cluster_kernel_matches_dense_ljpme():
    """The XLA cluster kernel's LJ-PME real-space part (energy AND
    analytic force) matches AD through the dense oracle."""
    from gromacs_fep_gpu_tpu.models.water import water_box
    from gromacs_fep_gpu_tpu.ops.cluster_nb import make_cluster_force_fn
    from gromacs_fep_gpu_tpu.ops.forces import make_dense_force_fn
    from gromacs_fep_gpu_tpu.ops.pairlist import build_cluster_pairlist

    system, state = water_box(4, spacing=0.31, seed=8, temperature=300.0)
    params = MdParams(coulomb=CoulombType.CUTOFF, rcoulomb=0.55,
                      rvdw=0.55, rlist=0.7, vdw_type="pme",
                      ewald_rtol_lj=1e-3, pme_grid=(12, 12, 12))
    lam = jnp.zeros((7,), jnp.float32)
    nlist = build_cluster_pairlist(state.x, state.box, system,
                                   params.rlist, nnbr=96)
    force_fn = make_cluster_force_fn(system, params, None, has_fep=False,
                                     block=16)
    f_c, terms_c = force_fn(state.x, state.box, lam, nlist, None)
    dense = make_dense_force_fn(system, params)
    f_d, terms_d = dense(state.x, state.box, lam)
    np.testing.assert_allclose(float(terms_c.lj), float(terms_d.lj),
                               rtol=2e-4)
    np.testing.assert_allclose(float(terms_c.lj_recip),
                               float(terms_d.lj_recip), rtol=1e-4)
    scale = float(jnp.abs(f_d).max())
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_d),
                               atol=5e-4 * scale)
