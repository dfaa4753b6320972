"""Ewald surface/dipole correction tests (reference:
ewald/long_range_correction.cpp ewald_LRcorrection)."""
import jax
import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.core.topology import MoleculeType, build_system
from gromacs_fep_gpu_tpu.core.types import CoulombType, MdParams
from gromacs_fep_gpu_tpu.core.units import ONE_4PI_EPS0
from gromacs_fep_gpu_tpu.ops.ewald_surface import make_surface_corr_fn


def _two_charge_system(qb=None):
    mol = MoleculeType(name="DIP", types_a=[0, 0], charges_a=[0.5, -0.5],
                       masses_a=[10.0, 10.0])
    if qb is not None:
        mol.charges_b = list(qb)
        mol.types_b = [0, 0]
        mol.masses_b = [10.0, 10.0]
    nbfp = np.zeros((1, 1, 2), np.float32)
    return build_system([(mol, 1)], nbfp)


BOX = jnp.eye(3, dtype=jnp.float32) * 4.0


def test_3d_epsilon_surface_analytic():
    """|M|^2 form: two charges +-q at separation d along z."""
    system = _two_charge_system()
    params = MdParams(coulomb=CoulombType.PME, epsilon_surface=1.0)
    fn = make_surface_corr_fn(system, params)
    d = 0.3
    x = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 1.0, 1.0 + d]], jnp.float32)
    e = float(fn(x, BOX, 0.0))
    vol = 4.0 ** 3
    expect = 2 * np.pi * ONE_4PI_EPS0 / ((2 * 1.0 + 1.0) * vol) * (0.5 * d) ** 2
    np.testing.assert_allclose(e, expect, rtol=1e-5)
    # tinfoil (eps=0 means off)
    assert make_surface_corr_fn(
        system, MdParams(coulomb=CoulombType.PME)) is None
    # larger surface epsilon weakens the correction
    fn2 = make_surface_corr_fn(
        system, MdParams(coulomb=CoulombType.PME, epsilon_surface=10.0))
    assert float(fn2(x, BOX, 0.0)) < e


def test_3dc_slab_z_only():
    system = _two_charge_system()
    params = MdParams(coulomb=CoulombType.PME, ewald_geometry="3dc")
    fn = make_surface_corr_fn(system, params)
    d = 0.25
    xz = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 1.0, 1.0 + d]], jnp.float32)
    xx = jnp.asarray([[1.0, 1.0, 1.0], [1.0 + d, 1.0, 1.0]], jnp.float32)
    vol = 4.0 ** 3
    expect = 2 * np.pi * ONE_4PI_EPS0 / vol * (0.5 * d) ** 2
    np.testing.assert_allclose(float(fn(xz, BOX, 0.0)), expect, rtol=1e-5)
    # x-oriented dipole contributes nothing in slab geometry
    np.testing.assert_allclose(float(fn(xx, BOX, 0.0)), 0.0, atol=1e-8)


def test_force_is_gradient_and_dvdl_linear():
    system = _two_charge_system(qb=[1.0, -1.0])
    params = MdParams(coulomb=CoulombType.PME, epsilon_surface=2.0)
    fn = make_surface_corr_fn(system, params)
    x = jnp.asarray([[1.0, 1.2, 1.1], [1.4, 1.0, 1.6]], jnp.float32)
    g = jax.grad(lambda xx: fn(xx, BOX, 0.3))(x)
    eps = 1e-3
    for (i, dd) in [(0, 2), (1, 0)]:
        fd = (float(fn(x.at[i, dd].add(eps), BOX, 0.3))
              - float(fn(x.at[i, dd].add(-eps), BOX, 0.3))) / (2 * eps)
        np.testing.assert_allclose(float(g[i, dd]), fd, rtol=1e-3,
                                   atol=1e-7)
    # linear lambda interpolation: dvdl == E_B - E_A exactly
    dvdl = float(jax.grad(lambda l: fn(x, BOX, l))(jnp.float32(0.3)))
    e_a = float(fn(x, BOX, 0.0))
    e_b = float(fn(x, BOX, 1.0))
    np.testing.assert_allclose(dvdl, e_b - e_a, rtol=1e-4)


def test_dense_path_includes_surface_term():
    from gromacs_fep_gpu_tpu.ops.forces import dense_energy
    from gromacs_fep_gpu_tpu.ops.pme import make_pme_recip_fn, pme_grid_size
    from gromacs_fep_gpu_tpu.ops.nonbonded_ref import ewald_beta
    system = _two_charge_system()
    params = MdParams(coulomb=CoulombType.PME, rcoulomb=0.9, rvdw=0.9,
                      rlist=1.0, epsilon_surface=1.0,
                      pme_grid=pme_grid_size((4.0,) * 3, 0.12))
    x = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 1.0, 1.3]], jnp.float32)
    lam = jnp.zeros((7,), jnp.float32)
    beta = ewald_beta(params.rcoulomb, params.ewald_rtol)
    recip = make_pme_recip_fn(system, params)
    t1 = dense_energy(x, BOX, lam, system, params, beta, recip)
    t0 = dense_energy(x, BOX, lam, system,
                      params.replace(epsilon_surface=0.0), beta, recip)
    fn = make_surface_corr_fn(system, params)
    np.testing.assert_allclose(float(t1.coul_recip - t0.coul_recip),
                               float(fn(x, BOX, 0.0)), rtol=1e-3)
