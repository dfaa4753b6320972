"""PME tests (mirrors reference ewald/tests: spline/spread/solve/gather
validated against exact Ewald and the NaCl Madelung constant)."""
import jax
import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.core.topology import MoleculeType, build_system
from gromacs_fep_gpu_tpu.core.types import CoulombType, MdParams, VdwModifier
from gromacs_fep_gpu_tpu.core.units import ONE_4PI_EPS0
from gromacs_fep_gpu_tpu.ops import pme as pme_mod
from gromacs_fep_gpu_tpu.ops.forces import dense_energy, get_beta
from gromacs_fep_gpu_tpu.ops.nonbonded_ref import ewald_beta


def test_pme_matches_exact_ewald_recip():
    rng = np.random.RandomState(0)
    n = 16
    box = jnp.eye(3, dtype=jnp.float32) * 2.0
    x = jnp.asarray(rng.uniform(0, 2.0, (n, 3)), jnp.float32)
    q = rng.uniform(-1, 1, n)
    q -= q.mean()
    q = jnp.asarray(q, jnp.float32)
    beta = 3.0
    e_exact = pme_mod.ewald_reciprocal_exact(x, box, q, beta, kmax=16)
    e_pme = pme_mod.reciprocal_energy(x, box, q, (32, 32, 32), beta, order=4)
    np.testing.assert_allclose(float(e_pme), float(e_exact), rtol=2e-4)


def test_pme_force_matches_exact_ewald_force():
    rng = np.random.RandomState(1)
    n = 8
    box = jnp.eye(3, dtype=jnp.float32) * 2.0
    x = jnp.asarray(rng.uniform(0, 2.0, (n, 3)), jnp.float32)
    q = rng.uniform(-1, 1, n)
    q -= q.mean()
    q = jnp.asarray(q, jnp.float32)
    beta = 3.0
    f_exact = -jax.grad(
        lambda xx: pme_mod.ewald_reciprocal_exact(xx, box, q, beta, kmax=16))(x)
    f_pme = -jax.grad(
        lambda xx: pme_mod.reciprocal_energy(xx, box, q, (32, 32, 32), beta,
                                             order=4))(x)
    np.testing.assert_allclose(np.asarray(f_pme), np.asarray(f_exact),
                               atol=2e-3 * float(jnp.abs(f_exact).max()))


def nacl_system(n_side=4, d=0.28):
    """Rock-salt lattice of +-1 charges, no LJ."""
    idx = np.mgrid[0:n_side, 0:n_side, 0:n_side].reshape(3, -1).T
    q = np.where(idx.sum(1) % 2 == 0, 1.0, -1.0)
    x = (idx + 0.5) * d
    box = np.diag([n_side * d] * 3)
    mols = []
    plus = MoleculeType(name="NA", types_a=[0], charges_a=[1.0], masses_a=[23.0])
    minus = MoleculeType(name="CL", types_a=[0], charges_a=[-1.0], masses_a=[35.5])
    # build per-atom in lattice order
    order = []
    for qi in q:
        order.append((plus if qi > 0 else minus, 1))
    nbfp = np.zeros((1, 1, 2), np.float32)
    system = build_system(order, nbfp)
    return system, jnp.asarray(x, jnp.float32), jnp.asarray(box, jnp.float32)


def test_madelung_energy():
    d = 0.28
    system, x, box = nacl_system(4, d)
    n = system.n_atoms
    grid = (24, 24, 24)
    params = MdParams(coulomb=CoulombType.PME, rcoulomb=0.55, rvdw=0.55,
                      ewald_rtol=1e-6, pme_grid=grid,
                      vdw_modifier=VdwModifier.POTENTIAL_SHIFT)
    beta = ewald_beta(params.rcoulomb, params.ewald_rtol)
    recip_fn = pme_mod.make_pme_recip_fn(system, params, grid)
    terms = dense_energy(x, box, jnp.zeros(7), system, params, beta=beta,
                         pme_recip_fn=lambda xx, bb, lc: recip_fn(xx, bb, lc))
    e_total = float(terms.coulomb + terms.coul_recip)
    madelung = -1.747565 * ONE_4PI_EPS0 / d * n / 2 * 2 / 2
    # energy per ion = -M k q^2 / (2 r0) * 2 ... total = -(N) * M k / (2 d)
    madelung = -n * 1.747565 * ONE_4PI_EPS0 / (2.0 * d)
    np.testing.assert_allclose(e_total, madelung, rtol=2e-3)


def test_pme_total_independent_of_split():
    """Total Coulomb must be invariant under the real/reciprocal split."""
    rng = np.random.RandomState(2)
    system, x, box = nacl_system(4, 0.28)
    x = x + jnp.asarray(rng.normal(0, 0.01, x.shape), jnp.float32)
    grid = (32, 32, 32)
    totals = []
    for rc in (0.45, 0.55):
        params = MdParams(coulomb=CoulombType.PME, rcoulomb=rc, rvdw=rc,
                          ewald_rtol=1e-7, pme_grid=grid)
        beta = ewald_beta(rc, params.ewald_rtol)
        recip_fn = pme_mod.make_pme_recip_fn(system, params, grid)
        terms = dense_energy(x, box, jnp.zeros(7), system, params, beta=beta,
                             pme_recip_fn=recip_fn)
        totals.append(float(terms.coulomb + terms.coul_recip))
    np.testing.assert_allclose(totals[0], totals[1],
                               rtol=3e-4, atol=abs(totals[0]) * 3e-4)


def test_pallas_spread_matches_xla():
    """spread_charges_pallas (interpret) == spread_charges (MXU-resident
    expansion kernel vs XLA matmul formulation)."""
    from gromacs_fep_gpu_tpu.ops.pme_pallas import spread_charges_pallas
    rng = np.random.RandomState(3)
    n = 257
    box = jnp.eye(3, dtype=jnp.float32) * 2.0
    x = jnp.asarray(rng.uniform(0, 2.0, (n, 3)), jnp.float32)
    q = jnp.asarray(rng.uniform(-1, 1, n), jnp.float32)
    grid_shape = (20, 24, 28)
    g_ref = pme_mod.spread_charges(x, box, q, grid_shape)
    g_pl = spread_charges_pallas(x, box, q, grid_shape, interpret=True)
    # bf16x3 split passes: ~1e-7 rel per product, accumulated over the
    # spread support; well inside the reference's 1e-4 energy gate
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               atol=1e-5)


def test_pallas_gather_matches_xla():
    from gromacs_fep_gpu_tpu.ops.pme_pallas import phi_gather_pallas
    rng = np.random.RandomState(4)
    n = 130
    box = jnp.eye(3, dtype=jnp.float32) * 2.0
    x = jnp.asarray(rng.uniform(0, 2.0, (n, 3)), jnp.float32)
    q = jnp.asarray(rng.uniform(-1, 1, n), jnp.float32)
    grid_shape = (20, 24, 28)
    phi = jnp.asarray(rng.normal(size=grid_shape), jnp.float32)
    f_ref, d_ref = pme_mod.phi_gather(x, box, q, phi, grid_shape)
    f_pl, d_pl = phi_gather_pallas(x, box, q, phi, grid_shape,
                                   interpret=True)
    fs = float(jnp.abs(f_ref).max())
    np.testing.assert_allclose(np.asarray(f_pl), np.asarray(f_ref),
                               atol=3e-5 * fs)
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                               atol=3e-5 * float(jnp.abs(d_ref).max()))
