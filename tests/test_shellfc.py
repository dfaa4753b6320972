"""Shell/Drude relaxation (polarizable force fields).

Reference: mdrun/shellfc.cpp relax_shell_flexcon (:930) — SCF
minimization of massless shell positions before each step; spring
constant k = q_shell^2 * ONE_4PI_EPS0 / alpha
(listed_forces/bonded.cpp:734 polarize).

Ground truth: a core(+q)/shell(-q) pair in a uniform external field E
relaxes to displacement d = q_shell E / k, i.e. an induced dipole
mu = q^2 E / k = alpha_eff E with alpha_eff = alpha / ONE_4PI_EPS0
(the classical Drude identity) — an analytic check of both the spring
bookkeeping and the SCF fixed point.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from gromacs_fep_gpu_tpu.core.topology import MoleculeType, build_system
from gromacs_fep_gpu_tpu.core.types import (CoulombType, MdParams,
                                            TcouplType, make_state)
from gromacs_fep_gpu_tpu.core.units import ONE_4PI_EPS0


def _drude_atom(alpha=0.002, q=1.0, n_copies=1):
    """One 'atom': heavy core (+q) + massless shell (-q), LJ on the core
    only so copies don't collapse."""
    mol = MoleculeType(
        name="DRU",
        types_a=[0, 1], charges_a=[q, -q], masses_a=[15.0, 0.0],
        polarization=[((1, 0), (alpha,))],   # ((shell, core), (alpha,))
        nrexcl=2,
    )
    # type 0: LJ sphere; type 1 (shell): no LJ
    nbfp = np.zeros((2, 2, 2), np.float32)
    nbfp[0, 0] = (1e-3, 1e-6)
    return build_system([(mol, n_copies)], nbfp)


def test_shell_system_build():
    system = _drude_atom()
    assert system.shells is not None
    assert int(system.shells.idx[0]) == 1 and int(system.shells.core[0]) == 0
    k_expect = 1.0 ** 2 * ONE_4PI_EPS0 / 0.002
    np.testing.assert_allclose(float(system.shells.k[0]), k_expect,
                               rtol=1e-6)
    # the spring is materialized as a b0=0 harmonic bond
    b = system.bonded["bonds"]
    assert b.n == 1 and float(b.params_a[0, 0]) == 0.0
    np.testing.assert_allclose(float(b.params_a[0, 1]), k_expect, rtol=1e-6)
    # core-shell pair excluded from nonbonded
    assert 1 in set(np.asarray(system.exclusions.idx[0]).tolist())


def test_shell_relax_analytic_field():
    """SCF fixed point under a uniform field: d = qE/k exactly."""
    from gromacs_fep_gpu_tpu.md.shellfc import make_shell_relax
    alpha, q = 0.003, 0.8
    system = _drude_atom(alpha=alpha, q=q)
    k = float(system.shells.k[0])
    e_field = jnp.array([0.0, 0.0, 25.0])     # kJ/mol/nm/e
    q_shell = -q

    def force_fn(x, box, lam):
        # spring force + external field on charges
        d = x[1] - x[0]
        f_spring = -k * d
        charges = jnp.array([q, q_shell])
        f_field = charges[:, None] * e_field[None, :]
        f = jnp.stack([-f_spring, f_spring]) + f_field
        return f, None

    relax = make_shell_relax(system, force_fn, n_iter=3)
    box = jnp.eye(3) * 5.0
    x0 = jnp.array([[2.5, 2.5, 2.5], [2.5, 2.5, 2.5]])
    x = relax(x0, box, jnp.zeros((7,)))
    d = np.asarray(x[1] - x[0])
    d_expect = np.asarray(q_shell * e_field / k)
    np.testing.assert_allclose(d, d_expect, rtol=1e-4, atol=1e-7)
    # induced dipole = alpha/ONE_4PI_EPS0 * E (Drude identity)
    mu = q_shell * d
    np.testing.assert_allclose(mu, alpha / ONE_4PI_EPS0 * np.asarray(e_field)
                               * 1.0, rtol=1e-4, atol=1e-7)


def test_shell_md_runner_end_to_end():
    """A short MD run with shells through the production runner: shells
    stay relaxed (small spring stretch), energy finite, cores move."""
    from gromacs_fep_gpu_tpu.md.runner import MdRunner, RunnerConfig
    import jax
    system = _drude_atom(alpha=0.001, q=0.5, n_copies=8)
    n = system.n_atoms
    rng = np.random.RandomState(4)
    x = np.zeros((n, 3), np.float32)
    # cores on a loose grid, shells on top of cores
    g = 0
    for i in range(2):
        for j in range(2):
            for kk in range(2):
                x[2 * g] = (0.9 * i + 0.55, 0.9 * j + 0.55, 0.9 * kk + 0.55)
                x[2 * g + 1] = x[2 * g]
                g += 1
    x += rng.uniform(-0.02, 0.02, x.shape).astype(np.float32)
    x[1::2] = x[0::2]          # shells exactly on cores initially
    box = jnp.eye(3) * 2.4
    v = np.zeros((n, 3), np.float32)
    state = make_state(x.astype(np.float32), v, np.asarray(box))
    params = MdParams(dt=0.001, nstlist=5, coulomb=CoulombType.CUTOFF,
                      rcoulomb=0.9, rvdw=0.9, rlist=1.0, nstcomm=0,
                      tcoupl=TcouplType.V_RESCALE, ref_t=50.0, tau_t=0.2,
                      nsttcouple=1, nstcalcenergy=1, niter=4)
    runner = MdRunner(system, params, RunnerConfig(use_dense=True))
    out, logs = runner.run(state, 20)
    jax.block_until_ready(out.x)
    from gromacs_fep_gpu_tpu.md.runner import concat_logs
    log = concat_logs(logs)
    epot = np.asarray(log.epot)
    assert np.isfinite(epot[np.isfinite(epot)]).all()
    # shells stayed near their cores (relaxed, not exploded)
    d = np.asarray(out.x[1::2] - out.x[0::2])
    assert np.abs(d).max() < 0.05, d
    # shell velocities identically zero (massless, never integrated)
    assert float(jnp.abs(out.v[1::2]).max()) == 0.0


def test_shell_ndf_excludes_shells():
    from gromacs_fep_gpu_tpu.md.simulator import degrees_of_freedom
    system = _drude_atom(n_copies=4)
    params = MdParams(nstcomm=0)
    # 8 atoms total, 4 shells -> 12 kinetic dof
    assert degrees_of_freedom(system, params) == 3 * 4


def test_polarization_topfile_parsing(tmp_path):
    from gromacs_fep_gpu_tpu.io.topio import system_from_top
    top_text = """
[ defaults ]
1 2 yes 0.5 0.8333

[ atomtypes ]
CORE 15.0 0.5 A 0.3 0.4
SHELL 0.0 -0.5 S 0.0 0.0

[ moleculetype ]
DRU 2

[ atoms ]
1 CORE 1 DRU C 1 0.5 15.0
2 SHELL 1 DRU S 1 -0.5 0.0

[ polarization ]
; ai aj funct alpha
1 2 1 0.002

[ system ]
drude

[ molecules ]
DRU 3
"""
    system = system_from_top(top_text)
    assert system.shells is not None
    assert system.shells.idx.shape[0] == 3
    k_expect = 0.5 ** 2 * ONE_4PI_EPS0 / 0.002
    np.testing.assert_allclose(np.asarray(system.shells.k), k_expect,
                               rtol=1e-6)
