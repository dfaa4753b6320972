"""L-BFGS / normal-mode / TPI tests (reference: minimize.cpp do_lbfgs
:1978, do_nm :3127; tpi.cpp :163)."""
import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.core.topology import MoleculeType, build_system
from gromacs_fep_gpu_tpu.core.types import CoulombType, MdParams
from gromacs_fep_gpu_tpu.md.minimize import (conjugate_gradient, l_bfgs,
                                             normal_modes, steepest_descent)
from gromacs_fep_gpu_tpu.models.water import water_box
from gromacs_fep_gpu_tpu.ops.cluster_nb import make_cluster_force_fn
from gromacs_fep_gpu_tpu.ops.forces import dense_energy
from gromacs_fep_gpu_tpu.ops.pairlist import build_cluster_pairlist


def _water_force(params, system, x0, box):
    nlist = build_cluster_pairlist(x0, box, system, params.rlist, nnbr=96)
    force_fn = make_cluster_force_fn(system, params, None, has_fep=False)
    return lambda x, b, lam: force_fn(x, b, lam, nlist, None)


def test_lbfgs_minimizes_water_box():
    params = MdParams(rcoulomb=0.55, rvdw=0.55, rlist=0.75,
                      coulomb=CoulombType.REACTION_FIELD)
    system, state = water_box(3, spacing=0.33, seed=5, temperature=300.0)
    # LJ-only: unconstrained point-charge water has -inf Coulomb wells
    # (H fusing onto O of another molecule); any aggressive minimizer
    # correctly falls into them, so test on the smooth LJ landscape
    system = system.replace(charge_a=system.charge_a * 0.0,
                            charge_b=system.charge_b * 0.0)
    rng = np.random.default_rng(9)
    state = state.replace(x=state.x + jnp.asarray(
        rng.uniform(-0.03, 0.03, state.x.shape), jnp.float32))
    lam = jnp.zeros((7,), jnp.float32)
    f3 = _water_force(params, system, state.x, state.box)
    _, t0 = f3(state.x, state.box, lam)
    res = l_bfgs(state.x, state.box, lam, f3, nsteps=150, emtol=50.0)
    assert bool(res.converged)
    assert float(res.fmax) <= 50.0
    assert float(res.epot) < float(t0.epot) - 10.0
    # tight tolerance run keeps descending monotonically
    res2 = l_bfgs(state.x, state.box, lam, f3, nsteps=300, emtol=5.0)
    assert float(res2.epot) <= float(res.epot) + 1e-3


def _dimer_system(k=100000.0, b0=0.12, m=12.011):
    mol = MoleculeType(name="D", types_a=[0, 0], charges_a=[0.0, 0.0],
                       masses_a=[m, m])
    mol.bonds.append(((0, 1), (b0, k)))
    nbfp = np.zeros((1, 1, 2), np.float32)
    return build_system([(mol, 1)], nbfp)


def test_normal_modes_harmonic_dimer():
    """One bond: 5 zero modes + one vibration with eigenvalue 2k/m in
    the mass-weighted Hessian (mu = m/2)."""
    k, b0, m = 100000.0, 0.12, 12.011
    system = _dimer_system(k, b0, m)
    params = MdParams(rcoulomb=0.5, rvdw=0.5, rlist=0.6,
                      coulomb=CoulombType.CUTOFF)
    box = jnp.eye(3, dtype=jnp.float32) * 3.0
    x = jnp.asarray([[1.0, 1.0, 1.0], [1.0 + b0, 1.0, 1.0]], jnp.float32)
    lam = jnp.zeros((7,), jnp.float32)

    def f3(xx, bb, ll):
        f, terms = None, dense_energy(xx, bb, ll, system, params, None, None)
        import jax
        f = -jax.grad(lambda q: dense_energy(q, bb, ll, system, params,
                                             None, None).epot)(xx)
        return f, terms

    evals, freqs, _ = normal_modes(x, box, lam, f3,
                                   jnp.asarray(system.mass_a))
    ev = np.sort(np.asarray(evals))
    # 5 ~zero modes
    np.testing.assert_allclose(ev[:5], 0.0, atol=1e-1)
    # stretch eigenvalue = k_bond * 2 / m (mass-weighted)
    np.testing.assert_allclose(ev[-1], 2.0 * k / m, rtol=1e-3)


def test_tpi_ideal_gas_is_zero():
    """A test particle with no interactions has mu_excess = 0."""
    from gromacs_fep_gpu_tpu.md.tpi import tpi_over_frames
    params = MdParams(rcoulomb=0.55, rvdw=0.55, rlist=0.7,
                      coulomb=CoulombType.CUTOFF)
    system, state = water_box(2, spacing=0.4, seed=1, temperature=300.0)
    T = int(system.nbfp.shape[0])
    nbfp2 = np.zeros((T + 1, T + 1, 2), np.float32)
    nbfp2[:T, :T] = np.asarray(system.nbfp)
    system2 = system.replace(nbfp=jnp.asarray(nbfp2))
    res = tpi_over_frames([state.x], [state.box], system2, params,
                          test_type=T, test_q=0.0, temperature=300.0,
                          n_insert=500, seed=3)
    np.testing.assert_allclose(float(res.mu_excess), 0.0, atol=1e-4)


def test_tpi_repulsive_particle_positive_mu():
    """Inserting an LJ particle into liquid-density water costs free
    energy (mu_excess > 0) and scales sanely with density."""
    from gromacs_fep_gpu_tpu.md.tpi import tpi_over_frames
    params = MdParams(rcoulomb=0.55, rvdw=0.55, rlist=0.7,
                      coulomb=CoulombType.CUTOFF)
    system, state = water_box(3, spacing=0.31, seed=2, temperature=300.0)
    # test particle = water oxygen type (index 0 in the water model)
    res = tpi_over_frames([state.x], [state.box], system, params,
                          test_type=0, test_q=0.0, temperature=300.0,
                          n_insert=3000, seed=4)
    assert float(res.mu_excess) > 1.0


def test_cli_minimize_and_tpi(tmp_path):
    import os
    from gromacs_fep_gpu_tpu.cli import main as cli_main
    from tests.test_cli import MDP, TOP, make_water_gro
    os.chdir(tmp_path)
    make_water_gro("conf.gro")
    with open("topol.top", "w") as f:
        f.write(TOP)
    mdp = MDP.replace("integrator = md", "integrator = l-bfgs").replace(
        "free-energy = yes", "free-energy = no")
    with open("em.mdp", "w") as f:
        f.write(mdp + "emtol = 100\nnsteps = 120\n")
    cli_main(["grompp", "-f", "em.mdp", "-p", "topol.top", "-c", "conf.gro",
              "-o", "em.tpz"])
    cli_main(["mdrun", "-s", "em.tpz", "-deffnm", "em", "-fep", "cpu"])
    assert os.path.exists("em.gro")

    # --- TPI: water box + one extra LJ atom in the topology ---
    top_tpi = TOP.replace("[ system ]", """[ moleculetype ]
TST 1

[ atoms ]
1 OW 1 TST TST 1 0.0 15.9994

[ system ]""").replace("SOL 27", "SOL 27\nTST 1")
    with open("tpi.top", "w") as f:
        f.write(top_tpi)
    # conf needs the extra atom for grompp's count check
    lines = open("conf.gro").readlines()
    n = int(lines[1])
    lines[1] = f"{n + 1}\n"
    lines.insert(-1, f"{28:5d}TST    TST{n + 1:5d}"
                 f"{0.1:8.3f}{0.1:8.3f}{0.1:8.3f}\n")
    with open("conf_tpi.gro", "w") as f:
        f.writelines(lines)
    mdp_tpi = MDP.replace("integrator = md", "integrator = tpi").replace(
        "free-energy = yes", "free-energy = no")
    with open("tpi.mdp", "w") as f:
        f.write(mdp_tpi + "tpi-ninsert = 200\n")
    cli_main(["grompp", "-f", "tpi.mdp", "-p", "tpi.top", "-c",
              "conf_tpi.gro", "-o", "tpi.tpz"])
    # trajectory of the 81 water atoms (from a short md run)
    mdp_md = MDP.replace("free-energy = yes", "free-energy = no")
    with open("md.mdp", "w") as f:
        f.write(mdp_md + "nstxout = 10\n")
    cli_main(["grompp", "-f", "md.mdp", "-p", "topol.top", "-c", "conf.gro",
              "-o", "md.tpz"])
    cli_main(["mdrun", "-s", "md.tpz", "-deffnm", "md", "-fep", "cpu"])
    cli_main(["mdrun", "-s", "tpi.tpz", "-deffnm", "tp", "-fep", "cpu",
              "-rerun", "md.trr"])
    assert os.path.exists("tp.tpi.xvg")
    mu = float(open("tp.tpi.xvg").readlines()[-1])
    assert np.isfinite(mu)


def test_minimize_preserves_constraints(tmp_path, monkeypatch):
    """EM must apply SETTLE to every trial step (minimize.cpp
    do_em_step constr->apply): rigid waters keep their geometry."""
    import os
    from gromacs_fep_gpu_tpu.cli import main as cli_main
    from gromacs_fep_gpu_tpu.io.groio import read_gro
    from tests.test_cli import TOP, make_water_gro

    monkeypatch.chdir(tmp_path)
    make_water_gro("conf.gro")
    with open("topol.top", "w") as f:
        f.write(TOP)
    with open("em.mdp", "w") as f:
        f.write("integrator = steep\nnsteps = 40\nemtol = 10\n"
                "coulombtype = reaction-field\nrcoulomb = 0.55\n"
                "rvdw = 0.55\nrlist = 0.6\n")
    cli_main(["grompp", "-f", "em.mdp", "-p", "topol.top", "-c",
              "conf.gro", "-o", "em.tpz"])
    cli_main(["mdrun", "-s", "em.tpz", "-deffnm", "em", "-fep", "cpu"])
    _, _, x0, _, _ = read_gro("conf.gro")
    _, _, x1, _, _ = read_gro("em.gro")
    assert os.path.exists("em.gro")
    # the structure moved...
    assert np.abs(np.asarray(x1) - np.asarray(x0)).max() > 1e-4
    # ...but every O-H stayed at the SETTLE length 0.09572
    x1 = np.asarray(x1)
    for o in range(0, len(x1), 3):
        for h in (o + 1, o + 2):
            np.testing.assert_allclose(
                np.linalg.norm(x1[h] - x1[o]), 0.09572, atol=2e-3)
