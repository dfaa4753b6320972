"""Energy-group decomposition tests (reference: mdp energygrps, nbnxm
Egrp kernel flavor -> gmx_grppairener_t)."""
import os

import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.core.types import FepParams
from gromacs_fep_gpu_tpu.ops.forces import (dense_energy,
                                            dense_group_energies, get_beta)


def test_group_energies_sum_to_total():
    """Groups covering every atom: the pair-matrix sums must equal the
    dense oracle's SR totals exactly (same code path, partitioned)."""
    from gromacs_fep_gpu_tpu.core.types import (CoulombType, MdParams)
    from gromacs_fep_gpu_tpu.models.solvation import solvation_system

    system, state = solvation_system(n_side=3, spacing=0.35, seed=2)
    params = MdParams(coulomb=CoulombType.REACTION_FIELD, rcoulomb=0.5,
                      rvdw=0.5, rlist=0.55,
                      fep=FepParams(enabled=True, sc_alpha=0.5,
                                    sc_coul=True))
    lam = state.lam.at[2].set(0.4).at[3].set(0.4)
    beta = get_beta(params)
    terms = dense_energy(state.x, state.box, lam, system, params, beta)
    # ligand = perturbed atoms, solvent = the rest
    pert = np.where(np.asarray(system.perturbed))[0]
    rest = np.where(~np.asarray(system.perturbed).astype(bool))[0]
    ec, el = dense_group_energies(state.x, state.box, lam, system, params,
                                  [pert, rest], beta)
    ec, el = np.asarray(ec), np.asarray(el)
    np.testing.assert_allclose(ec[np.triu_indices(2)].sum(),
                               float(terms.coulomb), rtol=1e-5)
    np.testing.assert_allclose(el[np.triu_indices(2)].sum(),
                               float(terms.lj), rtol=1e-5)
    # the ligand-ligand block of a single methane-like ligand has no
    # intramolecular pairs beyond exclusions -> tiny or zero LJ
    assert abs(el[0, 0]) < abs(el[1, 1])


def test_group_energies_interaction_block():
    """Two argon atoms in different groups: the off-diagonal block is
    exactly the pair LJ energy."""
    from gromacs_fep_gpu_tpu.core.types import (CoulombType, MdParams)
    from gromacs_fep_gpu_tpu.core.topology import build_system
    from gromacs_fep_gpu_tpu.models.argon import argon_moltype
    import numpy as _np

    nbfp = _np.zeros((1, 1, 2), _np.float64)
    nbfp[0, 0] = (4 * 0.98 * 0.34 ** 6, 4 * 0.98 * 0.34 ** 12)
    system = build_system([(argon_moltype(), 2)], jnp.asarray(nbfp))
    params = MdParams(coulomb=CoulombType.CUTOFF, rcoulomb=1.2, rvdw=1.2,
                      rlist=1.25)
    x = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]])
    box = jnp.eye(3) * 3.0
    lam = jnp.zeros(7)
    ec, el = dense_group_energies(x, box, lam, system, params,
                                  [np.asarray([0]), np.asarray([1])])
    c6 = 4 * 0.98 * 0.34 ** 6
    c12 = 4 * 0.98 * 0.34 ** 12
    e_pair = c12 / 0.5 ** 12 - c6 / 0.5 ** 6
    # potential-shift modifier subtracts V(rc)
    e_shift = c12 / 1.2 ** 12 - c6 / 1.2 ** 6
    np.testing.assert_allclose(float(el[0, 1]), e_pair - e_shift,
                               rtol=1e-5)
    assert float(el[0, 0]) == 0.0 and float(el[1, 1]) == 0.0
    assert float(ec[0, 1]) == 0.0


def test_rerun_energygrps_e2e(tmp_path, monkeypatch):
    """grompp energygrps + mdrun -rerun writes the group-pair xvg."""
    from gromacs_fep_gpu_tpu.cli import main
    from gromacs_fep_gpu_tpu.io.xvgio import read_xvg
    from tests.test_cli import MDP, TOP, make_water_gro

    monkeypatch.chdir(tmp_path)
    make_water_gro("conf.gro")
    with open("topol.top", "w") as f:
        f.write(TOP)
    with open("md.mdp", "w") as f:
        f.write(MDP + "\nnstxout = 10\nenergygrps = Water\n")
    with open("index.ndx", "w") as f:
        f.write("[ firstwater ]\n1 2 3\n")
    main(["grompp", "-f", "md.mdp", "-p", "topol.top", "-c", "conf.gro",
          "-n", "index.ndx", "-o", "topol.tpz"])
    main(["mdrun", "-s", "topol.tpz", "-deffnm", "md", "-fep", "cpu"])
    main(["mdrun", "-s", "topol.tpz", "-deffnm", "rr", "-fep", "cpu",
          "-rerun", "md.trr"])
    assert os.path.exists("rr.eg.xvg")
    data, legends = read_xvg("rr.eg.xvg")
    assert "Coul-SR:Water-Water" in legends
    assert "LJ-SR:Water-Water" in legends
    assert np.isfinite(data).all() and data.shape[1] == 3
    # consistency: the single Water-Water block must equal the dense
    # oracle's SR totals on the same frame
    from gromacs_fep_gpu_tpu.cli import _load_tpz
    from gromacs_fep_gpu_tpu.io.trrio import read_trr_frame, scan_trr
    pp, _ = _load_tpz("topol.tpz")
    na, _nf = scan_trr("md.trr")
    fr = read_trr_frame("md.trr", 0, na)
    terms = dense_energy(jnp.asarray(fr["x"]), jnp.asarray(fr["box"]),
                         pp.state.lam, pp.system, pp.params,
                         get_beta(pp.params))
    np.testing.assert_allclose(data[0, 1], float(terms.coulomb),
                               rtol=1e-4)
    np.testing.assert_allclose(data[0, 2], float(terms.lj), rtol=1e-4)
