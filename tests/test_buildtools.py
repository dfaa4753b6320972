"""ndx index files + solvate/insert-molecules/genion tests
(reference: topology/index.cpp, gmxpreprocess/solvate.cpp,
insert-molecules.cpp, genion.cpp)."""
import numpy as np
import pytest

from gromacs_fep_gpu_tpu.io.buildtools import (genion, insert_molecules,
                                               solvate)
from gromacs_fep_gpu_tpu.io.ndxio import (default_groups, read_ndx,
                                          resolve_group, write_ndx)


def test_ndx_roundtrip(tmp_path):
    p = str(tmp_path / "index.ndx")
    groups = {"System": np.arange(20), "Ligand": np.asarray([0, 3, 7]),
              "Water": np.arange(3, 20)}
    write_ndx(p, groups)
    back = read_ndx(p)
    assert set(back) == set(groups)
    for k in groups:
        np.testing.assert_array_equal(back[k], groups[k])
    # file is 1-based
    txt = open(p).read()
    assert "[ Ligand ]" in txt and " 1 " in txt.replace("\n", " ")


def test_ndx_resolve_and_defaults():
    names = ["C1", "OW", "HW1", "HW2", "OW", "HW1", "HW2"]
    res = ["LIG", "SOL", "SOL", "SOL", "SOL", "SOL", "SOL"]
    g = default_groups(names, res)
    np.testing.assert_array_equal(g["Water"], [1, 2, 3, 4, 5, 6])
    np.testing.assert_array_equal(g["non-Water"], [0])
    np.testing.assert_array_equal(resolve_group("Water", g, 7),
                                  [1, 2, 3, 4, 5, 6])
    np.testing.assert_array_equal(resolve_group("1 3 5", g, 7), [0, 2, 4])
    with pytest.raises(ValueError):
        resolve_group("Protein", g, 7)
    with pytest.raises(ValueError):
        resolve_group("99", g, 7)


def test_solvate_density_and_shell():
    box = np.eye(3) * 2.48                  # 8^3 cells at 0.31 nm
    solute = np.asarray([[1.24, 1.24, 1.24]])
    xw, n = solvate(solute, box, spacing=0.31, shell=0.5)
    assert xw.shape == (3 * n, 3)
    # roughly bulk water density minus the carved shell
    vol = 2.48 ** 3
    v_shell = 4 / 3 * np.pi * 0.5 ** 3
    expect = (vol - v_shell) / 0.31 ** 3
    assert abs(n - expect) / expect < 0.15
    # no O within the shell
    d = np.linalg.norm(xw[::3] - solute[0], axis=1)
    assert d.min() >= 0.5
    # O-H bond geometry preserved
    doh = np.linalg.norm(xw[1::3] - xw[0::3], axis=1)
    np.testing.assert_allclose(doh, doh[0], rtol=1e-5)


def test_insert_molecules_overlap_rejection():
    box = np.eye(3) * 3.0
    mol = np.asarray([[0.0, 0.0, 0.0], [0.15, 0.0, 0.0]])
    existing = np.asarray([[1.5, 1.5, 1.5]])
    x_ins, n = insert_molecules(existing, box, mol, 20, radius=0.15,
                                seed=3)
    assert n == 20 and x_ins.shape == (40, 3)
    pool = np.concatenate([existing, x_ins])
    d = pool[:, None, :] - pool[None, :, :]
    d -= 3.0 * np.round(d / 3.0)
    r = np.sqrt((d * d).sum(-1))
    np.fill_diagonal(r, np.inf)
    # intra-molecular bond (0.15) allowed; inter-atom floor 2*radius,
    # except the bonded pairs
    bonded = np.zeros_like(r, bool)
    for i in range(1, len(pool) - 1, 2):
        bonded[i, i + 1] = bonded[i + 1, i] = True
    assert r[~bonded].min() >= 2 * 0.15 - 1e-6


def test_insert_molecules_gives_up_when_full():
    box = np.eye(3) * 0.5
    mol = np.zeros((1, 3))
    _, n = insert_molecules(None, box, mol, 50, radius=0.2, ntries=50,
                            seed=1)
    assert 0 < n < 50                      # box can't fit 50 at r=0.2


def test_grompp_ndx_pull_group_names():
    """pull-groupN-name resolved against an index file end to end
    (reference: readir.cpp do_index path for grompp -n)."""
    from gromacs_fep_gpu_tpu.io.grompp import preprocess_arrays

    top = """
[ defaults ]
1 2 yes 0.5 0.8333

[ atomtypes ]
AR 39.948 0.0 A 0.34 0.98

[ moleculetype ]
AR 1

[ atoms ]
1 AR 1 AR AR 1 0.0 39.948

[ system ]
argon

[ molecules ]
AR 4
"""
    mdp = """
integrator = md
dt = 0.002
nsteps = 2
coulombtype = reaction-field
rcoulomb = 0.55
rvdw = 0.55
rlist = 0.6
nstcomm = 0
pull = yes
pull-ngroups = 2
pull-ncoords = 1
pull-group1-name = left
pull-group2-name = right
pull-coord1-groups = 1 2
pull-coord1-type = umbrella
pull-coord1-k = 1000
pull-coord1-init = 0.5
"""
    ndx = "[ left ]\n1 2\n[ right ]\n3 4\n"
    x = np.asarray([[0.2, 0.5, 0.5], [0.4, 0.5, 0.5],
                    [0.8, 0.5, 0.5], [1.0, 0.5, 0.5]], np.float32)
    box = np.eye(3, dtype=np.float32) * 1.5
    names = ["AR"] * 4
    res = ["AR"] * 4
    pp = preprocess_arrays(mdp, top, names, res, x, None, box,
                           ndx_text=ndx)
    (coord,) = pp.params.pull
    assert tuple(coord.group0) == (0, 1)
    assert tuple(coord.group1) == (2, 3)
    # without the ndx the same mdp must fail loudly
    with pytest.raises(ValueError):
        preprocess_arrays(mdp, top, names, res, x, None, box)


def test_genion_neutralizes():
    o_idx = np.arange(0, 300, 3)
    charges = np.zeros(300)
    charges[0] = -3.0                      # net -3 solute
    pos, neg = genion(o_idx, None, charges, neutralize=True, seed=5)
    assert len(pos) == 3 and len(neg) == 0
    assert set(pos).issubset(set(o_idx))
    pos2, neg2 = genion(o_idx, None, charges, n_positive=1,
                        n_negative=2, neutralize=True, seed=5)
    # net = -3 + 1 - 2 = -4 -> +4 more cations
    assert len(pos2) == 5 and len(neg2) == 2
    with pytest.raises(ValueError):
        genion(o_idx[:2], None, charges, n_positive=5)