"""pdb2gmx-lite tests: protein topology generation from force-field
residue databases (reference: gmxpreprocess/pdb2gmx.cpp + pdb2top.cpp +
gen_ad.cpp), validated against the reference's shipped
amber99sb-ildn.ff databases end-to-end through grompp + the dense
force oracle."""
import os

import numpy as np
import pytest

from gromacs_fep_gpu_tpu.io.pdb2top import (Pdb2TopError, _his_block,
                                            build_protein_top,
                                            load_forcefield, parse_rtp,
                                            write_top)

FF_TOP = "/root/reference/share/top"
FF_DIR = os.path.join(FF_TOP, "amber99sb-ildn.ff")

needs_ff = pytest.mark.skipif(not os.path.isdir(FF_DIR),
                              reason="reference share/top not present")


def _diala_names():
    """Atom name/resname/resid arrays of an H-complete zwitterionic
    Ala-Ala, in the force field's own rtp order."""
    _, residues = parse_rtp(open(os.path.join(FF_DIR,
                                              "aminoacids.rtp")).read())
    names, resnames, resids = [], [], []
    for rid, block in ((1, "NALA"), (2, "CALA")):
        for (anm, _t, _q, _cg) in residues[block].atoms:
            names.append(anm)
            resnames.append("ALA")
            resids.append(rid)
    return names, resnames, resids


@needs_ff
def test_rtp_parse_and_his():
    bt, residues = parse_rtp(open(os.path.join(FF_DIR,
                                               "aminoacids.rtp")).read())
    # amber99sb-ildn [ bondedtypes ]: 1 1 9 4  1 3 1 0
    assert (bt.bonds, bt.angles, bt.dihedrals, bt.impropers) == (1, 1, 9, 4)
    assert (bt.all_dihedrals, bt.nrexcl, bt.hh14, bt.remove_dih) == (1, 3, 1, 0)
    assert {"ALA", "NALA", "CALA", "HID", "HIE", "HIP"} <= set(residues)
    ala = residues["ALA"]
    assert [a[0] for a in ala.atoms] == [
        "N", "H", "CA", "HA", "CB", "HB1", "HB2", "HB3", "C", "O"]
    # backbone link: -C N across residues
    assert ("-C", "N") in ala.bonds or ("N", "-C") in ala.bonds
    # HIS protonation state from hydrogens present (pdb2gmx.cpp)
    assert _his_block(["HD1", "HE2", "CA"]) == "HIP"
    assert _his_block(["HD1", "CA"]) == "HID"
    assert _his_block(["HE2", "CA"]) == "HIE"


@needs_ff
def test_build_diala_topology():
    names, resnames, resids = _diala_names()
    top = build_protein_top(names, resnames, resids, FF_DIR)
    # 13 (NALA) + 10 (CALA) atoms; a linear peptide is acyclic: n-1 bonds
    assert len(top["atoms"]) == 23
    assert len(top["bonds"]) == 22
    assert top["blocks"] == ["NALA", "CALA"]
    # zwitterion: NH3+ and COO- cancel
    assert abs(sum(a[4] for a in top["atoms"])) < 1e-9
    # every angle is a bonded triple, every pair is a 1-4 partner of
    # some dihedral and not 1-2/1-3
    bonds = set(top["bonds"])
    for (i, j, k) in top["angles"]:
        assert (min(i, j), max(i, j)) in bonds
        assert (min(j, k), max(j, k)) in bonds
    e13 = {(min(a, c), max(a, c)) for (a, _b, c) in top["angles"]}
    quads = {(min(i, l), max(i, l)) for (i, _j, _k, l) in top["dihedrals"]}
    for p in top["pairs"]:
        assert p in quads and p not in bonds and p not in e13
    # CA chirality impropers + peptide-bond impropers come from the rtp
    assert len(top["impropers"]) == 3


@needs_ff
def test_reorders_shuffled_atoms():
    names, resnames, resids = _diala_names()
    rng = np.random.RandomState(7)
    perm = rng.permutation(len(names))
    sh_names = [names[i] for i in perm]
    sh_res = [resnames[i] for i in perm]
    sh_rid = [resids[i] for i in perm]
    # grouping requires residues contiguous; shuffle only within residues
    order = np.argsort(sh_rid, kind="stable")
    sh_names = [sh_names[i] for i in order]
    sh_rid = [sh_rid[i] for i in order]
    sh_res = [sh_res[i] for i in order]
    src = perm[order]
    top = build_protein_top(sh_names, sh_res, sh_rid, FF_DIR)
    # order maps output rows back to input indices; undoing both
    # permutations must give the canonical rtp order — except the two
    # chemically equivalent C-terminal oxygens, which the reference's
    # own xlateat.dat → .arn chain deliberately swaps (OC1→O→OC2; see
    # the comment block in amber99sb-ildn.ff/aminoacids.arn:28-31)
    restored = [int(src[i]) for i in top["order"]]
    i_oc1 = names.index("OC1")
    i_oc2 = names.index("OC2")
    expect = list(range(len(names)))
    expect[i_oc1], expect[i_oc2] = expect[i_oc2], expect[i_oc1]
    assert restored == expect


@needs_ff
def test_missing_hydrogen_fails_clearly():
    names, resnames, resids = _diala_names()
    i = names.index("HB2")
    del names[i], resnames[i], resids[i]
    with pytest.raises(Pdb2TopError, match="HB2"):
        build_protein_top(names, resnames, resids, FF_DIR)


@needs_ff
def test_his_and_r2b_block_choice():
    """A lone HIE (with HE2, no HD1) resolves through r2b + HIS logic."""
    _, residues, *_ = load_forcefield(FF_DIR)
    atoms = [a[0] for a in residues["HIE"].atoms]
    top = build_protein_top(atoms, ["HIS"] * len(atoms),
                            [1] * len(atoms), FF_DIR)
    assert top["blocks"] == ["HIE"]  # single residue: no terminal blocks


@needs_ff
def test_multi_term_funct9_dihedrals_expand():
    """The ff99sb backbone correction has 2-4 lines per dihedraltype
    key (e.g. N-CT-C-N); parameterless funct-9 lines must expand to one
    interaction per line (toppush.cpp push_bond bAllowRepeat)."""
    from gromacs_fep_gpu_tpu.io.topio import parse_top
    names, resnames, resids = _diala_names()
    top = build_protein_top(names, resnames, resids, FF_DIR)
    text = write_top(top, "amber99sb-ildn.ff/forcefield.itp")
    parsed = parse_top(text, include_dirs=[FF_TOP])
    mol = parsed.moltypes["Protein"]
    quads = {tuple(r[0]) for r in mol.pdihs}
    # more stored terms than distinct quadruples = multi-term expansion
    assert len(mol.pdihs) > len(quads)
    # the ff99sb phi C-N-CT-C dihedral carries exactly 2 terms
    # (ffbonded.itp "new for 99sb" block)
    by_res = {(a[1], a[3]): k for k, a in enumerate(top["atoms"])}
    phi = (by_res[(1, "C")], by_res[(2, "N")], by_res[(2, "CA")],
           by_res[(2, "C")])
    n_terms = sum(1 for r in mol.pdihs
                  if tuple(r[0]) in (phi, phi[::-1]))
    assert n_terms == 2


@needs_ff
def test_hdb_builds_missing_hydrogens():
    """Heavy-atom-only di-alanine gets every rtp hydrogen (and the
    C-terminal OC1/OC2 pair is completed) from the .hdb geometry
    database at ~0.1 nm from its attachment atom
    (reference: genhydro.cpp add_h + calch.cpp calc_h_pos)."""
    from gromacs_fep_gpu_tpu.io.pdb2top import add_missing_atoms

    names, resnames, resids = _diala_names()
    x = _spiral_coords(len(names))
    # minimize first so the heavy-atom geometry is physical enough for
    # the H constructions (hdb geometry needs sane frames); crude SD on
    # the full system then strip hydrogens
    heavy = [i for i, n in enumerate(names) if not n.startswith("H")]
    h_names = [names[i] for i in heavy]
    h_res = [resnames[i] for i in heavy]
    h_rid = [resids[i] for i in heavy]
    h_x = x[heavy]
    out = add_missing_atoms(h_names, h_res, h_rid, h_x, FF_DIR)
    n2, rn2, rid2, x2, n_added = out
    assert n_added == len(names) - len(heavy)
    # the completed structure builds the full topology
    top = build_protein_top(n2, rn2, rid2, FF_DIR)
    assert len(top["atoms"]) == 23
    # geometric check: every bond to a built H must be ~0.1 nm long
    # (calch.cpp distH = 0.1; every H here is built)
    xo = np.asarray(x2)[top["order"]]
    hnames = [top["atoms"][i][3] for i in range(len(top["atoms"]))]
    for (a, b) in top["bonds"]:
        if hnames[a].startswith("H") or hnames[b].startswith("H"):
            d = np.linalg.norm(xo[a] - xo[b])
            assert 0.05 < d < 0.15, (hnames[a], hnames[b], d)


@needs_ff
def test_ignh_regenerates_hydrogens():
    from gromacs_fep_gpu_tpu.io.pdb2top import add_missing_atoms

    names, resnames, resids = _diala_names()
    x = _spiral_coords(len(names))
    # corrupt one H position badly, then -ignh must rebuild all H
    names2 = list(names)
    out = add_missing_atoms(names2, resnames, resids, x, FF_DIR,
                            ignh=True)
    n2, rn2, rid2, x2, n_added = out
    n_h = sum(1 for n in names if n.startswith("H"))
    assert n_added == n_h
    top = build_protein_top(n2, rn2, rid2, FF_DIR)
    assert len(top["atoms"]) == 23


def _spiral_coords(n):
    """Deterministic self-avoiding layout: finite energies guaranteed
    (no coincident atoms), physics-free."""
    t = np.arange(n, dtype=np.float64)
    return np.stack([0.11 * t, 0.3 * np.sin(0.9 * t),
                     0.3 * np.cos(0.9 * t)], axis=1) + 2.0


@needs_ff
def test_cli_pdb2gmx_grompp_minimize(tmp_path):
    """pdb → pdb2gmx → grompp → dense-oracle minimization, end to end."""
    from gromacs_fep_gpu_tpu.cli import main
    from gromacs_fep_gpu_tpu.io.grompp import preprocess
    from gromacs_fep_gpu_tpu.io.pdbio import write_pdb
    from gromacs_fep_gpu_tpu.md.minimize import steepest_descent
    from gromacs_fep_gpu_tpu.ops.forces import make_dense_force_fn

    names, resnames, resids = _diala_names()
    x = _spiral_coords(len(names))
    box = np.diag([8.0, 8.0, 8.0])
    pdb = os.path.join(tmp_path, "in.pdb")
    write_pdb(pdb, "diala", names, resnames, x, box, resids=resids)
    gro = os.path.join(tmp_path, "conf.gro")
    topf = os.path.join(tmp_path, "topol.top")
    main(["pdb2gmx", "-f", pdb, "-ff", "amber99sb-ildn",
          "-ffdir", FF_TOP, "-o", gro, "-p", topf])
    assert os.path.exists(gro) and os.path.exists(topf)

    mdp = ("integrator = steep\nnsteps = 60\ncoulombtype = cutoff\n"
           "rcoulomb = 2.0\nrvdw = 2.0\nrlist = 2.0\n")
    pre = preprocess(mdp, open(topf).read(), gro, include_dirs=[FF_TOP])
    assert pre.system.n_atoms == len(names)
    force_fn = make_dense_force_fn(pre.system, pre.params)
    lam = pre.state.lam

    def epot(xx):
        _f, terms = force_fn(xx, pre.state.box, lam)
        return float(terms.epot)

    e0 = epot(pre.state.x)
    assert np.isfinite(e0)
    res = steepest_descent(pre.state.x, pre.state.box, lam, force_fn,
                           nsteps=60)
    e1 = epot(res.x)
    assert np.isfinite(e1) and e1 < e0
