"""GROMACS .tpr reader tests against the reference's own test files
(reference: fileio/tpxio.cpp do_tpxheader/do_mtop/do_tpx_state_*)."""
import numpy as np
import pytest

from gromacs_fep_gpu_tpu.io.tprio import read_tpr, tpr_to_system

DHDL = "/root/reference/src/gromacs/energyanalysis/tests/dhdl.tpr"
ORIRES = "/root/reference/src/gromacs/energyanalysis/tests/orires.tpr"
CLUST = "/root/reference/src/gromacs/trajectoryanalysis/tests/clustsize.tpr"


def test_read_dhdl_tpr_fep_system():
    """Double-precision v110 FEP tpr: methane in water."""
    t = read_tpr(DHDL)
    assert t.version == 110 and t.precision == 8
    assert t.system_name == "Methane in water"
    assert t.natoms == 1793
    assert [(m.name, len(m.m)) for m in t.moltypes] == [("Methane", 5),
                                                        ("SOL", 3)]
    assert t.molblocks == [(0, 1), (1, 596)]
    assert t.x.shape == (1793, 3) and t.v.shape == (1793, 3)
    # truncated octahedron
    box = t.box
    assert abs(box[2, 0] - box[0, 0] / 2) < 1e-6

    system, x, v, box = tpr_to_system(t)
    assert system.n_atoms == 1793
    assert int(np.asarray(system.perturbed).sum()) == 5   # methane CH4
    assert system.settle.atoms.shape[0] == 596
    assert system.lincs.atoms.shape[0] == 4
    # TIP3P-like oxygen LJ from the ffparams pair table
    nbfp = np.asarray(system.nbfp)
    assert (nbfp > 0).any()
    q = np.asarray(system.charge_a)
    np.testing.assert_allclose(sorted(set(q.round(4))), [-0.834, 0.0, 0.417])


def test_read_protein_tpr_bonded_terms():
    """Single-precision v111 protein with a full bonded set."""
    t = read_tpr(ORIRES)
    system, x, v, box = tpr_to_system(t)
    assert system.n_atoms == 1007
    counts = {k: v.n for k, v in system.bonded.items()}
    assert counts["bonds"] == 547
    assert counts["ub"] == 1855          # CHARMM Urey-Bradley angles
    assert counts["pdihs"] == 2356
    assert counts["idihs"] == 170
    assert system.pairs14.n == 2653
    assert system.lincs.atoms.shape[0] == 484


def test_dense_energy_matches_bruteforce_lj():
    """The converted system's LJ energy on the triclinic box equals an
    exact 27-image brute-force minimum-image sum."""
    import jax.numpy as jnp
    from gromacs_fep_gpu_tpu.core.types import CoulombType, MdParams
    from gromacs_fep_gpu_tpu.ops.forces import dense_energy

    t = read_tpr(CLUST)
    system, x, v, box = tpr_to_system(t)
    params = MdParams(coulomb=CoulombType.CUTOFF, rcoulomb=0.85,
                      rvdw=0.85, rlist=0.9)
    lam = jnp.zeros((7,), jnp.float32)
    terms = dense_energy(jnp.asarray(x, jnp.float32),
                         jnp.asarray(box, jnp.float32), lam, system,
                         params, None, None)
    nbfp = np.asarray(system.nbfp)
    ty = np.asarray(system.type_a)
    xs = np.asarray(x)
    b = np.asarray(box)
    shifts = np.array([i * b[0] + j * b[1] + k * b[2]
                       for i in (-1, 0, 1) for j in (-1, 0, 1)
                       for k in (-1, 0, 1)])
    excl = np.asarray(system.exclusions.idx)
    rc = 0.85
    rcin6 = 1.0 / rc ** 6
    e = 0.0
    n = xs.shape[0]
    for i in range(n):
        ex = set(int(j) for j in excl[i] if j >= 0)
        for j in range(i + 1, n):
            if j in ex:
                continue
            r2 = ((xs[i] - xs[j] + shifts) ** 2).sum(1).min()
            if r2 < rc * rc:
                c6, c12 = nbfp[ty[i], ty[j]]
                inv6 = 1.0 / r2 ** 3
                e += (c12 * inv6 * inv6 - c6 * inv6
                      - (c12 * rcin6 * rcin6 - c6 * rcin6))
    np.testing.assert_allclose(float(terms.lj), e, rtol=1e-4)


def test_cli_check_and_mdrun_from_tpr(tmp_path):
    import os
    from gromacs_fep_gpu_tpu.cli import main as cli_main
    os.chdir(tmp_path)
    cli_main(["check", "-s", CLUST])
    with open("md.mdp", "w") as f:
        f.write("""integrator = md
dt = 0.001
nsteps = 10
nstlist = 5
coulombtype = reaction-field
rcoulomb = 0.85
rvdw = 0.85
rlist = 0.9
tcoupl = v-rescale
ref-t = 300
tau-t = 0.5
nstcomm = 0
""")
    cli_main(["mdrun", "-s", CLUST, "-mdp", "md.mdp", "-deffnm", "tp",
              "-fep", "cpu"])
    e = np.loadtxt("tp.ener.csv")
    assert np.isfinite(e).all()
