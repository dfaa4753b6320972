"""Topology (.top) parser tests against a hand-checkable system."""
import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.core.types import CoulombType, MdParams
from gromacs_fep_gpu_tpu.io.topio import parse_top, system_from_top
from gromacs_fep_gpu_tpu.ops.forces import dense_energy

TOP = """
[ defaults ]
; nbfunc comb-rule gen-pairs fudgeLJ fudgeQQ
1 2 yes 0.5 0.8333

[ atomtypes ]
; name mass charge ptype sigma epsilon
OW   15.9994  -0.834 A 0.315061 0.636386
HW    1.008    0.417 A 0.0      0.0
CM   12.011   -0.4   A 0.35     0.45

[ moleculetype ]
SOL 2

[ atoms ]
1 OW 1 SOL OW 1 -0.834 15.9994
2 HW 1 SOL HW1 1 0.417 1.008
3 HW 1 SOL HW2 1 0.417 1.008

[ settles ]
1 1 0.09572 0.15139

[ exclusions ]
1 2 3
2 3

[ moleculetype ]
LIG 3

[ atoms ]
; with B state: decouple charge
1 CM 1 LIG C1 1 -0.2 12.011 CM 0.0 12.011
2 CM 1 LIG C2 1  0.2 12.011 CM 0.0 12.011

[ bonds ]
1 2 1 0.15 1000.0

[ system ]
test

[ molecules ]
LIG 1
SOL 2
"""


def test_parse_and_build():
    parsed = parse_top(TOP)
    assert parsed.fudge_qq == 0.8333
    assert parsed.comb_rule == 2
    assert set(parsed.moltypes) == {"SOL", "LIG"}
    sol = parsed.moltypes["SOL"]
    assert sol.settle is not None and abs(sol.settle[3] - 0.09572) < 1e-9

    system = system_from_top(TOP)
    assert system.n_atoms == 2 + 6
    q = np.asarray(system.charge_a)
    np.testing.assert_allclose(q[:2], [-0.2, 0.2])
    np.testing.assert_allclose(q[2:5], [-0.834, 0.417, 0.417])
    # B state decouples the ligand charges
    qb = np.asarray(system.charge_b)
    np.testing.assert_allclose(qb[:2], [0.0, 0.0])
    assert bool(np.asarray(system.perturbed)[:2].all())
    assert not bool(np.asarray(system.perturbed)[2:].any())
    # LJ table: OW sigma/eps via LB rule on the diagonal
    nbfp = np.asarray(system.nbfp)
    c6_ow = 4 * 0.636386 * 0.315061**6
    np.testing.assert_allclose(nbfp[0, 0, 0], c6_ow, rtol=1e-5)

    # energy evaluates finite
    params = MdParams(rcoulomb=0.7, rvdw=0.7,
                      coulomb=CoulombType.REACTION_FIELD)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(0.2, 1.8, (8, 3)), jnp.float32)
    terms = dense_energy(x, jnp.eye(3) * 2.0, jnp.zeros(7), system, params)
    assert np.isfinite(float(terms.epot))


def test_couple_moltype_decouples_lj_too():
    system = system_from_top(TOP, couple_moltype="LIG")
    nbfp = np.asarray(system.nbfp)
    tb = np.asarray(system.type_b)[:2]
    # B types point at the dummy row with zero LJ
    assert (nbfp[tb][:, :, 0] == 0).all()
