"""Flat LJ wall tests (reference: mdlib/wall.cpp do_walls, readir.cpp
read_wall_params)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gromacs_fep_gpu_tpu.md.walls import (WallParams, parse_walls,
                                          wall_energy)


def _setup(wall_type, density=50.0, r_linpot=-1.0, nwall=1):
    # type 0 = wall pseudo-type, type 1 = the particle
    c6, c12 = 1e-3, 1e-6
    nbfp = np.zeros((2, 2, 2))
    nbfp[0, 1] = nbfp[1, 0] = (c6, c12)
    p = WallParams(nwall=nwall, wall_type=wall_type, atomtype=(0, 0),
                   density=(density, density), r_linpot=r_linpot)
    return jnp.asarray(nbfp), p, c6, c12


def test_wall_93_analytic():
    nbfp, p, c6, c12 = _setup("9-3", density=50.0)
    z = 0.4
    x = jnp.asarray([[1.0, 1.0, z]])
    box = jnp.eye(3) * 3.0
    t = jnp.asarray([1], jnp.int32)
    e = float(wall_energy(x, box, t, t, nbfp, p, 0.0))
    vr = 50.0 * math.pi / 45 * c12 / z**9
    vd = 50.0 * math.pi / 6 * c6 / z**3
    np.testing.assert_allclose(e, vr - vd, rtol=1e-5)
    # force = -dE/dz must match (9 Vr - 3 Vd)/z (wall.cpp:285-286)
    g = jax.grad(lambda xx: wall_energy(xx, box, t, t, nbfp, p, 0.0))(x)
    np.testing.assert_allclose(float(-g[0, 2]), (9 * vr - 3 * vd) / z,
                               rtol=1e-4)


def test_wall_104_and_126_analytic():
    nbfp, p4, c6, c12 = _setup("10-4", density=30.0)
    z = 0.35
    x = jnp.asarray([[0.0, 0.0, z]])
    box = jnp.eye(3) * 3.0
    t = jnp.asarray([1], jnp.int32)
    e4 = float(wall_energy(x, box, t, t, nbfp, p4, 0.0))
    vr = 30.0 * math.pi / 5 * c12 / z**10
    vd = 30.0 * math.pi / 2 * c6 / z**4
    np.testing.assert_allclose(e4, vr - vd, rtol=1e-5)
    nbfp, p6, c6, c12 = _setup("12-6")
    e6 = float(wall_energy(x, box, t, t, nbfp, p6, 0.0))
    np.testing.assert_allclose(e6, c12 / z**12 - c6 / z**6, rtol=1e-5)


def test_wall_two_walls_and_box_dependence():
    nbfp, p, c6, c12 = _setup("9-3", nwall=2)
    box = jnp.eye(3) * 2.0
    t = jnp.asarray([1], jnp.int32)
    # mid-box: symmetric contributions from both walls
    e_mid = float(wall_energy(jnp.asarray([[0.0, 0.0, 1.0]]), box, t, t,
                              nbfp, p, 0.0))
    e_one = float(wall_energy(jnp.asarray([[0.0, 0.0, 1.0]]),
                              jnp.eye(3) * 2.0, t, t, nbfp,
                              WallParams(nwall=1, wall_type="9-3",
                                         atomtype=(0, 0),
                                         density=(50.0, 50.0)), 0.0))
    np.testing.assert_allclose(e_mid, 2 * e_one, rtol=1e-6)
    # upper wall rides box_zz: shrinking the box into the repulsive
    # regime (0.1 nm gap) raises the energy steeply
    e_sm = float(wall_energy(jnp.asarray([[0.0, 0.0, 1.0]]),
                             jnp.eye(3) * 1.1, t, t, nbfp, p, 0.0))
    assert e_sm > e_mid and e_sm > 0


def test_wall_linpot_continuation():
    nbfp, p, _, _ = _setup("9-3", r_linpot=0.3)
    box = jnp.eye(3) * 3.0
    t = jnp.asarray([1], jnp.int32)

    def e_at(z):
        return float(wall_energy(jnp.asarray([[0.0, 0.0, z]]), box, t, t,
                                 nbfp, p, 0.0))
    # below r_linpot the potential is linear: equal slope segments
    e1, e2, e3 = e_at(0.10), e_at(0.15), e_at(0.20)
    np.testing.assert_allclose(e1 - e2, e2 - e3, rtol=1e-4)
    # continuous at the matching point
    np.testing.assert_allclose(e_at(0.3 - 1e-6), e_at(0.3 + 1e-6),
                               rtol=5e-5)     # f32
    # and the gradient inside the linear region equals that slope
    # exactly (wall.cpp V += mr*F semantics)
    g = jax.grad(lambda xx: wall_energy(xx, box, t, t, nbfp, p, 0.0))(
        jnp.asarray([[0.0, 0.0, 0.2]]))
    np.testing.assert_allclose((e3 - e2) / 0.05, float(g[0, 2]),
                               rtol=1e-3)


def test_wall_fep_dvdl():
    # A-state interacts, B-state type has no wall LJ -> dvdl = -V_A
    c6, c12 = 1e-3, 1e-6
    nbfp = np.zeros((3, 3, 2))
    nbfp[0, 1] = nbfp[1, 0] = (c6, c12)      # type 2 = B state, zero
    p = WallParams(nwall=1, wall_type="9-3", atomtype=(0,),
                   density=(50.0,))
    box = jnp.eye(3) * 3.0
    ta = jnp.asarray([1], jnp.int32)
    tb = jnp.asarray([2], jnp.int32)
    x = jnp.asarray([[0.0, 0.0, 0.5]])
    e_a = wall_energy(x, box, ta, ta, jnp.asarray(nbfp), p, 0.0)
    for lam in (0.0, 0.37, 1.0):
        e = wall_energy(x, box, ta, tb, jnp.asarray(nbfp), p, lam)
        np.testing.assert_allclose(float(e), (1 - lam) * float(e_a),
                                   rtol=1e-5)
        dvdl = jax.grad(wall_energy, argnums=6)(
            x, box, ta, tb, jnp.asarray(nbfp), p, jnp.asarray(lam))
        np.testing.assert_allclose(float(dvdl), -float(e_a), rtol=1e-5)


def test_parse_walls_and_validation():
    tindex = {"WALL": 0, "OW": 1}
    kv = {"nwall": "2", "wall-type": "10-4",
          "wall-atomtype": "WALL WALL", "wall-density": "30 40",
          "wall-r-linpot": "0.2"}
    p = parse_walls(kv, tindex)
    assert p.nwall == 2 and p.wall_type == "10-4"
    assert p.atomtype == (0, 0) and p.density == (30.0, 40.0)
    assert p.r_linpot == 0.2
    assert parse_walls({"nwall": "0"}, tindex) is None
    with pytest.raises(ValueError):
        parse_walls({"nwall": "1", "wall-atomtype": "XX",
                     "wall-density": "30"}, tindex)
    with pytest.raises(ValueError):
        parse_walls({"nwall": "1", "wall-atomtype": "WALL"}, tindex)
    with pytest.raises(ValueError):
        parse_walls({"nwall": "3", "wall-atomtype": "WALL WALL WALL"},
                    tindex)


def test_wall_mdrun_end_to_end(tmp_path, monkeypatch):
    """grompp wall keys -> mdrun: a bouncing particle stays above the
    wall and total energy is conserved (NVE) to integration accuracy."""
    from gromacs_fep_gpu_tpu.cli import main as cli_main
    from gromacs_fep_gpu_tpu.io.groio import write_gro

    monkeypatch.chdir(tmp_path)
    top = """
[ defaults ]
1 2 yes 0.5 0.8333

[ atomtypes ]
WALL 10.0 0.0 A 0.3 1.0
AR 39.948 0.0 A 0.34 0.98

[ moleculetype ]
AR 1

[ atoms ]
1 AR 1 AR AR 1 0.0 39.948

[ system ]
argon on a wall

[ molecules ]
AR 2
"""
    mdp = """
integrator = md
dt = 0.001
nsteps = 200
nstlist = 10
rlist = 0.9
rcoulomb = 0.8
rvdw = 0.8
coulombtype = reaction-field
nstcomm = 0
nstcalcenergy = 1
nwall = 2
wall-type = 9-3
wall-atomtype = WALL WALL
wall-density = 40 40
wall-r-linpot = 0.05
"""
    with open("topol.top", "w") as f:
        f.write(top)
    with open("md.mdp", "w") as f:
        f.write(mdp)
    x = np.asarray([[1.0, 1.0, 0.8], [1.0, 1.4, 1.2]], np.float32)
    v = np.asarray([[0.0, 0.0, -0.4], [0.0, 0.0, 0.3]], np.float32)
    write_gro("conf.gro", "ar2", ["AR", "AR"], ["AR", "AR"], x, v,
              np.diag([2.0, 2.0, 2.0]).astype(np.float32))
    cli_main(["grompp", "-f", "md.mdp", "-p", "topol.top", "-c",
              "conf.gro", "-o", "topol.tpz"])
    cli_main(["mdrun", "-s", "topol.tpz", "-deffnm", "wl", "-fep", "cpu"])
    from gromacs_fep_gpu_tpu.analysis.energy import read_ener_csv
    names, data = read_ener_csv("wl.ener.csv")
    etot = (data[:, names.index("epot")] + data[:, names.index("ekin")])
    assert np.isfinite(etot).all()
    # bouncing off soft walls in NVE: drift stays small
    assert abs(etot[-1] - etot[0]) < 0.02 * max(abs(etot[0]), 1.0) + 0.05
    from gromacs_fep_gpu_tpu.io.groio import read_gro
    _, _, xf, _, _ = read_gro("wl.gro")
    assert (xf[:, 2] > 0.0).all() and (xf[:, 2] < 2.0).all()
