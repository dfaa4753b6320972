"""Distance-restraint tests (reference: listed_forces/disre.cpp)."""
import jax
import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.core.types import InteractionList
from gromacs_fep_gpu_tpu.ops.bonded import disres_energy

BOX = jnp.eye(3, dtype=jnp.float32) * 10.0
LAM = jnp.zeros(())


def _il(rows):
    """rows: (ai, aj, lo, up1, up2, w, label)"""
    atoms = np.array([[r[0], r[1]] for r in rows], np.int32)
    p = np.array([r[2:] for r in rows], np.float32)
    return InteractionList(atoms=jnp.asarray(atoms), params_a=jnp.asarray(p),
                           params_b=jnp.asarray(p),
                           mask=jnp.ones((len(rows),), jnp.float32))


def _x(*dists):
    """Atom pairs (2i, 2i+1) separated by dists[i] along x."""
    x = np.zeros((2 * len(dists), 3), np.float32)
    for i, d in enumerate(dists):
        x[2 * i] = [1.0 + i, 1.0, 1.0]
        x[2 * i + 1] = [1.0 + i + d, 1.0, 1.0]
    return jnp.asarray(x)


def test_flat_bottom_regions():
    fc = 800.0
    il = _il([(0, 1, 0.2, 0.3, 0.4, 1.0, 0)])
    # inside [lo, up1]: zero
    assert float(disres_energy(_x(0.25), BOX, il, LAM, fc)) == 0.0
    # below lo: harmonic in (r - lo)
    e = float(disres_energy(_x(0.15), BOX, il, LAM, fc))
    np.testing.assert_allclose(e, 0.5 * fc * 0.05 ** 2, rtol=1e-4)
    # between up1 and up2: harmonic in (r - up1)
    e = float(disres_energy(_x(0.35), BOX, il, LAM, fc))
    np.testing.assert_allclose(e, 0.5 * fc * 0.05 ** 2, rtol=1e-4)
    # beyond up2: linear with slope fc*(up2-up1), continuous at up2
    e2 = float(disres_energy(_x(0.4), BOX, il, LAM, fc))
    e3 = float(disres_energy(_x(0.5), BOX, il, LAM, fc))
    np.testing.assert_allclose(e3 - e2, fc * 0.1 * 0.1, rtol=1e-3)


def test_r3_averaging_over_label():
    """Two pairs sharing a label restrain the r^-3 average, not each
    distance (disre.cpp ta_disres Rav)."""
    fc = 500.0
    il = _il([(0, 1, 0.1, 0.2, 0.5, 1.0, 0),
              (2, 3, 0.1, 0.2, 0.5, 1.0, 0)])
    r1, r2 = 0.25, 0.35
    rav = ((r1 ** -3 + r2 ** -3) / 2.0) ** (-1.0 / 3.0)
    e = float(disres_energy(_x(r1, r2), BOX, il, LAM, fc))
    np.testing.assert_allclose(e, 0.5 * fc * (rav - 0.2) ** 2, rtol=1e-4)
    # a second independent label adds its own violation
    il2 = _il([(0, 1, 0.1, 0.2, 0.5, 1.0, 0),
               (2, 3, 0.1, 0.2, 0.5, 1.0, 1)])
    e2 = float(disres_energy(_x(r1, r2), BOX, il2, LAM, fc))
    np.testing.assert_allclose(
        e2, 0.5 * fc * ((r1 - 0.2) ** 2 + (r2 - 0.2) ** 2), rtol=1e-4)


def test_conservative_force_is_gradient():
    fc = 500.0
    il = _il([(0, 1, 0.1, 0.2, 0.5, 1.0, 0),
              (2, 3, 0.1, 0.2, 0.5, 2.0, 0)])
    x0 = _x(0.27, 0.33) + jnp.asarray(
        np.random.default_rng(0).normal(0, 0.01, (4, 3)), jnp.float32)
    e_fn = lambda xx: disres_energy(xx, BOX, il, LAM, fc)
    g = np.asarray(jax.grad(e_fn)(x0))
    eps = 1e-3
    for (i, d) in [(0, 0), (1, 1), (3, 0)]:
        fd = (float(e_fn(x0.at[i, d].add(eps)))
              - float(e_fn(x0.at[i, d].add(-eps)))) / (2 * eps)
        np.testing.assert_allclose(g[i, d], fd, rtol=5e-2, atol=1e-3)


DISRE_TOP = """
[ defaults ]
1 2 yes 0.5 0.8333

[ atomtypes ]
CX  CX  6  12.011  0.0  A  0.35  0.3

[ bondtypes ]
CX CX 1 0.15 200000.0

[ moleculetype ]
DIM 1

[ atoms ]
1 CX 1 DIM C1 1 0.0 12.011
2 CX 1 DIM C2 2 0.0 12.011
3 CX 1 DIM C3 3 0.0 12.011

[ bonds ]
1 2 1
2 3 1

[ distance_restraints ]
; ai aj funct type label lo up1 up2 weight
1 3 1 1 7 0.2 0.3 0.4 1.0

[ system ]
disre test

[ molecules ]
DIM 2
"""


def test_top_disres_labels_per_copy():
    from gromacs_fep_gpu_tpu.io.topio import system_from_top
    system = system_from_top(DISRE_TOP)
    il = system.bonded["disres"]
    assert il.n == 2
    np.testing.assert_array_equal(np.asarray(il.atoms), [[0, 2], [3, 5]])
    # copies must not share a restraint group
    labels = np.asarray(il.params_a)[:, 4]
    assert labels[0] != labels[1]
    np.testing.assert_allclose(np.asarray(il.params_a)[0, :4],
                               [0.2, 0.3, 0.4, 1.0])


def test_fbposres_geometries():
    """Flat-bottom position restraints (reference:
    position_restraints.cpp fbposres): sphere, z-slab, z-cylinder,
    inverted sphere."""
    from gromacs_fep_gpu_tpu.ops.bonded import fbposres_energy

    def il_one(geom, r, k=100.0, x0=(1.0, 1.0, 1.0)):
        p = np.array([[geom, *x0, r, k]], np.float32)
        return InteractionList(atoms=jnp.zeros((1, 1), jnp.int32),
                               params_a=jnp.asarray(p),
                               params_b=jnp.asarray(p),
                               mask=jnp.ones((1,), jnp.float32))

    box = jnp.eye(3, dtype=jnp.float32) * 10.0

    def e(geom, r, pos):
        x = jnp.asarray([pos], jnp.float32)
        return float(fbposres_energy(x, box, il_one(geom, r), 0.0))

    # sphere: inside flat, outside harmonic in (d - r)
    assert e(1, 0.3, (1.2, 1.0, 1.0)) == 0.0
    np.testing.assert_allclose(e(1, 0.3, (1.5, 1.0, 1.0)),
                               0.5 * 100 * 0.2 ** 2, rtol=1e-5)
    # inverted sphere (r < 0): restrained OUTSIDE radius |r|
    assert e(1, -0.3, (1.5, 1.0, 1.0)) == 0.0
    np.testing.assert_allclose(e(1, -0.3, (1.1, 1.0, 1.0)),
                               0.5 * 100 * 0.2 ** 2, rtol=1e-4)
    # z-slab (geom 5): only z distance counts
    assert e(5, 0.2, (3.0, 3.0, 1.1)) == 0.0
    np.testing.assert_allclose(e(5, 0.2, (3.0, 3.0, 1.5)),
                               0.5 * 100 * 0.3 ** 2, rtol=1e-5)
    # z-cylinder (geom 8): xy-plane distance
    assert e(8, 0.3, (1.2, 1.0, 5.0)) == 0.0
    np.testing.assert_allclose(e(8, 0.3, (1.0, 1.5, 5.0)),
                               0.5 * 100 * 0.2 ** 2, rtol=1e-4)


def test_fbposres_top_parse(tmp_path):
    """[ position_restraints ] funct 2 parses and fills the reference
    position from the conformation (grompp gen_posres analogue)."""
    import os
    from gromacs_fep_gpu_tpu.cli import main as cli_main
    from tests.test_cli import TOP, make_water_gro
    os.chdir(tmp_path)
    make_water_gro("conf.gro")
    top = TOP.replace("[ settles ]", """[ position_restraints ]
; ai funct g r k
1 2 1 0.5 400.0

[ settles ]""")
    with open("topol.top", "w") as f:
        f.write(top)
    with open("md.mdp", "w") as f:
        f.write("integrator = md\nnsteps = 0\nrcoulomb = 0.55\n"
                "rvdw = 0.55\nrlist = 0.6\n"
                "coulombtype = reaction-field\n")
    cli_main(["grompp", "-f", "md.mdp", "-p", "topol.top", "-c",
              "conf.gro", "-o", "t.tpz"])
    from gromacs_fep_gpu_tpu.cli import _load_tpz
    pp, _ = _load_tpz("t.tpz")
    il = pp.system.bonded["fbposres"]
    assert il.n == 27                 # one per water molecule
    p = np.asarray(il.params_a)
    assert (p[:, 0] == 1).all() and (p[:, 4] == 0.5).all()
    # reference positions = the conformation's oxygens
    assert np.abs(p[:, 1:4]).max() > 0.1
