"""Orientation-restraint tests (reference: listed_forces/orires.cpp)."""
import jax
import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.ops.orires import OriresList, orires_energy

BOX = jnp.eye(3, dtype=jnp.float32) * 10.0
PAIRS = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7),
         (0, 3), (1, 5)]


def _x(seed=0, n=8):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, 0.15, (n, 3)).astype(np.float32) + 2.0)


def _make_od(x, obs, xref=None):
    n = len(PAIRS)
    m = x.shape[0]
    if xref is None:
        com = jnp.mean(x, axis=0)
        xref = x - com
    return OriresList(
        atoms=jnp.asarray(np.array(PAIRS, np.int32)),
        exp=jnp.zeros((n,), jnp.int32),
        power=jnp.full((n,), 3, jnp.int32),
        c=jnp.full((n,), 10.0, jnp.float32),
        obs=jnp.asarray(np.asarray(obs, np.float32)),
        weight=jnp.ones((n,), jnp.float32),
        mask=jnp.ones((n,), jnp.float32),
        fit_idx=jnp.arange(m, dtype=jnp.int32),
        fit_mass=jnp.ones((m,), jnp.float32),
        xref=jnp.asarray(xref, jnp.float32),
        n_exp=1)


def _obs_from_structure(x):
    """Build observables from a known order tensor so the LSQ model is
    exactly satisfiable (energy 0 at x)."""
    S = np.array([0.3, -0.1, 0.2, 0.1, -0.05])
    ai = np.array([p[0] for p in PAIRS])
    aj = np.array([p[1] for p in PAIRS])
    r = np.asarray(x)[ai] - np.asarray(x)[aj]
    r2 = (r ** 2).sum(1)
    invr = 1.0 / np.sqrt(r2)
    pfac = 3.0 * 10.0 * invr ** 2 * invr ** 3
    X, Y, Z = r[:, 0], r[:, 1], r[:, 2]
    D = np.stack([2 * X * X + Y * Y - r2, 2 * X * Y, 2 * X * Z,
                  2 * Y * Y + X * X - r2, 2 * Y * Z], -1) * pfac[:, None]
    return (2.0 / 3.0) * (D * S).sum(1)


def test_zero_at_generating_structure():
    x = _x()
    obs = _obs_from_structure(x)
    od = _make_od(x, obs)
    e0 = float(orires_energy(x, BOX, od, fc=500.0))
    # exactly satisfiable: residual is fp32 rounding on the obs scale
    e_scale = 0.5 * 500.0 * float((np.asarray(obs) ** 2).sum())
    assert abs(e0) < 1e-9 * e_scale
    # distorting the structure raises the energy far above that
    x2 = x.at[0].add(jnp.asarray([0.05, -0.03, 0.02]))
    assert float(orires_energy(x2, BOX, od, fc=500.0)) > 100.0 * abs(e0)


def test_rotation_invariance_via_fit():
    """Rotating the whole molecule must not change the energy (the
    Kabsch fit removes overall rotation, orires.cpp calc_fit_R)."""
    x = _x(seed=3)
    obs = _obs_from_structure(x) + np.random.default_rng(1).normal(
        0, 0.05, len(PAIRS))
    od = _make_od(x, obs)
    e0 = float(orires_energy(x, BOX, od, fc=500.0))
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1.0]], np.float32)
    com = np.mean(np.asarray(x), axis=0)
    x_rot = jnp.asarray((np.asarray(x) - com) @ R.T + com, jnp.float32)
    e1 = float(orires_energy(x_rot, BOX, od, fc=500.0))
    np.testing.assert_allclose(e1, e0, rtol=2e-3, atol=1e-5)
    assert e0 > 1e-4          # nontrivial energy


def test_forces_finite_difference_frozen_rotation():
    """With the fit rotation frozen to identity (the reference likewise
    neglects dR/dx in its forces), AD must equal finite differences —
    this covers the D tensors, the LSQ order-tensor solve (whose dS/dx
    contribution vanishes by the envelope theorem), and the deviation
    sum."""
    from unittest import mock
    import gromacs_fep_gpu_tpu.ops.orires as orr
    jax.config.update("jax_enable_x64", True)
    try:
        x = jnp.asarray(np.asarray(_x(seed=5)), jnp.float64)
        obs = _obs_from_structure(x) + 0.03
        od = jax.tree_util.tree_map(
            lambda a: (a.astype(jnp.float64)
                       if jnp.issubdtype(a.dtype, jnp.floating) else a),
            _make_od(x, obs))
        box = jnp.eye(3, dtype=jnp.float64) * 10.0
        eye = jnp.eye(3, dtype=jnp.float64)
        with mock.patch.object(orr, "kabsch_rotation",
                               lambda *a, **k: eye):
            e_fn = lambda xx: orr.orires_energy(xx, box, od, fc=200.0)
            g = np.asarray(jax.grad(e_fn)(x))
            eps = 1e-6
            for (i, d) in [(0, 0), (3, 1), (7, 2)]:
                fd = (float(e_fn(x.at[i, d].add(eps)))
                      - float(e_fn(x.at[i, d].add(-eps)))) / (2 * eps)
                np.testing.assert_allclose(g[i, d], fd, rtol=1e-5,
                                           atol=1e-7)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_net_force_is_zero():
    """Internal restraint: forces sum to zero (translation invariance),
    with the full fit active."""
    x = _x(seed=7)
    obs = _obs_from_structure(x) + 0.05
    od = _make_od(x, obs)
    g = np.asarray(jax.grad(
        lambda xx: orires_energy(xx, BOX, od, fc=200.0))(x))
    scale = np.abs(g).max()
    np.testing.assert_allclose(g.sum(0), 0.0, atol=2e-3 * scale)


def test_top_and_tpr_parse():
    """[ orientation_restraints ] parses and the reference orires.tpr
    converts with its restraints attached."""
    from gromacs_fep_gpu_tpu.io.topio import system_from_top
    top = """
[ defaults ]
1 2 yes 0.5 0.8333

[ atomtypes ]
CX  CX  6  12.011  0.0  A  0.35  0.3

[ bondtypes ]
CX CX 1 0.15 200000.0

[ moleculetype ]
MOL 1

[ atoms ]
1 CX 1 MOL C1 1 0.0 12.011
2 CX 1 MOL C2 2 0.0 12.011
3 CX 1 MOL C3 3 0.0 12.011

[ bonds ]
1 2 1
2 3 1

[ orientation_restraints ]
; ai aj funct exp label alpha const obs weight
1 2 1 1 1 3 6.083 -6.73 1.0
2 3 1 1 2 3 6.083 -4.87 1.0

[ system ]
orires test

[ molecules ]
MOL 1
"""
    system = system_from_top(top)
    assert system.orires is not None and system.orires.n == 2
    np.testing.assert_allclose(np.asarray(system.orires.obs),
                               [-6.73, -4.87])
    assert system.orires.n_exp == 1

    from gromacs_fep_gpu_tpu.io.tprio import read_tpr, tpr_to_system
    t = read_tpr("/root/reference/src/gromacs/energyanalysis/tests/"
                 "orires.tpr")
    sys2, x, v, box = tpr_to_system(t)
    assert sys2.orires is not None and sys2.orires.n > 0
    # energy evaluates finite on the real protein
    e = float(orires_energy(jnp.asarray(x, jnp.float32),
                            jnp.asarray(box, jnp.float32), sys2.orires,
                            fc=100.0))
    assert np.isfinite(e)
