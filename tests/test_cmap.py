"""CMAP cross-term tests (reference: listed_forces/bonded.cpp cmap_dihs,
gmxpreprocess/toppush.cpp push_cmaptype / push_cmap)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gromacs_fep_gpu_tpu.core.types import CmapList
from gromacs_fep_gpu_tpu.ops.cmap import (cmap_energy, _dihedral,
                                          precompute_cmap_tables,
                                          spline_derivative_matrix)


def test_spline_derivative_exact_on_trig():
    n = 24
    h = 2 * np.pi / n
    xg = np.arange(n) * h
    D = spline_derivative_matrix(n, h)
    for k in (1, 2, 3):
        y = np.sin(k * xg)
        dy = D @ y
        np.testing.assert_allclose(dy, k * np.cos(k * xg),
                                   atol=2e-3 * k ** 4)


def _smooth(phi, psi):
    return (np.cos(phi) + 0.5 * np.sin(psi)
            + 0.3 * np.cos(phi + psi) + 0.2 * np.sin(2 * phi - psi))


def _grid(gs=24):
    h = 2 * np.pi / gs
    ang = -np.pi + np.arange(gs) * h
    P, S = np.meshgrid(ang, ang, indexing="ij")
    return _smooth(P, S)


def _geometry(rng, n_terms=6):
    """Random-ish 5-atom chains with well-defined dihedrals."""
    xs = []
    for _ in range(n_terms):
        x = np.zeros((5, 3))
        x[0] = [0.1, 0.0, 0.0]
        x[1] = [0.0, 0.15, 0.0]
        x[2] = [0.15, 0.3, 0.05]
        x[3] = [0.05, 0.45, 0.2]
        x[4] = [0.2, 0.55, 0.1]
        x += rng.normal(0, 0.02, (5, 3))
        x += rng.uniform(0.5, 2.0, (1, 3))
        xs.append(x)
    return np.concatenate(xs)


def _cmap_list(n_terms, gs=24):
    tables = precompute_cmap_tables(_grid(gs)[None])
    atoms = np.arange(n_terms * 5, dtype=np.int32).reshape(n_terms, 5)
    return CmapList(atoms=jnp.asarray(atoms),
                    typ=jnp.zeros((n_terms,), jnp.int32),
                    mask=jnp.ones((n_terms,), jnp.float32),
                    tables=jnp.asarray(tables))


def test_cmap_interpolates_smooth_surface():
    """Bicubic-Hermite on a 24-grid reproduces a smooth analytic surface
    to interpolation accuracy at arbitrary dihedral angles."""
    rng = np.random.default_rng(3)
    n_terms = 8
    x = jnp.asarray(_geometry(rng, n_terms), jnp.float32)
    box = jnp.eye(3, dtype=jnp.float32) * 10.0
    cm = _cmap_list(n_terms)
    at = cm.atoms
    phi = np.asarray(_dihedral(x, box, at[:, 0], at[:, 1], at[:, 2],
                               at[:, 3]), np.float64)
    psi = np.asarray(_dihedral(x, box, at[:, 1], at[:, 2], at[:, 3],
                               at[:, 4]), np.float64)
    expect = _smooth(phi, psi).sum()
    got = float(cmap_energy(x, box, cm))
    assert abs(got - expect) < 1e-2 * n_terms


def test_cmap_periodic_continuity():
    """The surface is continuous across the phi = +-pi seam: energies of
    two geometries with dihedrals straddling the seam stay close."""
    gs = 24
    tables = precompute_cmap_tables(_grid(gs)[None])
    box = jnp.eye(3, dtype=jnp.float32) * 10.0

    # planar zig-zag gives phi exactly pi; tiny twists straddle the seam
    def chain(eps):
        x = np.array([[0.0, 0.0, 0.0], [0.1, 0.0, 0.0], [0.2, 0.1, 0.0],
                      [0.3, 0.1, 0.0], [0.4, 0.2, 0.0]])
        x[0, 2] = eps   # twist atom 0 out of plane
        x[4, 2] = eps
        return jnp.asarray(x + 3.0, jnp.float32)

    cm = CmapList(atoms=jnp.arange(5, dtype=jnp.int32)[None],
                  typ=jnp.zeros((1,), jnp.int32),
                  mask=jnp.ones((1,), jnp.float32),
                  tables=jnp.asarray(tables))
    e_plus = float(cmap_energy(chain(1e-4), box, cm))
    e_minus = float(cmap_energy(chain(-1e-4), box, cm))
    assert abs(e_plus - e_minus) < 1e-3


def test_cmap_forces_match_finite_difference():
    rng = np.random.default_rng(5)
    n_terms = 3
    x0 = jnp.asarray(_geometry(rng, n_terms), jnp.float32)
    box = jnp.eye(3, dtype=jnp.float32) * 10.0
    cm = _cmap_list(n_terms)

    e_fn = lambda xx: cmap_energy(xx, box, cm)
    g = np.asarray(jax.grad(e_fn)(x0))
    eps = 1e-3
    for (i, d) in [(0, 0), (3, 1), (7, 2), (11, 0), (14, 2)]:
        xp = x0.at[i, d].add(eps)
        xm = x0.at[i, d].add(-eps)
        fd = (float(e_fn(xp)) - float(e_fn(xm))) / (2 * eps)
        np.testing.assert_allclose(g[i, d], fd, rtol=5e-2, atol=5e-3)


CMAP_TOP = """
[ defaults ]
1 2 yes 0.5 0.8333

[ atomtypes ]
; name btype at.num mass charge ptype sigma epsilon
CX  CX  6  12.011  0.0  A  0.35  0.3
NX  NX  7  14.007  0.0  A  0.32  0.7

[ bondtypes ]
CX NX 1 0.13 200000.0
CX CX 1 0.15 200000.0

[ angletypes ]
CX NX CX 1 110.0 400.0
NX CX NX 1 110.0 400.0
CX CX NX 1 110.0 400.0
NX CX CX 1 110.0 400.0
CX NX NX 1 110.0 400.0

[ cmaptypes ]
CX NX CX CX NX 1 4 4\\
0.0 1.0 2.0 1.0\\
1.0 2.0 3.0 2.0\\
2.0 3.0 4.0 3.0\\
1.0 2.0 3.0 2.0

[ moleculetype ]
PEP 2

[ atoms ]
1 CX 1 PEP C1 1 0.1 12.011
2 NX 1 PEP N1 2 -0.1 14.007
3 CX 1 PEP C2 3 0.0 12.011
4 CX 1 PEP C3 4 0.1 12.011
5 NX 1 PEP N2 5 -0.1 14.007

[ bonds ]
1 2 1
2 3 1
3 4 1
4 5 1

[ cmap ]
1 2 3 4 5 1

[ system ]
cmap test

[ molecules ]
PEP 2
"""


def test_top_cmap_end_to_end():
    from gromacs_fep_gpu_tpu.io.topio import system_from_top
    system = system_from_top(CMAP_TOP)
    assert system.cmap is not None
    assert system.cmap.n == 2                  # two molecule copies
    assert system.cmap.tables.shape == (1, 4, 4, 4)
    np.testing.assert_array_equal(np.asarray(system.cmap.atoms),
                                  [[0, 1, 2, 3, 4], [5, 6, 7, 8, 9]])

    # dense energy path includes the cmap contribution
    from gromacs_fep_gpu_tpu.core.types import MdParams, CoulombType
    from gromacs_fep_gpu_tpu.ops.forces import dense_energy
    rng = np.random.default_rng(7)
    x = jnp.asarray(np.concatenate([_geometry(rng, 1)[:5],
                                    _geometry(rng, 1)[:5] + 1.0]),
                    jnp.float32)
    box = jnp.eye(3, dtype=jnp.float32) * 6.0
    params = MdParams(coulomb=CoulombType.CUTOFF, rcoulomb=1.0, rvdw=1.0,
                      rlist=1.1)
    lam = jnp.zeros((7,), jnp.float32)
    terms = dense_energy(x, box, lam, system, params, None, None)
    e_direct = float(cmap_energy(x, box, system.cmap))
    assert abs(e_direct) > 1e-3                # nontrivial
    # removing cmap changes dihedrals channel by exactly e_direct
    terms0 = dense_energy(x, box, lam, system.replace(cmap=None), params,
                          None, None)
    np.testing.assert_allclose(float(terms.dihedrals - terms0.dihedrals),
                               e_direct, rtol=1e-5)
