"""Density-guided simulation tests.

Mirrors the reference's math/tests/densityfit.cpp (similarity values and
gradients, incl. the shipped refdata XMLs), gausstransform.cpp semantics,
and an end-to-end run against the shipped ellipsoid-density.mrc fixture
(programs/mdrun/tests/densityfittingmodule.cpp uses the same file).
"""
import os
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gromacs_fep_gpu_tpu.io.mrcio import MrcMap, read_mrc, write_mrc
from gromacs_fep_gpu_tpu.md.densfit import (DensfitParams, DensfitState,
                                            make_densfit_force_fn,
                                            parse_densfit, similarity,
                                            similarity_gradient,
                                            spread_gaussian, spread_range)

REFDATA = "/root/reference/src/gromacs/math/tests/refdata"
ELLIPSOID = ("/root/reference/src/testutils/simulationdatabase/"
             "ellipsoid-density.mrc")


def _refdata_sequence(path):
    vals = re.findall(r"<Real>([^<]+)</Real>", open(path).read())
    return np.asarray([float(v) for v in vals], np.float32)


# ---------------------------------------------------------------------------
# Similarity measures vs the reference's own test values
# (math/tests/densityfit.cpp:61-260)
# ---------------------------------------------------------------------------

def test_inner_product_matches_reference():
    ref = jnp.arange(27.0).reshape(3, 3, 3)
    comp = jnp.arange(-18.0, 9.0).reshape(3, 3, 3)
    s = float(similarity("inner-product", ref, comp))
    np.testing.assert_allclose(s, -117.0 / 27.0, rtol=1e-6)
    g = np.asarray(similarity_gradient("inner-product", ref, comp))
    np.testing.assert_allclose(g.ravel(), np.arange(27.0) / 27.0, rtol=1e-6)


def test_relative_entropy_matches_reference():
    ref = jnp.arange(-2.0, 25.0).reshape(3, 3, 3)
    comp = jnp.arange(-2.0, 25.0).reshape(3, 3, 3)
    assert abs(float(similarity("relative-entropy", ref, comp))) < 1e-12
    comp2 = jnp.arange(-1.0, 26.0).reshape(3, 3, 3)
    s = float(similarity("relative-entropy", ref, comp2))
    np.testing.assert_allclose(s, 22.468290398724498791, rtol=1e-6)


@pytest.mark.skipif(not os.path.isdir(REFDATA), reason="no reference tree")
def test_relative_entropy_gradient_refdata():
    ref = jnp.arange(-1.0, 26.0).reshape(3, 3, 3)
    comp = jnp.arange(-2.0, 25.0).reshape(3, 3, 3)
    g = np.asarray(similarity_gradient("relative-entropy", ref,
                                       comp)).ravel()
    want = _refdata_sequence(os.path.join(
        REFDATA, "DensitySimilarityTest_RelativeEntropyGradientIsCorrect.xml"))
    np.testing.assert_allclose(g, want, rtol=2e-6, atol=1e-7)


def test_cross_correlation_limits():
    ref = jnp.arange(27000.0).reshape(30, 30, 30) + 10000.0
    comp = jnp.arange(27000.0).reshape(30, 30, 30) - 10000.0
    np.testing.assert_allclose(
        float(similarity("cross-correlation", ref, comp)), 1.0, rtol=1e-4)
    np.testing.assert_allclose(
        float(similarity("cross-correlation", -ref, comp)), -1.0, rtol=1e-4)
    # gradient is zero when perfectly correlated
    g = np.asarray(similarity_gradient("cross-correlation", ref, comp))
    assert np.abs(g).max() < 1e-6


@pytest.mark.skipif(not os.path.isdir(REFDATA), reason="no reference tree")
def test_cross_correlation_gradient_refdata():
    ref = jnp.arange(-1.0, 26.0).reshape(3, 3, 3)
    comp = (jnp.arange(-2.0, 25.0) ** 2).reshape(3, 3, 3)
    want = _refdata_sequence(os.path.join(
        REFDATA,
        "DensitySimilarityTest_CrossCorrelationGradientIsCorrect.xml"))
    g = np.asarray(similarity_gradient("cross-correlation", ref,
                                       comp)).ravel()
    np.testing.assert_allclose(g, want, rtol=2e-4, atol=1e-8)


# ---------------------------------------------------------------------------
# Gaussian spread (gausstransform.cpp)
# ---------------------------------------------------------------------------

def test_spread_gaussian_normalization_and_peak():
    sigma = np.asarray([2.0, 2.0, 2.0])
    rng = spread_range(sigma, 5.0)
    x = jnp.asarray([[10.0, 10.0, 10.0]])
    amp = jnp.asarray([3.0])
    grid = spread_gaussian(x, amp, (21, 21, 21), jnp.asarray(sigma), rng)
    # a fully contained normalized Gaussian integrates to the amplitude
    np.testing.assert_allclose(float(grid.sum()), 3.0, rtol=1e-3)
    assert np.unravel_index(int(jnp.argmax(grid)), grid.shape) == (10, 10,
                                                                   10)
    # off-lattice center: 1D marginal equals the analytic Gaussian
    x2 = jnp.asarray([[10.3, 10.0, 10.0]])
    g2 = spread_gaussian(x2, jnp.asarray([1.0]), (21, 21, 21),
                         jnp.asarray(sigma), rng)
    marg = np.asarray(g2.sum(axis=(0, 1)))
    i = np.arange(21)
    want = np.exp(-0.5 * ((i - 10.3) / 2.0) ** 2) / (2.0 * np.sqrt(2 * np.pi))
    np.testing.assert_allclose(marg, want, atol=2e-4)


def test_densfit_force_pulls_toward_density():
    """A single atom off the blob center feels a force toward it, and the
    force is the exact gradient of -k*similarity (FD check)."""
    nz = ny = nx = 12
    zz, yy, xx = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                             indexing="ij")
    blob = np.exp(-((xx - 6.0) ** 2 + (yy - 6.0) ** 2 + (zz - 6.0) ** 2)
                  / (2 * 2.0 ** 2)).astype(np.float32)
    p = DensfitParams(force_constant=100.0, sigma=0.4, n_sigma=4.0,
                      similarity_measure="inner-product", normalize=False)
    scale = np.asarray([2.0, 2.0, 2.0], np.float32)   # lattice pts per nm
    trans = np.zeros(3, np.float32)
    mass = np.asarray([12.0]); charge = np.asarray([0.0])
    fn = make_densfit_force_fn(p, blob, scale, trans, mass, charge,
                               dt=0.002)
    box = jnp.eye(3) * 6.0
    x = jnp.asarray([[2.0, 3.0, 3.0]])   # blob center is (3,3,3) nm
    f, e, s, _ = fn(x, box, DensfitState.init())
    assert float(f[0, 0]) > 0.0          # pulled +x toward the center
    assert abs(float(f[0, 1])) < 1e-4 and abs(float(f[0, 2])) < 1e-4
    # finite-difference the energy
    h = 1e-3
    _, e_p, _, _ = fn(x.at[0, 0].add(h), box, DensfitState.init())
    _, e_m, _, _ = fn(x.at[0, 0].add(-h), box, DensfitState.init())
    np.testing.assert_allclose(float(f[0, 0]), -(e_p - e_m) / (2 * h),
                               rtol=2e-3)
    assert np.isfinite(s)


def test_adaptive_scaling_ema():
    """Scale shrinks while similarity rises (reference:
    densityfittingforceprovider.cpp:383-396)."""
    blob = np.ones((8, 8, 8), np.float32)
    p = DensfitParams(force_constant=10.0, sigma=0.5, n_sigma=3.0,
                      adaptive_scaling=True, adaptive_tau_ps=0.1,
                      normalize=False)
    fn = make_densfit_force_fn(p, blob, np.ones(3, np.float32),
                               np.zeros(3, np.float32),
                               np.asarray([1.0]), np.asarray([0.0]),
                               dt=0.002)
    box = jnp.eye(3) * 8.0
    st = DensfitState.init()
    # move the atom deeper into the box -> similarity increases -> after
    # the EMA warms up, the scale must come down
    for xc in (0.5, 1.5, 2.5, 3.5, 4.0):
        _, _, _, st = fn(jnp.asarray([[xc, 4.0, 4.0]]), box, st)
    assert float(st.adaptive_scale) < 1.0


# ---------------------------------------------------------------------------
# MRC interop
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not os.path.isfile(ELLIPSOID), reason="no fixture")
def test_read_reference_ellipsoid_mrc():
    m = read_mrc(ELLIPSOID)
    assert m.data.shape == (6, 9, 9)          # (nz, ny, nx)
    assert m.extent == (9, 9, 6)
    assert np.isfinite(m.data).all() and m.data.min() > 0
    scale, trans = m.lattice_transform()
    np.testing.assert_allclose(scale, [1.25, 1.25, 1.25], rtol=1e-6)
    np.testing.assert_allclose(trans, [0.0, -1.6, 0.0], atol=1e-6)


def test_mrc_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    m = MrcMap(data=rng.random((4, 5, 6)).astype(np.float32),
               cell_length_A=(60.0, 50.0, 40.0), extent=(6, 5, 4),
               start=(1, 0, -2), origin_A=(0.0, 0.0, 0.0))
    p = str(tmp_path / "t.mrc")
    write_mrc(p, m)
    m2 = read_mrc(p)
    np.testing.assert_array_equal(m.data, m2.data)
    assert m2.extent == m.extent and m2.start == m.start
    np.testing.assert_allclose(m2.cell_length_A, m.cell_length_A)


# ---------------------------------------------------------------------------
# mdp parsing + end-to-end through MdRunner
# ---------------------------------------------------------------------------

def test_parse_densfit_keys():
    kv = {
        "density-guided-simulation-active": "yes",
        "density-guided-simulation-similarity-measure": "relative-entropy",
        "density-guided-simulation-atom-spreading-weight": "mass",
        "density-guided-simulation-force-constant": "500",
        "density-guided-simulation-gaussian-transform-spreading-width":
            "0.3",
        "density-guided-simulation-nst": "2",
        "density-guided-simulation-normalize-densities": "false",
        "density-guided-simulation-group": "1 2 3",
        "density-guided-simulation-reference-density-filename": "ref.mrc",
    }
    p = parse_densfit(kv)
    assert p.similarity_measure == "relative-entropy"
    assert p.amplitude_method == "mass"
    assert p.force_constant == 500.0 and p.sigma == 0.3 and p.nst == 2
    assert p.group == (0, 1, 2) and not p.normalize
    assert p.reference_density == "ref.mrc"
    assert parse_densfit({}) is None


def test_densfit_e2e_runner(tmp_path):
    """Two free atoms guided into a blob: similarity rises monotonically
    over the run and the energy term is finite (the reference's
    densityfittingmodule.cpp end-to-end analogue)."""
    from gromacs_fep_gpu_tpu.core.topology import MoleculeType, build_system
    from gromacs_fep_gpu_tpu.core.types import make_state
    from gromacs_fep_gpu_tpu.io.mdpio import mdp_to_params
    from gromacs_fep_gpu_tpu.md.runner import MdRunner, RunnerConfig, \
        concat_logs

    nz = ny = nx = 10
    zz, yy, xx = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                             indexing="ij")
    blob = np.exp(-((xx - 5.0) ** 2 + (yy - 5.0) ** 2 + (zz - 5.0) ** 2)
                  / (2 * 1.5 ** 2)).astype(np.float32)
    mrc = tmp_path / "blob.mrc"
    write_mrc(str(mrc), MrcMap(data=blob, cell_length_A=(50.0,) * 3,
                               extent=(10, 10, 10)))

    params, _ = mdp_to_params(f"""
integrator = md
dt = 0.002
nsteps = 40
coulombtype = cut-off
rcoulomb = 0.8
rvdw = 0.8
rlist = 0.9
nstcomm = 0
density-guided-simulation-active = yes
density-guided-simulation-force-constant = 1e9
density-guided-simulation-gaussian-transform-spreading-width = 0.4
density-guided-simulation-reference-density-filename = {mrc}
""")
    assert params.densfit is not None
    mol = MoleculeType(name="P", types_a=[0], charges_a=[0.0],
                       masses_a=[40.0])
    nbfp = np.zeros((1, 1, 2), np.float32)
    system = build_system([(mol, 2)], nbfp)
    x0 = np.asarray([[1.5, 2.5, 2.5], [3.5, 2.5, 2.5]], np.float32)
    state = make_state(x0, None, np.eye(3, dtype=np.float32) * 5.0)
    runner = MdRunner(system, params, RunnerConfig(use_dense=True))
    final, logs = runner.run(state, 40)
    log = concat_logs(logs)
    sims = np.asarray(log.densfit_sim)
    assert np.isfinite(sims).all()
    assert sims[-1] > sims[0] * 1.02     # atoms moved into the density
    # atoms drifted toward the blob center (2.5, 2.5, 2.5)
    d0 = np.linalg.norm(x0 - 2.5, axis=1)
    d1 = np.linalg.norm(np.asarray(final.x) - 2.5, axis=1)
    assert (d1 < d0).all()
    # restart state carries the densfit slot
    assert final.densfit is not None
