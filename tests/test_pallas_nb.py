"""Pallas kernel vs XLA cluster kernel (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gromacs_fep_gpu_tpu.core.types import CoulombType, MdParams
from gromacs_fep_gpu_tpu.models.water import water_box
from gromacs_fep_gpu_tpu.ops.cluster_nb import cluster_nb_kernel
from gromacs_fep_gpu_tpu.ops.pairlist import build_cluster_pairlist
from gromacs_fep_gpu_tpu.ops.pallas_nb import pallas_cluster_forces


@pytest.mark.parametrize("coulomb", [CoulombType.REACTION_FIELD,
                                     CoulombType.PME])
def test_pallas_matches_xla_kernel(coulomb):
    params = MdParams(rcoulomb=0.55, rvdw=0.55, rlist=0.6, coulomb=coulomb)
    system, state = water_box(3, spacing=0.4, seed=30)
    beta = 3.5 if coulomb == CoulombType.PME else None
    nlist = build_cluster_pairlist(state.x, state.box, system, params.rlist,
                                   nnbr=96, super_nnbr=128)
    assert int(nlist.super_overflow) == 0

    f_ref, ec_ref, el_ref = cluster_nb_kernel(
        state.x, state.box, nlist, system.nbfp, params, beta, block=16,
        lj_mode="geometric")
    f_p, ec_p, el_p = pallas_cluster_forces(
        state.x, state.box, nlist, system.nbfp, params, beta, interpret=True)

    np.testing.assert_allclose(float(ec_p), float(ec_ref), rtol=1e-5)
    np.testing.assert_allclose(float(el_p), float(el_ref), rtol=1e-5)
    scale = float(jnp.abs(f_ref).max())
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_ref),
                               atol=2e-5 * scale)


@pytest.mark.parametrize("coulomb", [CoulombType.REACTION_FIELD,
                                     CoulombType.PME])
@pytest.mark.parametrize("compute_energy", [True, False])
def test_pallas_v2_matches_xla_kernel(coulomb, compute_energy):
    """v2 per-cluster-stream kernel (baked-in shifts + pair bitmasks)."""
    from gromacs_fep_gpu_tpu.ops.pallas_nb import (pallas_cluster_forces_v2,
                                                   pallas_prepare_v2)
    params = MdParams(rcoulomb=0.55, rvdw=0.55, rlist=0.6, coulomb=coulomb)
    system, state = water_box(8, spacing=0.31, seed=30)
    # (box large enough that build-time shifts are provably valid)
    # drift an atom out of the box: the image-count handling must keep the
    # baked-in shifts exact for unwrapped coordinates
    x = state.x.at[10].add(jnp.array([3.0 * state.box[0, 0], 0.0, 0.0]))
    beta = 3.5 if coulomb == CoulombType.PME else None
    nlist = build_cluster_pairlist(x, state.box, system, params.rlist,
                                   nnbr=96, compute_shifts=True)
    assert int(nlist.n_overflow) == 0

    f_ref, ec_ref, el_ref = cluster_nb_kernel(
        x, state.box, nlist, system.nbfp, params, beta, block=16,
        lj_mode="geometric")
    prep = pallas_prepare_v2(nlist, system.nbfp)
    f_p, ec_p, el_p = pallas_cluster_forces_v2(
        x, state.box, nlist, system.nbfp, params, beta, prep=prep,
        interpret=True, compute_energy=compute_energy)

    if compute_energy:
        np.testing.assert_allclose(float(ec_p), float(ec_ref), rtol=1e-5)
        np.testing.assert_allclose(float(el_p), float(el_ref), rtol=1e-5)
    scale = float(jnp.abs(f_ref).max())
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_ref),
                               atol=2e-5 * scale)


@pytest.mark.parametrize("coulomb", [CoulombType.REACTION_FIELD,
                                     CoulombType.PME])
def test_pallas_v2u_matches_xla_kernel(coulomb):
    """v2u union-stream kernel (4-cluster i-blocks, bitmask pair masks)."""
    from gromacs_fep_gpu_tpu.ops.pallas_nb import (pallas_cluster_forces_v2u,
                                                   pallas_prepare_v2u)
    params = MdParams(rcoulomb=0.55, rvdw=0.55, rlist=0.6, coulomb=coulomb)
    system, state = water_box(8, spacing=0.31, seed=30)
    x = state.x.at[10].add(jnp.array([3.0 * state.box[0, 0], 0.0, 0.0]))
    beta = 3.5 if coulomb == CoulombType.PME else None
    nlist = build_cluster_pairlist(x, state.box, system, params.rlist,
                                   nnbr=96, super_nnbr=192, super_block=4)
    assert int(nlist.n_overflow) == 0 and int(nlist.super_overflow) == 0

    f_ref, ec_ref, el_ref = cluster_nb_kernel(
        x, state.box, nlist, system.nbfp, params, beta, block=16,
        lj_mode="geometric")
    prep = pallas_prepare_v2u(nlist, system.nbfp)
    f_p, ec_p, el_p = pallas_cluster_forces_v2u(
        x, state.box, nlist, system.nbfp, params, beta, prep=prep,
        interpret=True)

    np.testing.assert_allclose(float(ec_p), float(ec_ref), rtol=1e-5)
    np.testing.assert_allclose(float(el_p), float(el_ref), rtol=1e-5)
    scale = float(jnp.abs(f_ref).max())
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_ref),
                               atol=2e-5 * scale)


@pytest.mark.parametrize("coulomb", [CoulombType.PME,
                                     CoulombType.REACTION_FIELD])
def test_pallas_v2u_baked_shifts_drift(coulomb):
    """v2u with build-time periodic shifts folded into the j stream
    (kernel skips min-image folds) must still match the XLA cluster
    kernel exactly — including after the atoms drift from the build
    positions within the verlet buffer (the list-reuse guarantee,
    reference: nbnxm/pairlist.h per-entry shift indices)."""
    from gromacs_fep_gpu_tpu.ops.pallas_nb import (pallas_cluster_forces_v2u,
                                                   pallas_prepare_v2u)
    params = MdParams(rcoulomb=0.55, rvdw=0.55, rlist=0.7, coulomb=coulomb)
    system, state = water_box(8, spacing=0.31, seed=33)
    beta = 3.5 if coulomb == CoulombType.PME else None
    # unwrapped input: a whole molecule several periodic images away
    # (the builder wraps internally; the baked-shift path must re-enter
    # the wrapped frame via nlist.img — the bug class this test pins)
    x = state.x.at[30:33].add(jnp.array([2.0 * state.box[0, 0],
                                         -3.0 * state.box[1, 1], 0.0]))
    nlist = build_cluster_pairlist(x, state.box, system,
                                   params.rlist, nnbr=96, super_nnbr=256,
                                   super_block=4, compute_shifts=True)
    assert int(nlist.super_overflow) == 0
    assert int(nlist.shift_overflow) == 0
    prep = pallas_prepare_v2u(nlist, system.nbfp)
    assert prep.shift is not None

    # drift every atom (within the rlist-rc buffer) off the build frame
    rng = np.random.RandomState(7)
    x2 = x + jnp.asarray(rng.uniform(-0.03, 0.03, x.shape), jnp.float32)

    for xx in (x, x2):
        f_ref, ec_ref, el_ref = cluster_nb_kernel(
            xx, state.box, nlist, system.nbfp, params, beta, block=16,
            lj_mode="geometric")
        f_p, ec_p, el_p = pallas_cluster_forces_v2u(
            xx, state.box, nlist, system.nbfp, params, beta, prep=prep,
            interpret=True)
        np.testing.assert_allclose(float(ec_p), float(ec_ref), rtol=1e-5)
        np.testing.assert_allclose(float(el_p), float(el_ref), rtol=1e-5)
        scale = float(jnp.abs(f_ref).max())
        np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_ref),
                                   atol=2e-5 * scale)


@pytest.mark.parametrize("coulomb", [CoulombType.PME])
def test_pallas_v2u_g_cap(coulomb):
    """Packing the union stream with a g_cap >= the needed group count
    must be exactly equivalent to the uncapped pack (the runner's
    super_g tightening; truncating caps are detected via the s_max flag
    and rolled back, so only the sufficient-cap case must be exact)."""
    from gromacs_fep_gpu_tpu.ops.pallas_nb import (GJU,
                                                   pallas_cluster_forces_v2u,
                                                   pallas_prepare_v2u)
    params = MdParams(rcoulomb=0.55, rvdw=0.55, rlist=0.6, coulomb=coulomb)
    system, state = water_box(8, spacing=0.31, seed=30)
    beta = 3.5
    nlist = build_cluster_pairlist(state.x, state.box, system, params.rlist,
                                   nnbr=96, super_nnbr=192, super_block=4)
    assert int(nlist.super_overflow) == 0
    need = int(-(-int(nlist.super_max_count) // GJU))
    full = pallas_prepare_v2u(nlist, system.nbfp)
    assert need < full.nbr2.shape[1], "fixture must have slack to cap"
    capped = pallas_prepare_v2u(nlist, system.nbfp, g_cap=need)
    assert capped.nbr2.shape[1] == need

    f_ref, ec_ref, el_ref = pallas_cluster_forces_v2u(
        state.x, state.box, nlist, system.nbfp, params, beta, prep=full,
        interpret=True)
    f_c, ec_c, el_c = pallas_cluster_forces_v2u(
        state.x, state.box, nlist, system.nbfp, params, beta, prep=capped,
        interpret=True)
    np.testing.assert_allclose(float(ec_c), float(ec_ref), rtol=1e-6)
    np.testing.assert_allclose(float(el_c), float(el_ref), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(f_c), np.asarray(f_ref))


@pytest.mark.parametrize("coulomb", [CoulombType.REACTION_FIELD,
                                     CoulombType.PME])
def test_pallas_v2u_triclinic_box(coulomb):
    """Triclinic (dodecahedron-like) cell on the v2u Pallas path: the
    build-time shifts are integer box-vector counts, so the PBC-free
    baked-shift kernel handles skewed cells exactly (reference:
    pbcutil/pbc.cpp triclinic shift machinery + nbnxm/pairlist.h shift
    indices).  Must match the XLA cluster kernel, which uses general
    minimum-image math."""
    from gromacs_fep_gpu_tpu.ops.pallas_nb import (pallas_cluster_forces_v2u,
                                                   pallas_prepare_v2u)
    # realistic cutoff/cell proportions (rlist ~ 0.16 of the cell
    # height): with an aggressive rlist ~ 0.35 of the height, two images
    # of a cluster pair can both carry interacting pairs and the build
    # correctly flags shift_overflow -> XLA fallback instead
    params = MdParams(rcoulomb=0.55, rvdw=0.55, rlist=0.6, coulomb=coulomb)
    system, state = water_box(16, spacing=0.31, seed=30)
    L = float(state.box[0, 0])
    # rhombic-dodecahedron box rows (GROMACS convention)
    box = jnp.array([[L, 0.0, 0.0],
                     [0.0, L, 0.0],
                     [0.5 * L, 0.5 * L, L / np.sqrt(2.0)]], jnp.float32)
    # fill the skewed cell by mapping the rect lattice through fractional
    # space (shears molecules slightly — irrelevant for kernel parity)
    from gromacs_fep_gpu_tpu.core.pbc import frac_coords
    s = frac_coords(state.x, state.box)
    x = s[:, 0:1] * box[0] + s[:, 1:2] * box[1] + s[:, 2:3] * box[2]
    beta = 3.5 if coulomb == CoulombType.PME else None
    nlist = build_cluster_pairlist(x, box, system, params.rlist,
                                   nnbr=128, super_nnbr=640, super_block=4,
                                   compute_shifts=True, triclinic=True)
    assert int(nlist.super_overflow) == 0
    assert int(nlist.shift_overflow) == 0

    f_ref, ec_ref, el_ref = cluster_nb_kernel(
        x, box, nlist, system.nbfp, params, beta, block=16,
        lj_mode="geometric")
    prep = pallas_prepare_v2u(nlist, system.nbfp)
    f_p, ec_p, el_p = pallas_cluster_forces_v2u(
        x, box, nlist, system.nbfp, params, beta, prep=prep,
        interpret=True)
    np.testing.assert_allclose(float(ec_p), float(ec_ref), rtol=2e-5)
    np.testing.assert_allclose(float(el_p), float(el_ref), rtol=2e-5)
    scale = float(jnp.abs(f_ref).max())
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_ref),
                               atol=3e-5 * scale)


@pytest.mark.parametrize("coulomb", [CoulombType.PME,
                                     CoulombType.REACTION_FIELD])
@pytest.mark.parametrize("baked", [True, False])
def test_pallas_v2u_duo_matches_xla_kernel(coulomb, baked):
    """Duo-packed union streams (2-cluster rows, deduplicated; see
    PallasPrepV2U.duo) must match the XLA cluster kernel exactly in
    both the baked-shift and min-image flavors, including unwrapped
    inputs and per-member shifts straddling the box boundary."""
    from gromacs_fep_gpu_tpu.ops.pallas_nb import (pallas_cluster_forces_v2u,
                                                   pallas_prepare_v2u)
    params = MdParams(rcoulomb=0.55, rvdw=0.55, rlist=0.7, coulomb=coulomb)
    system, state = water_box(8, spacing=0.31, seed=41)
    beta = 3.5 if coulomb == CoulombType.PME else None
    x = state.x.at[30:33].add(jnp.array([2.0 * state.box[0, 0],
                                         -3.0 * state.box[1, 1], 0.0]))
    nlist = build_cluster_pairlist(x, state.box, system, params.rlist,
                                   nnbr=96, super_nnbr=256, super_block=4,
                                   compute_shifts=baked)
    assert int(nlist.super_overflow) == 0
    prep = pallas_prepare_v2u(nlist, system.nbfp, duo=True)
    assert prep.duo and int(prep.duo_ovf) == 0
    assert (prep.shift is not None) == baked

    rng = np.random.RandomState(9)
    x2 = x + jnp.asarray(rng.uniform(-0.03, 0.03, x.shape), jnp.float32)
    for xx in (x, x2):
        f_ref, ec_ref, el_ref = cluster_nb_kernel(
            xx, state.box, nlist, system.nbfp, params, beta, block=16,
            lj_mode="geometric")
        f_p, ec_p, el_p = pallas_cluster_forces_v2u(
            xx, state.box, nlist, system.nbfp, params, beta, prep=prep,
            interpret=True)
        np.testing.assert_allclose(float(ec_p), float(ec_ref), rtol=1e-5)
        np.testing.assert_allclose(float(el_p), float(el_ref), rtol=1e-5)
        scale = float(jnp.abs(f_ref).max())
        np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_ref),
                                   atol=2e-5 * scale)


def test_pallas_v2u_duo_force_only_and_capped():
    """Force-only flavor + a sufficient duo_g cap must equal the
    uncapped duo pack (runner's super_g_duo tightening contract)."""
    from gromacs_fep_gpu_tpu.ops.pallas_nb import (DJU,
                                                   pallas_cluster_forces_v2u,
                                                   pallas_prepare_v2u)
    params = MdParams(rcoulomb=0.55, rvdw=0.55, rlist=0.6,
                      coulomb=CoulombType.PME)
    system, state = water_box(8, spacing=0.31, seed=42)
    nlist = build_cluster_pairlist(state.x, state.box, system, params.rlist,
                                   nnbr=96, super_nnbr=192, super_block=4,
                                   compute_shifts=True)
    assert int(nlist.super_overflow) == 0
    full = pallas_prepare_v2u(nlist, system.nbfp, duo=True)
    need = -(-int(full.duo_max) // DJU)
    capped = pallas_prepare_v2u(nlist, system.nbfp, duo=True, duo_g=need)
    assert int(capped.duo_ovf) == 0
    f_ref, _, _ = cluster_nb_kernel(
        state.x, state.box, nlist, system.nbfp, params, 3.5, block=16,
        lj_mode="geometric")
    for prep in (full, capped):
        f_p, _, _ = pallas_cluster_forces_v2u(
            state.x, state.box, nlist, system.nbfp, params, 3.5, prep=prep,
            interpret=True, compute_energy=False)
        scale = float(jnp.abs(f_ref).max())
        np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_ref),
                                   atol=2e-5 * scale)
