"""tpr WRITER round-trip (reference: tpxio.cpp:3359 write_tpx_state).

A repo-built FEP system is written as a version-118 tpr and decoded by
our byte-level reader (which is validated against reference-shipped
tprs); topology, coordinates, and ENERGIES must survive the trip.
"""
import os

import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.core.types import CoulombType, MdParams
from gromacs_fep_gpu_tpu.io.tprio import read_tpr, tpr_to_system
from gromacs_fep_gpu_tpu.io.tprwrite import write_tpr
from gromacs_fep_gpu_tpu.models.solvation import solvation_system
from gromacs_fep_gpu_tpu.models.water import water_box
from gromacs_fep_gpu_tpu.ops.forces import dense_energy, get_beta


def _energies(system, x, box, params, lam):
    beta = get_beta(params)
    terms = dense_energy(jnp.asarray(x), jnp.asarray(box),
                         jnp.asarray(lam), system, params, beta, None)
    return float(terms.epot), np.asarray(terms.dvdl)


def test_tpr_roundtrip_water(tmp_path):
    system, state = water_box(3, spacing=0.4, seed=11, temperature=300.0)
    params = MdParams(rcoulomb=0.5, rvdw=0.5, rlist=0.55,
                      coulomb=CoulombType.REACTION_FIELD)
    path = os.path.join(tmp_path, "w.tpr")
    write_tpr(path, system, params, np.asarray(state.x),
              np.asarray(state.v), np.asarray(state.box))

    t = read_tpr(path)
    assert t.version == 118
    assert t.natoms == system.n_atoms
    sys2, x2, v2, box2 = tpr_to_system(t)
    np.testing.assert_allclose(x2, np.asarray(state.x), atol=1e-6)
    np.testing.assert_allclose(v2, np.asarray(state.v), atol=1e-6)
    np.testing.assert_allclose(box2, np.asarray(state.box), atol=1e-6)

    lam = jnp.zeros(7)
    e1, _ = _energies(system, state.x, state.box, params, lam)
    e2, _ = _energies(sys2, state.x, state.box, params, lam)
    np.testing.assert_allclose(e2, e1, rtol=2e-5)
    # constraints survive (SETTLE waters become constraints or settles)
    from gromacs_fep_gpu_tpu.md.constraints import n_constraints
    assert n_constraints(sys2) == n_constraints(system)


def test_tpr_roundtrip_fep_ligand(tmp_path):
    system, state = solvation_system(n_side=5, spacing=0.31, seed=2,
                                     temperature=300.0)
    params = MdParams(rcoulomb=0.5, rvdw=0.5, rlist=0.55,
                      coulomb=CoulombType.REACTION_FIELD)
    ladder = np.tile(np.linspace(0.0, 1.0, 5), (7, 1))
    path = os.path.join(tmp_path, "l.tpr")
    write_tpr(path, system, params, np.asarray(state.x),
              np.asarray(state.v), np.asarray(state.box),
              all_lambda=ladder, init_fep_state=2, nsteps=100)

    t = read_tpr(path)
    assert t.natoms == system.n_atoms
    assert t.fep_state == 2
    sys2, x2, v2, box2 = tpr_to_system(t)
    # perturbation survives: A/B charges and types differ where expected
    np.testing.assert_array_equal(np.asarray(sys2.perturbed),
                                  np.asarray(system.perturbed))
    lam = jnp.full((7,), 0.4)
    e1, d1 = _energies(system, state.x, state.box, params, lam)
    e2, d2 = _energies(sys2, state.x, state.box, params, lam)
    np.testing.assert_allclose(e2, e1, rtol=2e-5)
    np.testing.assert_allclose(d2[2:4], d1[2:4], rtol=1e-4, atol=1e-5)


def test_xdr_reader_mem_mode_primitives():
    """tpx >= 119 bodies use the InMemorySerializer layout (reference:
    utility/inmemoryserializer.cpp): 1-byte bools/uchars, 2-byte
    ushorts, u64-length unpadded strings, big-endian scalars."""
    import struct
    from gromacs_fep_gpu_tpu.io.tprio import XdrReader
    blob = (b"\x01" + b"\x7f" + struct.pack(">H", 515)
            + struct.pack(">Q", 5) + b"hello"
            + struct.pack(">i", -7) + struct.pack(">f", 2.5)
            + b"\x01\x00\x02")
    r = XdrReader(blob, mem=True)
    assert r.bool_() is True
    assert r.uchar() == 127
    assert r.ushort() == 515
    assert r.string() == "hello"
    assert r.i32() == -7
    assert r.f32() == 2.5
    assert list(r.uchars(3)) == [1, 0, 2]
