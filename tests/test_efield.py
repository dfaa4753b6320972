"""Applied electric field tests (reference:
applied_forces/electricfield.cpp)."""
import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.md.efield import (FIELDFAC, EfieldDim,
                                           field_strength,
                                           make_efield_force_fn,
                                           parse_efield)


def test_field_forms():
    const = (EfieldDim(e0=0.5), EfieldDim(), EfieldDim())
    e = np.asarray(field_strength(const, jnp.float32(3.0)))
    np.testing.assert_allclose(e, [0.5, 0.0, 0.0], atol=1e-7)
    osc = (EfieldDim(), EfieldDim(e0=1.0, omega=2.0), EfieldDim())
    e = np.asarray(field_strength(osc, jnp.float32(0.25)))
    np.testing.assert_allclose(e[1], np.cos(0.5), rtol=1e-6)
    pulse = (EfieldDim(), EfieldDim(),
             EfieldDim(e0=2.0, omega=0.0, t0=1.0, sigma=0.5))
    e_peak = float(field_strength(pulse, jnp.float32(1.0))[2])
    e_off = float(field_strength(pulse, jnp.float32(3.0))[2])
    np.testing.assert_allclose(e_peak, 2.0, rtol=1e-6)
    assert abs(e_off) < 2e-3


def test_force_is_charge_times_field():
    dims = (EfieldDim(e0=0.3), EfieldDim(), EfieldDim())
    qa = jnp.asarray([1.0, -0.5])
    fn = make_efield_force_fn(dims, qa, qa)
    f = np.asarray(fn(jnp.float32(0.0), 0.0))
    np.testing.assert_allclose(f[:, 0], [0.3 * FIELDFAC,
                                         -0.15 * FIELDFAC], rtol=1e-5)
    np.testing.assert_allclose(f[:, 1:], 0.0)


def test_parse_and_ion_drift():
    """An ion in a constant field accelerates along it (mdp-driven,
    through the full step loop)."""
    from gromacs_fep_gpu_tpu.io.mdpio import mdp_to_params
    from gromacs_fep_gpu_tpu.core.types import CoulombType
    from gromacs_fep_gpu_tpu.md.runner import MdRunner, RunnerConfig
    from gromacs_fep_gpu_tpu.core.topology import MoleculeType, build_system
    from gromacs_fep_gpu_tpu.core.types import make_state

    params, _ = mdp_to_params("""
integrator = md
dt = 0.002
nsteps = 50
coulombtype = cut-off
rcoulomb = 0.8
rvdw = 0.8
rlist = 0.9
nstcomm = 0
electric-field-x = 1.0 0 0 0
""")
    assert params.efield is not None and params.efield[0].e0 == 1.0
    mol = MoleculeType(name="ION", types_a=[0], charges_a=[1.0],
                       masses_a=[22.99])
    nbfp = np.zeros((1, 1, 2), np.float32)
    system = build_system([(mol, 1)], nbfp)
    state = make_state(np.asarray([[1.0, 1.0, 1.0]], np.float32), None,
                       np.eye(3, dtype=np.float32) * 10.0)
    runner = MdRunner(system, params, RunnerConfig(use_dense=True))
    final, _ = runner.run(state, 50)
    dx = float(final.x[0, 0] - 1.0)
    # a = qE fac / m; x(t) ~ 0.5 a t^2
    t = 50 * 0.002
    expect = 0.5 * (1.0 * FIELDFAC / 22.99) * t ** 2
    np.testing.assert_allclose(dx, expect, rtol=0.05)
    assert abs(float(final.x[0, 1] - 1.0)) < 1e-5
