"""fp32 energy-conservation audit (reference methodology:
mdlib/calc_verletbuf.cpp:1080 — the Verlet buffer is sized for a target
energy drift, default verlet-buffer-tolerance = 0.005 kJ/mol/ps/atom).

An NVE run on the production force path must conserve energy to within
a small multiple of that target: this bounds BOTH the pair-list buffer
model AND fp32 rounding accumulation in forces/integration (the
reference runs double-precision builds for the same audit; our
accelerator path is fp32 + fp32 accumulators, so this test is the
evidence that it suffices)."""
import jax
import jax.numpy as jnp
import numpy as np

from gromacs_fep_gpu_tpu.core.types import CoulombType, MdParams
from gromacs_fep_gpu_tpu.md.runner import MdRunner, RunnerConfig
from gromacs_fep_gpu_tpu.md.runner import concat_logs
from gromacs_fep_gpu_tpu.models.water import water_box


def test_nve_energy_drift_fp32():
    system, state = water_box(6, spacing=0.31, seed=12, temperature=300.0)
    n = system.n_atoms
    params = MdParams(dt=0.001, nstlist=10,
                      coulomb=CoulombType.REACTION_FIELD,
                      rcoulomb=0.55, rvdw=0.55, rlist=0.62,
                      nstcomm=0, nstcalcenergy=1)
    runner = MdRunner(system, params, RunnerConfig(nnbr=128))
    # equilibrate off the lattice with a thermostat first
    from gromacs_fep_gpu_tpu.core.types import TcouplType
    eq_params = params.replace(tcoupl=TcouplType.V_RESCALE, ref_t=300.0,
                               tau_t=0.1, nsttcouple=1, dt=0.0005)
    eq = MdRunner(system, eq_params, RunnerConfig(nnbr=128))
    state, _ = eq.run(state, 400)

    state, logs = runner.run(state, 1000)
    log = concat_logs(logs)
    etot = np.asarray(log.epot) + np.asarray(log.ekin)
    assert np.isfinite(etot).all()
    # linear drift estimate over the run (robust to fluctuation): fit
    t = np.arange(etot.size) * params.dt
    slope = np.polyfit(t, etot, 1)[0]          # kJ/mol per ps
    per_atom = abs(slope) / n
    # verlet-buffer-tolerance default target is 0.005 kJ/mol/ps/atom;
    # allow 4x for the fp32 path + fit noise on a short window
    assert per_atom < 0.02, f"NVE drift {per_atom:.4f} kJ/mol/ps/atom"
