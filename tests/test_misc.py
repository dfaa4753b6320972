"""Coverage for auxiliary modules: exclusion checker, energy statistics,
dispersion scaling, verlet buffer."""
import numpy as np
import jax.numpy as jnp

from gromacs_fep_gpu_tpu.analysis.energy import (block_average_error,
                                                 energy_statistics)
from gromacs_fep_gpu_tpu.core.types import MdParams
from gromacs_fep_gpu_tpu.md.verletbuf import effective_rlist, verlet_buffer
from gromacs_fep_gpu_tpu.models.water import water_box
from gromacs_fep_gpu_tpu.ops.pairlist import check_exclusions


def test_exclusion_checker_flags_split_molecule():
    system, state = water_box(2, spacing=0.5)
    assert int(check_exclusions(state.x, state.box, system, 0.6)) == 0
    # teleport one H far away -> its exclusions to O/H now exceed rlist
    x = state.x.at[1].add(jnp.asarray([0.45, 0.45, 0.0]))
    assert int(check_exclusions(x, state.box, system, 0.3)) > 0


def test_energy_statistics(tmp_path):
    rng = np.random.RandomState(0)
    t = np.arange(200) * 0.002
    epot = -100 + rng.randn(200)
    data = np.stack([t, epot, 50 + rng.randn(200), 300 + 5 * rng.randn(200),
                     np.ones(200)], 1)
    p = str(tmp_path / "x.ener.csv")
    np.savetxt(p, data, header="time epot ekin temp pres", comments="# ")
    stats = energy_statistics(p)
    assert abs(stats["epot"]["average"] + 100) < 1.0
    assert stats["temp"]["rmsd"] > 1.0
    assert np.isfinite(stats["epot"]["err_est"])


def test_verlet_buffer_scales_with_nstlist():
    p10 = MdParams(nstlist=10, dt=0.002, ref_t=300.0)
    p40 = MdParams(nstlist=40, dt=0.002, ref_t=300.0)
    assert verlet_buffer(p40) > verlet_buffer(p10) * 3.5
    assert effective_rlist(p10) > max(p10.rcoulomb, p10.rvdw)
