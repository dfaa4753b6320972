"""PME load-balancer tests (reference: ewald/pme_load_balancing.cpp)."""
import numpy as np
import jax.numpy as jnp

from gromacs_fep_gpu_tpu.core.types import CoulombType, MdParams
from gromacs_fep_gpu_tpu.md.pme_tuning import (candidate_params, tune_pme,
                                               DEFAULT_SCALES)
from gromacs_fep_gpu_tpu.md.runner import RunnerConfig
from gromacs_fep_gpu_tpu.models.water import water_box
from gromacs_fep_gpu_tpu.ops.pme import pme_grid_size


def test_candidates_preserve_accuracy_invariants():
    params = MdParams(rcoulomb=0.9, rvdw=0.9, rlist=1.0,
                      coulomb=CoulombType.PME, fourier_spacing=0.12)
    box = (3.1, 3.1, 3.1)
    for s in DEFAULT_SCALES:
        p = candidate_params(params, box, s)
        assert abs(p.rcoulomb - 0.9 * s) < 1e-9
        assert p.rvdw == params.rvdw            # vdW cutoff fixed
        assert p.rlist >= p.rcoulomb            # list covers the cutoff
        # grid spacing scales with the cutoff: fewer points at larger rc
        g0 = pme_grid_size(box, params.fourier_spacing)
        assert np.prod(p.pme_grid) <= np.prod(g0) + 1e-9


def test_tune_pme_rejects_inaccurate_candidates():
    """On a tiny box the scaled grid (9^3) loses real accuracy; the
    tuner's energy check must reject it and keep the input setting."""
    params = MdParams(dt=0.001, nstlist=10, coulomb=CoulombType.PME,
                      rcoulomb=0.55, rvdw=0.55, rlist=0.65,
                      fourier_spacing=0.12,
                      pme_grid=pme_grid_size((1.24,) * 3, 0.12))
    system, state = water_box(4, spacing=0.31, seed=0, temperature=300.0)
    res = tune_pme(system, params, state, RunnerConfig(nnbr=96),
                   scales=(1.0, 1.15), steps=10)
    assert res.params.coulomb == CoulombType.PME
    assert len(res.timings) == 1 and res.scale == 1.0
    # a no-op for non-PME
    rf = params.replace(coulomb=CoulombType.REACTION_FIELD)
    assert tune_pme(system, rf, state).scale == 1.0


def test_tune_pme_accepts_equivalent_candidates():
    """At adequate grid resolution the real/recip split moves without
    changing the total: both candidates must pass the physics check."""
    box_l = 6 * 0.31
    params = MdParams(dt=0.001, nstlist=10, coulomb=CoulombType.PME,
                      rcoulomb=0.7, rvdw=0.7, rlist=0.8,
                      fourier_spacing=0.10,
                      pme_grid=pme_grid_size((box_l,) * 3, 0.10))
    system, state = water_box(6, spacing=0.31, seed=0, temperature=300.0)
    res = tune_pme(system, params, state, RunnerConfig(nnbr=96),
                   scales=(1.0, 1.08), steps=10)
    assert len(res.timings) == 2
    assert res.scale in (1.0, 1.08)
