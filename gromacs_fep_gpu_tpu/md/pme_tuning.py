"""PME load balancing: cutoff / grid auto-tuning
(reference: src/gromacs/ewald/pme_load_balancing.cpp:209 pme_loadbal_init,
:924 pme_load_balance).

The reference shifts work between the short-ranged kernel and the PME
grid DURING the run by scaling rcoulomb and the grid spacing together
(Ewald beta recomputed so ewald-rtol is preserved — the electrostatics
stay equivalent to the requested accuracy).  On TPU every candidate is
one more XLA compile, so the tuner runs as a one-time scan up front
(mdrun -tunepme / bench): each candidate executes a short timed chunk
through the REAL runner (same fused rebuild+scan program as production)
and the fastest setting wins.  Physics invariance across candidates is
asserted by comparing energies at the starting structure.
"""
from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Tuple

import numpy as np

from ..core.types import CoulombType, MdParams
from ..ops.pme import pme_grid_size

# candidate rcoulomb scale ladder (reference scans upward in ~8% steps
# from the input cutoff, pme_load_balancing.cpp:296 c_gridScaleFactor)
DEFAULT_SCALES = (1.0, 1.08, 1.17, 1.26, 1.36)


@dataclasses.dataclass
class TuneResult:
    params: MdParams
    scale: float
    timings: List[Tuple[float, float]]   # (scale, seconds/step)


def candidate_params(params: MdParams, box_diag, scale: float) -> MdParams:
    """Scale rcoulomb and the grid spacing together; beta is derived
    from (rcoulomb, ewald_rtol) downstream so accuracy is preserved.
    rlist is recomputed by the runner's kinetic-theory buffer."""
    rc = params.rcoulomb * scale
    grid = pme_grid_size(box_diag, params.fourier_spacing * scale)
    return params.replace(rcoulomb=rc,
                          rvdw=params.rvdw,
                          rlist=max(params.rlist, rc + 0.1),
                          pme_grid=grid)


def tune_pme(system, params: MdParams, state, config=None,
             scales=DEFAULT_SCALES, steps: int = 40,
             verbose: bool = False) -> TuneResult:
    """Time a short chunk at each cutoff/grid candidate and return the
    fastest-equivalent parameter set.  No-op for non-PME runs."""
    import jax

    from .runner import MdRunner, RunnerConfig

    if params.coulomb != CoulombType.PME:
        return TuneResult(params=params, scale=1.0, timings=[])
    box_diag = tuple(float(v) for v in np.diag(np.asarray(state.box)))

    timings = []
    e_ref: Optional[float] = None
    best = (None, float("inf"))
    for s in scales:
        p = candidate_params(params, box_diag, s)
        cfg = dataclasses.replace(config) if config is not None \
            else RunnerConfig()
        runner = MdRunner(system, p, cfg)
        st = state
        try:
            # warmup chunk compiles the programs; its first frame is the
            # energy at the SHARED starting structure, the physics check
            st, logs_w = runner.run(st, max(p.nstlist, 1))
            jax.block_until_ready(st.x)
            t0 = time.perf_counter()
            st, _ = runner.run(st, steps)
            jax.block_until_ready(st.x)
            dt = (time.perf_counter() - t0) / steps
        except Exception as exc:     # candidate failed (overflow etc.)
            if verbose:
                print(f"  tunepme: scale {s:.2f} failed: {exc}")
            continue
        # physics check: the energy of the starting structure must match
        # the reference candidate within fp32 + cutoff-tail tolerance
        # (the real/recip split moves, the total must not)
        e0 = float(np.asarray(logs_w[0].epot)[0])
        if e_ref is None:
            e_ref = e0
        elif abs(e0 - e_ref) > 2e-2 * abs(e_ref) + 5.0:
            # realistic PME split error is a few kJ/mol (spline error of
            # the large excluded-pair grid/analytic cancellation); only
            # gross accuracy loss (under-resolved grids) is rejected
            if verbose:
                print(f"  tunepme: scale {s:.2f} energy drifted "
                      f"({e0:.3f} vs {e_ref:.3f}); skipped")
            continue
        timings.append((s, dt))
        if verbose:
            print(f"  tunepme: scale {s:.2f} rc={p.rcoulomb:.3f} "
                  f"grid={p.pme_grid} -> {dt * 1e3:.2f} ms/step")
        if dt < best[1]:
            best = (s, dt)
    if best[0] is None or best[0] == 1.0:
        chosen = params if best[0] is None else candidate_params(
            params, box_diag, 1.0)
        return TuneResult(params=chosen, scale=1.0, timings=timings)
    return TuneResult(params=candidate_params(params, box_diag, best[0]),
                      scale=best[0], timings=timings)
