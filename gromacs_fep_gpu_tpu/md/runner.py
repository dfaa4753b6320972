"""High-level run driver: neighbor-search segments + simulation loop.

The mdrunner analogue (reference: src/gromacs/mdrun/runner.cpp:858): wires
system + params into force/step functions, drives nstlist-step jitted
segments with pair-list rebuilds between them, handles list-capacity
overflow by growing and recompiling (the reference reallocates its lists
on the host side too), and collects per-step logs.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import CoulombType, MdParams, State, System
from ..ops.cluster_nb import make_cluster_force_fn
from ..ops.forces import make_dense_force_fn
from ..ops.pairlist import build_cluster_pairlist, build_fep_pairlist
from ..ops.pme import make_pme_recip_fn, pme_grid_size
from ..utils.timing import Wallcycle
from .simulator import StepLog, make_step_fn
from .verletbuf import effective_rlist


@dataclasses.dataclass
class RunnerConfig:
    nnbr: int = 64
    fep_max_nbr: int = 256
    kernel_block: int = 64
    use_dense: bool = False     # small systems / debugging
    log_every: int = 1


class MdRunner:
    """Owns compiled step segments and the pair-list lifecycle."""

    def __init__(self, system: System, params: MdParams,
                 config: Optional[RunnerConfig] = None,
                 all_lambda=None):
        """all_lambda: optional (L, 7) lambda ladder; when given, the step
        loop records Delta H to every window each fep.nstdhdl steps."""
        self.system = system
        self.params = params
        self.config = config or RunnerConfig()
        self.all_lambda = all_lambda
        self.wallcycle = Wallcycle()

        self.pert_idx = np.where(np.asarray(system.perturbed))[0]
        self.has_fep = self.pert_idx.size > 0

        self.recip_fn = None
        if params.coulomb == CoulombType.PME:
            if params.pme_grid is None:
                raise ValueError("set params.pme_grid (use pme.pme_grid_size)")
            self.recip_fn = make_pme_recip_fn(system, params)

        if self.config.use_dense:
            force = make_dense_force_fn(system, params, self.recip_fn)
            self._force_fn = lambda x, box, lam, nl, fl: force(x, box, lam)
        else:
            self._force_fn = make_cluster_force_fn(
                system, params, self.recip_fn, has_fep=self.has_fep,
                block=self.config.kernel_block)

        def epot_only(x, box, lam):
            # for pressure: differentiable total energy on the dense path is
            # expensive; reuse force_fn terms via closure at segment level.
            f, terms = self._force_fn(x, box, lam, self._nlist, self._feplist)
            return terms.epot

        self._nlist = None
        self._feplist = None
        self._segment = None
        self._compiled_for = None

    # ---- pair-list management ----
    def _rebuild_lists(self, state: State):
        if self.config.use_dense:
            return
        with self.wallcycle.region("ns"):
            rl = effective_rlist(self.params)
            while True:
                nlist = build_cluster_pairlist(
                    state.x, state.box, self.system, rl, nnbr=self.config.nnbr)
                if int(nlist.n_overflow) == 0:
                    break
                self.config.nnbr = int(self.config.nnbr * 1.5)
                self._segment = None  # force recompile with new shapes
            self._nlist = nlist
            if self.has_fep:
                while True:
                    fl = build_fep_pairlist(state.x, state.box, self.system,
                                            rl, self.pert_idx,
                                            max_nbr=self.config.fep_max_nbr)
                    if int(fl.n_overflow) == 0:
                        break
                    self.config.fep_max_nbr = int(self.config.fep_max_nbr * 1.5)
                    self._segment = None
                self._feplist = fl

    def _build_segment(self, nsteps_seg: int):
        force_fn = self._force_fn

        def seg_force(x, box, lam, nlist, feplist):
            return force_fn(x, box, lam, nlist, feplist)

        def epot_fn_factory(nlist, feplist):
            def epot(x, box, lam):
                _, terms = force_fn(x, box, lam, nlist, feplist)
                return terms.epot
            return epot

        foreign_factory = None
        n_foreign = 0
        if self.all_lambda is not None:
            n_foreign = int(self.all_lambda.shape[0])
            if self.config.use_dense:
                from ..ops.forces import dense_energy, get_beta
                beta = get_beta(self.params)
                all_lam = self.all_lambda

                def foreign_factory(feplist):
                    def delta(x, box, lam):
                        def e_at(l):
                            return dense_energy(x, box, l, self.system,
                                                self.params, beta,
                                                self.recip_fn).epot
                        return jax.vmap(e_at)(all_lam) - e_at(lam)
                    return delta
            else:
                from ..ops.foreign import make_foreign_delta_fn
                delta_core = make_foreign_delta_fn(
                    self.system, self.params, self.all_lambda, self.recip_fn)

                def foreign_factory(feplist):
                    return lambda x, box, lam: delta_core(x, box, lam, feplist)

        def segment(state, nlist, feplist):
            bound_force = lambda x, box, lam: seg_force(x, box, lam, nlist,
                                                        feplist)
            step_fn = make_step_fn(
                self.system, self.params, bound_force,
                energy_epot_fn=epot_fn_factory(nlist, feplist),
                compute_pressure=self.params.pcoupl.value != "no",
                foreign_delta_fn=(foreign_factory(feplist)
                                  if foreign_factory else None),
                n_foreign=n_foreign)
            return jax.lax.scan(step_fn, state, length=nsteps_seg)

        return jax.jit(segment)

    def run(self, state: State, nsteps: int,
            callback: Optional[Callable] = None) -> Tuple[State, list]:
        """Run nsteps; returns (final_state, list of per-segment StepLog)."""
        nst = self.params.nstlist if not self.config.use_dense else nsteps
        nst = max(1, min(nst, nsteps))
        logs = []
        done = 0
        while done < nsteps:
            seg_len = min(nst, nsteps - done)
            self._rebuild_lists(state)
            key = (seg_len, self.config.nnbr, self.config.fep_max_nbr)
            if self._segment is None or self._compiled_for != key:
                self._segment = self._build_segment(seg_len)
                self._compiled_for = key
            with self.wallcycle.region("step"):
                state, log = self._segment(state, self._nlist, self._feplist)
                jax.block_until_ready(state.x)
            logs.append(log)
            done += seg_len
            if callback is not None:
                callback(state, log, done)
        return state, logs


def concat_logs(logs) -> StepLog:
    return jax.tree_util.tree_map(
        lambda *xs: np.concatenate([np.asarray(x) for x in xs]), *logs)
