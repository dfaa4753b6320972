"""High-level run driver: fused (pair-search + nstlist-step scan) chunks.

The mdrunner analogue (reference: src/gromacs/mdrun/runner.cpp:858).  One
jitted `chunk(state) -> (state, logs, overflow_flags)` performs the
neighbor-search rebuild AND the nstlist-step scan as a single XLA
program, so the host dispatches one call per nstlist steps and never
blocks on intermediate results — the TPU analogue of the reference's
whole-step CUDA-graph capture (mdlib/mdgraph_gpu_impl.cu) extended to
cover the NS step as well.

List-capacity overflow is reported in the chunk outputs; the host checks
the flags on the first chunk synchronously and every `check_every` chunks
asynchronously (reads lag behind dispatch, keeping the pipeline full).
On overflow the run resumes from the last verified state with grown
capacities (the reference reallocates its lists on the host too).
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
from ..ops.pairlist import (build_cluster_pairlist, build_fep_pairlist,
                            check_exclusions)
from ..utils.timing import Wallcycle
from .simulator import StepLog, make_step_fn
from .verletbuf import effective_rlist


@dataclasses.dataclass
class RunnerConfig:
    nnbr: int = 64
    fep_max_nbr: int = 256
    kernel_block: int = 32
    use_dense: bool = False     # small systems / debugging
    check_every: int = 8        # chunks between overflow-flag reads
    cell_size: Optional[float] = None  # sort-cell edge; default ~ cluster size
    use_pallas: bool = False    # Pallas supercluster kernel for the NB loop
    super_nnbr: int = 384       # supercluster list capacity (pallas path)
    pallas_interpret: bool = False
    # "v2u": union j-streams shared by 4-cluster i-blocks (default,
    #        fastest: fewest gathered rows at moderate pair-slot count);
    # "v2": per-i-cluster tight streams with baked-in shifts;
    # "cluster": per-i-cluster j streams, 2D grid;
    # "super": one shared j stream per 64-atom supercluster
    pallas_mode: str = "v2u"
    # bake build-time periodic shifts into the gathered j stream so the
    # kernel skips per-pair min-image folds (reference: per-entry shift
    # index, nbnxm/pairlist.h).  Default on: exact (validity fail-hard at
    # rebuild via shift_overflow) and ~6% faster than the in-loop
    # minimum-image kernel on TPU v5e.  Requires the f32-exact
    # frac_coords image counts (core/pbc.py) — the bf16 MXU default
    # misplaced boundary atoms by whole boxes.
    pallas_baked_shifts: bool = True
    # static cap (in GJU-cluster groups) on the packed v2u j-stream.
    # List CAPACITY (super_nnbr) carries 1.25x-growth headroom for the
    # worst block ever observed, but every per-step cost that scales
    # with the packed width (j-coordinate gather, shift fold, VMEM
    # staging, prep pack) only needs the CURRENT max in-range count
    # (s_max flag): at 81k capacity was G=23 vs max ng 13.  Maintained
    # lazily from the lagged flag reads; a rebuild that needs more than
    # the cap is caught by the s_max flag and rolled back like any
    # other overflow.  None = uncapped (= capacity).
    super_g: Optional[int] = None
    # v2u duo streams: pack the union j-stream as deduplicated 2-cluster
    # rows (16 atoms / 48 lanes per gathered row) instead of single
    # clusters — adjacent Hilbert-sorted clusters co-occur in a block's
    # list, so the per-step j-coordinate gather fetches ~2x fewer rows
    # for ~+13% masked kernel lanes (ops/pallas_nb.py PallasPrepV2U.duo).
    # Measured on TPU v5e: NEUTRAL at 12k and ~5% SLOWER at 81k — the
    # row-count model did not hold (the XLA row gather is not purely
    # per-row-bound), so default off; kept as an exact, tested variant.
    # Single-chip v2u only; DD uses per-cluster streams.
    pallas_duo: bool = False
    # packed duo-stream width in 16-row groups; maintained from the
    # duo_max flag exactly like super_g.  None = capacity worst case.
    super_g_duo: Optional[int] = None
    # i-clusters per v2u union block (the kernel's i-tile height).
    # 4 = the default union-of-4 (32 atoms); 2 halves the union-dilution
    # of the pair lanes at ~2x the pair-search query count; 1 = tight
    # per-cluster streams.  DD requires 4.
    pallas_bu: int = 4
    # candidate-tile capacity of the two-level pair search (its own knob:
    # deriving it from super_nnbr made the capacity shrink and the tile
    # growth fight each other).  None = formula default; grown from the
    # tile_max flag like the other capacities.
    tile_cap: Optional[int] = None
    # spatial domain decomposition: a jax.sharding.Mesh with a 'spatial'
    # axis (parallel/mesh.py make_mesh).  Atoms are slab-sorted along x,
    # each device owns a contiguous cluster slab, positions move by
    # ppermute ring halo and the PME grid reduces by psum (reference:
    # domdec/domdec.cpp dd_move_x + ewald pme grid overlap).  Runs the
    # production v2u Pallas kernels per device (make_dd_v2u_override);
    # other pallas modes fall back to the XLA cluster kernel.
    mesh: Optional[object] = None
    dd_block: int = 8           # clusters per kernel block on the DD path
    # N-D decomposition grid (P0, P1, P2) with prod == mesh spatial size;
    # None = 1-D slab ring.  2-D/3-D grids use the hierarchical
    # equal-count sort (ops/pairlist.py sort_atoms_dd) and per-axis
    # ppermute halo sweeps (reference: domdec_setup.cpp rank grids)
    dd_grid: Optional[Tuple[int, ...]] = None
    # locality-blocked PME spread/gather (ops/pme_blocked.py): atoms are
    # bucketed onto a coarse block grid at every pair-list rebuild and
    # the spread/gather run on per-block local subgrids — O(N*s^3)
    # instead of O(N*K^3).  None = auto (on at >= 30k atoms, where the
    # dense MXU formulation's HBM traffic dominates; measured crossover
    # TPU v5e).  Reference analogue: pme_spread.cu/pme_gather.cu touch
    # only the order^3 support.
    blocked_pme: Optional[bool] = None
    pme_block_amax: Optional[int] = None   # per-block atom capacity (auto)


class MdRunner:
    """Owns the compiled chunk function and the pair-list lifecycle."""

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

        self._dd_mesh = None
        self._dd_sort = None
        if self.config.pallas_bu not in (1, 2, 4):
            raise ValueError("pallas_bu must be 1, 2 or 4 (bitmasks hold "
                             "<= 32 bits at 8 atoms per cluster)")
        if self.config.pallas_bu == 1:
            self.config.pallas_duo = False   # duo rows need even C_pad
        if self.config.mesh is not None and not self.config.use_dense:
            from ..parallel.mesh import SPATIAL_AXIS
            if self.config.mesh.shape.get(SPATIAL_AXIS, 1) > 1:
                self._dd_mesh = self.config.mesh
                # the DD halo override gathers per-cluster streams from
                # 4-cluster blocks
                self.config.pallas_duo = False
                self.config.pallas_bu = 4
                if self.config.pallas_mode != "v2u":
                    # only the v2u union-stream kernel has a DD flavor
                    self.config.use_pallas = False
                if self.config.dd_grid is not None:
                    from ..ops.pairlist import dd_geometry
                    grid = tuple(self.config.dd_grid) + (1,) * (
                        3 - len(self.config.dd_grid))
                    nsh = self.config.mesh.shape[SPATIAL_AXIS]
                    if int(np.prod(grid)) != nsh:
                        raise ValueError(
                            f"dd_grid {grid} does not cover the "
                            f"{nsh}-device spatial mesh axis")
                    self.config.dd_grid = grid
                    ps, _ = dd_geometry(system.n_atoms, grid,
                                        self.config.dd_block)
                    self._dd_sort = (grid, ps)

        self.recip_fn = None
        self.recip_force_fn = None
        self._pme_nb = None    # blocked-PME coarse grid (static)
        if params.coulomb == CoulombType.PME:
            if params.pme_grid is None:
                raise ValueError("set params.pme_grid (use pme.pme_grid_size)")
            from ..ops.pme import make_pme_recip_pair
            self.recip_fn, self.recip_force_fn = make_pme_recip_pair(
                system, params)
            if self._dd_mesh is not None:
                from ..parallel.spatial import make_sharded_pme
                self.recip_force_fn = make_sharded_pme(
                    system, params, self._dd_mesh)
            else:
                use_blocked = self.config.blocked_pme
                if use_blocked is None:
                    # crossover re-measured after the inverse-permutation
                    # gather fix: blocked wins at 12k by ~13% (66.0 vs
                    # 57.5 ns/day, TPU v5e); dense keeps the small end
                    # where whole-grid MXU contractions are free
                    use_blocked = (system.n_atoms >= 8_000
                                   and not self.config.use_dense)
                if use_blocked and not self.config.use_dense:
                    from ..ops.pme_blocked import choose_blocks
                    nb, amax = choose_blocks(params.pme_grid,
                                             system.n_atoms,
                                             params.pme_order)
                    self._pme_nb = nb
                    if self.config.pme_block_amax is None:
                        self.config.pme_block_amax = amax

        if self.config.use_pallas and not self.config.use_dense:
            # mirror make_cluster_force_fn's fallback conditions so the
            # rebuild doesn't prepare Pallas data the force path won't use
            from ..ops.cluster_nb import lj_table_mode
            from ..core.types import VdwModifier
            if (lj_table_mode(np.asarray(system.nbfp)) != "geometric"
                    or params.vdw_modifier != VdwModifier.POTENTIAL_SHIFT
                    or params.vdw_type == "pme"):
                self.config.use_pallas = False

        self._triclinic = False   # set from the state box in run()
        self._make_force_fn()

        # density-guided simulation: load the reference map and build the
        # force provider once (reference: densityfitting.cpp:349-365)
        self._densfit_fn = None
        if params.densfit is not None:
            from ..io.mrcio import read_mrc
            from .densfit import make_densfit_force_fn
            m = read_mrc(params.densfit.reference_density)
            scale, trans = m.lattice_transform()
            self._densfit_fn = make_densfit_force_fn(
                params.densfit, m.data, scale, trans,
                np.asarray(system.mass_a), np.asarray(system.charge_a),
                params.dt)

        self._chunk_cache = {}
        self._rlist = None   # kinetic-theory sized at run() (needs volume)
        self.stopped_at = None   # step the StopHandler ended the run at

    # ------------------------------------------------------------------
    def _make_force_fn(self):
        """(Re)build the production force function from the current
        config — called at init and again if run() demotes the kernel
        path (e.g. triclinic box without baked shifts)."""
        system, params = self.system, self.params
        if self.config.use_dense:
            dense = make_dense_force_fn(system, params, self.recip_fn)
            self._force_fn = (lambda x, box, lam, nl, fl, prep=None,
                              **_flavor_kwargs: dense(x, box, lam))
            return
        nb_override = None
        if self._dd_mesh is not None:
            from ..ops.forces import get_beta
            from ..parallel.spatial import (make_dd_nb_override,
                                            make_dd_v2u_override)
            if self.config.use_pallas:
                # production Pallas kernels under DD (reference runs
                # its CUDA kernels under DD the same way,
                # nbnxm_cuda.cu:642 + gpuhaloexchange)
                nb_override = make_dd_v2u_override(
                    system, params, self._dd_mesh, get_beta(params),
                    block=self.config.dd_block,
                    grid=self.config.dd_grid,
                    interpret=self.config.pallas_interpret)
            else:
                nb_override = make_dd_nb_override(
                    system, params, self._dd_mesh, get_beta(params),
                    block=self.config.dd_block,
                    grid=self.config.dd_grid)
        self._force_fn = make_cluster_force_fn(
            system, params, self.recip_fn, has_fep=self.has_fep,
            block=self.config.kernel_block,
            use_pallas=self.config.use_pallas,
            pallas_interpret=self.config.pallas_interpret,
            pme_recip_force_fn=self.recip_force_fn,
            nb_kernel_override=nb_override)

    # ------------------------------------------------------------------
    def _foreign_factory(self):
        if self.all_lambda is None:
            return None, 0
        n_foreign = int(self.all_lambda.shape[0])
        if self.config.use_dense:
            from ..ops.forces import dense_energy, get_beta
            beta = get_beta(self.params)
            all_lam = self.all_lambda

            def factory(feplist):
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

            def factory(feplist):
                return lambda x, box, lam: delta_core(x, box, lam, feplist)
        return factory, n_foreign

    def _flavor_pattern(self, start_step: int, seg_len: int) -> str:
        """Per-offset force-kernel flavor for a chunk starting at absolute
        step start_step: 'F' force-only, 'E' energy, 'R' energy+virial.

        Mirrors the step function's do_ener/do_vir triggers exactly (all
        are step%N==0 with static N, so they are host-computable) — this
        lets the chunk be composed of statically-flavored segments with
        no per-step lax.cond around the force kernels, which measured
        +0.6 ms/step on TPU (reference analogue: the kernel flavor is a
        launch-time choice, nbnxm/kerneldispatch.cpp:447)."""
        p = self.params
        compute_pressure = p.pcoupl.value != "no"
        # mirror of the scan()-local bound_force_vir condition
        vir_active = (compute_pressure and not self.config.use_dense
                      and self._dd_mesh is None
                      and (not self.config.use_pallas
                           or self.config.pallas_mode == "v2u")
                      and p.pcoupltype != "anisotropic")
        noener_active = (not self.config.use_dense and p.nstcalcenergy > 1)
        exp = p.expanded
        has_expanded = (exp is not None and self.all_lambda is not None
                        and exp.nstexpanded > 0
                        and exp.lmc_move not in ("no", ""))
        has_awh = (p.awh is not None and self.all_lambda is not None
                   and p.awh.coord_provider == "fep-lambda")
        foreign_active = self.all_lambda is not None
        out = []
        for o in range(seg_len):
            s = start_step + o
            # mirror of the step fn's foreign-sweep `need`
            foreign = foreign_active and (
                (s % p.fep.nstdhdl) == 0
                or (has_expanded and (s % exp.nstexpanded) == 0 and s > 0)
                or (has_awh and (s % p.awh.nstsample) == 0 and s > 0))
            if not noener_active:
                ener = True
            else:
                ener = (s % p.nstcalcenergy) == 0 or foreign
                if p.fep.enabled:
                    ener = ener or (s % p.fep.nstdhdl) == 0
                if has_expanded:
                    ener = ener or ((s % exp.nstexpanded) == 0 and s > 0)
                if has_awh:
                    ener = ener or ((s % p.awh.nstsample) == 0 and s > 0)
            vir = vir_active and (s % p.nstpcouple) == 0
            fl = "R" if vir else ("E" if (ener or vir) else "F")
            if foreign:
                fl = {"E": "D", "R": "S"}[fl]
            if p.mts and (s % p.mts_factor) != 0:
                # MTS off-step: recip force skipped.  Energy/virial steps
                # must land on MTS steps (validated in run()); if an
                # unvalidated trigger slips through, fail loudly rather
                # than report energies without the recip term
                if fl != "F":
                    raise ValueError(
                        f"step {s}: energy/virial step not aligned with "
                        f"mts-level2-factor {p.mts_factor}")
                fl = "f"
            out.append(fl)
        return "".join(out)

    def _build_chunk(self, seg_len: int, flavors: Optional[str] = None):
        """Two jitted programs per chunk: pair-search rebuild and the
        nstlist-step scan.  Keeping them separate lets XLA pick clean
        input layouts for the scan (fusing the rebuild into the same
        program measured 3.5x slower per step); both dispatches are async
        so the host still never blocks.

        flavors: optional per-offset force-kernel flavor string from
        _flavor_pattern; when given, the scan is composed of
        statically-flavored segments instead of a per-step lax.cond."""
        cfg = self.config
        rl = self._rlist if self._rlist is not None else effective_rlist(
            self.params)
        foreign_factory, n_foreign = self._foreign_factory()
        force_fn = self._force_fn
        compute_pressure = self.params.pcoupl.value != "no"
        # excluded pairs beyond the list cutoff silently lose their
        # RF/Ewald corrections: checked at EVERY rebuild, failed hard in
        # run() (reference: nbnxm/exclusionchecker.cpp)
        check_excl = self.params.coulomb in (CoulombType.PME,
                                             CoulombType.REACTION_FIELD)

        def rebuild(state: State):
            if cfg.use_dense:
                return None, None, None, None, jnp.zeros((9,), jnp.int32)
            v2u = cfg.use_pallas and cfg.pallas_mode == "v2u"
            nlist = build_cluster_pairlist(
                state.x, state.box, self.system, rl,
                # the v2u path consumes only the union list; a stub
                # per-cluster list capacity keeps the rebuild cheap
                nnbr=(0 if v2u else cfg.nnbr),
                cell_size=cfg.cell_size,
                super_nnbr=(cfg.super_nnbr
                            if cfg.use_pallas
                            and cfg.pallas_mode in ("super", "v2u")
                            else None),
                super_block=(cfg.pallas_bu if v2u else 8),
                # DD: slab-sort along x (1-D ring) or the hierarchical
                # equal-count sort (N-D grid) so contiguous cluster
                # ranges are the spatial cells the halo owns (domdec
                # cell order, domdec_setup.cpp)
                slab_axis=(0 if (self._dd_mesh is not None
                                 and self.config.dd_grid is None)
                           else None),
                dd_sort=self._dd_sort,
                # v2 (and v2u when opted in) folds build-time periodic
                # shifts into the gathered j coordinates (kernel skips
                # per-pair min-image folds)
                compute_shifts=(cfg.use_pallas
                                and (cfg.pallas_mode == "v2"
                                     or (cfg.pallas_mode == "v2u"
                                         and cfg.pallas_baked_shifts))),
                triclinic=self._triclinic,
                tile_cap=cfg.tile_cap)
            feplist = None
            fep_ovf = jnp.zeros((), jnp.int32)
            if self.has_fep:
                feplist = build_fep_pairlist(
                    state.x, state.box, self.system, rl, self.pert_idx,
                    max_nbr=cfg.fep_max_nbr)
                fep_ovf = feplist.n_overflow.astype(jnp.int32)
            s_ovf = (nlist.super_overflow.astype(jnp.int32)
                     if nlist.super_overflow is not None
                     else jnp.zeros((), jnp.int32))
            s_max = (nlist.super_max_count.astype(jnp.int32)
                     if nlist.super_max_count is not None
                     else jnp.zeros((), jnp.int32))
            excl_bad = (check_exclusions(state.x, state.box, self.system,
                                         rl, skip_perturbed=True
                                         ).astype(jnp.int32)
                        if check_excl else jnp.zeros((), jnp.int32))
            shift_bad = (nlist.shift_overflow.astype(jnp.int32)
                         if nlist.shift_overflow is not None
                         else jnp.zeros((), jnp.int32))
            n_ovf = (jnp.zeros((), jnp.int32) if v2u
                     else nlist.n_overflow.astype(jnp.int32))
            n_max = (jnp.zeros((), jnp.int32) if v2u
                     else nlist.max_count.astype(jnp.int32))
            halo_bad = jnp.zeros((), jnp.int32)
            if self._dd_mesh is not None:
                from ..parallel.mesh import SPATIAL_AXIS
                from ..parallel.spatial import halo_violations
                halo_bad = halo_violations(
                    nlist,
                    self.config.dd_grid
                    or self._dd_mesh.shape[SPATIAL_AXIS],
                    self.config.dd_block).astype(jnp.int32)
            pme_blocks = None
            pme_ovf = jnp.zeros((), jnp.int32)
            if self._pme_nb is not None:
                from ..ops.pme_blocked import build_pme_blocks
                pme_blocks = build_pme_blocks(
                    state.x, state.box, self.params.pme_grid,
                    self._pme_nb, cfg.pme_block_amax)
                pme_ovf = pme_blocks.n_overflow.astype(jnp.int32)
            t_ovf = (nlist.tile_overflow.astype(jnp.int32)
                     if nlist.tile_overflow is not None
                     else jnp.zeros((), jnp.int32))
            t_max = (nlist.tile_max.astype(jnp.int32)
                     if nlist.tile_max is not None
                     else jnp.zeros((), jnp.int32))
            fx_ov = jnp.zeros((), jnp.int32)
            prep = None
            if cfg.use_pallas:
                if cfg.pallas_mode == "v2u":
                    from ..ops.pallas_nb import pallas_prepare_v2u
                    prep = pallas_prepare_v2u(nlist, self.system.nbfp,
                                              g_cap=cfg.super_g,
                                              duo=cfg.pallas_duo,
                                              duo_g=cfg.super_g_duo,
                                              bu=cfg.pallas_bu)
                elif cfg.pallas_mode == "v2":
                    from ..ops.pallas_nb import pallas_prepare_v2
                    prep = pallas_prepare_v2(nlist, self.system.nbfp)
                elif cfg.pallas_mode == "super":
                    from ..ops.pallas_nb import pallas_prepare
                    prep = pallas_prepare(nlist, self.system.nbfp)
                else:
                    from ..ops.pallas_nb import pallas_prepare_cl
                    prep = pallas_prepare_cl(nlist, self.system.nbfp)
            d_ovf = d_max = jnp.zeros((), jnp.int32)
            if prep is not None and getattr(prep, "duo", False):
                d_ovf, d_max = prep.duo_ovf, prep.duo_max
            flags = jnp.stack([n_ovf, fep_ovf, n_max,
                               s_ovf, s_max, excl_bad, shift_bad,
                               halo_bad, pme_ovf, t_ovf, t_max, fx_ov,
                               d_ovf, d_max])
            return nlist, feplist, prep, pme_blocks, flags

        def scan(state: State, nlist, feplist, prep, pme_blocks):
            # MTS: on-steps apply the recip force as a factor-scaled
            # impulse; off-steps ('f' flavor) skip the recip entirely
            # (reference: mdlib MTS combineMtsForces)
            rs = float(self.params.mts_factor) if self.params.mts else 1.0
            bound_force = lambda x, box, lam: force_fn(x, box, lam, nlist,
                                                       feplist, prep,
                                                       recip_scale=rs,
                                                       pme_blocks=pme_blocks)
            bound_force_noener = None
            if not cfg.use_dense and self.params.nstcalcenergy > 1:
                bound_force_noener = (
                    lambda x, box, lam: force_fn(x, box, lam, nlist,
                                                 feplist, prep,
                                                 need_energy=False,
                                                 recip_scale=rs,
                                                 pme_blocks=pme_blocks))
            bound_force_mts_off = None
            if self.params.mts:
                bound_force_mts_off = (
                    lambda x, box, lam: force_fn(x, box, lam, nlist,
                                                 feplist, prep,
                                                 need_energy=False,
                                                 skip_recip=True))
            # decomposed NPT virial: supported on the XLA cluster kernel
            # and the v2u Pallas path (no DD override, no dense path)
            bound_force_vir = None
            if (compute_pressure and not cfg.use_dense
                    and self._dd_mesh is None
                    and (not cfg.use_pallas
                         or cfg.pallas_mode == "v2u")):
                bound_force_vir = (
                    lambda x, box, lam: force_fn(x, box, lam, nlist,
                                                 feplist, prep,
                                                 need_virial=True,
                                                 recip_scale=rs,
                                                 pme_blocks=pme_blocks))

            pull_static = (self.params.pull is not None
                           and len(self.params.pull) > 0
                           and all(c.rate == 0.0 for c in self.params.pull))

            def epot_fn(x, box, lam):
                _, terms = force_fn(x, box, lam, nlist, feplist, prep,
                                    pme_blocks=pme_blocks)
                e = terms.epot
                if pull_static:
                    # time-independent pull coords contribute to the
                    # pressure virial through the strain derivative
                    from .pull import pull_energy
                    e = e + pull_energy(x, box,
                                        jnp.asarray(self.system.mass_a),
                                        self.params.pull, 0.0)
                return e

            shell_relax = None
            if self.system.shells is not None:
                from .shellfc import make_shell_relax
                # relax on the force-only flavor when available (the SCF
                # needs no energies; reference: relax_shell_flexcon calls
                # do_force with energy output off except the last pass)
                shell_relax = make_shell_relax(
                    self.system,
                    bound_force_noener or bound_force,
                    n_iter=self.params.niter)

            def mk_step(flavor=None):
                return make_step_fn(
                    self.system, self.params, bound_force,
                    energy_epot_fn=epot_fn,
                    shell_relax_fn=shell_relax,
                    compute_pressure=compute_pressure,
                    force_vir_fn=bound_force_vir,
                    foreign_delta_fn=(foreign_factory(feplist)
                                      if foreign_factory else None),
                    n_foreign=n_foreign,
                    all_lambda=(self.all_lambda.T
                                if self.all_lambda is not None else None),
                    force_fn_noener=bound_force_noener,
                    densfit_fn=self._densfit_fn,
                    force_fn_mts_off=bound_force_mts_off,
                    static_flavor=flavor)

            if flavors is None:
                if self.params.mts:
                    raise ValueError("mts requires the host-computed "
                                     "flavored chunk path")
                state_out, log = jax.lax.scan(mk_step(), state,
                                              length=seg_len)
                return state_out, log
            # statically-flavored segments: consecutive same-flavor runs
            # become one lax.scan each, so no per-step cond survives
            from .simulator import scan_flavored
            return scan_flavored(mk_step, flavors, state)

        rebuild_j = jax.jit(rebuild)
        scan_j = jax.jit(scan)

        def chunk(state: State):
            nlist, feplist, prep, pme_blocks, flags = rebuild_j(state)
            state_out, log = scan_j(state, nlist, feplist, prep, pme_blocks)
            return state_out, log, flags

        return chunk

    def _grow(self, flags: np.ndarray):
        if flags[0] > 0:
            # size to the observed maximum + headroom, 16-aligned (the v2
            # kernel packs j-streams in 16-cluster groups)
            need = int(max(flags[2], self.config.nnbr) * 1.25 + 8)
            self.config.nnbr = (need + 15) // 16 * 16
        if flags[1] > 0:
            self.config.fep_max_nbr = int(self.config.fep_max_nbr * 1.5 + 8)
        if len(flags) > 3 and flags[3] > 0:
            need = int(max(flags[4], self.config.super_nnbr) * 1.25 + 8)
            self.config.super_nnbr = (need + 31) // 32 * 32
        if len(flags) > 5 and flags[5] > 0:
            self.config.pme_block_amax = int(
                self.config.pme_block_amax * 1.5 + 63) // 64 * 64
        self._chunk_cache.clear()

    def run(self, state: State, nsteps: int,
            callback: Optional[Callable] = None,
            stop_condition: Optional[Callable[[], bool]] = None
            ) -> Tuple[State, list]:
        """Run nsteps; returns (final_state, list of per-chunk StepLog).

        stop_condition() is polled at every overflow-check boundary (a
        synchronized, rollback-safe point); when it returns True the run
        ends cleanly after the current verified chunk — the StopHandler
        analogue (reference: mdlib/stophandler.h:125; signals/-maxh are
        wired by the CLI)."""
        nst = self.params.nstlist if not self.config.use_dense else nsteps
        nst = max(1, min(nst, nsteps))
        if self.params.mts:
            p, m = self.params, self.params.mts_factor
            if p.mts_forces != "longrange-nonbonded":
                raise ValueError("only mts-level2-forces = "
                                 "longrange-nonbonded is supported")
            if self.recip_force_fn is None or self.config.use_dense \
                    or self._dd_mesh is not None:
                raise ValueError("mts requires PME on the single-device "
                                 "cluster/Pallas path")
            checks = [("nstcalcenergy", p.nstcalcenergy)]
            if p.fep.enabled:
                checks.append(("nstdhdl", p.fep.nstdhdl))
            if p.pcoupl.value != "no":
                checks.append(("nstpcouple", p.nstpcouple))
            if p.expanded is not None:
                checks.append(("nstexpanded", p.expanded.nstexpanded))
            if p.awh is not None:
                checks.append(("awh-nstsample", p.awh.nstsample))
            for nm, n in checks:
                if n <= 1 or n % m != 0:
                    raise ValueError(
                        f"mts-level2-factor {m} requires {nm} (= {n}) to "
                        "be a multiple of it (reference: readir.cpp MTS "
                        "checks)")
        b = np.asarray(state.box)
        self._triclinic = bool(np.abs(b - np.diag(np.diag(b))).max() > 1e-6)
        if self.config.use_pallas and self._triclinic:
            # triclinic (e.g. dodecahedron) runs on the v2u Pallas path
            # via baked build-time shifts — the kernel itself is PBC-free
            # (reference: pbc.cpp triclinic shift machinery baked into
            # nbnxn_ci_t::shift indices).  Other Pallas modes / the
            # in-loop minimum-image flavor fall back to the XLA kernel.
            if not (self.config.pallas_mode == "v2u"
                    and self.config.pallas_baked_shifts):
                self.config.use_pallas = False
                self._make_force_fn()
                self._chunk_cache.clear()
        from .vsites import construct_vsites, n_vsites
        if n_vsites(self.system) > 0:
            state = state.replace(
                x=construct_vsites(state.x, self.system.vsites))
        if self._densfit_fn is not None and state.densfit is None:
            from .densfit import DensfitState
            state = state.replace(densfit=DensfitState.init())
        if (self.params.expanded is not None and self.all_lambda is not None
                and state.dfhist is None):
            from .expanded import DfHist
            state = state.replace(dfhist=DfHist.init(
                int(self.all_lambda.shape[0]),
                self.params.expanded.init_wl_delta))
        from ..core.types import IntegratorType, TcouplType
        nh_len = (self.params.nhchainlength
                  if (self.params.tcoupl == TcouplType.NOSE_HOOVER
                      and self.params.integrator == IntegratorType.MD_VV)
                  else 1)
        if state.coupling.xi.shape != (nh_len,):
            state = state.replace(coupling=state.coupling.replace(
                xi=jnp.zeros((nh_len,), state.x.dtype),
                vxi=jnp.zeros((nh_len,), state.x.dtype)))
        if (self.params.awh is not None and self.all_lambda is not None
                and self.params.awh.coord_provider == "fep-lambda"
                and state.dfhist is None):
            from ..core.units import BOLTZ
            from .awh import AwhState
            state = state.replace(dfhist=AwhState.init(
                int(self.all_lambda.shape[0]),
                self.params.awh.error_init
                / (BOLTZ * self.params.ref_t)))
        if (self.params.awh is not None
                and self.params.awh.coord_provider == "pull"):
            # continuous-coordinate AWH: bias over the umbrella grid;
            # start from the grid point nearest the initial coordinate
            # (reference: coordstate.cpp CoordState constructor)
            from ..core.units import BOLTZ
            from .awh import AwhState
            from .pull import pull_distance
            a = self.params.awh
            if state.dfhist is None:
                state = state.replace(dfhist=AwhState.init(
                    a.n_points, a.error_init / (BOLTZ * self.params.ref_t)))
            if state.awh_center is None:
                xi0 = float(pull_distance(
                    state.x, state.box, jnp.asarray(self.system.mass_a),
                    self.params.pull[a.pull_coord - 1]))
                centers = np.linspace(a.coord_min, a.coord_max, a.n_points)
                state = state.replace(awh_center=jnp.asarray(
                    int(np.argmin(np.abs(centers - xi0))), jnp.int32))
        if self.config.cell_size is None and not self.config.use_dense:
            vol = float(np.prod(np.diag(np.asarray(state.box))))
            n = max(self.system.n_atoms, 1)
            self.config.cell_size = max((8.0 * vol / n) ** (1.0 / 3.0), 0.15)
        if self._rlist is None and not self.config.use_dense:
            vol = float(np.prod(np.diag(np.asarray(state.box))))
            self._rlist = effective_rlist(self.params, system=self.system,
                                          volume=vol)

        logs = []
        done = 0
        # host mirror of state.step: every flavor trigger is step%N==0
        # with static N, so chunk force flavors are host-computable (one
        # scalar fetch per run() call)
        step0 = int(np.asarray(jax.device_get(state.step)))
        verified_state, verified_done, verified_nlogs = state, 0, 0
        pending = []   # (flags_device, done_after, nlogs_after)
        first_chunk = True
        may_tighten = True   # stream tightening only at the first check
        while done < nsteps:
            seg_len = min(nst, nsteps - done)
            flavors = self._flavor_pattern(step0 + done, seg_len)
            key = (seg_len, self.config.nnbr, self.config.fep_max_nbr,
                   self.config.super_nnbr, flavors,
                   self.config.pallas_baked_shifts,
                   self.config.pme_block_amax, self.config.super_g,
                   self.config.use_pallas, self._triclinic,
                   self.config.tile_cap,
                   self.config.pallas_duo, self.config.super_g_duo,
                   self.config.pallas_bu)
            chunk = self._chunk_cache.get(key)
            if chunk is None:
                chunk = self._build_chunk(seg_len, flavors)
                self._chunk_cache[key] = chunk
            with self.wallcycle.region("chunk"):
                state, log, flags = chunk(state)
            logs.append(log)
            done += seg_len
            pending.append((flags, state, done, len(logs)))

            # flag reads run a full check_every chunks BEHIND the dispatch
            # frontier: the device_get of chunk k's flags only happens once
            # chunks k+1..k+check_every are already enqueued, so the ~25 ms
            # host round-trip overlaps device work instead of idling the
            # chip (the reference's analogue: staged D2H of kernel outputs
            # consumed a step later, nbnxm/gpu_common.h staged reductions)
            at_end = done >= nsteps
            check = (first_chunk
                     or len(pending) >= 2 * self.config.check_every
                     or at_end)
            first_chunk = False
            if check:
                take = pending if at_end else \
                    pending[:self.config.check_every]
                with self.wallcycle.region("overflow_check"):
                    fl = np.asarray(
                        jax.device_get(jnp.stack([p[0] for p in take])))
                if fl.shape[1] > 7 and fl[:, 7].sum() > 0:
                    raise RuntimeError(
                        f"{int(fl[:, 7].sum())} pair(s) reach beyond the "
                        "ring-halo neighbourhood: the spatial slabs are "
                        "thinner than the pair-list cutoff for this mesh. "
                        "Use fewer spatial shards or a larger box "
                        "(reference behavior: domdec cell-size-vs-cutoff "
                        "fatal error, domdec.cpp)")
                if fl.shape[1] > 6 and fl[:, 6].sum() > 0:
                    if self._triclinic and self.config.use_pallas:
                        # ambiguous-image entries in a skewed cell: the
                        # baked-shift contract fails -> XLA kernel path
                        self.config.use_pallas = False
                        self._make_force_fn()
                        self._chunk_cache.clear()
                        state = verified_state
                        done = verified_done
                        logs = logs[:verified_nlogs]
                        pending = []
                        continue
                    if (self.config.pallas_mode == "v2u"
                            and self.config.pallas_baked_shifts):
                        # cluster extents too large relative to the box
                        # for build-time shifts (small box / gas density):
                        # degrade to the in-loop minimum-image kernel —
                        # same physics, ~6% slower — and roll back to the
                        # last verified state
                        self.config.pallas_baked_shifts = False
                        self._chunk_cache.clear()
                        state = verified_state
                        done = verified_done
                        logs = logs[:verified_nlogs]
                        pending = []
                        continue
                    raise RuntimeError(
                        "cluster extents too large relative to the box for "
                        "the v2/v2u Pallas kernel's build-time periodic "
                        "shifts "
                        "(gas-density system or tiny box); rerun with "
                        "RunnerConfig(pallas_mode='super') or use_dense")
                if fl.shape[1] > 5 and fl[:, 5].sum() > 0:
                    raise RuntimeError(
                        f"{int(fl[:, 5].sum())} excluded atom pair(s) beyond "
                        f"the pair-list cutoff ({self._rlist:.3f} nm): their "
                        "RF/Ewald exclusion corrections would be lost. The "
                        "system is blowing up, or rlist/box is too small "
                        "for the molecular geometry (reference behavior: "
                        "nbnxm/exclusionchecker.cpp fails hard here)")
                pme_ovf = fl[:, 8].sum() if fl.shape[1] > 8 else 0
                s_max_obs = int(fl[:, 4].max())
                t_ovf = fl[:, 9].sum() if fl.shape[1] > 9 else 0
                t_max_obs = int(fl[:, 10].max()) if fl.shape[1] > 10 else 0
                v2u_active = (self.config.use_pallas
                              and self.config.pallas_mode == "v2u"
                              and not self.config.use_dense)
                g_trunc = 0
                if v2u_active and self.config.super_g is not None:
                    from ..ops.pallas_nb import GJU
                    if s_max_obs > self.config.super_g * GJU:
                        # a rebuild needed more j-groups than the packed
                        # cap: the kernel walked a truncated stream —
                        # discard those chunks and re-pack wider
                        g_trunc = 1
                        self.config.super_g = -(-int(s_max_obs * 1.1 + 8)
                                                // GJU)
                        self._chunk_cache.clear()
                if t_ovf > 0:
                    # candidate-tile capacity exceeded: the rebuild's
                    # lists are underestimates — grow the tile knob
                    self.config.tile_cap = (
                        int(max(t_max_obs,
                                (self.config.tile_cap or 0)) * 1.25) + 8)
                    self._chunk_cache.clear()
                # flags slot 11 is reserved (was the deleted v3u
                # fixup-stream overflow; always zero now)
                fx_ovf = fl[:, 11].sum() if fl.shape[1] > 11 else 0
                d_ovf = fl[:, 12].sum() if fl.shape[1] > 12 else 0
                d_max_obs = int(fl[:, 13].max()) if fl.shape[1] > 13 else 0
                if d_ovf > 0:
                    # duo stream truncated: re-pack wider and roll back
                    from ..ops.pallas_nb import DJU
                    self.config.super_g_duo = -(-int(d_max_obs * 1.1 + 8)
                                                // DJU)
                    self._chunk_cache.clear()
                if (fl[:, :2].sum() + fl[:, 3:4].sum() + pme_ovf
                        + g_trunc + t_ovf + fx_ovf + d_ovf > 0):
                    # roll back to last verified point with grown capacity
                    if fl[:, :2].sum() + fl[:, 3:4].sum() + pme_ovf > 0:
                        self._grow(np.array([fl[:, 0].sum(), fl[:, 1].sum(),
                                             fl[:, 2].max(), fl[:, 3].sum(),
                                             fl[:, 4].max(), pme_ovf]))
                    state = verified_state
                    done = verified_done
                    logs = logs[:verified_nlogs]
                    pending = []
                    continue
                if v2u_active and s_max_obs > 0 and may_tighten:
                    # lazily tighten the packed j-stream to what rebuilds
                    # actually need (vs the 1.25x-headroom CAPACITY): all
                    # per-step stream costs scale with it.  Hysteresis of
                    # 2 groups avoids recompile churn, and tightening is
                    # only allowed at the FIRST check of a run() call so
                    # a long production run never recompiles mid-flight.
                    from ..ops.pallas_nb import GJU
                    target = -(-int(s_max_obs * 1.05 + 8) // GJU)
                    if (self.config.super_g is None
                            or target <= self.config.super_g - 2):
                        self.config.super_g = target
                        self._chunk_cache.clear()
                    # shrink list CAPACITY back toward observed need too:
                    # the pair-search packing cost scales with it (e.g.
                    # equilibration can leave a 1.5x-oversized capacity
                    # behind for the whole production run)
                    cap = -(-int(s_max_obs * 1.2 + 16) // 32) * 32
                    if cap <= self.config.super_nnbr - 96:
                        self.config.super_nnbr = cap
                        self._chunk_cache.clear()
                    if t_max_obs > 0:
                        tc = int(t_max_obs * 1.2) + 6
                        if (self.config.tile_cap is None
                                or tc <= self.config.tile_cap - 12):
                            self.config.tile_cap = tc
                            self._chunk_cache.clear()
                    if self.config.pallas_duo and d_max_obs > 0:
                        # tighten the packed duo stream to observed need
                        from ..ops.pallas_nb import DJU
                        tgt = -(-int(d_max_obs * 1.05 + 8) // DJU)
                        if (self.config.super_g_duo is None
                                or tgt <= self.config.super_g_duo - 2):
                            self.config.super_g_duo = tgt
                            self._chunk_cache.clear()
                may_tighten = False
                verified_state, verified_done, verified_nlogs = (
                    take[-1][1], take[-1][2], take[-1][3])
                pending = pending[len(take):]
                if stop_condition is not None and stop_condition():
                    # clean early stop: flag checks lag the dispatch
                    # frontier, so return the newest VERIFIED state (any
                    # still-unverified chunks beyond it are discarded)
                    if callback is not None:
                        callback(verified_state, log, verified_done)
                    self.stopped_at = verified_done
                    return verified_state, logs[:verified_nlogs]

            if callback is not None:
                callback(state, log, done)
        self.stopped_at = None
        return state, logs


def concat_logs(logs) -> StepLog:
    return jax.tree_util.tree_map(
        lambda *xs: np.concatenate([np.asarray(x) for x in xs]), *logs)
