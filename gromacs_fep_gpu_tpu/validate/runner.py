"""Run the golden FEP systems with our framework and collect per-step
reported energy terms (the in-process equivalent of grompp+mdrun+edr
reading in the reference's freeenergy.cpp test).

Requires JAX x64 mode for double-precision comparison (enable with
jax.config.update('jax_enable_x64', True) before calling, or run under
JAX_ENABLE_X64=1).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from ..core.types import FepCoupling, MdParams, State
from ..io.grompp import Preprocessed, preprocess
from .golden import GoldenCase, reported_dvdl_terms


def cast_pytree_f64(tree):
    import jax
    import jax.numpy as jnp

    def cast(x):
        if isinstance(x, (jax.Array, np.ndarray)) and \
                jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return jnp.asarray(x, jnp.float64)
        return x

    return jax.tree_util.tree_map(cast, tree)


def build_force_fn(pp: Preprocessed, force_path: str = "dense", x0=None):
    """Force path for the golden runs.

    force_path='dense': the O(N^2) oracle (reference CPU-kernel role).
    force_path='cluster': the PRODUCTION cluster pair-list kernel
    (make_cluster_force_fn, the path bench.py times) — the acceptance
    criterion of the reference fork is exactly production-path == refdata
    (freeenergy.cpp:159-165).  The golden boxes are triclinic, so this
    exercises the XLA cluster kernel; the pair list is built once from the
    initial coordinates with enough margin to stay valid for the 20-step
    trajectories (motion < 0.02 nm)."""
    from ..core.types import CoulombType
    from ..ops.forces import make_dense_force_fn
    from ..ops.pme import make_pme_recip_fn

    recip = None
    if pp.params.coulomb == CoulombType.PME:
        recip = make_pme_recip_fn(pp.system, pp.params)
    if force_path == "dense":
        return make_dense_force_fn(pp.system, pp.params, recip)
    assert force_path == "cluster", force_path
    import jax.numpy as jnp
    from ..ops.cluster_nb import make_cluster_force_fn
    from ..ops.pairlist import (build_cluster_pairlist, build_fep_pairlist,
                                check_exclusions)

    box = pp.state.box.astype(x0.dtype)
    rl = pp.params.rlist + 0.1
    nlist = build_cluster_pairlist(x0, box, pp.system, rl, nnbr=64)
    assert int(nlist.n_overflow) == 0
    assert int(check_exclusions(x0, box, pp.system, rl,
                                skip_perturbed=True)) == 0
    pert_idx = np.where(np.asarray(pp.system.perturbed))[0]
    feplist = None
    if pert_idx.size > 0:
        feplist = build_fep_pairlist(x0, box, pp.system, rl, pert_idx,
                                     max_nbr=176)
        assert int(feplist.n_overflow) == 0
    inner = make_cluster_force_fn(pp.system, pp.params, recip,
                                  has_fep=pert_idx.size > 0, block=8)
    return lambda x, bx, lam: inner(x, bx, lam, nlist, feplist)


def constrain_initial(pp: Preprocessed, x, v):
    """do_constrain_first analogue: project the input coordinates onto the
    constraint manifold, and make the velocities consistent by constraining
    x + dt*v (reference: mdlib/constr.cpp do_constrain_first)."""
    import jax.numpy as jnp
    from ..md import constraints as constr_mod
    from ..md.simulator import masses_at_lambda

    if constr_mod.n_constraints(pp.system) == 0:
        return x, v
    lam = jnp.asarray(pp.state.lam, x.dtype)
    _, invmass = masses_at_lambda(pp.system, lam[FepCoupling.MASS])
    dt = pp.params.dt
    x_c = constr_mod.constrain(x, x, pp.state.box.astype(x.dtype),
                               pp.system, invmass,
                               lam[FepCoupling.BONDED],
                               max(pp.params.lincs_order, 8), 4)
    xv = constr_mod.constrain(x_c, x_c + dt * v,
                              pp.state.box.astype(x.dtype), pp.system,
                              invmass, lam[FepCoupling.BONDED],
                              max(pp.params.lincs_order, 8), 4)
    v_c = (xv - x_c) / dt
    return x_c, v_c


def evaluate_terms(pp: Preprocessed, x, v, lam) -> Dict[str, float]:
    """Reported energy terms at one configuration (Potential + dV/dl)."""
    import jax
    import jax.numpy as jnp

    force_fn = build_force_fn(pp)
    f, terms = force_fn(x, pp.state.box.astype(x.dtype), lam)
    dvdl = np.asarray(terms.dvdl, np.float64)
    # kinetic dEkin/dl for perturbed masses on the current velocities
    # (reference: md_support.cpp:157)
    ma = np.asarray(pp.system.mass_a, np.float64)
    mb = np.asarray(pp.system.mass_b, np.float64)
    vv = np.asarray(v, np.float64)
    dekindl = float(np.sum(0.5 * (mb - ma) * np.sum(vv * vv, -1)))
    out = reported_dvdl_terms(dvdl, pp.separate_dvdl, dekindl=dekindl)
    out["Potential"] = float(terms.epot)
    return out


def run_case_step0(case: GoldenCase) -> Dict[str, float]:
    pp = preprocess(case.mdp, case.top, case.gro_path, [case.include_dir])
    pp = dataclasses.replace(pp, system=cast_pytree_f64(pp.system),
                             state=cast_pytree_f64(pp.state))
    x, v = constrain_initial(pp, pp.state.x, pp.state.v)
    return evaluate_terms(pp, x, v, pp.state.lam)


def run_case(case: GoldenCase, nsteps: Optional[int] = None,
             force_path: str = "dense") -> Dict[str, np.ndarray]:
    """Run the full MD chain and return per-frame reported terms
    (frames 0..nsteps inclusive, like the reference's edr output with
    nstcalcenergy=1)."""
    import jax
    import jax.numpy as jnp
    from ..md import constraints as constr_mod
    from ..md.integrators import remove_com_motion
    from ..md.simulator import make_step_fn, masses_at_lambda

    pp = preprocess(case.mdp, case.top, case.gro_path, [case.include_dir])
    pp = dataclasses.replace(pp, system=cast_pytree_f64(pp.system),
                             state=cast_pytree_f64(pp.state))
    if nsteps is None:
        nsteps = pp.params.nsteps
    x, v = constrain_initial(pp, pp.state.x, pp.state.v)
    # setup compute_globals removes COM motion before the first step
    # (reference: md.cpp initial compute_globals with CGLO_STOPCM)
    lam = jnp.asarray(pp.state.lam, x.dtype)
    if pp.params.nstcomm > 0:
        mass, _ = masses_at_lambda(pp.system, lam[FepCoupling.MASS])
        v = remove_com_motion(v, mass)
    state = pp.state.replace(x=x, v=v, lam=lam)

    force_fn = build_force_fn(pp, force_path=force_path, x0=x)

    # expanded ensemble / simulated tempering need the foreign-lambda
    # energies and the weight history in the state
    foreign_fn = None
    n_foreign = 0
    all_lambda = None
    if pp.params.expanded is not None and pp.all_lambda is not None:
        from ..md.expanded import DfHist
        from ..ops.forces import dense_energy, get_beta
        from ..core.types import CoulombType
        from ..ops.pme import make_pme_recip_fn

        all_lambda = jnp.asarray(pp.all_lambda, x.dtype)
        n_foreign = all_lambda.shape[1]
        recip = None
        if pp.params.coulomb == CoulombType.PME:
            recip = make_pme_recip_fn(pp.system, pp.params)
        beta = get_beta(pp.params)

        def epot_at(xx, box, l7):
            terms = dense_energy(xx, box, l7, pp.system, pp.params, beta,
                                 recip)
            return terms.epot

        def foreign_fn(xx, box, lam_cur):
            e_cur = epot_at(xx, box, lam_cur)
            e_all = jax.vmap(lambda l: epot_at(xx, box, l))(all_lambda.T)
            return e_all - e_cur

        state = state.replace(
            dfhist=cast_pytree_f64(DfHist.init(
                n_foreign, pp.params.expanded.init_wl_delta)))

    step_fn = make_step_fn(pp.system, pp.params, force_fn,
                           foreign_delta_fn=foreign_fn,
                           n_foreign=n_foreign, all_lambda=all_lambda)

    @jax.jit
    def segment(st):
        def body(s, _):
            s2, log = step_fn(s)
            return s2, (log, s2.fep_state)
        return jax.lax.scan(body, st, length=nsteps + 1)

    _, (logs, fep_states) = segment(state)

    ma = np.asarray(pp.system.mass_a, np.float64)
    mb = np.asarray(pp.system.mass_b, np.float64)
    frames: Dict[str, List[float]] = {}
    dvdl_all = np.asarray(logs.dvdl, np.float64)          # (T, 7)
    dekindl_all = np.asarray(logs.dekindl, np.float64)    # (T,)
    epot_all = np.asarray(logs.epot, np.float64)
    for t in range(nsteps + 1):
        out = reported_dvdl_terms(dvdl_all[t], pp.separate_dvdl,
                                  dekindl=float(dekindl_all[t]))
        out["Potential"] = float(epot_all[t])
        for k, val in out.items():
            frames.setdefault(k, []).append(val)
    result = {k: np.array(v) for k, v in frames.items()}
    # post-step lambda state per frame (expanded ensemble MC trajectory)
    result["fep_state"] = np.asarray(fep_states, np.int64)[:nsteps + 1]
    return result
