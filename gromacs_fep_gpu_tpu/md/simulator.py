"""The MD step loop — do_md analogue (reference: src/gromacs/mdrun/md.cpp:159
LegacySimulator::do_md, step loop :851).

One jitted `step(state) -> (state, StepLog)` closes over the System and
static MdParams; `run` drives lax.scan segments (a segment = nstlist steps
between neighbor-list rebuilds on the cluster path; the dense path scans
freely).  The whole step — forces, integration, constraints, T/P coupling,
dH/dlambda — is one XLA program per segment, the TPU analogue of the
reference's CUDA-graph whole-step capture (mdlib/mdgraph_gpu_impl.cu).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core import pbc as pbc_mod
from ..core.types import (EnergyTerms, FepCoupling, IntegratorType, MdParams,
                          PcouplType, State, System, TcouplType)
from ..core.units import BOLTZ, PRESFAC
from . import constraints as constr_mod
from . import coupling as coupling_mod
from . import integrators as integ_mod


@struct.dataclass
class StepLog:
    epot: jnp.ndarray
    ekin: jnp.ndarray
    temp: jnp.ndarray
    pres: jnp.ndarray
    lam: jnp.ndarray            # (7,)
    dvdl: jnp.ndarray           # (7,)
    terms: EnergyTerms
    constr_rmsd: jnp.ndarray
    delta_h: jnp.ndarray        # (L,) foreign-lambda U(l)-U(cur); (0,) if off
    dekindl: jnp.ndarray        # dEkin/dlambda-mass (reference: F_DKDL)
    pull_x: jnp.ndarray         # (P,) pull-coordinate values; (0,) if off
    pull_f: jnp.ndarray         # (P,) pull scalar forces
    # density-fitting similarity (NaN when off or on a non-calc step;
    # reference: densityfittingforceprovider.cpp:375 similarity output)
    densfit_sim: jnp.ndarray = None


def degrees_of_freedom(system: System, params: MdParams) -> float:
    from .shellfc import n_shells
    from .vsites import n_vsites
    n = system.n_atoms
    # shells are massless SCF particles: no kinetic degrees of freedom
    # (reference: ndof excludes ptype SHELL, mdlib/mdatoms + dof calc)
    ndf = (3 * n - constr_mod.n_constraints(system) - 3 * n_vsites(system)
           - 3 * n_shells(system))
    if params.nstcomm > 0:
        ndf -= 3
    return float(ndf)


def masses_at_lambda(system: System, lam_mass):
    m = (1.0 - lam_mass) * system.mass_a + lam_mass * system.mass_b
    # virtual sites have zero mass: invmass 0 keeps them frozen in the
    # integrator (their positions are reconstructed each step)
    invm = jnp.where(m > 0, 1.0 / jnp.where(m > 0, m, 1.0), 0.0)
    return m, invm


def current_lambdas(step, lam0, params: MdParams):
    """Per-step lambda vector incl. slow growth
    (reference: mdlib/freeenergyparameters.cpp:155 currentLambdas).

    lam0 is the PREVIOUS step's lambda (State.lam accumulates), so slow
    growth advances by delta_lambda once per step (none at step 0)."""
    if params.fep.delta_lambda == 0.0:
        return lam0
    dl = jnp.where(step > 0, params.fep.delta_lambda, 0.0)
    return jnp.clip(lam0 + dl, 0.0, 1.0)


def make_pressure_fn(energy_epot_fn: Callable,
                     p_extra_fn: Optional[Callable] = None):
    """Diagonal stress via strain jvp: scale x and box by (1+e) along each
    axis; P_aa = (2 K_aa - dU/de_aa) / V (reference semantics:
    mdlib/coupling.cpp calc_pres from Ekin and virial).
    p_extra_fn(box): isotropic extra pressure in bar (dispersion tail)."""

    def pressure(x, box, lam, v, mass, extra_virial_diag=None):
        vol = pbc_mod.box_volume(box)

        def u_of_strain(eps):
            s = 1.0 + eps  # (3,)
            return energy_epot_fn(x * s[None, :], box * s[None, :], lam)

        dude = jax.grad(u_of_strain)(jnp.zeros(3, x.dtype))
        ekin_diag = 0.5 * jnp.sum(mass[:, None] * v * v, axis=0)
        vir_diag = 0.5 * dude  # Xi_aa = 1/2 dU/de_aa
        if extra_virial_diag is not None:
            vir_diag = vir_diag + extra_virial_diag
        p_diag = 2.0 / vol * (ekin_diag - vir_diag) * PRESFAC
        if p_extra_fn is not None:
            p_diag = p_diag + p_extra_fn(box)
        return jnp.mean(p_diag), p_diag

    return pressure


def make_pressure_tensor_fn(energy_epot_fn: Callable,
                            p_extra_fn: Optional[Callable] = None):
    """FULL 3x3 stress via strain gradient: deform coordinates and box
    by (I + E) and differentiate (one backward pass for all nine
    components); P_ab = (2 K_ab - dU/dE_ab) / V (reference semantics:
    sim_util.cpp calc_virial full tensor).  Used by the anisotropic
    Parrinello-Rahman branch."""

    def pressure(x, box, lam, v, mass, extra_virial_diag=None):
        vol = pbc_mod.box_volume(box)
        eye = jnp.eye(3, dtype=x.dtype)

        def u_of_strain(E):
            A = eye + E
            return energy_epot_fn(x @ A.T, box @ A.T, lam)

        dude = jax.grad(u_of_strain)(jnp.zeros((3, 3), x.dtype))
        vir = 0.5 * (dude + dude.T) * 0.5      # symmetrized, Xi = dU/dE/2
        if extra_virial_diag is not None:
            vir = vir + jnp.diag(extra_virial_diag)
        ekin_t = 0.5 * jnp.einsum("ni,nj->ij", v * mass[:, None], v)
        p_t = 2.0 / vol * (ekin_t - vir) * PRESFAC
        if p_extra_fn is not None:
            p_t = p_t + jnp.eye(3, dtype=x.dtype) * p_extra_fn(box) / 1.0
        return jnp.trace(p_t) / 3.0, p_t

    return pressure


def make_step_fn(system: System, params: MdParams, force_fn: Callable,
                 energy_epot_fn: Optional[Callable] = None,
                 compute_pressure: bool = False,
                 foreign_delta_fn: Optional[Callable] = None,
                 n_foreign: int = 0,
                 all_lambda=None,
                 force_fn_noener: Optional[Callable] = None,
                 temp_ladder=None,
                 force_vir_fn: Optional[Callable] = None,
                 densfit_fn: Optional[Callable] = None,
                 force_fn_mts_off: Optional[Callable] = None,
                 static_flavor: Optional[str] = None,
                 shell_relax_fn: Optional[Callable] = None):
    """force_fn(x, box, lam) -> (f, EnergyTerms).
    shell_relax_fn(x, box, lam) -> x: pre-step SCF relaxation of
    polarizable shells (md/shellfc.py; reference: relax_shell_flexcon
    runs before every integration step, mdrun/shellfc.cpp:930).
    foreign_delta_fn(x, box, lam) -> (n_foreign,) Delta-H vector, evaluated
    every fep.nstdhdl steps (reference: mdebin_bar.cpp Delta-H collection)
    and at expanded-ensemble MC steps.
    all_lambda: (7, L) per-component lambda matrix; required for expanded
    ensemble / simulated tempering (params.expanded is not None).
    temp_ladder: (L,) per-replica thermostat temperatures indexed by
    state.fep_state — T-replica-exchange mode (the multisim analogue,
    reference: replicaexchange.cpp T branch).
    static_flavor: 'F' (force-only), 'E' (energy), or 'R' (energy+virial)
    pins the force-kernel flavor at TRACE time instead of the per-step
    lax.cond — the runner knows each chunk offset's flavor on the host
    (all triggers are step%N==0 with static N) and composes chunks from
    statically-flavored segments; the cond version measured +0.6 ms/step
    on TPU because the branch blocks XLA's scheduling around the force
    (reference analogue: kernel flavor picked at launch time,
    nbnxm/kerneldispatch.cpp:447)."""
    ndf = degrees_of_freedom(system, params)
    dt = params.dt
    has_constraints = constr_mod.n_constraints(system) > 0
    # FEP-perturbed constraint lengths contribute dH/dl via the Lagrange
    # multipliers (reference: lincs.cpp:1257, summed into the bonded
    # component, enerdata_utils.cpp:364)
    import numpy as _np
    has_pert_constr = (params.fep.enabled
                       and system.lincs.atoms.shape[0] > 0
                       and bool(_np.any(_np.asarray(system.lincs.length_a)
                                        != _np.asarray(system.lincs.length_b
                                                       ))))
    p_extra_fn = None
    if params.dispcorr:
        from ..ops.dispcorr import make_dispersion_correction
        _, p_extra_fn = make_dispersion_correction(system, params)
    # decomposed virial: the force pass itself fills terms.vir_diag at
    # pressure steps (NB kernel pair sums + cheap-term strain grad), so
    # NPT costs no second full energy evaluation (reference:
    # sim_util.cpp calc_virial from the same force pass)
    pressure_from_force = (compute_pressure and force_vir_fn is not None
                           and params.pcoupltype != "anisotropic")
    pressure_fn = (make_pressure_fn(energy_epot_fn, p_extra_fn)
                   if compute_pressure and energy_epot_fn is not None
                   and not pressure_from_force else None)
    # full-stress variant for anisotropic Parrinello-Rahman
    pressure_tensor_fn = (
        make_pressure_tensor_fn(energy_epot_fn, p_extra_fn)
        if (compute_pressure and energy_epot_fn is not None
            and params.pcoupl == PcouplType.PARRINELLO_RAHMAN
            and params.pcoupltype == "anisotropic") else None)

    from .vsites import construct_vsites, n_vsites, spread_vsite_forces
    has_vsites = n_vsites(system) > 0

    # COM pulling: the computeSpecialForces slot (sim_util.cpp:624)
    has_pull = params.pull is not None and len(params.pull) > 0
    if has_pull:
        from .pull import make_pull_force_fn
        pull_fn = make_pull_force_fn(params.pull, system.mass_a)
    efield_fn = None
    if params.efield is not None:
        from .efield import make_efield_force_fn
        efield_fn = make_efield_force_fn(params.efield, system.charge_a,
                                         system.charge_b)
    # flat LJ walls (reference: wall.cpp do_walls, called from
    # do_force's special-forces region)
    wall_fn = None
    if params.walls is not None:
        from .walls import wall_energy
        _wall_pert = bool(np.any(np.asarray(system.type_a)
                                 != np.asarray(system.type_b)))

        def wall_fn(x, box, lamv):
            e, g = jax.value_and_grad(wall_energy)(
                x, box, system.type_a, system.type_b, system.nbfp,
                params.walls, lamv, _wall_pert)
            dvdl = jax.grad(wall_energy, argnums=6)(
                x, box, system.type_a, system.type_b, system.nbfp,
                params.walls, lamv, _wall_pert)
            return -g, e, dvdl
    # density-guided simulation (another computeSpecialForces provider;
    # reference: densityfittingforceprovider.cpp:255 calculateForces)
    has_densfit = densfit_fn is not None and params.densfit is not None
    densfit_nst = params.densfit.nst if has_densfit else 1

    # expanded ensemble / simulated tempering setup
    exp = params.expanded
    has_expanded = exp is not None and all_lambda is not None \
        and exp.nstexpanded > 0 and exp.lmc_move not in ("no", "")
    # AWH biasing on the lambda coordinate (awh.h:256 fepLambdaState);
    # mutually exclusive with expanded ensemble (readir.cpp checks)
    has_awh = (params.awh is not None and all_lambda is not None
               and params.awh.coord_provider == "fep-lambda")
    if has_awh and has_expanded:
        raise ValueError("awh and expanded ensemble are mutually exclusive")
    # AWH on a continuous pull coordinate (awh1-dim1-coord-provider =
    # pull): the bias umbrella-couples to one pull coordinate whose
    # reference distance tracks the current grid point
    has_awh_pull = (params.awh is not None
                    and params.awh.coord_provider == "pull")
    awh_centers = None
    if has_awh_pull:
        if not has_pull:
            raise ValueError("awh coord-provider = pull needs pull coords")
        if not (1 <= params.awh.pull_coord <= len(params.pull)):
            raise ValueError(f"awh pull-coord {params.awh.pull_coord} "
                             "out of range")
        awh_centers = jnp.linspace(params.awh.coord_min,
                                   params.awh.coord_max,
                                   params.awh.n_points)
    sim_temps = None
    if has_expanded and exp.sim_temp:
        from .expanded import simulated_tempering_temperatures
        sim_temps = simulated_tempering_temperatures(
            int(jnp.asarray(all_lambda).shape[1]), exp.sim_temp_low,
            exp.sim_temp_high, exp.sim_temp_scale,
            jnp.asarray(all_lambda)[int(FepCoupling.TEMPERATURE)])

    # mass perturbation is a host-known property: skip the per-step
    # dEkin/dl reductions entirely for the (vast majority of) systems
    # with unperturbed masses
    _has_pert_mass = bool(_np.any(_np.asarray(system.mass_b)
                                  != _np.asarray(system.mass_a)))

    def dekindl_of(v):
        """dEkin/dlambda-mass at constant velocity
        (reference: md_support.cpp:157)."""
        if not _has_pert_mass:
            return jnp.zeros((), v.dtype)
        dm = system.mass_b - system.mass_a
        return 0.5 * jnp.sum(dm * jnp.sum(v * v, -1))

    def constrain_velocities(x_ref, v, box, invmass, lam_b):
        """Project velocities onto the constraint manifold by constraining
        x + dt*v (reference: constr.cpp ConstraintVariable::Velocities)."""
        xv = constr_mod.constrain(x_ref, x_ref + dt * v, box, system,
                                  invmass, lam_b,
                                  params.lincs_order, params.lincs_iter)
        return (xv - x_ref) / dt

    def step(state: State, _=None) -> Tuple[State, StepLog]:
        lam = current_lambdas(state.step, state.lam, params)
        if shell_relax_fn is not None:
            # SCF-relax massless shells before the forces that drive the
            # integrator (they persist: invmass 0 freezes them until the
            # next step's relaxation)
            state = state.replace(x=shell_relax_fn(state.x, state.box, lam))
        mass, invmass = masses_at_lambda(system, lam[FepCoupling.MASS])
        lam_bonded = lam[FepCoupling.BONDED]
        key = jax.random.fold_in(state.rng, state.step.astype(jnp.int32))
        k_therm, k_sd, k_baro = jax.random.split(key, 3)
        is_vv = params.integrator == IntegratorType.MD_VV

        # energies (and the dvdl backward pass) are only needed every
        # nstcalcenergy steps; in between the force-only kernel flavor
        # runs (reference: do_md nstcalcenergy + F/VF kernel split).
        # Pressure steps run the virial flavor of the energy kernel.
        do_ener = jnp.asarray(True)
        do_vir = ((state.step % params.nstpcouple) == 0 \
                  if pressure_from_force else jnp.asarray(False))
        if static_flavor is not None:
            # flavor pinned at trace time: no per-step cond around the
            # force kernels (see docstring); 'f' = MTS off-step (force-
            # only, PME recip skipped); 'D'/'S' = 'E'/'R' plus the
            # foreign-lambda sweep (statically included)
            base = {"f": "F", "D": "E", "S": "R"}.get(static_flavor,
                                                      static_flavor)
            do_ener = base != "F"
            do_vir = base == "R"
            if static_flavor == "f":
                f, terms = force_fn_mts_off(state.x, state.box, lam)
            elif do_vir:
                f, terms = force_vir_fn(state.x, state.box, lam)
            elif do_ener or force_fn_noener is None:
                f, terms = force_fn(state.x, state.box, lam)
            else:
                f, terms = force_fn_noener(state.x, state.box, lam)
        elif force_fn_noener is not None and params.nstcalcenergy > 1:
            do_ener = (state.step % params.nstcalcenergy) == 0
            if params.fep.enabled:
                do_ener = do_ener | ((state.step % params.fep.nstdhdl) == 0)
            if has_expanded:
                do_ener = do_ener | (((state.step % exp.nstexpanded) == 0)
                                     & (state.step > 0))
            if has_awh:
                do_ener = do_ener | (
                    ((state.step % params.awh.nstsample) == 0)
                    & (state.step > 0))
            do_ener = do_ener | do_vir
            ener_branch = lambda: jax.lax.cond(
                do_ener,
                lambda: force_fn(state.x, state.box, lam),
                lambda: force_fn_noener(state.x, state.box, lam))
        else:
            ener_branch = lambda: force_fn(state.x, state.box, lam)
        if static_flavor is not None:
            pass                       # f, terms assigned above
        elif pressure_from_force:
            f, terms = jax.lax.cond(
                do_vir,
                lambda: force_vir_fn(state.x, state.box, lam),
                ener_branch)
        else:
            f, terms = ener_branch()
        pull_x = jnp.zeros((0,), state.x.dtype)
        pull_f_log = jnp.zeros((0,), state.x.dtype)
        if has_pull:
            t_ps = state.step.astype(state.x.dtype) * dt
            ref_ov = None
            if has_awh_pull:
                ref_ov = (params.awh.pull_coord - 1,
                          jnp.asarray(awh_centers,
                                      state.x.dtype)[state.awh_center])
            f_pull, e_pull, pull_x, pull_f_log = pull_fn(state.x, state.box,
                                                         t_ps, ref_ov)
            f = f + f_pull
            terms = terms.replace(restraints=terms.restraints + e_pull)
        if efield_fn is not None:
            t_ps = state.step.astype(state.x.dtype) * dt
            f = f + efield_fn(t_ps, lam[FepCoupling.COUL])
        if wall_fn is not None:
            f_w, e_w, dvdl_w = wall_fn(state.x, state.box,
                                       lam[FepCoupling.VDW])
            f = f + f_w
            terms = terms.replace(
                lj=terms.lj + e_w,
                dvdl=terms.dvdl.at[FepCoupling.VDW].add(dvdl_w))
        densfit_sim = jnp.asarray(jnp.nan, state.x.dtype)
        densfit_next = state.densfit
        if has_densfit:
            def df_off():
                return (jnp.zeros_like(state.x),
                        jnp.zeros((), state.x.dtype),
                        jnp.asarray(jnp.nan, state.x.dtype), state.densfit)
            f_df, e_df, densfit_sim, densfit_next = jax.lax.cond(
                (state.step % densfit_nst) == 0,
                lambda: densfit_fn(state.x, state.box, state.densfit),
                df_off)
            f = f + f_df
            terms = terms.replace(restraints=terms.restraints + e_df)
        if has_vsites:
            f = spread_vsite_forces(state.x, f, system.vsites)

        # --- foreign-lambda energies at x(t): frame-consistent with the
        # reference (enerd of step t feeds both the dhdl output and the
        # expanded-ensemble MC, md.cpp:1323) ---
        delta_h = jnp.zeros((0,), state.x.dtype)
        dh_vec = None
        if foreign_delta_fn is not None and n_foreign > 0:
            do_dhdl = (state.step % params.fep.nstdhdl) == 0
            if static_flavor is not None:
                # foreign sweep gated at trace time (the 'D'/'S' flavors):
                # the host pattern marks exactly the nstdhdl/MC/awh steps
                if static_flavor in ("D", "S"):
                    dh_vec = foreign_delta_fn(state.x, state.box, lam)
                else:
                    dh_vec = jnp.full((n_foreign,), jnp.nan, state.x.dtype)
            else:
                need = do_dhdl
                if has_expanded:
                    need = need | (((state.step % exp.nstexpanded) == 0)
                                   & (state.step > 0))
                if has_awh:
                    need = need | (((state.step % params.awh.nstsample)
                                    == 0) & (state.step > 0))
                dh_vec = jax.lax.cond(
                    need,
                    lambda: foreign_delta_fn(state.x, state.box, lam),
                    lambda: jnp.full((n_foreign,), jnp.nan, state.x.dtype))
            delta_h = jnp.where(do_dhdl, dh_vec,
                                jnp.full((n_foreign,), jnp.nan,
                                         state.x.dtype))

        # --- expanded-ensemble / simulated-tempering lambda MC: happens
        # before the update; the new lambda state takes effect next step
        # (md.cpp:1323-1338, fep_state assigned after output :1991);
        # simulated tempering rescales v and the thermostat reference
        # temperature immediately ---
        fep_state_next = state.fep_state
        lam_next_vec = lam
        dfhist_next = state.dfhist
        v_in = state.v
        tstate_idx = state.fep_state
        if has_expanded:
            from .expanded import expanded_step_gmx
            assert dh_vec is not None, \
                "expanded ensemble requires foreign_delta_fn"
            do_mc = ((state.step % exp.nstexpanded) == 0) & (state.step > 0)
            lamnew_raw, hist_new = expanded_step_gmx(
                state.fep_state, state.dfhist, jnp.nan_to_num(dh_vec),
                terms.epot, state.step, exp.lmc_seed, exp.lmc_move,
                exp.lmc_stats, exp.wl_scale, exp.wl_ratio,
                exp.weight_equil_wl_delta,
                exp.mc_temp if exp.mc_temp > 0 else params.ref_t,
                sim_temps=sim_temps)
            lamnew = jnp.where(do_mc, lamnew_raw, state.fep_state)
            dfhist_next = jax.tree_util.tree_map(
                lambda a, b: jnp.where(do_mc, a, b), hist_new, state.dfhist)
            fep_state_next = lamnew
            lam_next_vec = jnp.where(
                do_mc, jnp.asarray(all_lambda, lam.dtype)[:, lamnew], lam)
            if sim_temps is not None:
                ts = jnp.asarray(sim_temps, state.x.dtype)
                sc = jnp.sqrt(ts[lamnew] / ts[state.fep_state])
                v_in = jnp.where(do_mc, state.v * sc, state.v)
                tstate_idx = lamnew
        elif has_awh:
            from .awh import awh_fep_step
            assert dh_vec is not None, "awh requires foreign_delta_fn"
            do_mc = (((state.step % params.awh.nstsample) == 0)
                     & (state.step > 0))
            lamnew_raw, awh_new = awh_fep_step(
                state.fep_state, state.dfhist, jnp.nan_to_num(dh_vec),
                state.step, params.awh, params.ref_t)
            lamnew = jnp.where(do_mc, lamnew_raw, state.fep_state)
            dfhist_next = jax.tree_util.tree_map(
                lambda a, b: jnp.where(do_mc, a, b), awh_new, state.dfhist)
            fep_state_next = lamnew
            lam_next_vec = jnp.where(
                do_mc, jnp.asarray(all_lambda, lam.dtype)[:, lamnew], lam)

        # --- AWH on a pull coordinate: sample + move the umbrella grid
        # point (awh.cpp applyBiasForcesAndUpdateBias; the umbrella jump
        # takes effect in the next step's pull reference) ---
        awh_center_next = state.awh_center
        if has_awh_pull:
            from .awh import awh_pull_step
            do_mc = (((state.step % params.awh.nstsample) == 0)
                     & (state.step > 0))
            xi = pull_x[params.awh.pull_coord - 1]
            cnew_raw, awh_new = awh_pull_step(
                state.dfhist, xi,
                jnp.asarray(awh_centers, state.x.dtype),
                params.awh.force_constant, state.step, params.awh,
                params.ref_t)
            awh_center_next = jnp.where(do_mc, cnew_raw,
                                        state.awh_center).astype(jnp.int32)
            dfhist_next = jax.tree_util.tree_map(
                lambda a, b: jnp.where(do_mc, a, b), awh_new, state.dfhist)

        ref_t_eff = params.ref_t
        if sim_temps is not None:
            ref_t_eff = jnp.asarray(sim_temps, state.x.dtype)[tstate_idx]
        elif temp_ladder is not None:
            ref_t_eff = jnp.asarray(temp_ladder,
                                    state.x.dtype)[state.fep_state]
        elif params.annealing is not None:
            # simulated annealing: piecewise-linear ref_t(t) (reference:
            # mdlib/update.cpp update_annealing_target_temp; "single"
            # clamps past the last point, "periodic" wraps)
            ann_mode, ann_t, ann_temp = params.annealing
            t_ps = state.step.astype(state.x.dtype) * dt
            if ann_mode == "periodic":
                t_ps = jnp.mod(t_ps, ann_t[-1])
            ref_t_eff = jnp.interp(
                t_ps, jnp.asarray(ann_t, state.x.dtype),
                jnp.asarray(ann_temp, state.x.dtype))

        # --- thermostat scale (applied in the update) ---
        # Leapfrog uses the half-step-average T of the PREVIOUS step's
        # compute_globals: 0.5*(KE(v(t-3dt/2)) + KE(v(t-dt/2))); VV uses the
        # full-step KE(v(t)) (reference: md.cpp:1486 update_tcouple with
        # ekind Th from tgroup.cpp; ekinh_prev carries the older half).
        v_scale = jnp.ones((), state.x.dtype)
        coupl = state.coupling
        ekinh_cur = integ_mod.kinetic_energy(state.v, mass)
        if params.tcoupl != TcouplType.NO:
            do_t = (state.step % params.nsttcouple) == 0
            dt_c = params.nsttcouple * dt
            if is_vv:
                ekin_half = ekinh_cur
            else:
                ekinh_old = jnp.where(coupl.ekinh_prev < 0, ekinh_cur,
                                      coupl.ekinh_prev)
                ekin_half = 0.5 * (ekinh_old + ekinh_cur)
            t_cur = integ_mod.temperature(ekin_half, ndf)
            ekin_ref = 0.5 * ndf * BOLTZ * ref_t_eff
            if params.tcoupl == TcouplType.BERENDSEN:
                s = coupling_mod.berendsen_lambda(t_cur, ref_t_eff, dt_c,
                                                  params.tau_t)
            elif params.tcoupl == TcouplType.V_RESCALE:
                s, d_int = coupling_mod.vrescale_lambda(
                    ekin_half, ekin_ref, ndf, dt_c, params.tau_t, k_therm)
                coupl = coupl.replace(
                    therm_integral=coupl.therm_integral
                    + jnp.where(do_t, d_int, 0.0))
            elif params.tcoupl == TcouplType.ANDERSEN_MASSIVE:
                # full velocity reassignment handled below (not a scale)
                s = jnp.ones((), state.x.dtype)
            elif is_vv and coupl.xi.shape[0] > 1:
                # Nose-Hoover CHAINS: md-vv only, as in the reference
                s, xi_n, vxi_n = coupling_mod.nose_hoover_chain_step(
                    coupl.xi, coupl.vxi, ekin_half, ekin_ref, ndf, dt_c,
                    params.tau_t, ref_t_eff)
                coupl = coupl.replace(
                    xi=jnp.where(do_t, xi_n, coupl.xi),
                    vxi=jnp.where(do_t, vxi_n, coupl.vxi))
            else:  # NOSE_HOOVER, single link (leapfrog convention)
                s, xi_n, vxi_n = coupling_mod.nose_hoover_step(
                    coupl.xi[0], coupl.vxi[0], ekin_half, ekin_ref, ndf,
                    dt_c, params.tau_t)
                coupl = coupl.replace(
                    xi=jnp.where(do_t, coupl.xi.at[0].set(xi_n), coupl.xi),
                    vxi=jnp.where(do_t, coupl.vxi.at[0].set(vxi_n),
                                  coupl.vxi))
            v_scale = jnp.where(do_t, s, 1.0)
            if params.tcoupl == TcouplType.ANDERSEN_MASSIVE:
                v_rand = coupling_mod.andersen_massive(v_in, mass,
                                                       ref_t_eff, k_therm)
                v_in = jnp.where(do_t, v_rand, v_in)
        coupl = coupl.replace(ekinh_prev=ekinh_cur)

        # --- integrate ---
        constr_rmsd = jnp.zeros((), state.x.dtype)
        constr_vir_diag = jnp.zeros((3,), state.x.dtype)
        if params.integrator == IntegratorType.MD:
            x_new, v_new = integ_mod.leapfrog(state.x, v_in, f, invmass,
                                              dt, v_scale)
        elif params.integrator == IntegratorType.SD:
            x_new, v_new = integ_mod.langevin_sd(
                state.x, v_in * v_scale, f, invmass, dt, params.tau_t,
                ref_t_eff, k_sd)
        elif params.integrator == IntegratorType.MD_VV:
            # kick (f(t)) - drift - constrain - recompute f(t+dt) - kick -
            # constrain velocities (reference: md.cpp vv path +
            # update_vv.cpp integrateVVFirstStep/SecondStep)
            x_new, vh = integ_mod.velocity_verlet_1(state.x,
                                                    v_in * v_scale,
                                                    f, invmass, dt)
            v_new = vh
        else:
            raise NotImplementedError(params.integrator)

        # --- constraints on positions ---
        dvdl_constr = jnp.zeros((), state.x.dtype)
        if has_constraints:
            if has_pert_constr:
                x_c, dhdl_dt2 = constr_mod.constrain(
                    state.x, x_new, state.box, system, invmass, lam_bonded,
                    params.lincs_order, params.lincs_iter, with_dhdl=True)
                dvdl_constr = dhdl_dt2 / (dt * dt)
            else:
                x_c = constr_mod.constrain(state.x, x_new, state.box, system,
                                           invmass, lam_bonded,
                                           params.lincs_order,
                                           params.lincs_iter)
            dv = (x_c - x_new) / dt
            v_new = v_new + dv
            # diagnostic only: skip the reduction on force-only steps
            if static_flavor != "F":
                constr_rmsd = jnp.sqrt(jnp.mean(jnp.sum((x_c - x_new)**2,
                                                        -1)))
            if compute_pressure:
                # constraint virial: f_c = m dx/dt^2;
                # Xi_aa = -1/2 sum x_a f_c,a (reference: constr.cpp virial
                # from constraint displacements); only pressure paths
                # consume it
                f_c = mass[:, None] * (x_c - x_new) / (dt * dt)
                constr_vir_diag = -0.5 * jnp.sum(x_c * f_c, axis=0)
            x_new = x_c

        # --- VV second half: forces at t+dt, second kick, constrain v.
        # The reference computes this force at the START of step t+1, i.e.
        # with the lambda of step t+1 — after an expanded-ensemble switch
        # that is the NEW lambda (md.cpp vv ordering) ---
        if is_vv:
            f2, _ = (force_fn_noener if force_fn_noener is not None
                     else force_fn)(x_new, state.box, lam_next_vec)
            if has_pull:
                t2 = (state.step + 1).astype(state.x.dtype) * dt
                f2p, _, _, _ = pull_fn(x_new, state.box, t2)
                f2 = f2 + f2p
            if has_densfit:
                # force-only re-evaluation at t+dt with the state of step
                # t+1 (the reference applies providers in every do_force)
                f2d, _, _, _ = jax.lax.cond(
                    ((state.step + 1) % densfit_nst) == 0,
                    lambda: densfit_fn(x_new, state.box, densfit_next),
                    lambda: (jnp.zeros_like(x_new),
                             jnp.zeros((), state.x.dtype),
                             jnp.asarray(jnp.nan, state.x.dtype),
                             densfit_next))
                f2 = f2 + f2d
            if has_vsites:
                f2 = spread_vsite_forces(x_new, f2, system.vsites)
            v_new = integ_mod.velocity_verlet_2(v_new, f2, invmass, dt)
            if has_constraints:
                v_new = constrain_velocities(x_new, v_new, state.box,
                                             invmass, lam_bonded)

        # --- rebuild virtual-site positions from the moved atoms ---
        if has_vsites:
            x_new = construct_vsites(x_new, system.vsites)

        # --- kinetic energy for output, BEFORE COM removal (the
        # compute_globals reduction sees the pre-stopcm velocities);
        # VV reports the full-step KE(v(t)) with the frame at time t ---
        if is_vv:
            ekin = ekinh_cur
            # GROMACS's initial compute_globals for vv leaves F_DKDL unset,
            # so the frame-0 dVremain/dl carries no kinetic term (verified
            # against the transformAtoB refdata); match that convention
            dekindl = jnp.where(state.step == 0, 0.0, dekindl_of(state.v))
        else:
            ekin = integ_mod.kinetic_energy_halfstep_avg(state.v, v_new, mass)
            dekindl = 0.5 * (dekindl_of(state.v) + dekindl_of(v_new))
        temp = integ_mod.temperature(ekin, ndf)

        # --- COM motion removal ---
        if params.nstcomm > 0:
            do_com = (state.step % params.nstcomm) == 0
            v_new = jnp.where(do_com, integ_mod.remove_com_motion(v_new, mass),
                              v_new)

        # --- pressure coupling ---
        box_new = state.box

        def pressure_from_terms():
            """P from the force-pass virial (terms.vir_diag) + constraint
            virial + pull strain term, with the half-step-consistent KE
            (reference: coupling.cpp calc_pres)."""
            vol = pbc_mod.box_volume(state.box)
            vir = terms.vir_diag + constr_vir_diag
            if has_pull:
                t_ps = state.step.astype(state.x.dtype) * dt
                from .pull import pull_energy
                du = jax.grad(lambda e: pull_energy(
                    state.x * (1.0 + e)[None, :],
                    state.box * (1.0 + e)[None, :],
                    mass, params.pull, t_ps))(jnp.zeros(3, state.x.dtype))
                vir = vir + 0.5 * du
            if wall_fn is not None:
                # wall strain term (wall.cpp sumRF -> virial): the upper
                # wall rides box_zz, so a plain strain gradient captures
                # both walls' z-virial
                from .walls import wall_energy as _we
                du_w = jax.grad(lambda e: _we(
                    state.x * (1.0 + e)[None, :],
                    state.box * (1.0 + e)[None, :],
                    system.type_a, system.type_b, system.nbfp,
                    params.walls, lam[FepCoupling.VDW],
                    _wall_pert))(jnp.zeros(3, state.x.dtype))
                vir = vir + 0.5 * du_w
            ekin_diag = 0.5 * jnp.sum(mass[:, None] * v_new * v_new, axis=0)
            p_diag = 2.0 / vol * (ekin_diag - vir) * PRESFAC
            if p_extra_fn is not None:
                p_diag = p_diag + p_extra_fn(state.box)
            return jnp.mean(p_diag), p_diag

        if params.pcoupl != PcouplType.NO and (pressure_fn is not None
                                               or pressure_from_force):
            do_p = (state.step % params.nstpcouple) == 0
            dt_p = params.nstpcouple * dt
            if pressure_from_force:
                p_scalar, p_diag = pressure_from_terms()
            else:
                p_scalar, p_diag = pressure_fn(x_new, state.box, lam, v_new,
                                               mass, constr_vir_diag)
            if (params.pcoupl == PcouplType.MTTK
                    and params.pcoupltype == "semiisotropic"):
                # membrane MTTK: independent pistons for xy and z,
                # log-extent velocities in boxv[0,0] (xy) and boxv[2,2]
                vol = pbc_mod.box_volume(state.box)
                winv = coupling_mod.mttk_winv(
                    params.ref_t, params.tau_p, params.compressibility,
                    vol)
                p_xy = 0.5 * (p_diag[0] + p_diag[1])
                ref_z = (params.ref_p if params.ref_p_z is None
                         else params.ref_p_z)
                # per-piston: 2 xy dims share one veta, z has its own;
                # the dim-count factor 3 splits 2:1
                v_xy = coupl.boxv[0, 0] + dt_p * vol * (
                    winv / PRESFAC) * 2.0 * (p_xy - params.ref_p)
                v_z = coupl.boxv[2, 2] + dt_p * vol * (
                    winv / PRESFAC) * 1.0 * (p_diag[2] - ref_z)
                v_xy = jnp.where(do_p, v_xy, coupl.boxv[0, 0])
                v_z = jnp.where(do_p, v_z, coupl.boxv[2, 2])
                coupl = coupl.replace(boxv=coupl.boxv.at[0, 0].set(v_xy)
                                      .at[2, 2].set(v_z))
                mu_xy = jnp.clip(jnp.exp(v_xy * dt_p), 0.98, 1.02)
                mu_z = jnp.clip(jnp.exp(v_z * dt_p), 0.98, 1.02)
                mu3 = jnp.where(do_p, jnp.stack([mu_xy, mu_xy, mu_z]), 1.0)
                alpha = 1.0 + 3.0 / ndf
                vsc = jnp.exp(-alpha * (2.0 * v_xy + v_z) / 3.0 * dt_p)
                v_new = jnp.where(do_p, v_new * vsc, v_new)
                mu = None
                box_new = state.box * mu3[None, :]
                x_new = x_new * mu3[None, :]
            elif params.pcoupl == PcouplType.MTTK:
                # isotropic MTTK: log-volume velocity in coupl.boxv[0,0]
                # (requires md-vv + Nose-Hoover in the reference;
                # enforced loosely here — any thermostat works but the
                # exact NPT ensemble needs NH)
                vol = pbc_mod.box_volume(state.box)
                winv = coupling_mod.mttk_winv(
                    params.ref_t, params.tau_p, params.compressibility,
                    vol)
                veta_new, mu, vsc = coupling_mod.mttk_step(
                    coupl.boxv[0, 0], p_scalar, params.ref_p, dt_p, winv,
                    vol, ndf)
                veta_new = jnp.where(do_p, veta_new, coupl.boxv[0, 0])
                coupl = coupl.replace(
                    boxv=coupl.boxv.at[0, 0].set(veta_new))
                v_new = jnp.where(do_p, v_new * vsc, v_new)
            elif (params.pcoupl == PcouplType.BERENDSEN
                  and params.pcoupltype == "semiisotropic"):
                # membrane-style coupling: xy jointly, z independently
                # (reference: coupling.cpp berendsen_pcoupl epctSEMIISOTROPIC)
                p_xy = 0.5 * (p_diag[0] + p_diag[1])
                mu_xy = coupling_mod.berendsen_pscale(
                    p_xy, params.ref_p, dt_p, params.tau_p,
                    params.compressibility)
                mu_z = coupling_mod.berendsen_pscale(
                    p_diag[2],
                    params.ref_p if params.ref_p_z is None
                    else params.ref_p_z,
                    dt_p, params.tau_p,
                    params.compressibility if params.compressibility_z
                    is None else params.compressibility_z)
                mu3 = jnp.stack([mu_xy, mu_xy, mu_z])
                mu3 = jnp.where(do_p, mu3, 1.0)
                mu = None
                box_new = state.box * mu3[None, :]
                x_new = x_new * mu3[None, :]
            elif params.pcoupl == PcouplType.BERENDSEN:
                mu = coupling_mod.berendsen_pscale(
                    p_scalar, params.ref_p, dt_p, params.tau_p,
                    params.compressibility)
            elif params.pcoupl == PcouplType.C_RESCALE:
                mu = coupling_mod.crescale_pscale(
                    p_scalar, params.ref_p, dt_p, params.tau_p,
                    params.compressibility, pbc_mod.box_volume(state.box),
                    temp, k_baro)
            elif (params.pcoupl == PcouplType.PARRINELLO_RAHMAN
                  and params.pcoupltype == "anisotropic"
                  and pressure_tensor_fn is not None):
                # FULL Parrinello-Rahman: integrate the lower-triangular
                # box-velocity matrix from the full stress tensor
                # (reference: coupling.cpp:763 parrinellorahman_pcoupl)
                _, p_t = pressure_tensor_fn(x_new, state.box, lam, v_new,
                                            mass, constr_vir_diag)
                vol = pbc_mod.box_volume(state.box)
                maxl = jnp.max(jnp.diag(state.box))
                winv = (4.0 * jnp.pi ** 2 * params.compressibility) / \
                    (3.0 * params.tau_p ** 2 * maxl) / PRESFAC
                pdiff = p_t - params.ref_p * jnp.eye(3, dtype=state.x.dtype)
                boxv_new = coupl.boxv + dt_p * vol * winv / maxl * pdiff
                boxv_new = jnp.tril(boxv_new)    # GROMACS box convention
                boxv_new = jnp.where(do_p, boxv_new, coupl.boxv)
                coupl = coupl.replace(boxv=boxv_new)
                box_prop = state.box + dt_p * boxv_new
                # bound the per-step deformation like the diagonal path
                scale = jnp.clip(jnp.diag(box_prop) / jnp.diag(state.box),
                                 0.99, 1.01)
                box_prop = box_prop * (scale
                                       / jnp.maximum(jnp.diag(box_prop)
                                                     / jnp.diag(state.box),
                                                     1e-12))[:, None]
                box_new = jnp.where(do_p, box_prop, state.box)
                # remap by fractional coordinates: x' = x box^-1 box'
                A = pbc_mod.inv3(state.box) @ box_new
                x_new = jnp.where(do_p, x_new @ A, x_new)
                mu = None
            elif params.pcoupl == PcouplType.PARRINELLO_RAHMAN:
                # anisotropic (diagonal) PR: integrate box velocities, scale
                # box columns and coordinates per axis
                vol = pbc_mod.box_volume(state.box)
                boxv_new = coupling_mod.parrinello_rahman_step(
                    coupl.boxv, state.box, jnp.diag(p_diag), params.ref_p,
                    dt_p, params.tau_p, params.compressibility, vol)
                boxv_new = jnp.where(do_p, boxv_new, coupl.boxv)
                coupl = coupl.replace(boxv=boxv_new)
                box_prop = state.box + dt_p * boxv_new
                mu3 = jnp.diag(box_prop) / jnp.diag(state.box)
                mu3 = jnp.where(do_p, jnp.clip(mu3, 0.99, 1.01), 1.0)
                mu = None
                box_new = state.box * mu3[None, :]
                x_new = x_new * mu3[None, :]
            else:
                raise NotImplementedError(params.pcoupl)
            if mu is not None:
                mu = jnp.where(do_p, mu, 1.0)
                box_new = state.box * mu
                x_new = x_new * mu
            # decomposed path: the virial only exists at pressure steps;
            # off-step frames log NaN (same convention as epot)
            pres = (jnp.where(do_p, p_scalar, jnp.nan)
                    if pressure_from_force else p_scalar)
        elif pressure_fn is not None:
            pres, _ = pressure_fn(x_new, state.box, lam, v_new, mass,
                                  constr_vir_diag)
        else:
            pres = jnp.zeros((), state.x.dtype)

        new_state = state.replace(
            x=x_new, v=v_new, box=box_new, lam=lam_next_vec,
            fep_state=fep_state_next, dfhist=dfhist_next,
            densfit=densfit_next, awh_center=awh_center_next,
            step=state.step + 1, coupling=coupl)
        epot_log = jnp.where(do_ener, terms.epot,
                             jnp.asarray(jnp.nan, state.x.dtype))
        dvdl_out = terms.dvdl
        if has_pert_constr:
            dvdl_out = dvdl_out.at[FepCoupling.BONDED].add(dvdl_constr)
            if delta_h.shape[0] > 0 and all_lambda is not None:
                # constraints cannot be evaluated at foreign lambdas; add
                # the linear dlam*dvdl_constr term, as the reference does
                # (enerdata_utils.cpp:338-347)
                dlam_b = (jnp.asarray(all_lambda)[int(FepCoupling.BONDED)]
                          - lam_bonded)
                delta_h = delta_h + dlam_b * dvdl_constr
        log = StepLog(epot=epot_log, ekin=ekin, temp=temp, pres=pres,
                      lam=lam, dvdl=dvdl_out, terms=terms,
                      constr_rmsd=constr_rmsd, delta_h=delta_h,
                      dekindl=dekindl, pull_x=pull_x, pull_f=pull_f_log,
                      densfit_sim=densfit_sim)
        return new_state, log

    return step


def scan_flavored(mk_step: Callable, flavors: str, state: State
                  ) -> Tuple[State, StepLog]:
    """Compose a chunk from statically-flavored lax.scan segments.

    mk_step(flavor_char) -> step_fn; consecutive same-flavor offsets in
    `flavors` become one lax.scan each, so no per-step branch survives
    around the force kernels (see make_step_fn static_flavor)."""
    step_by_flavor = {fl: mk_step(fl) for fl in set(flavors)}
    runs = []
    for fl in flavors:
        if runs and runs[-1][0] == fl:
            runs[-1][1] += 1
        else:
            runs.append([fl, 1])
    logs = []
    for fl, count in runs:
        sfn = step_by_flavor[fl]
        if count == 1:
            state, lg = sfn(state, None)
            logs.append(jax.tree_util.tree_map(
                lambda a: jnp.asarray(a)[None], lg))
        else:
            state, lg = jax.lax.scan(sfn, state, length=count)
            logs.append(lg)
    log = (logs[0] if len(logs) == 1 else jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *logs))
    return state, log


def run(state: State, step_fn: Callable, nsteps: int,
        log_stride: int = 1) -> Tuple[State, StepLog]:
    """Scan nsteps; returns final state and stacked per-step logs."""

    @jax.jit
    def segment(st):
        return jax.lax.scan(step_fn, st, length=nsteps)

    return segment(state)
