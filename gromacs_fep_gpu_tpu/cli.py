"""Command-line interface — the `gmx` multiplex analogue
(reference: src/programs/gmx.cpp:49, mdrun registered in
legacymodules.cpp; mdrun flags from mdrun/legacymdrunoptions.h incl. the
fork's -fep).

Commands:
  grompp  -f md.mdp -p topol.top -c conf.gro -o topol.tpz
  mdrun   -s topol.tpz [-nsteps N] [-deffnm md] [-cpi state.cpt]
          [-fep auto|cpu|tpu]
  bar     -f dhdl0.xvg dhdl1.xvg ...
  check   -s topol.tpz
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def cmd_grompp(args):
    from .io.pdbio import read_structure
    from .io.grompp import preprocess_arrays

    with open(args.f) as f:
        mdp_text = f.read()
    with open(args.p) as f:
        top_text = f.read()
    names, resnames, x, v, box = read_structure(args.c)
    ndx_text = ""
    if args.n:
        with open(args.n) as f:
            ndx_text = f.read()
    posres_x = None
    if args.r:
        _, _, posres_x, _, _ = read_structure(args.r)
    # validate by building once (full grompp transforms incl. couple-moltype,
    # constraint conversion, defines)
    pp = preprocess_arrays(mdp_text, top_text, names, resnames, x, v, box,
                           include_dirs=[os.path.dirname(args.p)],
                           couple_moltype_override=args.couple_moltype,
                           ndx_text=ndx_text or None, posres_x=posres_x)
    if args.o.endswith(".tpr"):
        # GROMACS-format run input (reference: tpxio.cpp write_tpx_state)
        # so reference mdrun can run/validate repo-grompp'd systems
        from .io.tprwrite import write_tpr
        write_tpr(args.o, pp.system, pp.params, x,
                  v if v is not None else np.zeros_like(x), box,
                  all_lambda=(np.asarray(pp.all_lambda)
                              if pp.all_lambda is not None else None),
                  init_fep_state=pp.params.fep.init_lambda_state,
                  nsteps=pp.params.nsteps,
                  ref_t=pp.params.ref_t)
        print(f"wrote {args.o} ({pp.system.n_atoms} atoms, tpx "
              "version 118)")
        return
    extra_npz = {}
    if posres_x is not None:
        extra_npz["posres_x"] = posres_x
    with open(args.o, "wb") as f:   # np.savez would append .npz to a path
        np.savez(f, top=top_text, mdp=mdp_text, x=x,
                 v=(v if v is not None else np.zeros_like(x)), box=box,
                 couple_moltype=args.couple_moltype or "",
                 names=names, resnames=resnames, ndx=ndx_text,
                 include_dir=os.path.dirname(os.path.abspath(args.p)),
                 **extra_npz)
    print(f"wrote {args.o} ({pp.system.n_atoms} atoms)")


def _load_tpz(path):
    from .io.grompp import preprocess_arrays

    data = np.load(path, allow_pickle=True)
    cm = str(data["couple_moltype"]) or None
    inc = [str(data["include_dir"])] if "include_dir" in data else []
    ndx = str(data["ndx"]) if "ndx" in data else ""
    prx = data["posres_x"] if "posres_x" in data else None
    pp = preprocess_arrays(str(data["mdp"]), str(data["top"]),
                           [str(n) for n in data["names"]],
                           [str(r) for r in data["resnames"]],
                           data["x"], data["v"], data["box"],
                           include_dirs=inc, couple_moltype_override=cm,
                           ndx_text=ndx or None, posres_x=prx)
    return pp, data


def _load_tpr_inputs(args):
    """GROMACS .tpr + .mdp -> (system, params, state, all_lambda, data)
    (reference interop: fileio/tpxio.cpp; the tpr carries topology +
    state, run parameters come from the mdp as the tpr inputrec section
    is not read)."""
    from .io.grompp import gromacs_pme_grid, initial_lambda_vector
    from .io.mdpio import mdp_to_params
    from .io.tprio import read_tpr, tpr_to_system
    from .core.types import CoulombType, make_state

    if not getattr(args, "mdp", None):
        raise SystemExit("running from a .tpr needs run parameters: "
                         "add -mdp md.mdp (the tpr inputrec section is "
                         "not read)")
    t = read_tpr(args.s)
    system, x, v, box = tpr_to_system(t)
    if x is None:
        raise SystemExit(f"{args.s}: no coordinates in file")
    params, all_lambda = mdp_to_params(open(args.mdp).read())
    if ((params.coulomb == CoulombType.PME or params.vdw_type == "pme")
            and params.pme_grid is None):
        params = params.replace(
            pme_grid=gromacs_pme_grid(np.asarray(box),
                                      params.fourier_spacing,
                                      params.pme_order))
    lam0 = initial_lambda_vector(params.fep, all_lambda)
    fep_state = max(params.fep.init_lambda_state, 0)
    state = make_state(np.asarray(x, np.float32),
                       None if v is None else np.asarray(v, np.float32),
                       np.asarray(box, np.float32),
                       lam=lam0.astype(np.float32), fep_state=fep_state)
    names, resnames = [], []
    for mt_idx, nmol in t.molblocks:
        mt = t.moltypes[mt_idx]
        for _ in range(nmol):
            names += list(mt.atomnames)
            resnames += [mt.name[:5]] * len(mt.atomnames)
    data = {"names": names, "resnames": resnames, "box": np.asarray(box),
            "couple_moltype": "", "mdp": open(args.mdp).read(), "top": ""}
    return system, params, state, all_lambda, data


def cmd_mdrun(args):
    import jax
    import jax.numpy as jnp
    from .core.types import CoulombType, FepCoupling
    from .io.checkpoint import load_checkpoint, save_checkpoint
    from .io.groio import write_gro
    from .io.xvgio import write_dhdl_xvg
    from .md.runner import MdRunner, RunnerConfig, concat_logs
    from .ops.pme import pme_grid_size

    if args.s.endswith(".tpr"):
        system, params, state, all_lambda, data = _load_tpr_inputs(args)
    else:
        pp, data = _load_tpz(args.s)
        system, params, state, all_lambda = (pp.system, pp.params, pp.state,
                                             pp.all_lambda)
    if args.nsteps is not None:
        params = params.replace(nsteps=args.nsteps)
    if ((params.coulomb == CoulombType.PME or params.vdw_type == "pme")
            and params.pme_grid is None):
        diag = tuple(float(v) for v in np.diag(data["box"]))
        params = params.replace(pme_grid=pme_grid_size(
            diag, params.fourier_spacing))

    lam_arr = None
    if all_lambda is not None:
        lam_arr = jnp.asarray(all_lambda.T)   # (L, 7)
    from .io.cptio import is_gmx_cpt
    if args.cpi and os.path.exists(args.cpi) and is_gmx_cpt(args.cpi):
        # GROMACS-format checkpoint interop (fileio/checkpoint.cpp):
        # restore the core MD state fields
        from .io.cptio import read_gmx_cpt
        cp = read_gmx_cpt(args.cpi)
        if cp.natoms != system.n_atoms:
            raise SystemExit(f"{args.cpi}: checkpoint has {cp.natoms} "
                             f"atoms, topology {system.n_atoms}")
        upd = dict(x=jnp.asarray(cp.state["x"], jnp.float32),
                   box=jnp.asarray(cp.state["box"], jnp.float32),
                   step=jnp.asarray(cp.step, jnp.int32))
        if cp.get("v") is not None:
            upd["v"] = jnp.asarray(cp.state["v"], jnp.float32)
        if cp.get("lambda") is not None and cp.state["lambda"].size == 7:
            upd["lam"] = jnp.asarray(cp.state["lambda"], jnp.float32)
        if cp.get("fep_state") is not None:
            upd["fep_state"] = jnp.asarray(int(cp.state["fep_state"][0]),
                                           jnp.int32)
        state = state.replace(**upd)
        coup = {}
        if cp.get("nosehoover_xi") is not None:
            coup["xi"] = jnp.asarray(cp.state["nosehoover_xi"],
                                     jnp.float32)
            coup["vxi"] = jnp.asarray(
                cp.state.get("nosehoover_vxi",
                             np.zeros_like(cp.state["nosehoover_xi"])),
                jnp.float32)
        if cp.get("therm_integral") is not None:
            coup["therm_integral"] = jnp.asarray(
                float(cp.state["therm_integral"][0]), jnp.float32)
        if cp.get("boxv") is not None:
            coup["boxv"] = jnp.asarray(cp.state["boxv"], jnp.float32)
        if coup:
            state = state.replace(
                coupling=state.coupling.replace(**coup))
        print(f"restarted from GROMACS checkpoint {args.cpi} "
              f"(written by {cp.version_string}, step {cp.step})")
    elif args.cpi and os.path.exists(args.cpi):
        # the checkpoint restores by tree structure: give the template
        # the same dfhist shape the runner will use, else the saved
        # expanded-ensemble/AWH weight history would be dropped
        if (params.expanded is not None and lam_arr is not None
                and state.dfhist is None):
            from .md.expanded import DfHist
            state = state.replace(dfhist=DfHist.init(
                int(lam_arr.shape[0]), params.expanded.init_wl_delta))
        if params.awh is not None and state.dfhist is None:
            from .core.units import BOLTZ
            from .md.awh import AwhState
            if params.awh.coord_provider == "pull":
                npts = params.awh.n_points
            elif lam_arr is not None:
                npts = int(lam_arr.shape[0])
            else:
                npts = 0
            if npts:
                state = state.replace(dfhist=AwhState.init(
                    npts,
                    params.awh.error_init / (BOLTZ * params.ref_t)))
        if (params.awh is not None
                and params.awh.coord_provider == "pull"
                and state.awh_center is None):
            state = state.replace(awh_center=jnp.asarray(0, jnp.int32))
        from .core.types import IntegratorType, TcouplType
        nh_len = (params.nhchainlength
                  if (params.tcoupl == TcouplType.NOSE_HOOVER
                      and params.integrator == IntegratorType.MD_VV)
                  else 1)
        if state.coupling.xi.shape != (nh_len,):
            state = state.replace(coupling=state.coupling.replace(
                xi=jnp.zeros((nh_len,), jnp.float32),
                vxi=jnp.zeros((nh_len,), jnp.float32)))
        state, _ = load_checkpoint(args.cpi, state)
        print(f"restarted from {args.cpi} at step {int(state.step)}")

    use_pallas = args.fep != "cpu"
    if args.fep == "auto" or args.fep is None:
        # auto mode falls back to the XLA kernels on triclinic boxes
        # (the Pallas NB kernel is rectangular-only; an explicit
        # `-fep tpu` keeps the hard error in MdRunner.run) and on CPU
        # backends, where Pallas would need interpret mode (reference:
        # decidegpuusage.cpp decideWhetherToUseGpusForFep — auto
        # resolves by capability)
        b = np.asarray(data["box"], dtype=np.float64)
        if np.abs(b - np.diag(np.diag(b))).max() > 1e-6:
            use_pallas = False
        if jax.default_backend() == "cpu":
            use_pallas = False
    from .core.types import IntegratorType as _IT
    if params.integrator == _IT.TPI:
        return _do_tpi(args, system, params, state)
    if getattr(args, "rerun", None):
        return _do_rerun(args, system, params, state, lam_arr)
    if params.integrator in (_IT.STEEP, _IT.CG, _IT.LBFGS):
        return _do_minimize(args, system, params, state, data)
    if params.integrator == _IT.NM:
        return _do_nm(args, system, params, state)

    mesh = None
    dd_grid = None
    dd_spec = str(getattr(args, "dd", "0") or "0").lower()
    # "-dd 8" = 1-D slab ring; "-dd 4x2" / "-dd 2x2x2" = N-D grid with
    # per-axis ppermute halo sweeps (reference: mdrun -dd nx ny nz,
    # domdec_setup.cpp rank grids)
    dims = [int(v) for v in dd_spec.split("x") if v]
    n_dd = int(np.prod(dims)) if dims else 0
    if n_dd > 1:
        from .parallel.mesh import make_mesh
        if len(jax.devices()) < n_dd:
            raise SystemExit(f"-dd {dd_spec}: only {len(jax.devices())} "
                             "devices visible")
        mesh = make_mesh(n_ens=1, n_spatial=n_dd,
                         devices=jax.devices()[:n_dd])
        if len(dims) > 1:
            dd_grid = tuple(dims)
        use_pallas = False
    if getattr(args, "tunepme", False) and mesh is None:
        from .md.pme_tuning import tune_pme
        tuned = tune_pme(system, params, state,
                         RunnerConfig(use_pallas=use_pallas), verbose=True)
        if tuned.scale != 1.0:
            print(f"tunepme: scaled rcoulomb x{tuned.scale:.2f} -> "
                  f"{tuned.params.rcoulomb:.3f} nm, grid "
                  f"{tuned.params.pme_grid}")
        params = tuned.params
    runner = MdRunner(system, params,
                      RunnerConfig(use_pallas=use_pallas, mesh=mesh,
                                   dd_grid=dd_grid),
                      all_lambda=lam_arr)
    traj_path = f"{args.deffnm}.trr"
    xtc_path = f"{args.deffnm}.xtc"
    callback = None
    if params.nstxout > 0 or params.nstxout_compressed > 0:
        from .io.trrio import write_trr_frame
        from .io.xtcio import write_xtc_frame
        for p in (traj_path, xtc_path):
            if os.path.exists(p):
                os.unlink(p)
        next_frame = [0]
        next_xtc = [0]

        def callback(st, log, done):
            # chunk-granularity frames (every nstxout steps, rounded up to
            # the chunk boundary)
            if params.nstxout > 0 and done >= next_frame[0]:
                write_trr_frame(traj_path, np.asarray(st.x),
                                np.asarray(st.box), v=np.asarray(st.v),
                                step=int(done), time=done * params.dt,
                                lam=float(np.asarray(st.lam)[2]))
                next_frame[0] = done + params.nstxout
            if params.nstxout_compressed > 0 and done >= next_xtc[0]:
                write_xtc_frame(xtc_path, np.asarray(st.x),
                                np.asarray(st.box), step=int(done),
                                time=done * params.dt,
                                precision=params.compressed_x_precision)
                next_xtc[0] = done + params.nstxout_compressed

    # stop handler: SIGTERM/SIGINT and -maxh end the run cleanly at the
    # next verified chunk boundary with all outputs + checkpoint written
    # (reference: mdlib/stophandler.h, sighandler.cpp, mdrun -maxh)
    import signal as _signal
    stop_flag = {"stop": False}

    def _on_signal(signum, frame):
        print(f"\nreceived signal {signum}: stopping at the next "
              "checkpoint boundary (send again to abort)")
        if stop_flag["stop"]:
            raise KeyboardInterrupt
        stop_flag["stop"] = True

    old_handlers = {}
    for sg in (_signal.SIGTERM, _signal.SIGINT):
        try:
            old_handlers[sg] = _signal.signal(sg, _on_signal)
        except ValueError:
            pass   # non-main thread (tests)
    t0 = time.time()
    t_end = (t0 + 0.99 * args.maxh * 3600.0
             if getattr(args, "maxh", 0) else None)
    stop_condition = (lambda: stop_flag["stop"]
                      or (t_end is not None and time.time() > t_end))
    try:
        state, logs = runner.run(state, params.nsteps, callback=callback,
                                 stop_condition=stop_condition)
    finally:
        for sg, h in old_handlers.items():
            _signal.signal(sg, h)
    jax.block_until_ready(state.x)
    wall = time.time() - t0
    log = concat_logs(logs)
    if runner.stopped_at is not None:
        print(f"run stopped early at step {runner.stopped_at} "
              f"(signal or -maxh); outputs cover the completed steps")

    deffnm = args.deffnm
    # energy file (csv analogue of edr) + dhdl + checkpoint + final conf
    times = np.arange(len(log.epot)) * params.dt
    np.savetxt(f"{deffnm}.ener.csv",
               np.stack([times, log.epot, log.ekin, log.temp, log.pres], 1),
               header="time epot ekin temp pres", comments="# ")
    if all_lambda is not None:
        dh = np.asarray(log.delta_h)
        keep = ~np.isnan(dh[:, 0])
        write_dhdl_xvg(f"{deffnm}.dhdl.xvg", times[keep],
                       np.asarray(log.dvdl)[keep], dh[keep],
                       np.asarray(lam_arr),
                       max(int(params.fep.init_lambda_state), 0),
                       temperature=params.ref_t)
    if params.awh is not None and state.dfhist is not None:
        # AWH output: lambda-point PMF + bias free-energy estimate
        # (reference: awh.cpp writeToEnergyFrame / gmx awh xvg layout)
        from .md.awh import awh_free_energy, awh_pmf
        pmf = np.asarray(awh_pmf(state.dfhist, params.ref_t))
        dg = np.asarray(awh_free_energy(state.dfhist, params.ref_t))
        if params.awh.coord_provider == "pull":
            xs = np.linspace(params.awh.coord_min, params.awh.coord_max,
                             params.awh.n_points)
            xlab, xfmt = "xi (nm)", "{:10.5f}"
        else:
            xs = np.arange(pmf.shape[0])
            xlab, xfmt = "lambda index", "{:6d}"
        with open(f"{deffnm}.awh.xvg", "w") as f:
            f.write('@    title "AWH PMF and bias"\n')
            f.write(f'@    xaxis  label "{xlab}"\n')
            f.write('@    yaxis  label "(kJ/mol)"\n')
            f.write('@ s0 legend "PMF"\n@ s1 legend "bias dG"\n')
            for i in range(pmf.shape[0]):
                f.write(xfmt.format(xs[i])
                        + f" {pmf[i]:14.6f} {dg[i]:14.6f}\n")
        print(f"AWH: dG({len(dg) - 1}<-0) = {dg[-1]:.3f} kJ/mol "
              f"(N = {float(state.dfhist.hist_size):.0f}, "
              f"{'initial' if bool(state.dfhist.initial_stage) else 'final'}"
              " stage)")
    # binary .edr with per-frame BAR delta-H blocks (gmx energy / gmx bar
    # interop; reference: fileio/enxio.cpp, mdlib/mdebin_bar.cpp)
    from .io.edrio import (DHBT_DH, DHBT_DHDL, EdrFrame, EdrWriter, dh_block,
                           dhcoll_block)
    from .core.types import FepCoupling as _FC
    edr_names = ["Potential", "Kinetic En.", "Total Energy", "Temperature",
                 "Pressure"]
    edr_units = ["kJ/mol", "kJ/mol", "kJ/mol", "K", "bar"]
    etot = np.asarray(log.epot) + np.asarray(log.ekin)
    dvdl_all = np.asarray(log.dvdl)
    dh_all = np.asarray(log.delta_h) if all_lambda is not None else None
    nstdhdl = (max(int(params.fep.nstdhdl), 1)
               if params.fep is not None and params.fep.enabled else 0)
    lam0 = np.asarray(state.lam)
    with EdrWriter(f"{deffnm}.edr", edr_names, edr_units) as ew:
        step0 = int(state.step) - len(times)
        for i in range(len(times)):
            blocks = []
            has_dh = (nstdhdl > 0 and dh_all is not None
                      and not np.isnan(dh_all[i, 0]))
            if has_dh:
                comps = [int(_FC.COUL), int(_FC.VDW)]
                blocks.append(dhcoll_block(
                    temperature=params.ref_t, start_time=times[i],
                    delta_time=nstdhdl * params.dt, start_lambda=-1.0,
                    lambda_index=max(int(params.fep.init_lambda_state), 0),
                    native_lambda_vec=[float(lam0[c]) for c in comps],
                    lambda_components=comps))
                dvdl_sum = np.nansum(dvdl_all[i][[int(_FC.FEP), int(_FC.COUL),
                                                  int(_FC.VDW),
                                                  int(_FC.BONDED)]])
                blocks.append(dh_block(DHBT_DHDL, [dvdl_sum], derivative=0))
                for wdx in range(dh_all.shape[1]):
                    fl = [float(np.asarray(lam_arr)[wdx, c]) for c in comps]
                    blocks.append(dh_block(DHBT_DH, [dh_all[i, wdx]],
                                           foreign_lambda=fl))
            ew.write_frame(EdrFrame(
                t=float(times[i]), step=step0 + i,
                ener=np.array([log.epot[i], log.ekin[i], etot[i],
                               log.temp[i], log.pres[i]], np.float32),
                blocks=blocks, dt=params.dt))

    if params.pull is not None and log.pull_x.shape[-1] > 0:
        # pullx/pullf.xvg (reference: pulling/output.cpp)
        px = np.asarray(log.pull_x)
        pf = np.asarray(log.pull_f)
        stride = max(int(params.nstpullout), 1)
        sel = np.arange(0, len(times), stride)
        ncoord = px.shape[1]
        hdr = ("@    title \"Pull COM coordinates\"\n"
               "@    xaxis  label \"Time (ps)\"\n")
        with open(f"{deffnm}.pullx.xvg", "w") as f:
            f.write(hdr + "@    yaxis  label \"Position (nm)\"\n")
            for t in sel:
                f.write("%.4f " % times[t]
                        + " ".join("%.6f" % v for v in px[t]) + "\n")
        with open(f"{deffnm}.pullf.xvg", "w") as f:
            f.write(hdr + "@    yaxis  label \"Force (kJ/mol/nm)\"\n")
            for t in sel:
                f.write("%.4f " % times[t]
                        + " ".join("%.6f" % v for v in pf[t]) + "\n")
    if params.densfit is not None and log.densfit_sim is not None:
        # density-fitting similarity time series (the reference reports
        # it as an energy-file term, densityfittingoutputprovider.cpp)
        sim = np.asarray(log.densfit_sim)
        with open(f"{deffnm}.densfit.xvg", "w") as f:
            f.write("@    title \"Density fitting\"\n"
                    "@    xaxis  label \"Time (ps)\"\n"
                    "@    yaxis  label \"Similarity\"\n")
            for t in range(len(times)):
                if np.isfinite(sim[t]):
                    f.write("%.4f %.8g\n" % (times[t], sim[t]))
    save_checkpoint(f"{deffnm}.cpt", state)
    # GROMACS-format twin checkpoint for interop
    # (fileio/checkpoint.cpp write_checkpoint_data)
    from .io.cptio import write_gmx_cpt
    from .core.types import TcouplType as _Tc, IntegratorType as _It
    write_gmx_cpt(
        f"{deffnm}.gmx.cpt",
        x=np.asarray(state.x), v=np.asarray(state.v),
        box=np.asarray(state.box), lam=np.asarray(state.lam),
        fep_state=int(state.fep_state), step=int(state.step),
        t=float(state.step) * params.dt,
        nosehoover_xi=(np.asarray(state.coupling.xi, np.float64)
                       if params.tcoupl == _Tc.NOSE_HOOVER else None),
        nosehoover_vxi=(np.asarray(state.coupling.vxi, np.float64)
                        if params.tcoupl == _Tc.NOSE_HOOVER else None),
        therm_integral=(float(state.coupling.therm_integral)
                        if params.tcoupl == _Tc.V_RESCALE else None),
        boxv=(np.asarray(state.coupling.boxv)
              if params.pcoupl.value != "no" else None),
        integrator={_It.MD: 0, _It.SD: 9, _It.MD_VV: 10,
                    _It.BD: 3}.get(params.integrator, 0))
    names = [str(n) for n in data["names"]]
    resnames = [str(r) for r in data["resnames"]]
    write_gro(f"{deffnm}.gro", "tpumd output", names, resnames,
              np.asarray(state.x), np.asarray(state.v), np.asarray(state.box))
    nsteps_done = len(times)
    ns_day = nsteps_done * params.dt / 1000.0 / max(wall, 1e-9) * 86400.0
    print(runner.wallcycle.report())
    print(f"\nPerformance: {ns_day:10.3f} ns/day  ({wall:.1f} s wall, "
          f"{nsteps_done} steps, {system.n_atoms} atoms)")
    # md.log: setup report + nstlog energy blocks + averages + perf
    # (reference: MDLogger + EnergyOutput, energyoutput.cpp:1288,1340)
    from .io.logio import MdLogWriter
    mdlog = MdLogWriter(f"{deffnm}.log", params, system, argv=sys.argv)
    mdlog.write_frames(log, times, params.nstlog, params.dt)
    mdlog.write_performance(runner.wallcycle.report(), ns_day, wall,
                            nsteps_done, system.n_atoms)
    mdlog.close()


def _do_rerun(args, system, params, state, lam_arr):
    """Recompute energies/forces/dhdl over an existing TRR trajectory
    (reference: src/gromacs/mdrun/rerun.cpp:168) — the MBAR
    post-processing workflow: run once, evaluate at every lambda later."""
    import jax
    import jax.numpy as jnp
    from .io.xvgio import write_dhdl_xvg
    from .md.verletbuf import effective_rlist
    from .ops.cluster_nb import make_cluster_force_fn
    from .ops.foreign import make_foreign_delta_fn
    from .ops.pairlist import build_cluster_pairlist, build_fep_pairlist

    if args.rerun.endswith(".xtc"):
        from .io.xtcio import read_xtc_frame as read_trr_frame
        from .io.xtcio import scan_xtc as scan_trr
    else:
        from .io.trrio import read_trr_frame, scan_trr

    natoms, nframes = scan_trr(args.rerun)
    if natoms != system.n_atoms:
        raise SystemExit(f"rerun trajectory has {natoms} atoms, "
                         f"topology has {system.n_atoms}")
    recip_fn = recip_force_fn = None
    from .core.types import CoulombType
    if params.coulomb == CoulombType.PME:
        from .ops.pme import make_pme_recip_pair
        recip_fn, recip_force_fn = make_pme_recip_pair(system, params)
    pert_idx = np.where(np.asarray(system.perturbed))[0]
    has_fep = pert_idx.size > 0
    force_fn = make_cluster_force_fn(system, params, recip_fn,
                                     has_fep=has_fep,
                                     pme_recip_force_fn=recip_force_fn)
    foreign_fn = None
    if lam_arr is not None:
        foreign_fn = make_foreign_delta_fn(system, params,
                                           jnp.asarray(lam_arr), recip_fn)
    frame0 = read_trr_frame(args.rerun, 0, natoms)
    vol = float(np.abs(np.linalg.det(frame0["box"])))
    rl = effective_rlist(params, system=system, volume=vol)
    cell_size = max((8.0 * vol / max(system.n_atoms, 1)) ** (1.0 / 3.0),
                    0.15)
    nnbr, fep_max = 96, 256

    def make_eval(nnbr, fep_max):
        @jax.jit
        def ev(x, box, lam):
            nlist = build_cluster_pairlist(x, box, system, rl, nnbr=nnbr,
                                           cell_size=cell_size)
            feplist = (build_fep_pairlist(x, box, system, rl, pert_idx,
                                          max_nbr=fep_max)
                       if has_fep else None)
            _, terms = force_fn(x, box, lam, nlist, feplist)
            dh = (foreign_fn(x, box, lam, feplist)
                  if foreign_fn is not None
                  else jnp.zeros((0,), x.dtype))
            ovf = nlist.n_overflow + (feplist.n_overflow if feplist
                                      is not None else 0)
            return terms, dh, ovf
        return ev

    # energy-group decomposition (reference: nbnxm Egrp kernels filling
    # gmx_grppairener_t; here the dense path evaluates each group pair)
    eg_fn = None
    eg_rows = []
    if params.energygrps:
        from .ops.forces import dense_group_energies, get_beta
        if system.n_atoms > 6000:
            print(f"note: energygrps decomposition is O(N^2); "
                  f"{system.n_atoms} atoms will be slow")
        eg_idx = [np.asarray(g, np.int32) for _, g in params.energygrps]
        beta_eg = get_beta(params)
        eg_fn = jax.jit(lambda x, box, lam: dense_group_energies(
            x, box, lam, system, params, eg_idx, beta_eg))

    ev = make_eval(nnbr, fep_max)
    rows, dvdls, dhs, times = [], [], [], []
    i = 0
    while i < nframes:
        fr = read_trr_frame(args.rerun, i, natoms)
        x = jnp.asarray(fr["x"])
        box = jnp.asarray(fr["box"])
        lam = state.lam
        terms, dh, ovf = ev(x, box, lam)
        if int(ovf) > 0:
            nnbr, fep_max = nnbr * 2, fep_max * 2
            ev = make_eval(nnbr, fep_max)
            continue
        times.append(fr["time"])
        rows.append([fr["time"], float(terms.epot)])
        dvdls.append(np.asarray(terms.dvdl))
        dhs.append(np.asarray(dh))
        if eg_fn is not None:
            ec, el = eg_fn(x, box, lam)
            ec, el = np.asarray(ec), np.asarray(el)
            G = ec.shape[0]
            eg_rows.append([fr["time"]]
                           + [v for a in range(G) for b in range(a, G)
                              for v in (ec[a, b], el[a, b])])
        i += 1
    deffnm = args.deffnm
    np.savetxt(f"{deffnm}.ener.csv", np.asarray(rows),
               header="time epot", comments="# ")
    if eg_rows:
        gnames = [nm for nm, _ in params.energygrps]
        with open(f"{deffnm}.eg.xvg", "w") as f:
            f.write('@    title "Group pair energies"\n'
                    '@    xaxis  label "Time (ps)"\n'
                    '@    yaxis  label "(kJ/mol)"\n')
            s = 0
            for a in range(len(gnames)):
                for b in range(a, len(gnames)):
                    f.write(f'@ s{s} legend "Coul-SR:{gnames[a]}-'
                            f'{gnames[b]}"\n')
                    f.write(f'@ s{s + 1} legend "LJ-SR:{gnames[a]}-'
                            f'{gnames[b]}"\n')
                    s += 2
            for r in eg_rows:
                f.write(" ".join(f"{v:.6f}" for v in r) + "\n")
        print(f"energygrps: wrote {deffnm}.eg.xvg "
              f"({len(gnames)} groups)")
    if lam_arr is not None:
        write_dhdl_xvg(f"{deffnm}.dhdl.xvg", np.asarray(times),
                       np.asarray(dvdls), np.asarray(dhs),
                       np.asarray(lam_arr),
                       max(int(params.fep.init_lambda_state), 0),
                       temperature=params.ref_t)
    print(f"rerun: {len(rows)} frames evaluated from {args.rerun}")


def _bound_force(system, params, box):
    """force_fn(x, lam, nnbr) -> (f, terms, n_overflow) with a fresh
    cluster pair list per call (minimizers rebuild between chunks)."""
    import jax.numpy as jnp
    from .core.types import CoulombType
    from .md.verletbuf import effective_rlist
    from .ops.cluster_nb import make_cluster_force_fn
    from .ops.pairlist import build_cluster_pairlist

    recip_fn = recip_force_fn = None
    if params.coulomb == CoulombType.PME:
        from .ops.pme import make_pme_recip_pair
        recip_fn, recip_force_fn = make_pme_recip_pair(system, params)
    force_fn = make_cluster_force_fn(system, params, recip_fn,
                                     pme_recip_force_fn=recip_force_fn)
    vol = float(np.abs(np.linalg.det(np.asarray(box))))
    rl = effective_rlist(params, system=system, volume=vol)
    cell = max((8.0 * vol / max(system.n_atoms, 1)) ** (1.0 / 3.0), 0.15)

    def bound(x, box_, lam, nnbr):
        nlist = build_cluster_pairlist(x, box_, system, rl, nnbr=nnbr,
                                       cell_size=cell)
        f, terms = force_fn(x, box_, lam, nlist, None)
        return f, terms, nlist.n_overflow

    return bound


def _do_minimize(args, system, params, state, data):
    """Energy minimization: steep / cg / l-bfgs (reference:
    minimize.cpp do_steep/do_cg/do_lbfgs).  Runs in chunks with a pair
    list rebuilt between chunks (atoms move during minimization)."""
    import jax.numpy as jnp
    from .io.groio import write_gro
    from .md.minimize import conjugate_gradient, l_bfgs, steepest_descent
    from .core.types import IntegratorType as _IT

    bound = _bound_force(system, params, state.box)
    algo = {_IT.STEEP: steepest_descent, _IT.CG: conjugate_gradient,
            _IT.LBFGS: l_bfgs}[params.integrator]
    nnbr = [96]

    def force3(x, box, lam):
        f, terms, ovf = bound(x, box, lam, nnbr[0])
        return f, terms

    # constraints on every trial step (minimize.cpp do_em_step
    # constr->apply) — without this rigid waters deform during EM
    from .md import constraints as constr_mod
    constrain_fn = None
    if constr_mod.n_constraints(system) > 0:
        from .core.types import FepCoupling as _FC
        invmass = 1.0 / jnp.maximum(jnp.asarray(system.mass_a), 1e-10)
        lam_b = state.lam[_FC.BONDED]

        def constrain_fn(x_ref, x_try):
            return constr_mod.constrain(
                x_ref, x_try, state.box, system, invmass, lam_b,
                params.lincs_order, params.lincs_iter)

    x = state.x
    nsteps = params.nsteps if params.nsteps > 0 else 1000
    chunk = 50
    done = 0
    kw = ({"m": params.nbfgscorr} if params.integrator == _IT.LBFGS else {})
    res = None
    while done < nsteps:
        res = algo(x, state.box, state.lam, force3,
                   nsteps=min(chunk, nsteps - done), emtol=params.emtol,
                   step0=params.emstep, constrain_fn=constrain_fn, **kw)
        # fail-hard on list overflow at the converged structure
        _, _, ovf = bound(res.x, state.box, state.lam, nnbr[0])
        if int(ovf) > 0:
            nnbr[0] *= 2
            continue
        x = res.x
        done += int(res.n_steps)
        if bool(res.converged) or int(res.n_steps) == 0:
            break
    print(f"{params.integrator.value}: {done} steps, "
          f"Epot = {float(res.epot):.4f} kJ/mol, "
          f"Fmax = {float(res.fmax):.4f} kJ/mol/nm "
          f"({'converged' if bool(res.converged) else 'not converged'} "
          f"at emtol {params.emtol})")
    names = [str(n) for n in data["names"]]
    resnames = [str(r) for r in data["resnames"]]
    write_gro(f"{args.deffnm}.gro", "tpumd minimized", names, resnames,
              np.asarray(x), None, np.asarray(state.box))


def _do_nm(args, system, params, state):
    """Normal-mode analysis at the input structure (reference:
    minimize.cpp:3127 do_nm); writes eigenvalues/frequencies to
    <deffnm>.nm.xvg."""
    import jax.numpy as jnp
    from .md.minimize import normal_modes

    if system.n_atoms > 2000:
        raise SystemExit("nm: dense Hessian limited to <= 2000 atoms")
    bound = _bound_force(system, params, state.box)

    def force3(x, box, lam):
        f, terms, _ = bound(x, box, lam, 96)
        return f, terms

    evals, freqs, _ = normal_modes(state.x, state.box, state.lam, force3,
                                   jnp.asarray(system.mass_a))
    ev = np.asarray(evals)
    fr = np.asarray(freqs)
    # ps^-1 -> cm^-1 (c = 29.9792458 cm/ps; omega = sqrt(k/m))
    cm1 = fr / (2.0 * np.pi) / 0.0299792458
    with open(f"{args.deffnm}.nm.xvg", "w") as f:
        f.write('@    title "Normal-mode eigenvalues"\n')
        f.write('@ s0 legend "eigenvalue (kJ/mol/nm^2/amu)"\n')
        f.write('@ s1 legend "frequency (1/cm)"\n')
        for i in range(ev.shape[0]):
            f.write(f"{i:6d} {ev[i]:16.6e} {cm1[i]:14.4f}\n")
    nz = cm1[6:]
    print(f"nm: {ev.shape[0]} modes; lowest nonzero frequency "
          f"{nz[nz > 1e-3][0] if (nz > 1e-3).any() else 0.0:.2f} cm^-1 "
          f"-> {args.deffnm}.nm.xvg")


def _do_tpi(args, system, params, state):
    """Widom test-particle insertion over an existing trajectory
    (reference: mdrun/tpi.cpp).  The LAST atom of the topology is the
    test particle; the trajectory holds the other n-1 atoms."""
    import dataclasses as _dc
    import jax.numpy as jnp
    from .md.tpi import tpi_over_frames

    if not getattr(args, "rerun", None):
        raise SystemExit("integrator = tpi requires -rerun traj.{trr,xtc}")
    if args.rerun.endswith(".xtc"):
        from .io.xtcio import read_xtc_frame as read_frame
        from .io.xtcio import scan_xtc as scan
    else:
        from .io.trrio import read_trr_frame as read_frame
        from .io.trrio import scan_trr as scan
    natoms, nframes = scan(args.rerun)
    if natoms != system.n_atoms - 1:
        raise SystemExit(f"tpi: trajectory has {natoms} atoms; topology "
                         f"must have exactly one more (the test "
                         f"particle), has {system.n_atoms}")
    test_type = int(np.asarray(system.type_a)[-1])
    test_q = float(np.asarray(system.charge_a)[-1])
    # a sub-System without the test particle for the frame energies
    sub = system.replace(
        charge_a=system.charge_a[:-1], charge_b=system.charge_b[:-1],
        type_a=system.type_a[:-1], type_b=system.type_b[:-1],
        mass_a=system.mass_a[:-1], mass_b=system.mass_b[:-1],
        perturbed=system.perturbed[:-1], n_atoms=system.n_atoms - 1)
    frames_x, frames_box = [], []
    for i in range(nframes):
        fr = read_frame(args.rerun, i, natoms)
        frames_x.append(fr["x"])
        frames_box.append(fr["box"])
    res = tpi_over_frames(frames_x, frames_box, sub, params,
                          test_type, test_q, params.ref_t,
                          n_insert=params.tpi_ninsert,
                          seed=params.ld_seed)
    print(f"tpi: mu_excess = {float(res.mu_excess):.4f} kJ/mol "
          f"({res.n_insertions} insertions over {nframes} frames)")
    with open(f"{args.deffnm}.tpi.xvg", "w") as f:
        f.write('@    title "TPI excess chemical potential"\n')
        f.write(f"{float(res.mu_excess):.6f}\n")


def cmd_ensemble(args):
    """All lambda windows in lockstep with Hamiltonian replica exchange —
    the `mdrun -multidir -replex` analogue (reference:
    mdrun/replicaexchange.cpp, mdrunutility/multisim.h), as one
    vmapped/sharded XLA program instead of MPI ranks."""
    import jax
    import jax.numpy as jnp
    from .core.types import CoulombType
    from .io.checkpoint import save_checkpoint
    from .io.xvgio import write_dhdl_xvg
    from .md.ensemble_runner import EnsembleConfig, EnsembleRunner
    from .ops.pme import pme_grid_size
    from .parallel.ensemble import stack_states

    pp, data = _load_tpz(args.s)
    system, params, state, all_lambda = (pp.system, pp.params, pp.state,
                                         pp.all_lambda)
    if all_lambda is None:
        raise ValueError("ensemble needs a lambda ladder: set fep-lambdas "
                         "(or coul/vdw/bonded-lambdas) in the mdp")
    if args.nsteps is not None:
        params = params.replace(nsteps=args.nsteps)
    if ((params.coulomb == CoulombType.PME or params.vdw_type == "pme")
            and params.pme_grid is None):
        diag = tuple(float(v) for v in np.diag(data["box"]))
        params = params.replace(pme_grid=pme_grid_size(
            diag, params.fourier_spacing))

    lam_arr = jnp.asarray(all_lambda.T)                 # (L, 7)
    L = int(lam_arr.shape[0])
    states = stack_states(state, lam_arr, seed=args.seed)

    mesh = None
    if len(jax.devices()) > 1:
        from .parallel.mesh import make_mesh
        n_dev = len(jax.devices())
        n_ens = max(d for d in range(1, n_dev + 1)
                    if L % d == 0 and n_dev % d == 0)
        mesh = make_mesh(n_ens=n_ens, n_spatial=n_dev // n_ens)
    use_pallas = args.fep == "tpu" or (args.fep == "auto"
                                       and jax.default_backend() == "tpu")
    cfg = EnsembleConfig(nstexchange=args.replex,
                         exchange=args.replex > 0,
                         use_pallas=use_pallas)
    runner = EnsembleRunner(system, params, lam_arr, mesh=mesh, config=cfg)

    t0 = time.time()
    states, logs, n_acc = runner.run(states, params.nsteps)
    jax.block_until_ready(states.x)
    wall = time.time() - t0
    # per-chunk log leaves are (L, seg, ...): windows lead, time second
    log = jax.tree_util.tree_map(
        lambda *xs: np.concatenate([np.asarray(x) for x in xs], axis=1),
        *logs)

    deffnm = args.deffnm
    n_frames = log.epot.shape[1]
    times = np.arange(n_frames) * params.dt
    for i in range(L):
        dh = np.asarray(log.delta_h)[i]
        keep = ~np.isnan(dh[:, 0])
        write_dhdl_xvg(f"{deffnm}.w{i}.dhdl.xvg", times[keep],
                       np.asarray(log.dvdl)[i][keep], dh[keep],
                       np.asarray(lam_arr), i, temperature=params.ref_t)
        save_checkpoint(f"{deffnm}.w{i}.cpt",
                        jax.tree_util.tree_map(lambda a, ii=i: a[ii], states))
    n_attempts = (params.nsteps // max(args.replex, 1)
                  if args.replex > 0 else 0)
    if n_attempts:
        print(f"replica exchange: {n_acc} swaps accepted in "
              f"{n_attempts} attempts x {L - 1} pairs "
              f"(rate {n_acc / max(n_attempts * (L // 2), 1):.2f})")
    ns_day = (params.nsteps * params.dt / 1000.0 / max(wall, 1e-9) * 86400.0)
    print(f"\nPerformance: {ns_day:10.3f} ns/day/window x {L} windows "
          f"({wall:.1f} s wall, {params.nsteps} steps, "
          f"{system.n_atoms} atoms)")

    # free-energy profile straight from the in-memory Delta-H samples
    from .analysis.bar import bar_profile
    dh_all, idx_all = [], []
    for i in range(L):
        dh = np.asarray(log.delta_h)[i]
        keep = ~np.isnan(dh[:, 0])
        dh_all.append(dh[keep])
        idx_all.append(np.full(int(keep.sum()), i))
    try:
        legs, total, err = bar_profile(np.concatenate(dh_all),
                                       np.concatenate(idx_all),
                                       params.ref_t, skip_frac=0.1)
        print(f"BAR total dG = {total:.3f} +/- {err:.3f} kJ/mol "
              f"({L} windows)")
    except ValueError as e:
        print(f"BAR skipped: {e}")


def cmd_pdb2gmx(args):
    """Protein topology generation from force-field residue databases,
    with missing hydrogens built from the .hdb geometry database
    (reference: gmxpreprocess/pdb2gmx.cpp + genhydro.cpp).  Needs a
    GROMACS-layout force-field directory (<ffdir>/<ff>.ff with
    aminoacids.rtp etc.)."""
    from .io.groio import write_gro
    from .io.pdb2top import (Pdb2TopError, add_missing_atoms,
                             build_protein_top, write_top)
    from .io.pdbio import parse_pdb_atoms

    if args.f.lower().endswith(".pdb"):
        with open(args.f) as f:
            names, resnames, resids, x, box = parse_pdb_atoms(f.read())
    else:
        from .io.ndxio import infer_resids
        from .io.pdbio import read_structure
        names, resnames, x, _, box = read_structure(args.f)
        resids = infer_resids(names, resnames)
    ff_dir = os.path.join(args.ffdir, args.ff + ".ff")
    if not os.path.isdir(ff_dir):
        raise SystemExit(f"pdb2gmx: force field dir {ff_dir} not found "
                         "(-ffdir must point at a GROMACS share/top)")
    try:
        names, resnames, resids, x, n_added = add_missing_atoms(
            names, resnames, resids, x, ff_dir, ignh=args.ignh)
        if n_added:
            print(f"pdb2gmx: built {n_added} missing atoms from "
                  f"{args.ff}.ff/aminoacids.hdb")
        top = build_protein_top(names, resnames, resids, ff_dir)
    except Pdb2TopError as e:
        raise SystemExit(f"pdb2gmx: {e}")
    text = write_top(top, f"{args.ff}.ff/forcefield.itp",
                     system_name="Protein", molname="Protein")
    with open(args.p, "w") as f:
        f.write(text)
    order = top["order"]
    x = np.asarray(x)[order]
    out_names = [top["atoms"][i][3] for i in range(len(order))]
    out_res = [top["atoms"][i][2] for i in range(len(order))]
    out_rid = [top["atoms"][i][1] for i in range(len(order))]
    if not np.asarray(box).any():
        ext = x.max(0) - x.min(0)
        box = np.diag(ext + 2.0)
    write_gro(args.o, "pdb2gmx output", out_names, out_res, x, None,
              box, resids=out_rid)
    q = sum(a[4] for a in top["atoms"])
    print(f"pdb2gmx: {len(top['groups'])} residues, "
          f"{len(top['atoms'])} atoms, total charge {q:+.3f}")
    print(f"  bonds {len(top['bonds'])}, pairs {len(top['pairs'])}, "
          f"angles {len(top['angles'])}, dihedrals "
          f"{len(top['dihedrals'])}, impropers {len(top['impropers'])}")
    print(f"wrote {args.p} and {args.o}; grompp with "
          f"include dirs containing {args.ffdir}")


def cmd_solvate(args):
    """Fill a box with TIP3P water around a solute
    (reference: gmxpreprocess/solvate.cpp)."""
    from .io.buildtools import solvate
    from .io.groio import write_gro
    from .io.pdbio import read_structure

    if args.cp:
        names, resnames, x, v, box = read_structure(args.cp)
    else:
        names, resnames, x, v = [], [], np.zeros((0, 3), np.float32), None
        if not args.box:
            raise SystemExit("solvate: need -cp solute.gro or -box L")
        box = np.eye(3, dtype=np.float32) * args.box
    if args.box:
        box = np.eye(3, dtype=np.float32) * args.box
    xw, n_w = solvate(x, box, spacing=args.spacing, shell=args.shell,
                      seed=args.seed)
    names_out = list(names) + ["OW", "HW1", "HW2"] * n_w
    res_out = list(resnames) + ["SOL"] * (3 * n_w)
    x_out = np.concatenate([x, xw]) if len(x) else xw
    write_gro(args.o, "solvated by tpumd", names_out, res_out, x_out,
              None, box)
    print(f"solvate: added {n_w} SOL -> {args.o}")
    print(f"add to [ molecules ]:\nSOL {n_w}")


def cmd_insert_molecules(args):
    """Random rigid-body insertions with overlap rejection
    (reference: gmxpreprocess/insert-molecules.cpp)."""
    from .io.buildtools import insert_molecules
    from .io.groio import write_gro
    from .io.pdbio import read_structure

    mnames, mres, mx, _, _ = read_structure(args.ci)
    if args.f:
        names, resnames, x, _, box = read_structure(args.f)
    else:
        names, resnames, x = [], [], np.zeros((0, 3), np.float32)
        if not args.box:
            raise SystemExit("insert-molecules: need -f or -box L")
        box = np.eye(3, dtype=np.float32) * args.box
    xi, n = insert_molecules(x, box, mx, args.nmol, radius=args.radius,
                             ntries=args.try_, seed=args.seed)
    names_out = list(names) + list(mnames) * n
    res_out = list(resnames) + list(mres) * n
    x_out = np.concatenate([x, xi]) if len(x) else xi
    write_gro(args.o, "built by tpumd", names_out, res_out, x_out, None,
              box)
    print(f"insert-molecules: placed {n}/{args.nmol} copies -> {args.o}")


def cmd_genion(args):
    """Replace waters by monoatomic ions (reference: genion.cpp).
    Charges come from the run file so -neutral works."""
    from .io.buildtools import genion
    from .io.groio import write_gro

    pp, data = _load_tpz(args.s)
    names = [str(n) for n in data["names"]]
    resnames = [str(r) for r in data["resnames"]]
    x = np.asarray(data["x"])
    box = np.asarray(data["box"])
    o_idx = np.asarray([i for i, (nm, rs) in enumerate(zip(names,
                                                           resnames))
                        if rs in ("SOL", "WAT", "HOH")
                        and nm.startswith("O")], np.int32)
    charges = np.asarray(pp.system.charge_a)
    pos, neg = genion(o_idx, x, charges, n_positive=args.np,
                      n_negative=args.nn, neutralize=args.neutral,
                      seed=args.seed)
    # build the output: replace each picked water (O,H,H) by one ion
    drop = set()
    for s in np.concatenate([pos, neg]).astype(int):
        drop.update((s, s + 1, s + 2))
    out_n, out_r, out_x = [], [], []
    for i in range(len(names)):
        if i in drop:
            continue
        out_n.append(names[i])
        out_r.append(resnames[i])
        out_x.append(x[i])
    for s in pos.astype(int):
        out_n.append(args.pname)
        out_r.append(args.pname)
        out_x.append(x[s])
    for s in neg.astype(int):
        out_n.append(args.nname)
        out_r.append(args.nname)
        out_x.append(x[s])
    write_gro(args.o, "ions by tpumd", out_n, out_r,
              np.asarray(out_x, np.float32), None, box)
    n_sol = (len(o_idx) - len(pos) - len(neg))
    print(f"genion: {len(pos)} {args.pname}, {len(neg)} {args.nname} "
          f"-> {args.o}")
    print(f"update [ molecules ]: SOL {n_sol}, {args.pname} {len(pos)},"
          f" {args.nname} {len(neg)}")


def cmd_traj(args):
    """Write coordinates of selected atoms as xvg columns
    (reference: gmx traj -ox)."""
    frames, boxes, times = _read_traj_frames(args.f)
    sel = _group_arg(args.sel, args, len(frames[0])) if args.sel \
        else np.arange(min(len(frames[0]), 10))
    with open(args.o, "w") as f:
        f.write('@    title "Coordinates"\n'
                '@    xaxis  label "Time (ps)"\n'
                '@    yaxis  label "(nm)"\n')
        for s_i, a in enumerate(np.asarray(sel)):
            for k, ax in enumerate("XYZ"):
                f.write(f'@ s{3 * s_i + k} legend '
                        f'"{ax} atom {int(a) + 1}"\n')
        for t, x in zip(times, frames):
            row = np.asarray(x)[sel].reshape(-1)
            f.write(f"{t:.5f} " + " ".join(f"{v:.6f}" for v in row)
                    + "\n")
    print(f"traj: {len(sel)} atoms x {len(frames)} frames -> {args.o}")


def cmd_rotacf(args):
    """Rotational autocorrelation of bond vectors
    (reference: gmx rotacf)."""
    from .analysis.traj import rotacf
    frames, boxes, times = _read_traj_frames(args.f)
    idx = np.asarray([int(v) - 1 for v in args.sel.split()], np.int32)
    if len(idx) % 2:
        raise SystemExit("rotacf: -sel must list atom PAIRS")
    pairs = idx.reshape(-1, 2)
    c = rotacf(frames, pairs, boxes, order=args.P)
    dt = times[1] - times[0] if len(times) > 1 else 1.0
    _write_series_xvg(args.o, f"Rotational ACF (P{args.P})",
                      "Time (ps)", f"C_{args.P}(t)",
                      np.arange(len(c)) * dt, c)
    print(f"rotacf: {len(pairs)} vectors, C({.5 * len(times) * dt:g}) "
          f"= {c[-1]:.4f} -> {args.o}")


def cmd_covar(args):
    """Mass-weighted covariance PCA of the fitted trajectory
    (reference: gmx covar + gmx anaeig -proj)."""
    from .analysis.pca import covar, project
    names, _, xref, mass = _load_struct_arg(args.s)
    frames, _, times = _read_traj_frames(args.f)
    sel = (_group_arg(args.sel, args, len(names)) if args.sel
           else np.arange(len(names)))
    fsel = [f[sel] for f in frames]
    vals, vecs, mean = covar(fsel, xref[sel], mass[sel])
    _write_series_xvg(args.o, "Covariance eigenvalues", "index",
                      "eigenvalue (nm^2 u)", np.arange(1, len(vals) + 1),
                      vals)
    trace = vals.sum()
    print(f"covar: trace {trace:.6f} nm^2 u; top eigenvalues "
          + " ".join(f"{v:.4g}" for v in vals[:4]))
    if args.proj:
        p = project(fsel, xref[sel], vecs, mean, n_proj=args.first,
                    mass=mass[sel])
        with open(args.proj, "w") as f:
            f.write('@    title "PC projections"\n'
                    '@    xaxis  label "Time (ps)"\n')
            for t, row in zip(times, p):
                f.write(f"{t:.5f} "
                        + " ".join(f"{v:.6f}" for v in row) + "\n")
        print(f"covar: projections on {args.first} PCs -> {args.proj}")


def cmd_cluster(args):
    """Conformational clustering on the pairwise-RMSD matrix
    (reference: gmx cluster -method gromos, Daura et al.)."""
    from .analysis.pca import gromos_cluster, rmsd_matrix
    frames, _, times = _read_traj_frames(args.f)
    sel = None
    if args.sel:
        sel = _group_arg(args.sel, args, len(frames[0]))
        frames = [f[sel] for f in frames]
    m = rmsd_matrix(frames)
    labels, centers = gromos_cluster(m, args.cutoff)
    _write_series_xvg(args.o, "Cluster id", "Time (ps)", "cluster",
                      times, labels)
    print(f"cluster: {labels.max() + 1} clusters at cutoff "
          f"{args.cutoff} nm")
    for cid, c in enumerate(centers):
        nmem = int((labels == cid).sum())
        print(f"  cluster {cid}: {nmem:4d} frames, center t = "
              f"{times[c]:g} ps")


def cmd_velacc(args):
    """Velocity autocorrelation (+ optional vibrational spectrum)
    (reference: gmx velacc / gmx dos, gmxana/gmx_velacc.cpp)."""
    from .analysis.traj import dos_spectrum, vacf
    from .io.trrio import read_trr_frame, scan_trr

    if not args.f.endswith(".trr"):
        raise SystemExit("velacc: needs a .trr with velocities")
    natoms, nframes = scan_trr(args.f)
    vs, times = [], []
    for i in range(nframes):
        fr = read_trr_frame(args.f, i, natoms)
        if fr.get("v") is None:
            continue
        vs.append(fr["v"])
        times.append(fr["time"])
    if len(vs) < 4:
        raise SystemExit(f"velacc: only {len(vs)} velocity frames in "
                         f"{args.f} (write with nstvout)")
    mass = None
    if args.s:
        pp, _ = _load_tpz(args.s)
        mass = np.asarray(pp.system.mass_a)
    if args.sel:
        sel = _group_arg(args.sel, args, len(vs[0]))
        vs = [v[sel] for v in vs]
        mass = mass[sel] if mass is not None else None
    c = vacf(vs, mass)
    dt = times[1] - times[0]
    lags = np.arange(len(c)) * dt
    _write_series_xvg(args.o, "Velocity autocorrelation", "Time (ps)",
                      "C(t)", lags, c)
    print(f"velacc: {len(vs)} frames, C({lags[-1]:g} ps) = {c[-1]:.4f} "
          f"-> {args.o}")
    if args.dos:
        freq, spec = dos_spectrum(c, dt)
        _write_series_xvg(args.dos, "Vibrational spectrum",
                          "Frequency (1/ps)", "S", freq, spec)
        print(f"dos: peak at {freq[np.argmax(spec[1:]) + 1]:.3f} 1/ps "
              f"-> {args.dos}")


def cmd_lie(args):
    """Linear interaction energy binding estimate
    (reference: gmx lie, gmxana/gmx_lie.cpp):
    dG = alpha (<E_vdw> - Elj_free) + beta (<E_coul> - Eqq_free), with
    the bound-state interaction energies averaged from the rerun
    energygrps output (Coul-SR:LIG-X / LJ-SR:LIG-X columns)."""
    from .io.xvgio import read_xvg
    data, legends = read_xvg(args.f)
    lig = args.ligand
    c_cols = [i for i, l in enumerate(legends)
              if l.startswith("Coul-SR:") and lig in l.split(":")[1]
              and l.split(":")[1] != f"{lig}-{lig}"]
    l_cols = [i for i, l in enumerate(legends)
              if l.startswith("LJ-SR:") and lig in l.split(":")[1]
              and l.split(":")[1] != f"{lig}-{lig}"]
    if not c_cols or not l_cols:
        raise SystemExit(f"lie: no Coul-SR/LJ-SR columns involving "
                         f"'{lig}' in {args.f} (available: {legends})")
    # legends map to data columns offset by the time column
    e_qq = data[:, [i + 1 for i in c_cols]].sum(1)
    e_lj = data[:, [i + 1 for i in l_cols]].sum(1)
    dg = (args.alpha * (e_lj.mean() - args.elj)
          + args.beta * (e_qq.mean() - args.eqq))
    print(f"<E_lj(bound)> = {e_lj.mean():.3f} kJ/mol, "
          f"<E_qq(bound)> = {e_qq.mean():.3f} kJ/mol")
    print(f"DeltaG_bind (LIE) = {dg:.3f} kJ/mol "
          f"(alpha={args.alpha}, beta={args.beta})")


def cmd_distance(args):
    """COM distance time series between two groups
    (reference: gmx distance)."""
    frames, boxes, times = _read_traj_frames(args.f)
    n = len(frames[0])
    g1 = _group_arg(args.g1, args, n)
    g2 = _group_arg(args.g2, args, n)
    out = []
    for x, box in zip(frames, boxes):
        bd = np.diag(np.asarray(box, np.float64))
        d = np.asarray(x)[g1].mean(0) - np.asarray(x)[g2].mean(0)
        d -= bd * np.round(d / bd)
        out.append(float(np.sqrt((d * d).sum())))
    _write_series_xvg(args.o, "COM distance", "Time (ps)", "d (nm)",
                      times, out)
    print(f"distance: mean {np.mean(out):.4f} +- {np.std(out):.4f} nm "
          f"-> {args.o}")


def cmd_angle(args):
    """Angle / dihedral time series over atom triplets or quadruplets
    (reference: gmx angle, gmxana/gmx_angle.cpp).  -sel lists 1-based
    atoms in groups of 3 (-type angle) or 4 (-type dihedral)."""
    frames, boxes, times = _read_traj_frames(args.f)
    idx = np.asarray([int(v) - 1 for v in args.sel.split()], np.int32)
    k = 3 if args.type == "angle" else 4
    if len(idx) % k:
        raise SystemExit(f"angle: -sel length must be a multiple of {k}")
    sets = idx.reshape(-1, k)
    rows = []
    for x, box in zip(frames, boxes):
        x = np.asarray(x, np.float64)
        bd = np.diag(np.asarray(box, np.float64))

        def mi(d):
            return d - bd * np.round(d / bd)
        vals = []
        for s in sets:
            if k == 3:
                v1 = mi(x[s[0]] - x[s[1]])
                v2 = mi(x[s[2]] - x[s[1]])
                c = np.dot(v1, v2) / (np.linalg.norm(v1)
                                      * np.linalg.norm(v2))
                vals.append(np.degrees(np.arccos(np.clip(c, -1, 1))))
            else:
                b1 = mi(x[s[1]] - x[s[0]])
                b2 = mi(x[s[2]] - x[s[1]])
                b3 = mi(x[s[3]] - x[s[2]])
                n1 = np.cross(b1, b2)
                n2 = np.cross(b2, b3)
                m1 = np.cross(n1, b2 / np.linalg.norm(b2))
                ang = np.degrees(np.arctan2(np.dot(m1, n2),
                                            np.dot(n1, n2)))
                vals.append(ang)
        rows.append(vals)
    rows = np.asarray(rows)
    with open(args.o, "w") as f:
        f.write(f'@    title "{args.type}s"\n'
                '@    xaxis  label "Time (ps)"\n'
                '@    yaxis  label "degrees"\n')
        for t, r in zip(times, rows):
            f.write(f"{t:.5f} " + " ".join(f"{v:.4f}" for v in r) + "\n")
    print(f"angle: {rows.shape[1]} {args.type}(s), "
          f"mean {rows.mean():.2f} deg -> {args.o}")


def cmd_convert_tpr(args):
    """Extend/retarget a run file (reference: gmx convert-tpr
    -extend/-until/-nsteps, tools/convert_tpr.cpp): rewrites nsteps in
    the stored mdp text so restarts keep going."""
    import re as _re

    data = np.load(args.s, allow_pickle=True)
    mdp_text = str(data["mdp"])
    m = _re.search(r"^\s*nsteps\s*=\s*(\S+)", mdp_text, _re.M)
    old_nsteps = int(m.group(1)) if m else 0
    pp, _ = _load_tpz(args.s)
    dt = pp.params.dt
    if args.nsteps is not None:
        new_nsteps = args.nsteps
    elif args.extend is not None:
        new_nsteps = old_nsteps + int(round(args.extend / dt))
    elif args.until is not None:
        new_nsteps = int(round(args.until / dt))
    else:
        raise SystemExit("convert-tpr: give -nsteps, -extend or -until")
    if m:
        mdp_text = (mdp_text[:m.start()]
                    + f"nsteps = {new_nsteps}" + mdp_text[m.end():])
    else:
        mdp_text += f"\nnsteps = {new_nsteps}\n"
    out = {k: data[k] for k in data.files}
    out["mdp"] = mdp_text
    with open(args.o, "wb") as f:
        np.savez(f, **out)
    print(f"convert-tpr: nsteps {old_nsteps} -> {new_nsteps} "
          f"({new_nsteps * dt:g} ps) -> {args.o}")


def cmd_editconf(args):
    """Structure/box editing + gro<->pdb conversion
    (reference: gmx editconf, tools/editconf.cpp): -box sets the box,
    -d sets it from the solute extent plus a margin, -c centers, and
    the output format follows the -o extension."""
    from .io.groio import write_gro
    from .io.pdbio import read_structure, write_pdb

    names, resnames, x, v, box = read_structure(args.f)
    x = np.asarray(x, np.float64)
    if args.box:
        vals = [float(t) for t in args.box]
        if len(vals) == 1:
            vals = vals * 3
        box = np.diag(vals)
    elif args.d is not None:
        ext = x.max(0) - x.min(0)
        box = np.diag(ext + 2.0 * args.d)
    if args.c:
        bd = np.diag(np.asarray(box))
        x = x - (x.max(0) + x.min(0)) / 2.0 + bd / 2.0
    if args.translate:
        x = x + np.asarray([float(t) for t in args.translate])
    if args.rotate:
        ang = np.radians([float(t) for t in args.rotate])
        for axis, a in enumerate(ang):
            if a == 0.0:
                continue
            c, s = np.cos(a), np.sin(a)
            i, j = [(1, 2), (0, 2), (0, 1)][axis]
            rot = np.eye(3)
            rot[i, i] = rot[j, j] = c
            rot[i, j], rot[j, i] = -s, s
            x = x @ rot.T
    if args.o.lower().endswith(".pdb"):
        write_pdb(args.o, "edited by tpumd", names, resnames, x, box=box)
    elif args.o.lower().endswith(".g96"):
        from .io.g96io import write_g96
        write_g96(args.o, "edited by tpumd", names, resnames, x,
                  (np.asarray(v) if v is not None and not args.novel
                   else None), box)
    else:
        write_gro(args.o, "edited by tpumd", names, resnames, x,
                  (np.asarray(v) if v is not None and not args.novel
                   else None), box)
    bd = np.diag(np.asarray(box))
    print(f"editconf: {len(names)} atoms, box "
          f"{bd[0]:.4f} x {bd[1]:.4f} x {bd[2]:.4f} -> {args.o}")


def cmd_genrestr(args):
    """Generate a [ position_restraints ] .itp for a group
    (reference: gmx genrestr, gmxpreprocess/genrestr.cpp)."""
    from .io.pdbio import read_structure

    names, resnames, x, _, _ = read_structure(args.f)
    if args.sel:
        idx = _group_arg(args.sel, args, len(names))
    else:
        # default: all heavy atoms (gmx genrestr default group choice
        # is interactive; non-hydrogen is the common case)
        idx = np.asarray([i for i, nm in enumerate(names)
                          if not nm.strip().upper().startswith("H")],
                         np.int32)
    fx, fy, fz = args.fc
    with open(args.o, "w") as f:
        f.write("; position restraints generated by tpumd genrestr\n")
        f.write("[ position_restraints ]\n")
        f.write(";  i funct       fcx        fcy        fcz\n")
        for i in np.asarray(idx):
            f.write(f"{int(i) + 1:4d}    1 {fx:9.0f} {fy:9.0f} "
                    f"{fz:9.0f}\n")
    print(f"genrestr: {len(idx)} restraints -> {args.o}")


def cmd_trjcat(args):
    """Concatenate trajectories in time order, dropping duplicate
    frames at the joins (reference: gmx trjcat)."""
    from .io.trrio import write_trr_frame
    from .io.xtcio import write_xtc_frame
    out = args.o
    if os.path.exists(out):
        os.unlink(out)
    last_t = None
    kept = dropped = 0
    for src in args.f:
        frames, boxes, times = _read_traj_frames(src)
        # need v too for trr output: reread per-frame below if trr
        if src.endswith(".trr") and out.endswith(".trr"):
            from .io.trrio import read_trr_frame, scan_trr
            na, nf = scan_trr(src)
            for i in range(nf):
                fr = read_trr_frame(src, i, na)
                if last_t is not None and fr["time"] <= last_t + 1e-9:
                    dropped += 1
                    continue
                write_trr_frame(out, fr["x"], fr["box"], v=fr.get("v"),
                                step=fr["step"], time=fr["time"])
                last_t = fr["time"]
                kept += 1
        else:
            for x, b, t in zip(frames, boxes, times):
                if last_t is not None and t <= last_t + 1e-9:
                    dropped += 1
                    continue
                if out.endswith(".xtc"):
                    write_xtc_frame(out, x, b, step=kept, time=t)
                elif out.endswith(".trr"):
                    write_trr_frame(out, x, b, step=kept, time=t)
                else:
                    raise SystemExit(f"trjcat: unsupported output {out}")
                last_t = t
                kept += 1
    print(f"trjcat: {kept} frames ({dropped} overlapping dropped) "
          f"-> {out}")


def cmd_genconf(args):
    """Replicate a configuration on an N x M x K grid
    (reference: gmx genconf -nbox)."""
    from .io.groio import write_gro
    from .io.pdbio import read_structure
    names, resnames, x, v, box = read_structure(args.f)
    nx, ny, nz = args.nbox
    bd = np.diag(np.asarray(box, np.float64))
    xs, vs = [], []
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                shift = np.array([i, j, k]) * bd
                xs.append(np.asarray(x) + shift)
                if v is not None:
                    vs.append(np.asarray(v))
    n_copies = nx * ny * nz
    x_out = np.concatenate(xs)
    v_out = np.concatenate(vs) if v is not None else None
    box_out = np.asarray(box, np.float64).copy()
    box_out[0] *= nx
    box_out[1] *= ny
    box_out[2] *= nz
    write_gro(args.o, f"genconf {nx}x{ny}x{nz}",
              list(names) * n_copies, list(resnames) * n_copies,
              x_out, v_out, box_out)
    print(f"genconf: {n_copies} copies, {len(x_out)} atoms -> {args.o}")
    print("multiply every [ molecules ] count by "
          f"{n_copies} in the topology")


def cmd_make_ndx(args):
    """Non-interactive index-file generation (reference: gmx make_ndx
    auto groups, topology/index.cpp analyse): System / Water /
    non-Water plus one group per distinct residue name, written as a
    standard .ndx."""
    from .io.ndxio import default_groups, write_ndx
    from .io.pdbio import read_structure

    names, resnames, x, _, _ = read_structure(args.f)
    groups = default_groups(names, resnames)
    for rn in dict.fromkeys(r.strip() for r in resnames):   # stable order
        if rn and rn not in groups:
            groups[rn] = np.asarray(
                [i for i, r in enumerate(resnames) if r.strip() == rn],
                np.int32)
    write_ndx(args.o, groups)
    for k, v in groups.items():
        print(f"{k:>16s}: {len(v):6d} atoms")
    print(f"wrote {len(groups)} groups -> {args.o}")


def cmd_trjconv(args):
    """Trajectory conversion/filtering (reference: gmx trjconv,
    gmxana/gmx_trjconv.cpp): trr/xtc in -> trr/xtc/gro out, with -b/-e
    time window, -skip, and -pbc atom wrapping."""
    from .io.trrio import read_trr_frame, scan_trr, write_trr_frame
    from .io.xtcio import read_xtc_frame, scan_xtc, write_xtc_frame

    src = args.f
    if src.endswith(".trr"):
        natoms, nframes = scan_trr(src)
        read = lambda i: read_trr_frame(src, i, natoms)
    elif src.endswith(".xtc"):
        natoms, nframes = scan_xtc(src)
        read = lambda i: read_xtc_frame(src, i, natoms)
    else:
        raise SystemExit(f"trjconv: unsupported input {src} "
                         "(.trr/.xtc)")
    out = args.o
    if os.path.exists(out):
        os.unlink(out)
    names = resnames = None
    if out.endswith((".gro", ".pdb")):
        if args.s:
            pp, data = _load_tpz(args.s)
            names = [str(n) for n in data["names"]]
            resnames = [str(r) for r in data["resnames"]]
        else:
            names = ["X"] * natoms
            resnames = ["MOL"] * natoms

    kept = 0
    last_t = None
    for i in range(nframes):
        fr = read(i)
        t = fr["time"]
        if args.b is not None and t < args.b - 1e-9:
            continue
        if args.e is not None and t > args.e + 1e-9:
            break
        if args.skip > 1 and (i % args.skip) != 0:
            continue
        if args.dt and last_t is not None and t - last_t < args.dt - 1e-9:
            continue
        x = fr["x"]
        if x is None:
            continue
        if args.pbc == "atom":
            # wrap every atom into the primary cell (trjconv -pbc atom)
            from .core.pbc import wrap_into_box
            import jax.numpy as jnp
            x = np.asarray(wrap_into_box(jnp.asarray(x),
                                         jnp.asarray(fr["box"])))
        if out.endswith(".trr"):
            write_trr_frame(out, x, fr["box"], v=fr.get("v"),
                            step=fr["step"], time=t,
                            lam=fr.get("lam", 0.0))
        elif out.endswith(".xtc"):
            write_xtc_frame(out, x, fr["box"], step=fr["step"], time=t,
                            precision=fr.get("precision", 1000.0))
        elif out.endswith(".gro"):
            # multi-frame gro = concatenated frames (trjconv convention)
            from .io.groio import write_gro
            import tempfile
            with tempfile.NamedTemporaryFile("r", suffix=".gro",
                                             delete=False) as tf:
                tmpname = tf.name
            write_gro(tmpname, f"frame t={t:g}", names, resnames, x,
                      fr.get("v"), fr["box"])
            with open(tmpname) as tf, open(out, "a" if kept else "w") as of:
                of.write(tf.read())
            os.unlink(tmpname)
        elif out.endswith(".pdb"):
            # multi-frame pdb = MODEL/ENDMDL records (pdbio.cpp)
            from .io.pdbio import write_pdb
            write_pdb(out, f"frame t={t:g}", names, resnames, x,
                      box=fr["box"], append_model=kept + 1)
        else:
            raise SystemExit(f"trjconv: unsupported output {out}")
        kept += 1
        last_t = t
    print(f"trjconv: {kept}/{nframes} frames -> {out}")


def _read_traj_frames(path):
    """(frames, boxes, times) from a .trr or .xtc."""
    if path.endswith(".trr"):
        from .io.trrio import read_trr_frame, scan_trr
        natoms, nf = scan_trr(path)
        frames, boxes, times = [], [], []
        for i in range(nf):
            fr = read_trr_frame(path, i, natoms)
            if fr["x"] is None:
                continue
            frames.append(fr["x"])
            boxes.append(fr["box"])
            times.append(fr["time"])
        return frames, boxes, times
    if path.endswith(".xtc"):
        from .io.xtcio import read_xtc_frame, scan_xtc
        natoms, nf = scan_xtc(path)
        out = [read_xtc_frame(path, i, natoms) for i in range(nf)]
        return ([f["x"] for f in out], [f["box"] for f in out],
                [f["time"] for f in out])
    raise SystemExit(f"unsupported trajectory {path} (.trr/.xtc)")


def _parse_sel(s):
    return (np.asarray([int(v) - 1 for v in s.split()], np.int32)
            if s else None)


def _group_arg(spec, args, n_atoms):
    """Resolve a group CLI argument: inline 1-based list, or a name
    from -n index.ndx (reference tools' index-group prompt)."""
    from .io.ndxio import parse_ndx, resolve_group
    ndx = {}
    if getattr(args, "n", None):
        with open(args.n) as f:
            ndx = parse_ndx(f.read())
    return resolve_group(spec, ndx, n_atoms)


def _load_struct_arg(path):
    """-s for analysis tools: .tpz (names/resnames/masses) or .gro/.pdb
    (unit masses)."""
    if path.endswith(".tpz"):
        pp, data = _load_tpz(path)
        return ([str(v) for v in data["names"]],
                [str(v) for v in data["resnames"]],
                np.asarray(data["x"]), np.asarray(pp.system.mass_a))
    from .io.pdbio import read_structure
    names, resnames, x, _, _ = read_structure(path)
    return names, resnames, x, np.ones(len(names))


def cmd_rms(args):
    """RMSD to a reference structure after LSQ fit
    (reference: gmxana/gmx_rms.cpp)."""
    from .analysis.traj import rms_series
    names, _, xref, mass = _load_struct_arg(args.s)
    frames, _, times = _read_traj_frames(args.f)
    sel = (_group_arg(args.sel, args, len(names)) if args.sel
           else np.arange(len(names)))
    series = rms_series([f[sel] for f in frames], xref[sel], mass[sel],
                        fit=not args.nofit)
    _write_series_xvg(args.o, "RMSD", "Time (ps)", "RMSD (nm)",
                      times, series)
    print(f"rms: {len(frames)} frames, mean {series.mean():.4f} nm "
          f"-> {args.o}")


def cmd_rmsf(args):
    """Per-atom RMS fluctuation (reference: gmxana/gmx_rmsf.cpp)."""
    from .analysis.traj import rmsf
    names, _, xref, mass = _load_struct_arg(args.s)
    frames, _, _ = _read_traj_frames(args.f)
    sel = (_group_arg(args.sel, args, len(names)) if args.sel
           else np.arange(len(names)))
    flucts = rmsf([f[sel] for f in frames], xref[sel], mass[sel])
    _write_series_xvg(args.o, "RMS fluctuation", "Atom", "RMSF (nm)",
                      np.asarray(sel) + 1, flucts)
    print(f"rmsf: {len(frames)} frames, max {flucts.max():.4f} nm "
          f"-> {args.o}")


def cmd_gyrate(args):
    """Radius of gyration (reference: gmxana/gmx_gyrate.cpp)."""
    from .analysis.traj import gyrate
    names, _, _, mass = _load_struct_arg(args.s)
    frames, _, times = _read_traj_frames(args.f)
    sel = (_group_arg(args.sel, args, len(names)) if args.sel
           else np.arange(len(names)))
    rg = gyrate([f[sel] for f in frames], mass[sel])
    _write_series_xvg(args.o, "Radius of gyration", "Time (ps)",
                      "Rg (nm)", times, rg)
    print(f"gyrate: mean Rg {rg.mean():.4f} nm -> {args.o}")


def cmd_mindist(args):
    """Minimum inter-group distance (reference: gmxana/gmx_mindist.cpp)."""
    from .analysis.traj import mindist
    frames, boxes, times = _read_traj_frames(args.f)
    n = len(frames[0])
    g1 = _group_arg(args.g1, args, n)
    g2 = _group_arg(args.g2, args, n)
    d = mindist(frames, boxes, g1, g2)
    _write_series_xvg(args.o, "Minimum distance", "Time (ps)",
                      "d (nm)", times, d)
    print(f"mindist: min {d.min():.4f} nm -> {args.o}")


def cmd_density(args):
    """Partial density profile along a box axis
    (reference: gmxana/gmx_density.cpp)."""
    from .analysis.traj import density_profile
    names, _, _, mass = _load_struct_arg(args.s)
    frames, boxes, _ = _read_traj_frames(args.f)
    grp = (_group_arg(args.sel, args, len(names)) if args.sel else None)
    axis = "xyz".index(args.axis)
    centers, dens = density_profile(frames, boxes, mass, axis=axis,
                                    nslices=args.sl, group=grp)
    _write_series_xvg(args.o, "Partial density",
                      f"{args.axis} (nm)", "Density (kg/m^3)",
                      centers, dens)
    print(f"density: mean {dens.mean():.1f} kg/m^3 -> {args.o}")


def cmd_hbond(args):
    """Hydrogen-bond count per frame, geometric criterion
    (reference: gmxana/gmx_hbond.cpp).  With no explicit groups, uses
    the water convention: every SOL OW donates its two HW and accepts."""
    from .analysis.traj import hbond_series
    names, resnames, _, _ = _load_struct_arg(args.s)
    frames, boxes, times = _read_traj_frames(args.f)
    n = len(names)
    if args.don and args.hyd and args.acc:
        donors = _group_arg(args.don, args, n)
        hydrogens = _group_arg(args.hyd, args, n)
        acceptors = _group_arg(args.acc, args, n)
    else:
        ow = [i for i in range(n)
              if resnames[i] in ("SOL", "WAT", "HOH")
              and names[i].startswith("O")]
        donors, hydrogens = [], []
        for o in ow:
            for h in (o + 1, o + 2):
                if h < n and names[h].startswith("H"):
                    donors.append(o)
                    hydrogens.append(h)
        acceptors = np.asarray(ow, np.int32)
        donors = np.asarray(donors, np.int32)
        hydrogens = np.asarray(hydrogens, np.int32)
        if not len(donors):
            raise SystemExit("hbond: no water found; give -don/-hyd/-acc")
    counts = hbond_series(frames, boxes, donors, hydrogens, acceptors,
                          r_cut=args.r, angle_cut=args.a)
    _write_series_xvg(args.o, "Hydrogen bonds", "Time (ps)", "count",
                      times, counts)
    print(f"hbond: mean {counts.mean():.2f} bonds/frame -> {args.o}")


def cmd_sasa(args):
    """Solvent-accessible surface area, Shrake-Rupley
    (reference: gmx sasa, trajectoryanalysis/modules/sasa.cpp)."""
    from .analysis.sasa import radii_from_nbfp, sasa
    pp, data = _load_tpz(args.s)
    frames, boxes, times = _read_traj_frames(args.f)
    radii = radii_from_nbfp(np.asarray(pp.system.nbfp),
                            np.asarray(pp.system.type_a))
    sel = (_group_arg(args.sel, args, len(radii)) if args.sel
           else np.arange(len(radii)))
    series = [sasa(np.asarray(f)[sel], radii[sel], probe=args.probe,
                   n_points=args.ndots, box=b)[0]
              for f, b in zip(frames, boxes)]
    _write_series_xvg(args.o, "Solvent accessible surface",
                      "Time (ps)", "Area (nm^2)", times, series)
    print(f"sasa: mean {np.mean(series):.3f} nm^2 -> {args.o}")


def cmd_dipoles(args):
    """Total dipole moment + dielectric estimate
    (reference: gmxana/gmx_dipoles.cpp)."""
    from .analysis.electro import ENM2DEBYE, dipole_series, dipole_stats
    pp, data = _load_tpz(args.s)
    frames, boxes, times = _read_traj_frames(args.f)
    q = np.asarray(pp.system.charge_a)
    sel = (_group_arg(args.sel, args, len(q)) if args.sel else None)
    m = dipole_series(frames, q, sel)
    vol = float(np.prod(np.diag(np.asarray(boxes[0]))))
    st = dipole_stats(m, vol, args.temp)
    _write_series_xvg(args.o, "Total dipole moment", "Time (ps)",
                      "|M| (D)", times,
                      np.sqrt((m * m).sum(1)) * ENM2DEBYE)
    print(f"dipoles: <|M|> = {st['mu_mean_D']:.4f} D, "
          f"epsilon = {st['epsilon']:.3f} -> {args.o}")


def cmd_potential(args):
    """Electrostatic potential profile across the box
    (reference: gmxana/gmx_potential.cpp)."""
    from .analysis.electro import potential_profile
    pp, data = _load_tpz(args.s)
    frames, boxes, _ = _read_traj_frames(args.f)
    q = np.asarray(pp.system.charge_a)
    sel = (_group_arg(args.sel, args, len(q)) if args.sel else None)
    centers, rho, volt = potential_profile(
        frames, boxes, q, axis="xyz".index(args.axis),
        nslices=args.sl, group=sel)
    with open(args.o, "w") as f:
        f.write('@    title "Electrostatic potential"\n'
                f'@    xaxis  label "{args.axis} (nm)"\n'
                '@    yaxis  label "psi (V)"\n'
                '@ s0 legend "potential (V)"\n'
                '@ s1 legend "charge density (e/nm^3)"\n')
        for c, v, r in zip(centers, volt, rho):
            f.write(f"{c:.5f} {v:.6f} {r:.6f}\n")
    print(f"potential: range [{volt.min():.4f}, {volt.max():.4f}] V "
          f"-> {args.o}")


def _write_series_xvg(path, title, xlabel, ylabel, xs, ys):
    with open(path, "w") as f:
        f.write(f"@    title \"{title}\"\n"
                f"@    xaxis  label \"{xlabel}\"\n"
                f"@    yaxis  label \"{ylabel}\"\n")
        for xv, yv in zip(xs, ys):
            f.write(f"{xv:.5f} {yv:.6f}\n")


def cmd_rdf(args):
    """Radial distribution function (reference: gmxana/gmx_rdf.cpp)."""
    from .analysis.structure import rdf
    frames, boxes, _ = _read_traj_frames(args.f)
    centers, g = rdf(frames, boxes, sel_a=_parse_sel(args.sel_a),
                     sel_b=_parse_sel(args.sel_b),
                     r_max=args.rmax, n_bins=args.bins)
    with open(args.o, "w") as f:
        f.write("@    title \"Radial distribution\"\n"
                "@    xaxis  label \"r (nm)\"\n"
                "@    yaxis  label \"g(r)\"\n")
        for c, v in zip(centers, g):
            f.write(f"{c:.5f} {v:.6f}\n")
    print(f"rdf: {len(frames)} frames -> {args.o} "
          f"(g(r_max) = {g[-1]:.3f})")


def cmd_msd(args):
    """Mean-squared displacement + diffusion coefficient
    (reference: gmxana/gmx_msd.cpp, Einstein relation)."""
    from .analysis.structure import fit_diffusion, msd
    frames, _, times = _read_traj_frames(args.f)
    if len(frames) < 3:
        raise SystemExit("msd: need >= 3 frames")
    lags, m = msd(frames, times, sel=_parse_sel(args.sel),
                  n_restarts=args.restarts)
    with open(args.o, "w") as f:
        f.write("@    title \"Mean Square Displacement\"\n"
                "@    xaxis  label \"Time (ps)\"\n"
                "@    yaxis  label \"MSD (nm\\S2\\N)\"\n")
        for t, v in zip(lags, m):
            f.write(f"{t:.5f} {v:.6f}\n")
    d = fit_diffusion(lags, m)
    # GROMACS prints D in 1e-5 cm^2/s: 1 nm^2/ps = 1e-14 cm^2 / 1e-12 s
    # = 1e-2 cm^2/s = 1e3 * 1e-5 cm^2/s
    print(f"msd: D = {d * 1e3:.4f} 1e-5 cm^2/s "
          f"({d:.3e} nm^2/ps) over {len(frames)} frames -> {args.o}")


def cmd_wham(args):
    """Umbrella-sampling PMF via WHAM (reference: gmxana/gmx_wham.cpp)."""
    from .analysis.wham import read_pullx, wham, write_pmf_xvg

    if not (len(args.ix) == len(args.x0) == len(args.k)):
        raise SystemExit("wham: -ix, -x0 and -k need one entry per window")
    samples = [read_pullx(p, args.coord) for p in args.ix]
    centers, pmf, _ = wham(samples, args.x0, args.k, temp=args.temp,
                           n_bins=args.bins)
    write_pmf_xvg(args.o, centers, pmf)
    lo = np.nanargmin(pmf)
    print(f"wham: {len(samples)} windows, "
          f"{sum(len(s) for s in samples)} samples, {args.bins} bins")
    print(f"PMF written to {args.o}; minimum at "
          f"{centers[lo]:.3f} nm, max barrier "
          f"{np.nanmax(pmf):.2f} kJ/mol")


def cmd_bar(args):
    from .analysis.bar import bar_profile
    from .io.xvgio import read_xvg
    from .core.types import FepCoupling

    dh_rows, idx_rows = [], []
    for i, path in enumerate(args.f):
        if path.endswith(".edr"):
            # raw delta-H blocks from the binary energy file
            # (gmx bar's edr input path; mdlib/mdebin_bar.cpp layout)
            from .io.edrio import DHBT_DH, ENX_DH, read_edr
            _, _, frames = read_edr(path)
            rows = []
            for fr in frames:
                series = [np.atleast_1d(np.asarray(b.subs[2][1], float))
                          for b in fr.blocks
                          if b.id == ENX_DH
                          and int(b.subs[0][1][0]) == DHBT_DH]
                if series:
                    # (n_foreign, nsamples) -> one row per stored sample
                    rows.append(np.stack(series, axis=0).T)
            dh = np.concatenate(rows) if rows else np.zeros((0, 0))
        else:
            data, legends = read_xvg(path)
            ndvdl = sum(1 for l in legends if l.startswith("dH/d"))
            dh = data[:, 1 + ndvdl:]
        dh_rows.append(dh)
        idx_rows.append(np.full(dh.shape[0], i))
    delta_h = np.concatenate(dh_rows)
    lam_idx = np.concatenate(idx_rows)
    if getattr(args, "method", "bar") == "mbar":
        # all-sample multistate estimate (Shirts & Chodera 2008); needs
        # every window to log dH to every ladder state
        from .analysis.mbar import mbar
        from .core.units import BOLTZ
        nskip = int(args.b * len(delta_h))
        if delta_h.shape[1] != len(args.f):
            raise SystemExit(
                f"mbar: {len(args.f)} windows but {delta_h.shape[1]} "
                "dH columns (need calc-lambda-neighbors = -1)")
        keep = np.ones(len(lam_idx), bool)
        for i in range(len(args.f)):
            w = np.where(lam_idx == i)[0]
            keep[w[:int(args.b * len(w))]] = False
        f, errs = mbar(delta_h[keep], lam_idx[keep],
                       BOLTZ * args.temp)
        print("state      f (kJ/mol)    +/-")
        for i in range(len(f)):
            print(f"{i:3d}   {f[i]:12.3f}   {errs[i]:8.3f}")
        print(f"\ntotal (MBAR)   {f[-1] - f[0]:12.3f}   "
              f"{errs[-1]:8.3f} kJ/mol")
        return
    legs, total, err = bar_profile(delta_h, lam_idx, args.temp,
                                   skip_frac=args.b)
    print("lambda pair      dG (kJ/mol)    +/-")
    for i, (dg, e) in enumerate(legs):
        print(f"{i:3d} -> {i+1:<3d}   {dg:12.3f}   {e:8.3f}")
    print(f"\ntotal          {total:12.3f}   {err:8.3f} kJ/mol")


def cmd_energy(args):
    from .analysis.energy import energy_statistics, print_statistics
    print_statistics(energy_statistics(args.f, skip_frac=args.b))


def cmd_check(args):
    if not args.s and not getattr(args, "f", None):
        raise SystemExit("check: give -s run file and/or -f trajectory")
    if getattr(args, "f", None):
        # trajectory summary (reference: gmx check -f, tools/check.cpp):
        # frame count, time range, per-frame content, simple sanity
        frames, boxes, times = _read_traj_frames(args.f)
        print(f"{args.f}: {len(frames)} frames, "
              f"{len(frames[0])} atoms")
        if len(times) > 1:
            dts = np.diff(times)
            print(f"time: {times[0]:g} .. {times[-1]:g} ps "
                  f"(dt = {dts[0]:g}{'' if np.allclose(dts, dts[0]) else ' VARIABLE'})")
        bad = sum(1 for x in frames if not np.isfinite(x).all())
        print(f"non-finite frames: {bad}")
        b0 = np.diag(np.asarray(boxes[0]))
        print(f"box diag (first frame): {b0.round(4)}")
        if not args.s:
            return
    from .io.cptio import is_gmx_cpt
    if args.s.endswith(".cpt") and is_gmx_cpt(args.s):
        # gmx dump -cp analogue (reference: checkpoint.cpp list_checkpoint)
        from .io.cptio import read_gmx_cpt
        cp = read_gmx_cpt(args.s)
        print(f"GROMACS checkpoint (file version {cp.file_version}, "
              f"written by '{cp.version_string}')")
        print(f"atoms: {cp.natoms}")
        print(f"step: {cp.step}  t: {cp.t:g} ps  "
              f"part: {cp.simulation_part}")
        print(f"integrator: {cp.integrator}  ngtc: {cp.ngtc}  "
              f"nhchainlength: {cp.nhchainlength}")
        print(f"state entries: {sorted(cp.state.keys())}")
        if cp.get("lambda") is not None:
            print(f"lambda: {np.asarray(cp.state['lambda'])}")
        if cp.output_files:
            print("output files:")
            for fname, off in cp.output_files:
                print(f"  {fname} @ {off}")
        return
    if args.s.endswith(".tpr"):
        # GROMACS run-input interop (reference: fileio/tpxio.cpp)
        from .io.tprio import read_tpr, tpr_to_system
        t = read_tpr(args.s)
        system, x, v, box = tpr_to_system(t)
        print(f"GROMACS tpr: '{t.system_name}' (tpx version {t.version}, "
              f"{'double' if t.precision == 8 else 'single'} precision)")
        print(f"atoms: {system.n_atoms}")
        print(f"types: {system.n_types}")
        print(f"perturbed atoms: {int(np.asarray(system.perturbed).sum())}")
        print(f"settle waters: {system.settle.atoms.shape[0]}")
        print(f"constraints: {system.lincs.atoms.shape[0]}")
        for name, il in system.bonded.items():
            print(f"{name}: {il.n}")
        print(f"pairs14: {system.pairs14.n}")
        if system.cmap is not None:
            print(f"cmap: {system.cmap.n}")
        print(f"box diag: {np.diag(np.asarray(box)).round(4)}")
        print(f"coordinates: {'yes' if x is not None else 'no'}, "
              f"velocities: {'yes' if v is not None else 'no'}")
        return
    pp, _ = _load_tpz(args.s)
    system, params, state, all_lambda = (pp.system, pp.params, pp.state,
                                         pp.all_lambda)
    print(f"atoms: {system.n_atoms}")
    print(f"types: {system.n_types}")
    print(f"perturbed atoms: {int(np.asarray(system.perturbed).sum())}")
    print(f"settle waters: {system.settle.atoms.shape[0]}")
    print(f"constraints: {system.lincs.atoms.shape[0]}")
    for name, il in system.bonded.items():
        print(f"{name}: {il.n}")
    print(f"pairs14: {system.pairs14.n}")
    if system.cmap is not None:
        print(f"cmap: {system.cmap.n}")
    if system.orires is not None:
        print(f"orires: {system.orires.n} "
              f"({system.orires.n_exp} experiment(s))")
    if system.vsites is not None and system.vsites.atoms.shape[0] > 0:
        print(f"vsites: {system.vsites.atoms.shape[0]}")
    print(f"integrator: {params.integrator.value}, dt={params.dt}")
    if all_lambda is not None:
        print(f"lambda windows: {all_lambda.shape[1]}")


def _ensure_backend():
    """Fall back to an available JAX backend if JAX_PLATFORMS names one
    whose plugin is not importable in this environment."""
    try:
        import jax

        # a dead TPU tunnel wedges backend init forever — probe first
        # (subprocess + timeout, verdict disk-cached) and scrub the
        # plugin so jax.devices() below degrades to CPU instead
        from .utils.backend_guard import ensure_live_backend
        scrubbed = ensure_live_backend()
        # a sitecustomize may pin jax_platforms via config, which beats
        # the JAX_PLATFORMS env var; re-assert the user's env choice so
        # e.g. JAX_PLATFORMS=cpu + xla_force_host_platform_device_count
        # works for multi-device -dd runs on one host
        env_plat = None if scrubbed else os.environ.get("JAX_PLATFORMS")
        if env_plat:
            try:
                jax.config.update("jax_platforms", env_plat)
            except Exception:
                pass
        jax.devices()
    except RuntimeError:
        import jax
        jax.config.update("jax_platforms", None)
        os.environ.pop("JAX_PLATFORMS", None)
        try:
            jax.devices()
        except RuntimeError:
            pass


def main(argv=None):
    _ensure_backend()
    p = argparse.ArgumentParser(prog="tpumd",
                                description="TPU-native MD engine with "
                                "GPU-FEP-class free energy support")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("grompp", help="preprocess top+gro+mdp into a run file")
    g.add_argument("-f", required=True, help="mdp file")
    g.add_argument("-p", required=True, help="top file")
    g.add_argument("-c", required=True, help="gro file")
    g.add_argument("-n", default=None, help="index file (.ndx) for "
                   "pull/densfit group names (reference: grompp -n)")
    g.add_argument("-r", default=None, help="position-restraint "
                   "reference coordinates (reference: grompp -r)")
    g.add_argument("-o", default="topol.tpz")
    g.add_argument("--couple-moltype", default=None)
    g.set_defaults(fn=cmd_grompp)

    m = sub.add_parser("mdrun", help="run molecular dynamics")
    m.add_argument("-s", required=True,
                   help="tpz run file (or a GROMACS .tpr with -mdp)")
    m.add_argument("-mdp", default=None,
                   help="run parameters when -s is a GROMACS .tpr "
                        "(its inputrec section is not read)")
    m.add_argument("-deffnm", default="md")
    m.add_argument("-nsteps", type=int, default=None)
    m.add_argument("-cpi", default=None, help="checkpoint to restart from")
    m.add_argument("-rerun", default=None, metavar="TRR",
                   help="recompute energies/dhdl over an existing "
                        "trajectory (reference: mdrun/rerun.cpp)")
    m.add_argument("-tunepme", action="store_true",
                   help="one-time PME cutoff/grid auto-tune before the "
                        "run (reference: ewald/pme_load_balancing.cpp)")
    m.add_argument("-maxh", type=float, default=0.0,
                   help="stop cleanly (checkpoint + outputs) after "
                        "0.99*maxh hours (reference: mdrun -maxh)")
    m.add_argument("-dd", type=str, default="0",
                   help="spatial domain decomposition: N (1-D slab ring)"
                        " or NxM / NxMxK (N-D grid with per-axis "
                        "ppermute halo sweeps; reference: mdrun -dd "
                        "nx ny nz, domdec_setup.cpp)")
    m.add_argument("-fep", choices=["auto", "cpu", "tpu"], default="auto",
                   help="FEP kernel target (parity with the reference's "
                   "mdrun -fep flag)")
    m.set_defaults(fn=cmd_mdrun)

    en = sub.add_parser("ensemble", help="all lambda windows in lockstep "
                        "with replica exchange (mdrun -multidir -replex "
                        "analogue)")
    en.add_argument("-s", required=True, help="tpz run file")
    en.add_argument("-deffnm", default="ens")
    en.add_argument("-nsteps", type=int, default=None)
    en.add_argument("-replex", type=int, default=100,
                    help="steps between exchange attempts (0 = off)")
    en.add_argument("-seed", type=int, default=0)
    en.add_argument("-fep", choices=["auto", "cpu", "tpu"], default="auto")
    en.set_defaults(fn=cmd_ensemble)

    b = sub.add_parser("bar", help="BAR/MBAR free-energy estimate "
                                   "from dhdl/edr files")
    b.add_argument("-f", nargs="+", required=True)
    b.add_argument("-temp", type=float, default=300.0)
    b.add_argument("-b", type=float, default=0.1, help="skip fraction")
    b.add_argument("-method", default="bar", choices=("bar", "mbar"),
                   help="pairwise BAR or all-sample MBAR")
    b.set_defaults(fn=cmd_bar)

    p2 = sub.add_parser("pdb2gmx", help="protein topology from FF "
                                        "residue databases (reference: "
                                        "gmx pdb2gmx)")
    p2.add_argument("-f", required=True, help="input .pdb/.gro (missing "
                                              "hydrogens are built)")
    p2.add_argument("-ff", default="amber99sb-ildn")
    p2.add_argument("-ffdir", required=True,
                    help="GROMACS share/top directory with <ff>.ff")
    p2.add_argument("-ignh", action="store_true",
                    help="discard input hydrogens and rebuild from .hdb")
    p2.add_argument("-o", default="conf.gro")
    p2.add_argument("-p", default="topol.top")
    p2.set_defaults(fn=cmd_pdb2gmx)

    sv = sub.add_parser("solvate", help="fill a box with water "
                                        "(reference: gmx solvate)")
    sv.add_argument("-cp", default=None, help="solute .gro")
    sv.add_argument("-o", default="solvated.gro")
    sv.add_argument("-box", type=float, default=0.0,
                    help="cubic box edge (nm); overrides the -cp box")
    sv.add_argument("-spacing", type=float, default=0.31)
    sv.add_argument("-shell", type=float, default=0.24,
                    help="min water-O to solute distance (nm)")
    sv.add_argument("-seed", type=int, default=2021)
    sv.set_defaults(fn=cmd_solvate)

    im = sub.add_parser("insert-molecules",
                        help="random insertions with overlap rejection "
                             "(reference: gmx insert-molecules)")
    im.add_argument("-ci", required=True, help="molecule .gro to insert")
    im.add_argument("-f", default=None, help="existing configuration")
    im.add_argument("-o", default="out.gro")
    im.add_argument("-nmol", type=int, required=True)
    im.add_argument("-box", type=float, default=0.0)
    im.add_argument("-radius", type=float, default=0.105)
    im.add_argument("-try", dest="try_", type=int, default=400)
    im.add_argument("-seed", type=int, default=1997)
    im.set_defaults(fn=cmd_insert_molecules)

    gi = sub.add_parser("genion", help="replace waters by ions "
                                       "(reference: gmx genion)")
    gi.add_argument("-s", required=True, help="tpz run file")
    gi.add_argument("-o", default="ions.gro")
    gi.add_argument("-np", type=int, default=0, help="cations to add")
    gi.add_argument("-nn", type=int, default=0, help="anions to add")
    gi.add_argument("-neutral", action="store_true")
    gi.add_argument("-pname", default="NA")
    gi.add_argument("-nname", default="CL")
    gi.add_argument("-seed", type=int, default=1993)
    gi.set_defaults(fn=cmd_genion)

    va = sub.add_parser("velacc", help="velocity autocorrelation + "
                                       "spectrum (reference: gmx "
                                       "velacc/dos)")
    va.add_argument("-f", required=True, help=".trr with velocities")
    va.add_argument("-s", default=None, help=".tpz for masses")
    va.add_argument("-n", default=None)
    va.add_argument("-sel", default=None)
    va.add_argument("-o", default="vacf.xvg")
    va.add_argument("-dos", default=None,
                    help="also write the cosine-transform spectrum")
    va.set_defaults(fn=cmd_velacc)

    li = sub.add_parser("lie", help="linear interaction energy "
                                    "estimate (reference: gmx lie)")
    li.add_argument("-f", required=True,
                    help="energygrps .eg.xvg from mdrun -rerun")
    li.add_argument("-ligand", required=True, help="ligand group name")
    li.add_argument("-elj", type=float, default=0.0,
                    help="free-state <E_vdw> (kJ/mol)")
    li.add_argument("-eqq", type=float, default=0.0,
                    help="free-state <E_coul> (kJ/mol)")
    li.add_argument("-alpha", type=float, default=0.181)
    li.add_argument("-beta", type=float, default=0.5)
    li.set_defaults(fn=cmd_lie)

    dq = sub.add_parser("distance", help="COM distance time series "
                                         "(reference: gmx distance)")
    dq.add_argument("-f", required=True)
    dq.add_argument("-n", default=None)
    dq.add_argument("-g1", required=True)
    dq.add_argument("-g2", required=True)
    dq.add_argument("-o", default="dist.xvg")
    dq.set_defaults(fn=cmd_distance)

    an = sub.add_parser("angle", help="angle/dihedral time series "
                                      "(reference: gmx angle)")
    an.add_argument("-f", required=True)
    an.add_argument("-sel", required=True,
                    help="1-based atoms, groups of 3 (angle) / 4 "
                         "(dihedral)")
    an.add_argument("-type", default="angle",
                    choices=("angle", "dihedral"))
    an.add_argument("-o", default="angle.xvg")
    an.set_defaults(fn=cmd_angle)

    ct = sub.add_parser("convert-tpr", help="extend/retarget a run "
                                            "file (reference: gmx "
                                            "convert-tpr)")
    ct.add_argument("-s", required=True, help="input .tpz")
    ct.add_argument("-o", default="extended.tpz")
    ct.add_argument("-extend", type=float, default=None,
                    help="additional ps")
    ct.add_argument("-until", type=float, default=None, help="total ps")
    ct.add_argument("-nsteps", type=int, default=None)
    ct.set_defaults(fn=cmd_convert_tpr)

    ec = sub.add_parser("editconf", help="edit box/center/convert "
                                         "(reference: gmx editconf)")
    ec.add_argument("-f", required=True, help="structure (.gro/.pdb)")
    ec.add_argument("-o", default="out.gro", help=".gro or .pdb")
    ec.add_argument("-box", nargs="+", default=None,
                    help="box lengths (1 or 3 values, nm)")
    ec.add_argument("-d", type=float, default=None,
                    help="box from solute extent + margin (nm)")
    ec.add_argument("-c", action="store_true", help="center in the box")
    ec.add_argument("-translate", nargs=3, default=None)
    ec.add_argument("-rotate", nargs=3, default=None,
                    help="degrees around x, y, z")
    ec.add_argument("-novel", action="store_true",
                    help="drop velocities")
    ec.set_defaults(fn=cmd_editconf)

    gr = sub.add_parser("genrestr", help="position-restraint itp "
                                         "(reference: gmx genrestr)")
    gr.add_argument("-f", required=True, help="structure (.gro/.pdb)")
    gr.add_argument("-o", default="posre.itp")
    gr.add_argument("-n", default=None, help="index file")
    gr.add_argument("-sel", default=None, help="group (default: heavy)")
    gr.add_argument("-fc", nargs=3, type=float,
                    default=[1000.0, 1000.0, 1000.0])
    gr.set_defaults(fn=cmd_genrestr)

    mn = sub.add_parser("make-ndx", help="write auto index groups "
                                         "(reference: gmx make_ndx)")
    mn.add_argument("-f", required=True, help="structure (.gro/.pdb)")
    mn.add_argument("-o", default="index.ndx")
    mn.set_defaults(fn=cmd_make_ndx)

    tj = sub.add_parser("trjcat", help="concatenate trajectories "
                                       "(reference: gmx trjcat)")
    tj.add_argument("-f", nargs="+", required=True)
    tj.add_argument("-o", default="cat.trr")
    tj.set_defaults(fn=cmd_trjcat)

    gc = sub.add_parser("genconf", help="replicate the box NxMxK "
                                        "(reference: gmx genconf)")
    gc.add_argument("-f", required=True)
    gc.add_argument("-o", default="out.gro")
    gc.add_argument("-nbox", nargs=3, type=int, required=True)
    gc.set_defaults(fn=cmd_genconf)

    tc = sub.add_parser("trjconv", help="convert/filter trajectories "
                                        "(reference: gmx trjconv)")
    tc.add_argument("-f", required=True, help="input .trr or .xtc")
    tc.add_argument("-o", default="trajout.xtc",
                    help="output .trr/.xtc/.gro")
    tc.add_argument("-s", default=None,
                    help="run file for atom names (gro output)")
    tc.add_argument("-b", type=float, default=None, help="start time (ps)")
    tc.add_argument("-e", type=float, default=None, help="end time (ps)")
    tc.add_argument("-skip", type=int, default=1,
                    help="keep every Nth frame")
    tc.add_argument("-dt", type=float, default=0.0,
                    help="minimum time between kept frames (ps)")
    tc.add_argument("-pbc", choices=["none", "atom"], default="none")
    tc.set_defaults(fn=cmd_trjconv)

    rd = sub.add_parser("rdf", help="radial distribution function "
                                    "(reference: gmx rdf)")
    rd.add_argument("-f", required=True, help=".trr/.xtc trajectory")
    rd.add_argument("-o", default="rdf.xvg")
    rd.add_argument("-bins", type=int, default=200)
    rd.add_argument("-rmax", type=float, default=None)
    rd.add_argument("-sel-a", default="", help="1-based atom indices")
    rd.add_argument("-sel-b", default="", help="1-based atom indices")
    rd.set_defaults(fn=cmd_rdf)

    ms = sub.add_parser("msd", help="mean-squared displacement + "
                                    "diffusion (reference: gmx msd)")
    ms.add_argument("-f", required=True,
                    help=".trr/.xtc trajectory (unwrapped coordinates)")
    ms.add_argument("-o", default="msd.xvg")
    ms.add_argument("-sel", default="", help="1-based atom indices")
    ms.add_argument("-restarts", type=int, default=10)
    ms.set_defaults(fn=cmd_msd)

    def _traj_tool(name, help_, fn, need_s=True):
        t = sub.add_parser(name, help=help_)
        t.add_argument("-f", required=True, help="trajectory .trr/.xtc")
        if need_s:
            t.add_argument("-s", required=True,
                           help="structure: .tpz (masses) or .gro/.pdb")
        t.add_argument("-n", default=None, help="index file (.ndx)")
        t.add_argument("-o", default=f"{name}.xvg")
        t.set_defaults(fn=fn)
        return t

    t = _traj_tool("rms", "RMSD to reference (reference: gmx rms)",
                   cmd_rms)
    t.add_argument("-sel", default=None, help="fit/calc group")
    t.add_argument("-nofit", action="store_true")
    t = _traj_tool("rmsf", "per-atom fluctuation (reference: gmx rmsf)",
                   cmd_rmsf)
    t.add_argument("-sel", default=None)
    t = _traj_tool("gyrate", "radius of gyration (reference: gmx gyrate)",
                   cmd_gyrate)
    t.add_argument("-sel", default=None)
    t = _traj_tool("mindist", "minimum inter-group distance "
                              "(reference: gmx mindist)", cmd_mindist,
                   need_s=False)
    t.add_argument("-g1", required=True, help="group 1 (1-based or ndx)")
    t.add_argument("-g2", required=True, help="group 2")
    t = _traj_tool("density", "density profile along an axis "
                              "(reference: gmx density)", cmd_density)
    t.add_argument("-sel", default=None)
    t.add_argument("-axis", default="z", choices=("x", "y", "z"))
    t.add_argument("-sl", type=int, default=50, help="slices")
    t = _traj_tool("hbond", "hydrogen bond count (reference: gmx hbond)",
                   cmd_hbond)
    t.add_argument("-don", default=None, help="donor heavy atoms")
    t.add_argument("-hyd", default=None, help="donor hydrogens")
    t.add_argument("-acc", default=None, help="acceptors")
    t.add_argument("-r", type=float, default=0.35, help="D-A cutoff (nm)")
    t.add_argument("-a", type=float, default=30.0,
                   help="H-D-A angle cutoff (deg)")

    t = _traj_tool("sasa", "solvent accessible surface area "
                           "(reference: gmx sasa)", cmd_sasa)
    t.add_argument("-sel", default=None)
    t.add_argument("-probe", type=float, default=0.14)
    t.add_argument("-ndots", type=int, default=240)
    t = _traj_tool("dipoles", "total dipole moment + epsilon "
                              "(reference: gmx dipoles)", cmd_dipoles)
    t.add_argument("-sel", default=None)
    t.add_argument("-temp", type=float, default=300.0)
    t = _traj_tool("potential", "electrostatic potential profile "
                                "(reference: gmx potential)",
                   cmd_potential)
    t.add_argument("-sel", default=None)
    t.add_argument("-axis", default="z", choices=("x", "y", "z"))
    t.add_argument("-sl", type=int, default=50)

    t = _traj_tool("traj", "coordinate time series (reference: gmx "
                           "traj -ox)", cmd_traj, need_s=False)
    t.add_argument("-sel", default=None)
    t = _traj_tool("rotacf", "rotational autocorrelation (reference: "
                             "gmx rotacf)", cmd_rotacf, need_s=False)
    t.add_argument("-sel", required=True,
                   help="1-based atom pairs defining the vectors")
    t.add_argument("-P", type=int, default=2, choices=(1, 2),
                   help="Legendre order")

    t = _traj_tool("covar", "covariance PCA (reference: gmx covar/"
                            "anaeig)", cmd_covar)
    t.add_argument("-sel", default=None)
    t.add_argument("-proj", default=None,
                   help="write PC projections xvg")
    t.add_argument("-first", type=int, default=2,
                   help="number of PCs to project")
    t = _traj_tool("cluster", "gromos RMSD clustering (reference: "
                              "gmx cluster)", cmd_cluster, need_s=False)
    t.add_argument("-sel", default=None)
    t.add_argument("-cutoff", type=float, default=0.1)

    wh = sub.add_parser("wham", help="umbrella PMF from pullx windows "
                                     "(reference: gmx wham)")
    wh.add_argument("-ix", nargs="+", required=True,
                    help="pullx.xvg files, one per umbrella window")
    wh.add_argument("-x0", nargs="+", type=float, required=True,
                    help="umbrella centers (nm), one per window")
    wh.add_argument("-k", nargs="+", type=float, required=True,
                    help="spring constants (kJ/mol/nm^2), one per window")
    wh.add_argument("-temp", type=float, default=300.0)
    wh.add_argument("-bins", type=int, default=200)
    wh.add_argument("-coord", type=int, default=1,
                    help="pullx column of the reaction coordinate")
    wh.add_argument("-o", default="pmf.xvg")
    wh.set_defaults(fn=cmd_wham)

    c = sub.add_parser("check", help="inspect run/trajectory files "
                                     "(reference: gmx check/dump)")
    c.add_argument("-s", default=None, help="run file (.tpz/.tpr/.cpt)")
    c.add_argument("-f", default=None, help="trajectory (.trr/.xtc)")
    c.set_defaults(fn=cmd_check)

    e = sub.add_parser("energy", help="statistics of energy terms "
                       "(gmx energy analogue)")
    e.add_argument("-f", required=True, help=".ener.csv from mdrun")
    e.add_argument("-b", type=float, default=0.1, help="skip fraction")
    e.set_defaults(fn=cmd_energy)

    pr = sub.add_parser("profile", help="per-phase on-device timing of "
                        "the MD step (GPU kernel-timer analogue)")
    pr.add_argument("-nside", type=int, default=16,
                    help="water lattice edge (16 -> 12k atoms)")
    pr.set_defaults(fn=lambda a: __import__(
        "gromacs_fep_gpu_tpu.utils.phase_profile",
        fromlist=["main"]).main([str(a.nside)]))

    args = p.parse_args(argv)
    try:
        args.fn(args)
    except FileNotFoundError as e:
        sys.exit(f"tpumd error: file not found: {e.filename or e}")
    except (AssertionError, ValueError) as e:
        sys.exit(f"tpumd error: {e}")


if __name__ == "__main__":
    main()
