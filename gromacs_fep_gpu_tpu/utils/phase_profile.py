"""Per-phase on-device timing breakdown of the production MD step.

The reference times every GPU kernel with event pairs (GpuRegionTimer,
nbnxm/gpu_types_common.h:275 `fep_k`) and prints a per-kernel table.
XLA fuses the whole step into one program, so instead each phase is
jitted *standalone* and timed with block_until_ready — an upper bound
per phase (no overlap), but it answers "where does the time go on-chip"
and steers kernel work.  Used by `tpumd profile` and by bench work.

Run:  python -m gromacs_fep_gpu_tpu.utils.phase_profile [n_side]
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

def enable_compile_cache(path: str = "/tmp/jax_cache"):
    """Opt-in persistent compile cache for profiling runs.  NOT enabled
    at import: cached XLA:CPU AOT binaries are machine-specific, and
    loading one compiled on a different host (e.g. after a VM
    migration) can SIGILL/segfault the process."""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:
        pass


def time_fn(fn: Callable, *args, iters: int = 24, warmup: int = 2,
            reps: int = 3) -> float:
    """On-device ms per call of fn(*args).

    The op is run `iters` times inside ONE jitted lax.scan with a serial
    data dependency (carry perturbs the first float input; the carry is
    fed from the output), so per-dispatch host->device latency — ~25 ms
    through the axon tunnel — amortizes away instead of dominating."""
    flat, tree = jax.tree.flatten(args)
    fidx = next(i for i, a in enumerate(flat)
                if hasattr(a, "dtype")
                and jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating))

    def run(carry_and_flat):
        c0, fl = carry_and_flat

        def body(c, _):
            fl2 = list(fl)
            fl2[fidx] = fl[fidx] * (1.0 + c * 1e-30)
            out = fn(*jax.tree.unflatten(tree, fl2))
            # fold EVERY output leaf FULLY into the carry: keeping only
            # element [0] lets XLA dead-code-eliminate most of a phase
            # (e.g. a gather shrinks to one row) and under-reports it;
            # a full sum costs a few us but keeps the numbers honest
            c2 = jnp.float32(0.0)
            for leaf in jax.tree.leaves(out):
                c2 = c2 + (jnp.sum(jnp.asarray(leaf)).astype(jnp.float32)
                           * 1e-30)
            return c2, None

        c, _ = jax.lax.scan(body, c0, None, length=iters)
        return c

    jf = jax.jit(run)
    arg = (jnp.float32(0.0), flat)
    jax.block_until_ready(jf(arg))
    for _ in range(max(warmup - 1, 0)):
        jax.block_until_ready(jf(arg))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(jf(arg))
        ts.append((time.perf_counter() - t0) * 1e3)
    return (float(np.median(ts)) - _dispatch_overhead_ms()) / iters


_OVERHEAD = [None]


def _dispatch_overhead_ms() -> float:
    """One-dispatch round-trip latency (axon tunnel ~25 ms)."""
    if _OVERHEAD[0] is None:
        jf = jax.jit(lambda a: a + 1.0)
        x = jnp.zeros((8,), jnp.float32)
        jax.block_until_ready(jf(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(jf(x))
            ts.append((time.perf_counter() - t0) * 1e3)
        _OVERHEAD[0] = float(np.median(ts))
    return _OVERHEAD[0]


def profile_step_phases(n_side: int = 16, use_pme: bool = True,
                        nsteps_eq: int = 300,
                        iters: int = 20) -> Dict[str, float]:
    """Phase breakdown (ms) of the bench.py flagship config."""
    from ..core.types import (CoulombType, FepCoupling, FepParams, MdParams,
                              TcouplType)
    from ..md.runner import MdRunner, RunnerConfig
    from ..models.solvation import solvation_system
    from ..ops.cluster_nb import fep_pair_energy, make_cluster_force_fn
    from ..ops.forces import get_beta
    from ..ops.pairlist import build_cluster_pairlist, build_fep_pairlist
    from ..ops.pallas_nb import (pallas_cluster_forces_v2u,
                                 pallas_prepare_v2u)
    from ..ops import pme as pme_mod
    from ..ops.pme import pme_grid_size

    system, state = solvation_system(n_side=n_side, spacing=0.31, seed=0,
                                     temperature=300.0)
    box_l = n_side * 0.31
    coulomb = CoulombType.PME if use_pme else CoulombType.REACTION_FIELD
    grid = pme_grid_size((box_l,) * 3, 0.12) if use_pme else None
    params = MdParams(
        dt=0.002, nstlist=20, coulomb=coulomb,
        rcoulomb=0.9, rvdw=0.9, rlist=1.0, pme_grid=grid,
        tcoupl=TcouplType.V_RESCALE, ref_t=300.0, nsttcouple=10,
        nstcomm=100, nstcalcenergy=100,
        fep=FepParams(enabled=True, sc_alpha=0.5, sc_coul=True,
                      sc_sigma=0.3))
    state = state.replace(lam=state.lam.at[2].set(0.5).at[3].set(0.5))

    cfg = RunnerConfig(use_pallas=True, super_nnbr=448, fep_max_nbr=512)
    eq_params = params.replace(dt=0.0005, tau_t=0.1, nsttcouple=1)
    eq = MdRunner(system, eq_params, cfg)
    state, _ = eq.run(state, nsteps_eq)
    runner = MdRunner(system, params, RunnerConfig(
        use_pallas=True, super_nnbr=eq.config.super_nnbr,
        fep_max_nbr=eq.config.fep_max_nbr))
    state, _ = runner.run(state, 2 * params.nstlist)
    jax.block_until_ready(state.x)

    rl = runner._rlist
    cell = runner.config.cell_size
    beta = get_beta(params)
    out: Dict[str, float] = {}

    def t(name, fn, *args):
        out[name] = time_fn(fn, *args, iters=iters)

    # --- pair search / rebuild ---------------------------------------
    def rebuild_nb(x, box):
        return build_cluster_pairlist(
            x, box, system, rl, nnbr=0, cell_size=cell,
            super_nnbr=runner.config.super_nnbr, super_block=4)

    nlist = rebuild_nb(state.x, state.box)
    t("rebuild_nblist", rebuild_nb, state.x, state.box)

    def rebuild_fep(x, box):
        return build_fep_pairlist(x, box, system, rl, runner.pert_idx,
                                  max_nbr=runner.config.fep_max_nbr)

    feplist = rebuild_fep(state.x, state.box)
    t("rebuild_feplist", rebuild_fep, state.x, state.box)

    def prep_fn(nl):
        return pallas_prepare_v2u(nl, system.nbfp)

    prep = prep_fn(nlist)
    t("rebuild_pallas_prep", prep_fn, nlist)

    # --- NB kernel ----------------------------------------------------
    t("nb_kernel_VF", lambda x, box: pallas_cluster_forces_v2u(
        x, box, nlist, system.nbfp, params, beta, prep=prep,
        compute_energy=True), state.x, state.box)
    t("nb_kernel_F", lambda x, box: pallas_cluster_forces_v2u(
        x, box, nlist, system.nbfp, params, beta, prep=prep,
        compute_energy=False), state.x, state.box)

    # --- FEP pair kernel (fwd + grad) ----------------------------------
    if runner.has_fep:
        lam_c = state.lam[FepCoupling.COUL]
        lam_v = state.lam[FepCoupling.VDW]

        def fep_e(x, box, lc, lv):
            ec, ev = fep_pair_energy(x, box, lc, lv, feplist, system,
                                     params, beta)
            return ec + ev

        t("fep_pairs_E", fep_e, state.x, state.box, lam_c, lam_v)
        t("fep_pairs_grad", jax.grad(fep_e, argnums=(0, 2, 3)),
          state.x, state.box, lam_c, lam_v)

    # --- PME ------------------------------------------------------------
    if use_pme:
        order = params.pme_order
        influence = pme_mod.make_influence_function(grid, order)
        dft = pme_mod.make_dft_matrices(grid)
        qa = system.charge_a
        pme_beta = beta

        t("pme_spread", lambda x, box: pme_mod.spread_charges(
            x, box, qa, grid, order), state.x, state.box)
        g0 = jax.jit(lambda x, box: pme_mod.spread_charges(
            x, box, qa, grid, order))(state.x, state.box)
        t("pme_fft_fwd", lambda g: pme_mod.matmul_fft3(g, dft), g0)
        re, im = pme_mod.matmul_fft3(g0, dft)

        def solve_and_phi(re, im, box):
            G, scale = pme_mod._influence_scaled(box, influence, pme_beta,
                                                 re.dtype)
            e = scale * jnp.sum(G * (re * re + im * im))
            rr, ii = G * re, -(G * im)
            for ax in range(3):
                rr, ii = pme_mod._axis_dft(rr, ii, dft[ax][0], dft[ax][1],
                                           ax)
            return e, 2.0 * scale * rr

        t("pme_solve_phi", solve_and_phi, re, im, state.box)
        _, phi = jax.jit(solve_and_phi)(re, im, state.box)
        t("pme_gather", lambda x, box, p: pme_mod.phi_gather(
            x, box, qa, p, grid, order), state.x, state.box, phi)

        _, pme_force_fn = pme_mod.make_pme_recip_pair(system, params, grid)
        t("pme_total_force_fn", pme_force_fn, state.x, state.box,
          state.lam[FepCoupling.COUL])

    # --- bonded + 1-4 + other (grad_other backward) --------------------
    force_fn = runner._force_fn
    t("force_fn_VF", lambda x, box, lam: force_fn(
        x, box, lam, nlist, feplist, prep), state.x, state.box, state.lam)
    t("force_fn_F", lambda x, box, lam: force_fn(
        x, box, lam, nlist, feplist, prep, need_energy=False),
      state.x, state.box, state.lam)

    # --- foreign-lambda sweep ------------------------------------------
    factory, n_foreign = runner._foreign_factory()
    if factory is not None and n_foreign:
        dfn = factory(feplist)
        t("foreign_sweep", dfn, state.x, state.box, state.lam)

    # --- update + constraints (one integration step, zero forces) -------
    from ..core.types import EnergyTerms
    from ..md.simulator import make_step_fn
    step_fn = make_step_fn(
        system, params,
        lambda x, box, lam: (jnp.zeros_like(x), EnergyTerms.zeros(x.dtype)))
    t("update_constrain", lambda st: step_fn(st, None)[0].x, state)

    # --- whole chunk (nstlist steps + rebuild), per-step ----------------
    chunk = runner._build_chunk(params.nstlist)
    s2, _, fl = chunk(state)
    jax.block_until_ready(s2.x)
    ts = []
    for _ in range(max(iters // 2, 5)):
        t0 = time.perf_counter()
        s2, _, fl = chunk(state)
        jax.block_until_ready(s2.x)
        ts.append((time.perf_counter() - t0) * 1e3)
    out["chunk_per_step"] = float(np.median(ts)) / params.nstlist
    out["n_atoms"] = float(system.n_atoms)
    return out


def main(argv=None):
    import sys
    enable_compile_cache()
    args = list(sys.argv[1:] if argv is None else argv)
    n_side = int(args[0]) if args else 16
    res = profile_step_phases(n_side=n_side)
    n = int(res.pop("n_atoms"))
    per_step = res.pop("chunk_per_step")
    print(f"# phase profile @ {n} atoms "
          f"({jax.devices()[0].device_kind})")
    for k, v in sorted(res.items(), key=lambda kv: -kv[1]):
        print(f"{k:24s} {v:9.3f} ms")
    print(f"{'== chunk per-step ==':24s} {per_step:9.3f} ms "
          f"({0.002 / per_step * 86400.0 * 1e3 / 1e3:.1f} ns/day @ 2fs)")


if __name__ == "__main__":
    main()
