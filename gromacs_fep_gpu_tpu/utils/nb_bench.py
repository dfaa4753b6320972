"""Nonbonded kernel micro-benchmark — the `gmx nonbonded-benchmark`
analogue (reference: src/programs/mdrun/nonbonded_bench.cpp,
nbnxm/benchmark/bench_setup.cpp): synthetic water box, reports pair
throughput of the cluster kernels.

Run:  python -m gromacs_fep_gpu_tpu.utils.nb_bench [n_side] [kernel]
"""
from __future__ import annotations

import sys
import time

import jax
import numpy as np


def run_bench(n_side: int = 12, kernel: str = "pallas", iters: int = 20):
    import jax.numpy as jnp
    from ..core.types import CoulombType, MdParams
    from ..models.water import water_box
    from ..ops.cluster_nb import cluster_nb_kernel
    from ..ops.pairlist import build_cluster_pairlist
    from ..ops.pallas_nb import pallas_cluster_forces

    params = MdParams(rcoulomb=0.9, rvdw=0.9, rlist=1.0,
                      coulomb=CoulombType.REACTION_FIELD)
    system, state = water_box(n_side, spacing=0.31, seed=0)
    nlist = build_cluster_pairlist(state.x, state.box, system, params.rlist,
                                   nnbr=288, super_nnbr=512)
    n = system.n_atoms

    if kernel == "pallas":
        fn = jax.jit(lambda x: pallas_cluster_forces(
            x, state.box, nlist, system.nbfp, params, None))
    else:
        fn = jax.jit(lambda x: cluster_nb_kernel(
            x, state.box, nlist, system.nbfp, params, None, 64,
            lj_mode="geometric"))

    r = jax.block_until_ready(fn(state.x))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(state.x)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters

    # pairs actually inside the cutoff (the reference reports these)
    from ..core import pbc
    import numpy as np
    rc2 = params.rcoulomb ** 2
    x = np.asarray(state.x)
    # estimate via density: n_pairs ~ N * 2/3 pi rc^3 rho
    vol = float(np.prod(np.diag(np.asarray(state.box))))
    pairs = n * (4.0 / 3.0 * np.pi * params.rcoulomb ** 3) * (n / vol) / 2.0
    print(f"kernel={kernel} atoms={n} time/iter={dt*1e3:.3f} ms "
          f"~{pairs/dt/1e9:.2f} Gpairs/s (cutoff pairs)")
    return dt


if __name__ == "__main__":
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    kern = sys.argv[2] if len(sys.argv) > 2 else "pallas"
    run_bench(n_side, kern)
