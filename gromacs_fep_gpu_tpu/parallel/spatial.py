"""Spatial (domain) parallelism over the mesh 'spatial' axis.

The domain-decomposition analogue (reference: src/gromacs/domdec/
domdec.cpp:263 dd_move_x / :357 dd_move_f halo exchange): atoms are
Morton-sorted into clusters (already spatially compact), each device owns
a contiguous block range of i-clusters and computes the forces on its own
atoms from the FULL pair list — the full-list design means each device
needs neighbour *positions* but never writes remote forces, so the
per-step communication is one positions broadcast in and a sharded force
out (energies psum over ICI).  This replaces the reference's 8th-shell
halo + force reduce-halo with collectives XLA schedules itself.

Round-1 scope: positions are replicated across the spatial axis (fine up
to ~1M atoms: 12 MB); a ppermute ring halo for huge systems is the
round-2 upgrade path.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.types import MdParams, System
from ..ops.cluster_nb import CLUSTER, cluster_nb_kernel
from ..ops.pairlist import ClusterPairlist
from .mesh import SPATIAL_AXIS


def make_spatial_cluster_force(system: System, params: MdParams, mesh: Mesh,
                               beta, block: int = 16):
    """Returns f(x, box, nlist) -> (f_sorted, e_coul, e_lj) with the cluster
    block range sharded over the 'spatial' mesh axis."""
    import numpy as _np
    from ..ops.cluster_nb import lj_table_mode
    nsh = mesh.shape[SPATIAL_AXIS]
    lj_mode = lj_table_mode(_np.asarray(system.nbfp))

    def sharded(x, box, nlist: ClusterPairlist):
        C = nlist.n_clusters
        blk = max(1, min(block, C))
        Cb = (C + blk - 1) // blk
        per_shard = (Cb + nsh - 1) // nsh
        total_blocks = per_shard * nsh

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(), P(), P()),
                 out_specs=(P(SPATIAL_AXIS), P(), P()),
                 check_vma=False)
        def run(xx, bb, nl):
            shard_id = jax.lax.axis_index(SPATIAL_AXIS)
            f_rows, e_c, e_lj = cluster_nb_kernel(
                xx, bb, nl, system.nbfp, params, beta, blk,
                block_offset=shard_id * per_shard, n_blocks=per_shard,
                total_blocks=total_blocks, lj_mode=lj_mode)
            e_c = jax.lax.psum(e_c, SPATIAL_AXIS)
            e_lj = jax.lax.psum(e_lj, SPATIAL_AXIS)
            return f_rows, e_c, e_lj

        f_all, e_c, e_lj = run(x, box, nlist)
        f_sorted = f_all[: nlist.n_pad]
        return f_sorted, e_c, e_lj

    return sharded
