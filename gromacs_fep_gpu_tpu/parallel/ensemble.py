"""Ensemble (lambda-window) parallelism — the TPU design's headline win.

The reference runs one simulation per MPI communicator and exchanges
state between them (reference: mdrunutility/multisim.h:81,
mdrun/replicaexchange.cpp:1263).  Here the whole step function is vmapped
over a leading replica axis and sharded over the mesh 'ens' axis, so L
lambda windows advance in lockstep as one XLA program; Hamiltonian
replica exchange becomes an in-program permutation (no host round-trip,
no MPI).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.types import FepCoupling, MdParams, State, System
from ..core.units import BOLTZ
from .mesh import ENS_AXIS


def lambda_schedule(n_lambda: int, components=(FepCoupling.COUL,
                                               FepCoupling.VDW,
                                               FepCoupling.BONDED)):
    """(L, 7) linear lambda vectors (reference: t_lambda all_lambda)."""
    lams = np.zeros((n_lambda, int(FepCoupling.COUNT)), np.float32)
    ramp = np.linspace(0.0, 1.0, n_lambda, dtype=np.float32)
    for c in components:
        lams[:, int(c)] = ramp
    return jnp.asarray(lams)


def stack_states(state: State, lambdas: jnp.ndarray, seed: int = 0) -> State:
    """Replicate one State across L lambda windows (leading axis)."""
    L = lambdas.shape[0]

    def rep(a):
        return jnp.broadcast_to(a[None], (L,) + a.shape)

    batched = jax.tree_util.tree_map(rep, state)
    keys = jax.random.split(jax.random.PRNGKey(seed), L)
    return batched.replace(
        lam=lambdas,
        fep_state=jnp.arange(L, dtype=jnp.int32),
        rng=keys)


def make_ensemble_step(step_fn: Callable, mesh: Optional[Mesh] = None):
    """vmap a single-replica step over the leading axis; shard over 'ens'."""
    vstep = jax.vmap(step_fn, in_axes=(0, None))

    def ens_step(states: State, _=None):
        return vstep(states, None)

    if mesh is None:
        return jax.jit(ens_step)
    shard = NamedSharding(mesh, P(ENS_AXIS))
    return jax.jit(ens_step, in_shardings=(shard, None),
                   out_shardings=(shard, shard))


# ---------------------------------------------------------------------------
# Hamiltonian replica exchange
# ---------------------------------------------------------------------------

def replica_exchange_step(states: State, epot_fn: Callable, lambdas,
                          temperature: float, key, parity):
    """One neighbour-swap attempt over the lambda ladder
    (reference: replicaexchange.cpp:867 test_for_replica_exchange).

    epot_fn(x, box, lam) must be vmappable.  Swapping exchanges the
    *configurations* between neighbouring windows; acceptance uses
    Delta = beta [ (U_i(x_j) + U_j(x_i)) - (U_i(x_i) + U_j(x_j)) ].
    The cross energies U_i(x_j) come from evaluating each configuration at
    its neighbour's lambda — energies the fork computes with its
    foreign-lambda kernels; here one extra vmapped energy pass.
    """
    L = lambdas.shape[0]
    beta = 1.0 / (BOLTZ * temperature)

    e_self = jax.vmap(epot_fn)(states.x, states.box, lambdas)
    # lambda of the partner: pair (2k+parity, 2k+1+parity)
    idx = jnp.arange(L)
    partner = jnp.where((idx - parity) % 2 == 0,
                        jnp.clip(idx + 1, 0, L - 1),
                        jnp.clip(idx - 1, 0, L - 1))
    has_partner = partner != idx
    lam_partner = lambdas[partner]
    e_cross = jax.vmap(epot_fn)(states.x, states.box, lam_partner)

    delta = beta * ((e_cross + e_cross[partner]) - (e_self + e_self[partner]))
    lo = jnp.minimum(idx, partner)
    u = jax.random.uniform(key, (L,))  # shared random number per pair (u[lo])
    accept = (u[lo] < jnp.exp(-jnp.clip(delta, -50.0, 50.0))) & has_partner

    src = jnp.where(accept, partner, idx)

    def swap(a):
        return a[src] if a.ndim >= 1 and a.shape[0] == L else a

    # exchange configurations (x, v, box), keep lambda/fep_state in place
    new_states = states.replace(
        x=states.x[src], v=states.v[src], box=states.box[src],
        coupling=jax.tree_util.tree_map(lambda a: a[src], states.coupling))
    n_accepted = jnp.sum(accept & (partner > idx))
    return new_states, n_accepted
