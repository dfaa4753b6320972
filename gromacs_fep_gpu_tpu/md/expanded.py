"""Expanded-ensemble dynamics: Monte-Carlo moves in lambda space with
Wang-Landau weight adaptation (reference: src/gromacs/mdlib/expanded.cpp
:1571 ExpandedEnsembleDynamics, expanded_internal.cpp; history in
mdtypes/df_history.h).

The state lives in a small DfHistory pytree; one `expanded_step` performs
a Metropolis(-ized Gibbs) jump between lambda states using the
foreign-lambda energy vector that the force pass already produced — on
TPU the energies of ALL windows are available every nstdhdl step from the
vmapped foreign pass, so full-Gibbs moves cost nothing extra (the
reference computes the same vector serially).
"""
from __future__ import annotations

import enum
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.units import BOLTZ


class LmcMove(enum.Enum):
    METROPOLIS = "metropolis"        # nearest-neighbour jump
    BARKER = "barker"
    GIBBS = "metropolized-gibbs"     # global jump


@struct.dataclass
class DfHistory:
    """Wang-Landau bookkeeping (reference: mdtypes/df_history.h)."""
    weights: jnp.ndarray     # (L,) log-weights (dimensionless, beta*g)
    counts: jnp.ndarray      # (L,) visit counts
    wl_delta: jnp.ndarray    # () current WL increment
    n_at_lam: jnp.ndarray    # (L,) histogram since last flatness reset

    @staticmethod
    def init(n_lambda: int, wl_delta: float = 1.0) -> "DfHistory":
        z = jnp.zeros((n_lambda,))
        return DfHistory(weights=z, counts=z, wl_delta=jnp.asarray(wl_delta),
                         n_at_lam=z)


def wang_landau_update(hist: DfHistory, fep_state, wl_scale: float = 0.8,
                       flatness_ratio: float = 0.8) -> DfHistory:
    """Penalize the visited state by wl_delta (so over-sampled states lose
    probability); shrink wl_delta when the visit histogram is flat
    (reference: expanded.cpp UpdateWeights WL branch).  At convergence
    w_l = beta U_l + const, i.e. flat sampling."""
    weights = hist.weights.at[fep_state].add(-hist.wl_delta)
    n_at = hist.n_at_lam.at[fep_state].add(1.0)
    mean = jnp.mean(n_at)
    flat = (jnp.min(n_at) > flatness_ratio * mean) & (mean > 0)
    return DfHistory(
        weights=weights,
        counts=hist.counts.at[fep_state].add(1.0),
        wl_delta=jnp.where(flat, hist.wl_delta * wl_scale, hist.wl_delta),
        n_at_lam=jnp.where(flat, jnp.zeros_like(n_at), n_at))


def expanded_step(fep_state, u_all, hist: DfHistory, temperature: float,
                  key, move: LmcMove = LmcMove.GIBBS,
                  use_wl: bool = True) -> Tuple[jnp.ndarray, DfHistory]:
    """One lambda-space MC move.

    u_all: (L,) potential energies of the current configuration at every
    lambda window (from the foreign-lambda pass).  Returns (new_state,
    updated history).  Acceptance uses log pi_l = -beta U_l + w_l
    (reference: expanded.cpp CalculateAcceptance*).
    """
    beta = 1.0 / (BOLTZ * temperature)
    L = u_all.shape[0]
    logw = -beta * u_all + hist.weights
    k1, k2 = jax.random.split(key)

    if move == LmcMove.GIBBS:
        # metropolized Gibbs: propose from the conditional distribution
        # excluding the current state, accept with the metropolization
        # factor (reference: expanded.cpp lmc-gibbs path)
        logp = logw - jax.scipy.special.logsumexp(logw)
        p = jnp.exp(logp)
        p_prop = p.at[fep_state].set(0.0)
        norm = jnp.sum(p_prop)
        p_prop = jnp.where(norm > 0, p_prop / jnp.maximum(norm, 1e-30),
                           jnp.ones((L,)) / L)
        new = jax.random.choice(k1, L, p=p_prop)
        # metropolize: accept with min(1, (1-p_i)/(1-p_j))
        ratio = (1.0 - p[fep_state]) / jnp.maximum(1.0 - p[new], 1e-30)
        accept = jax.random.uniform(k2) < jnp.minimum(1.0, ratio)
        new_state = jnp.where(accept, new, fep_state)
    else:
        # nearest-neighbour move
        up = jax.random.uniform(k1) < 0.5
        prop = jnp.clip(fep_state + jnp.where(up, 1, -1), 0, L - 1)
        dlw = logw[prop] - logw[fep_state]
        if move == LmcMove.BARKER:
            p_acc = 1.0 / (1.0 + jnp.exp(-dlw))
        else:
            p_acc = jnp.minimum(1.0, jnp.exp(jnp.clip(dlw, -50.0, 50.0)))
        accept = (jax.random.uniform(k2) < p_acc) & (prop != fep_state)
        new_state = jnp.where(accept, prop, fep_state)

    if use_wl:
        hist = wang_landau_update(hist, new_state)
    else:
        hist = hist.replace(counts=hist.counts.at[new_state].add(1.0))
    return new_state.astype(jnp.int32), hist


def free_energy_estimate(hist: DfHistory, temperature: float) -> jnp.ndarray:
    """dG_l - dG_0 from the converged WL weights (kJ/mol): at flat
    sampling -beta U_l + w_l = const, so F_l - F_0 = kT (w_l - w_0)."""
    kt = BOLTZ * temperature
    return kt * (hist.weights - hist.weights[0])
