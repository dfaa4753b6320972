"""Expanded-ensemble dynamics: Monte-Carlo moves in lambda space with
Wang-Landau weight adaptation, bit-compatible with the reference
(reference: src/gromacs/mdlib/expanded.cpp — expandedEnsembleUpdateLambdaState
:1331, ChooseNewLambda :852, UpdateWeights WL branch, CheckHistogramRatios;
history layout mdtypes/df_history.h; simulated tempering
simulatedTemperingUpdateTemperature :1520).

The MC runs inside the jitted step using the GROMACS ThreeFry2x64 stream
(utils/gmx_rng.py), so with identical seeds the lambda-state trajectory
reproduces the reference exactly (verified against the `expanded` and
`simtemp` systems of the FEP golden matrix).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.units import BOLTZ
from ..utils.gmx_rng import DOMAIN_EXPANDED_ENSEMBLE, gmx_uniform_pair


@struct.dataclass
class DfHist:
    """Free-energy-weight history (reference: mdtypes/df_history.h)."""
    sum_weights: jnp.ndarray   # (L,) current log-weights
    wl_histo: jnp.ndarray      # (L,) Wang-Landau visit histogram
    wl_delta: jnp.ndarray      # () current WL increment
    n_at_lam: jnp.ndarray      # (L,) total visits
    equil: jnp.ndarray         # () bool: weights equilibrated

    @staticmethod
    def init(n_lambda: int, init_wl_delta: float = 1.0,
             init_weights=None) -> "DfHist":
        z = jnp.zeros((n_lambda,))
        w = z if init_weights is None else jnp.asarray(init_weights)
        return DfHist(sum_weights=w, wl_histo=z,
                      wl_delta=jnp.asarray(float(init_wl_delta)),
                      n_at_lam=z, equil=jnp.asarray(False))


def simulated_tempering_temperatures(n: int, low: float, high: float,
                                     scale: str,
                                     temperature_lambdas=None) -> np.ndarray:
    """(reference: gmxpreprocess/readir.cpp getSimTemps)."""
    i = np.arange(n, dtype=np.float64)
    if scale == "linear":
        tl = np.asarray(temperature_lambdas, np.float64)
        return low + (high - low) * tl
    if scale == "geometric":
        return low * (high / low) ** (i / max(n - 1, 1))
    if scale == "exponential":
        tl = np.asarray(temperature_lambdas, np.float64)
        return low + (high - low) * (np.expm1(tl) / np.expm1(1.0))
    raise ValueError(scale)


def _first_index_leq(cum, r):
    """First i with r <= cum[i] (the reference's subtract-walk)."""
    hit = r <= cum
    return jnp.argmax(hit)


def expanded_step_gmx(fep_state, dfhist: DfHist, delta_h, epot, step,
                      lmc_seed: int, lmc_move: str, lmc_stats: str,
                      wl_scale: float, wl_ratio: float,
                      weight_equil_wl_delta: float,
                      mc_temp: float,
                      sim_temps=None) -> Tuple[jnp.ndarray, DfHist]:
    """One lambda-space MC move, matching expandedEnsembleUpdateLambdaState.

    delta_h: (L,) U(lambda_i; x) - U(lambda_cur; x); epot: current
    potential (only used for simulated tempering); sim_temps: (L,)
    per-state temperatures for simulated tempering, None otherwise.
    Returns (new_state, updated history)."""
    L = delta_h.shape[0]
    dtype = delta_h.dtype
    cur = fep_state

    # visit count (expanded.cpp:1356)
    n_at_lam = dfhist.n_at_lam.at[cur].add(1.0)

    # scaled energies (expanded.cpp:1374-1407)
    if sim_temps is not None:
        temps = jnp.asarray(sim_temps, dtype)
        scaled = (delta_h / (temps * BOLTZ)
                  + epot * (1.0 / temps - 1.0 / temps[cur]) / BOLTZ)
    else:
        scaled = delta_h / (mc_temp * BOLTZ)
    weighted = dfhist.sum_weights - scaled
    weighted = weighted - jnp.max(weighted)

    # --- Wang-Landau weight update (UpdateWeights, WL branch); uses the
    # PRE-update weights for the move below ---
    equil = dfhist.equil
    if weight_equil_wl_delta > 0:
        newly_done = (~equil) & (dfhist.wl_delta < weight_equil_wl_delta)
    else:
        newly_done = jnp.asarray(False)
    equil_next = equil | newly_done
    do_wl = (lmc_stats in ("wang-landau", "wl"))
    if do_wl:
        upd = (~equil_next).astype(dtype)
        sum_weights = dfhist.sum_weights.at[cur].add(-dfhist.wl_delta * upd)
        wl_histo = dfhist.wl_histo.at[cur].add(upd)
        # flatness check (CheckHistogramRatios with wl_ratio)
        nmean = jnp.mean(wl_histo)
        flat = (nmean > 0) & jnp.all(wl_histo / jnp.maximum(nmean, 1e-30)
                                     >= wl_ratio) & (upd > 0)
        wl_delta = jnp.where(flat, dfhist.wl_delta * wl_scale,
                             dfhist.wl_delta)
        wl_histo = jnp.where(flat, jnp.zeros_like(wl_histo), wl_histo)
    else:
        sum_weights, wl_histo, wl_delta = (dfhist.sum_weights,
                                           dfhist.wl_histo, dfhist.wl_delta)
    n_at_lam = jnp.where(newly_done, jnp.zeros_like(n_at_lam), n_at_lam)

    # --- choose the new lambda (ChooseNewLambda) ---
    r1, r2 = gmx_uniform_pair(lmc_seed, DOMAIN_EXPANDED_ENSEMBLE,
                              step, 0, dtype=dtype)
    # Gibbs probabilities over the full range (gibbs-delta-lambda = -1)
    w = weighted - jnp.max(weighted)
    e = jnp.exp(w)
    p_k = e / jnp.sum(e)

    if lmc_move == "gibbs":
        lamnew = _first_index_leq(jnp.cumsum(p_k), r1)
    elif lmc_move in ("metropolized-gibbs", "metropolis-gibbs"):
        remainder = 1.0 - p_k
        rem_cur = remainder[cur]
        q = jnp.where(jnp.arange(L) == cur, 0.0,
                      p_k / jnp.maximum(rem_cur, 1e-300))
        trial = _first_index_leq(jnp.cumsum(q), r1)
        tprob = jnp.minimum(1.0, rem_cur
                            / jnp.maximum(remainder[trial], 1e-300))
        accept = r2 < tprob
        lamnew = jnp.where((rem_cur <= 0) | (~accept), cur, trial)
    elif lmc_move in ("metropolis", "barker"):
        # nearest-neighbour move (reference: ChooseNewLambda Metropolis
        # branch: r1 picks the direction, r2 the acceptance)
        up = r1 >= 0.5
        prop = jnp.clip(cur + jnp.where(up, 1, -1), 0, L - 1)
        dlw = weighted[prop] - weighted[cur]
        if lmc_move == "barker":
            p_acc = 1.0 / (1.0 + jnp.exp(-dlw))
        else:
            p_acc = jnp.minimum(1.0, jnp.exp(jnp.clip(dlw, -50.0, 50.0)))
        accept = (r2 < p_acc) & (prop != cur)
        lamnew = jnp.where(accept, prop, cur)
    else:
        raise ValueError(f"lmc-move {lmc_move} unsupported")

    hist = DfHist(sum_weights=sum_weights, wl_histo=wl_histo,
                  wl_delta=wl_delta, n_at_lam=n_at_lam, equil=equil_next)
    return lamnew.astype(jnp.int32), hist


def free_energy_estimate(hist: DfHist, temperature: float) -> jnp.ndarray:
    """dG_l - dG_0 from the converged weights (kJ/mol): at flat sampling
    sum_weights[l] = beta dG_l + const (expanded.cpp: weighted_lamee =
    sum_weights - beta dU must be state-independent)."""
    kt = BOLTZ * temperature
    return kt * (hist.sum_weights - hist.sum_weights[0])
