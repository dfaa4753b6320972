"""AWH (Accelerated Weight Histogram) biasing with the FEP lambda state
as the reaction coordinate.

TPU-native counterpart of the reference's AWH-FEP subsystem
(reference: applied_forces/awh/awh.h:256 fepLambdaState,
awh/bias.cpp doSkippedUpdatesForAllPoints + calcConvolvedBias,
awh/biasstate.cpp sampleCoordAndPmf / updateFreeEnergyAndAddSamplesToHistogram,
awh/pointstate.h updateFreeEnergy, awh/histogramsize.cpp initial-stage
growth; the method is Lindahl, Lidmar & Hess, J. Chem. Phys. 141, 044110
(2014)).

For a discrete lambda coordinate the machinery simplifies sharply and
maps perfectly onto jit:
- The conditional distribution over the L lambda points is computable
  exactly each sample: P(m|x) = exp(f_m - beta dU_m) / Z, where f_m is
  the current bias in kT (the running beta*DeltaG estimate) and dU_m the
  foreign-lambda energy differences the dhdl machinery already produces.
- The lambda state moves by Gibbs sampling from P(m|x) using the
  bit-exact GROMACS ThreeFry stream (RandomDomain::AwhBiasing).
- The free-energy update (pointstate.h updateFreeEnergy) becomes, per
  update with accumulated sample weights w_m (sum w_m = dn):
      f_m <- f_m - ln[ (N rho_m + w_m) / (N rho_m + dn rho_m) ]
  with rho the target distribution and N the weight-histogram size.
- Initial stage: N starts at N0 = (kT / error_init)^2 and multiplies by
  the growth factor on each covering of the lambda range; the stage
  ends when N reaches the sample count (exp-linear growth, reference:
  histogramsize.cpp).  In the final stage N grows linearly (N += dn).

All state lives in a small pytree updated in-program; nothing here
touches the host inside the step.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.types import AwhParams  # noqa: F401  (re-export)
from ..core.units import BOLTZ
from ..utils.gmx_rng import DOMAIN_AWH_BIASING, gmx_uniform_pair


@struct.dataclass
class AwhState:
    """Per-bias dynamic state (reference: awh/biasstate.h BiasState)."""
    f: jnp.ndarray            # (L,) bias = beta*DeltaG estimates (kT)
    w_update: jnp.ndarray     # (L,) sample weights since last F update
    n_update: jnp.ndarray     # ()   samples since last F update
    w_covering: jnp.ndarray   # (L,) sample weights since last covering
    hist_size: jnp.ndarray    # ()   weight-histogram size N
    n_total: jnp.ndarray      # ()   total samples ever
    initial_stage: jnp.ndarray  # () bool
    # log of the unbiased sample-weight sum per point: each sample adds
    # P(m|x) e^{-f_m} in log space, so the estimator stays correct while
    # the bias moves (reference: pointstate.h logPmfSum samplePmf)
    log_pmf_sum: jnp.ndarray  # (L,)

    @staticmethod
    def init(n_lambda: int, error_init_kt: float) -> "AwhState":
        z = jnp.zeros((n_lambda,))
        n0 = jnp.maximum(1.0 / jnp.asarray(error_init_kt) ** 2, 1.0)
        return AwhState(f=z, w_update=z, n_update=jnp.zeros(()),
                        w_covering=z, hist_size=n0,
                        n_total=jnp.zeros(()),
                        initial_stage=jnp.asarray(True),
                        log_pmf_sum=jnp.full((n_lambda,), -80.0))


def awh_fep_step(fep_state, awh: AwhState, delta_h, step,
                 params: AwhParams, mc_temp: float
                 ) -> Tuple[jnp.ndarray, AwhState]:
    """One AWH sample at a coordinate-sample step: accumulate the point
    distribution, move lambda by Gibbs, and every n_samples_update
    samples apply the free-energy update + histogram growth.

    delta_h: (L,) U(lambda_m; x) - U(lambda_cur; x) in kJ/mol.
    Returns (new_fep_state, new AwhState)."""
    L = delta_h.shape[0]
    dtype = delta_h.dtype
    kt = mc_temp * BOLTZ
    log_rho = jnp.full((L,), -jnp.log(jnp.asarray(float(L))), dtype)

    # conditional point distribution P(m|x) (biasstate.cpp
    # updateProbabilityWeightsAndConvolvedBias)
    logw = awh.f - delta_h / kt
    logw = logw - jnp.max(logw)
    p = jnp.exp(logw)
    p = p / jnp.sum(p)

    w_update = awh.w_update + p
    w_covering = awh.w_covering + p
    n_update = awh.n_update + 1.0
    n_total = awh.n_total + 1.0
    log_pmf_sum = jnp.logaddexp(awh.log_pmf_sum,
                                jnp.log(jnp.maximum(p, 1e-30)) - awh.f)

    # --- lambda move: Gibbs over the full range (moveUmbrella /
    # lambda-state jump, bias.cpp) ---
    r1, _ = gmx_uniform_pair(params.seed, DOMAIN_AWH_BIASING, step, 0,
                             dtype=dtype)
    lamnew = jnp.argmax(r1 <= jnp.cumsum(p)).astype(jnp.int32)

    # --- free-energy update every n_samples_update samples ---
    do_update = n_update >= params.n_samples_update

    def apply_update(a):
        f, w_up, w_cov, N, init = (a.f, a.w_update, a.w_covering,
                                   a.hist_size, a.initial_stage)
        rho = jnp.exp(log_rho)
        dn = jnp.sum(w_up)
        # pointstate.h updateFreeEnergy
        f_new = f - jnp.log((N * rho + w_up) / (N * rho + dn * rho))
        f_new = f_new - f_new[0]
        # covering check (discrete lambda: every point must have
        # accumulated a meaningful share since the last covering;
        # the reference's covered() peak criterion reduces to this)
        covered = jnp.all(w_cov * L >= 0.25 * jnp.sum(w_cov))
        grow = init & covered
        N_grown = jnp.where(grow, N * params.growth_factor, N)
        # exp-linear exit: once exponential growth can no longer outrun
        # the sample count, switch to the final (linear) stage
        # (histogramsize.cpp)
        leave = grow & (N_grown >= a.n_total)
        init_new = init & ~leave
        if params.growth == "linear":
            init_new = jnp.asarray(False)
            N_grown = N
        N_final = jnp.where(init_new, N_grown, N_grown + dn)
        w_cov_new = jnp.where(grow, jnp.zeros_like(w_cov), w_cov)
        return a.replace(f=f_new, w_update=jnp.zeros_like(w_up),
                         n_update=jnp.zeros(()), w_covering=w_cov_new,
                         hist_size=N_final, initial_stage=init_new)

    staged = awh.replace(w_update=w_update, n_update=n_update,
                         w_covering=w_covering, n_total=n_total,
                         log_pmf_sum=log_pmf_sum)
    new = jax.lax.cond(do_update, apply_update, lambda a: a, staged)
    return lamnew, new


def awh_pull_step(awh: AwhState, xi, centers, force_constant, step,
                  params: AwhParams, temp: float
                  ) -> Tuple[jnp.ndarray, AwhState]:
    """One AWH sample with a CONTINUOUS pull coordinate (reference:
    awh1-dim1-coord-provider = pull, applied_forces/awh/bias.cpp
    moveUmbrella): the reaction coordinate xi couples to grid point m
    through the harmonic umbrella U_m(xi) = k/2 (xi - xi_m)^2, so the
    conditional point distribution is P(m|xi) ~ exp(f_m - beta U_m) —
    the same machinery as the discrete lambda coordinate with
    delta_h := U_m(xi).  Returns (new center index, new AwhState)."""
    delta_h = 0.5 * force_constant * (xi - centers) ** 2
    return awh_fep_step(None, awh, delta_h, step, params, temp)


def awh_free_energy(awh: AwhState, temperature: float) -> jnp.ndarray:
    """DeltaG_m - DeltaG_0 in kJ/mol from the converged bias (the bias
    f_m is the running beta*DeltaG_m estimate)."""
    f = awh.f - awh.f[0]
    return f * BOLTZ * temperature


def awh_pmf(awh: AwhState, temperature: float) -> jnp.ndarray:
    """PMF estimate from the unbiased sampled weights (biasstate.cpp
    getPmf): -kT ln(sum of P(m|x) e^{-f_m}), normalized to 0."""
    pmf = -awh.log_pmf_sum
    pmf = pmf - pmf[0]
    return pmf * BOLTZ * temperature
