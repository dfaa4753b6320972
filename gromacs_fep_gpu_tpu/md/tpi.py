"""Test-particle insertion (Widom) excess chemical potential
(reference: src/gromacs/mdrun/tpi.cpp:163 do_tpi).

mu_excess = -kT ln [ <V exp(-beta dU)> / <V> ] over random insertions of
the test particle into frames of an existing trajectory (here NVT frames
make the V factors cancel; the V-weighted form is kept for NPT
trajectories).  The insertion energies are one dense vectorized
distance evaluation per frame batch — all R insertions of a frame run
as a single (R, N) pairwise computation on device (the reference loops
insertions serially on the CPU with a neighborlist around each point;
the batched dense form is the TPU-shaped equivalent at these sizes)."""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core import pbc as pbc_mod
from ..core.types import CoulombType, MdParams, System
from ..core.units import BOLTZ, ONE_4PI_EPS0
from ..ops.nonbonded_ref import rf_constants


class TpiResult(NamedTuple):
    mu_excess: jnp.ndarray      # kJ/mol
    n_insertions: int
    acc_vexp: jnp.ndarray       # sum of V exp(-beta dU)
    acc_v: jnp.ndarray          # sum of V


def make_tpi_frame_fn(system: System, params: MdParams,
                      test_type: int, test_q: float,
                      temperature: float, n_insert: int):
    """Returns fn(x, box, key) -> (sum of exp(-beta dU) over n_insert
    random insertions, V).  The test particle interacts with every real
    atom through the A-state LJ table + Coulomb at the run's cutoffs
    (tpi.cpp uses the cutoffs of the input tpr)."""
    kt = BOLTZ * temperature
    epsfac = ONE_4PI_EPS0 / params.epsilon_r
    rc2 = params.rcoulomb ** 2
    rv2 = params.rvdw ** 2
    rcinv6 = 1.0 / params.rvdw ** 6
    if params.coulomb == CoulombType.REACTION_FIELD:
        krf, crf = rf_constants(params)
    c6_row = system.nbfp[test_type, :, 0]    # (T,)
    c12_row = system.nbfp[test_type, :, 1]

    def frame(x, box, key):
        n = x.shape[0]
        diag = jnp.diag(box)
        u = jax.random.uniform(key, (n_insert, 3), x.dtype)
        xi = u * diag[None, :]
        d = xi[:, None, :] - x[None, :, :]            # (R, N, 3)
        d = d - jnp.round(d / diag) * diag
        r2 = jnp.sum(d * d, -1)
        r2 = jnp.maximum(r2, 1e-6)
        rinv = jax.lax.rsqrt(r2)
        rinv2 = rinv * rinv
        rinv6 = jnp.minimum(rinv2 * rinv2 * rinv2, 1e18)
        c6 = c6_row[system.type_a][None, :]
        c12 = c12_row[system.type_a][None, :]
        in_v = (r2 < rv2).astype(x.dtype)
        e_lj = ((c12 * rinv6 - c6) * rinv6
                - (c12 * rcinv6 * rcinv6 - c6 * rcinv6)) * in_v
        qq = epsfac * test_q * system.charge_a[None, :]
        in_c = (r2 < rc2).astype(x.dtype)
        if params.coulomb == CoulombType.REACTION_FIELD:
            e_c = qq * (rinv + krf * r2 - crf) * in_c
        elif params.coulomb == CoulombType.PME:
            # tpi treats the test charge with the short-ranged erfc part
            # only (the recip contribution of one charge is a constant
            # self-term at fixed box; tpi.cpp uses the same cutoff form)
            from ..ops.nonbonded_ref import ewald_beta
            beta = ewald_beta(params.rcoulomb, params.ewald_rtol)
            e_c = qq * rinv * jax.lax.erfc(beta * r2 * rinv) * in_c
        else:
            e_c = qq * (rinv - 1.0 / params.rcoulomb) * in_c
        du = jnp.sum(e_lj + e_c, axis=1)              # (R,)
        w = jnp.exp(jnp.clip(-du / kt, -80.0, 80.0))
        vol = pbc_mod.box_volume(box)
        return jnp.sum(w), vol

    return jax.jit(frame)


def tpi_over_frames(frames_x, frames_box, system: System, params: MdParams,
                    test_type: int, test_q: float, temperature: float,
                    n_insert: int = 1000, seed: int = 1993,
                    rng_key: Optional[jax.Array] = None) -> TpiResult:
    """Run TPI over a list of (x, box) frames."""
    fn = make_tpi_frame_fn(system, params, test_type, test_q, temperature,
                           n_insert)
    key = rng_key if rng_key is not None else jax.random.PRNGKey(seed)
    acc_vexp = 0.0
    acc_v = 0.0
    total = 0
    for x, box in zip(frames_x, frames_box):
        key, sub = jax.random.split(key)
        s, vol = fn(jnp.asarray(x), jnp.asarray(box), sub)
        acc_vexp += float(vol) * float(s) / n_insert
        acc_v += float(vol)
        total += n_insert
    kt = BOLTZ * temperature
    mu = -kt * jnp.log(jnp.maximum(acc_vexp / acc_v, 1e-300))
    return TpiResult(mu_excess=mu, n_insertions=total,
                     acc_vexp=jnp.asarray(acc_vexp),
                     acc_v=jnp.asarray(acc_v))
