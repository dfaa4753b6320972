"""Foreign-lambda energy differences for BAR/MBAR.

The fork computes these with a dedicated energy-only CUDA kernel looping
over all lambdas (reference: nbnxm/cuda/nbnxm_foreign_fep_cuda_kernel.cuh,
launched nbnxm_cuda.cu:810-845) and re-evaluates bonded/PME terms per
lambda on the CPU (listed_forces.cpp:554 calc_listed_lambda,
freeenergydispatch.cpp:236-307).  Here the only lambda-dependent energy
terms are the FEP pair list, perturbed bonded terms, 1-4 pairs and the
PME dual-grid mix — all cheap relative to the main kernel — and the sweep
is one jax.vmap over the (L, 7) lambda matrix.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.types import EnergyTerms, FepCoupling, MdParams, System
from . import bonded as bonded_mod
from .cluster_nb import fep_pair_energy
from .forces import get_beta, pairs14_energy
from .pairlist import FepPairlist


def make_lambda_energy_fn(system: System, params: MdParams,
                          pme_recip_fn: Optional[Callable] = None):
    """E_lam(x, box, lam, feplist) — only the lambda-DEPENDENT part of the
    potential.  Differences across lambdas equal full-potential
    differences because everything else cancels."""
    beta = get_beta(params)
    disp_e_fn = None
    if params.dispcorr:
        from .dispcorr import make_dispersion_correction
        disp_e_fn, _ = make_dispersion_correction(system, params)

    def e_lambda(x, box, lam, feplist: Optional[FepPairlist]):
        lam_c, lam_v = lam[FepCoupling.COUL], lam[FepCoupling.VDW]
        lam_b, lam_r = lam[FepCoupling.BONDED], lam[FepCoupling.RESTRAINT]
        e = jnp.zeros((), x.dtype)
        if feplist is not None:
            e_c, e_v = fep_pair_energy(x, box, lam_c, lam_v, feplist,
                                       system, params, beta)
            e = e + e_c + e_v
        for name, il in system.bonded.items():
            if il.n == 0:
                continue
            _, _, fn = bonded_mod.TERMS[name]
            lam_term = (lam_r if name in bonded_mod.RESTRAINT_TERMS
                        else lam_b)
            e = e + fn(x, box, il, lam_term)
        if system.pairs14.n > 0:
            e14c, e14l = pairs14_energy(x, box, system, lam_c, lam_v, params)
            e = e + e14c + e14l
        if pme_recip_fn is not None:
            e = e + pme_recip_fn(x, box, lam_c)
        if disp_e_fn is not None:
            e_dc, _ = disp_e_fn(box, lam[FepCoupling.VDW])
            e = e + e_dc
        return e

    return e_lambda


def make_foreign_delta_fn(system: System, params: MdParams,
                          all_lambda: jnp.ndarray,
                          pme_recip_fn: Optional[Callable] = None):
    """delta_fn(x, box, lam_cur, feplist) -> (L,) with
    Delta U_l = U(lambda_l) - U(lambda_cur)  (ForeignLambdaTerms analogue,
    reference: mdtypes/enerdata.h:80)."""
    e_lambda = make_lambda_energy_fn(system, params, pme_recip_fn)

    def delta_fn(x, box, lam_cur, feplist):
        e_cur = e_lambda(x, box, lam_cur, feplist)
        e_all = jax.vmap(lambda l: e_lambda(x, box, l, feplist))(all_lambda)
        return e_all - e_cur

    return delta_fn
