"""Long-range dispersion (tail) correction — DispCorr = EnerPres
(reference: src/gromacs/mdlib/dispersioncorrection.cpp).

E_tail = -(2 pi / 3) N^2/V <c6> rc^-3,  P_tail = 2 E_tail / V
with <c6> the number-weighted average over all type pairs.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import pbc as pbc_mod
from ..core.types import MdParams, System
from ..core.units import PRESFAC


def average_c6(system: System) -> float:
    """Number-weighted <c6> over A-state types (host-side, static)."""
    t = np.asarray(system.type_a)
    nbfp = np.asarray(system.nbfp)
    counts = np.bincount(t, minlength=nbfp.shape[0]).astype(np.float64)
    n = counts.sum()
    avg = counts @ nbfp[:, :, 0] @ counts / (n * n)
    return float(avg)


def make_dispersion_correction(system: System, params: MdParams):
    """Returns (energy_fn(box) -> E_tail, pressure_fn(box) -> P_tail[bar])."""
    avg_c6 = average_c6(system)
    n = system.n_atoms
    rc3 = params.rvdw ** 3
    pref = -(2.0 * np.pi / 3.0) * n * n * avg_c6 / rc3

    def e_tail(box):
        return pref / pbc_mod.box_volume(box)

    def p_tail(box):
        vol = pbc_mod.box_volume(box)
        return 2.0 * pref / (vol * vol) * PRESFAC

    return e_tail, p_tail
