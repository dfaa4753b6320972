"""Verlet buffer estimation (reference: src/gromacs/mdlib/calc_verletbuf.cpp
:116,1080).  The reference derives the buffer from kinetic theory for a
target per-atom energy drift; we provide the same interface with a simpler
conservative estimate: the RMS displacement of the fastest atoms over the
list lifetime plus a safety factor.
"""
from __future__ import annotations

import math

from ..core.types import MdParams
from ..core.units import BOLTZ


def verlet_buffer(params: MdParams, min_mass: float = 1.008,
                  temperature: float | None = None,
                  safety: float = 2.0) -> float:
    """Buffer (nm) so that pairs cannot drift inside the cutoff between
    rebuilds: ~ safety * nstlist*dt * v_thermal(lightest atom)."""
    t = temperature if temperature is not None else params.ref_t
    if t <= 0:
        t = 300.0
    v_rms = math.sqrt(3.0 * BOLTZ * t / min_mass)  # nm/ps
    lifetime = params.nstlist * params.dt
    return safety * v_rms * lifetime


def effective_rlist(params: MdParams, min_mass: float = 1.008) -> float:
    rc = max(params.rcoulomb, params.rvdw)
    if params.rlist > rc:
        return params.rlist
    return rc + verlet_buffer(params, min_mass)
