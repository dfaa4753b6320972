"""COM pulling: umbrella / constant-force / flat-bottom potentials on
center-of-mass distances between atom groups
(reference: src/gromacs/pulling/pull.cpp; geometry 'distance').

Pull coordinates are differentiable energy terms, so forces arrive through
the same AD pass as everything else; the reaction coordinate time series
is logged for WHAM-style analysis.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import pbc as pbc_mod


class PullType(enum.Enum):
    UMBRELLA = "umbrella"
    CONSTANT_FORCE = "constant-force"
    FLAT_BOTTOM = "flat-bottom"


@dataclasses.dataclass(frozen=True)
class PullCoord:
    """One pull coordinate between two groups (atom index tuples)."""
    group0: tuple
    group1: tuple
    type: PullType = PullType.UMBRELLA
    init: float = 0.0      # reference distance (nm)
    rate: float = 0.0      # nm/ps reference motion (steered MD)
    k: float = 1000.0      # kJ/mol/nm^2 (umbrella/flat-bottom) or kJ/mol/nm


def group_com(x, mass, idx):
    idx = jnp.asarray(idx)
    m = mass[idx]
    return jnp.sum(m[:, None] * x[idx], axis=0) / jnp.sum(m)


def pull_distance(x, box, mass, coord: PullCoord):
    c0 = group_com(x, mass, coord.group0)
    c1 = group_com(x, mass, coord.group1)
    d = pbc_mod.pbc_dx(c1 - c0, box)
    return jnp.sqrt(jnp.sum(d * d) + 1e-20)


def pull_energy(x, box, mass, coords: Sequence[PullCoord], t,
                ref_override=None):
    """Total pull potential at time t (ps); differentiable in x.

    ref_override: optional (static coord index, traced value) replacing
    that coordinate's reference distance — the AWH umbrella center
    (reference: awh.cpp Awh::applyBiasForcesAndUpdateBias sets the pull
    coordinate's umbrella to the current grid point)."""
    e = jnp.zeros((), x.dtype)
    for i, c in enumerate(coords):
        r = pull_distance(x, box, mass, c)
        ref = c.init + c.rate * t
        if ref_override is not None and i == ref_override[0]:
            ref = ref_override[1]
        if c.type == PullType.UMBRELLA:
            e = e + 0.5 * c.k * (r - ref) ** 2
        elif c.type == PullType.CONSTANT_FORCE:
            e = e + c.k * r
        else:  # FLAT_BOTTOM: only penalize r > ref
            d = jnp.maximum(r - ref, 0.0)
            e = e + 0.5 * c.k * d * d
    return e


def pull_scalar_forces(dists, coords: Sequence[PullCoord], t,
                       ref_override=None):
    """Per-coordinate scalar force -dE/dr (the pullf.xvg quantity,
    reference: pulling/output.cpp pull_print_f)."""
    fs = []
    for i, (c, r) in enumerate(zip(coords, dists)):
        ref = c.init + c.rate * t
        if ref_override is not None and i == ref_override[0]:
            ref = ref_override[1]
        if c.type == PullType.UMBRELLA:
            fs.append(-c.k * (r - ref))
        elif c.type == PullType.CONSTANT_FORCE:
            fs.append(-c.k * jnp.ones_like(r))
        else:
            fs.append(-c.k * jnp.maximum(r - ref, 0.0))
    return jnp.stack(fs)


def make_pull_force_fn(coords: Sequence[PullCoord], mass):
    """Returns pull_fn(x, box, t) -> (f_pull, e_pull, dists, fscal) —
    the computeSpecialForces slot (reference: sim_util.cpp:624)."""
    mass = jnp.asarray(mass)
    coords = tuple(coords)

    def pull_fn(x, box, t, ref_override=None):
        e, g = jax.value_and_grad(pull_energy)(x, box, mass, coords, t,
                                               ref_override)
        dists = jnp.stack([pull_distance(x, box, mass, c) for c in coords])
        return -g, e, dists, pull_scalar_forces(dists, coords, t,
                                                ref_override)

    return pull_fn
