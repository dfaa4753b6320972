"""Lennard-Jones argon test systems (analogue of the reference's
src/testutils/simulationdatabase argon12/argon5832 boxes)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.topology import MoleculeType, build_system, lj_table_from_sigma_eps
from ..core.types import make_state, System, State

AR_SIGMA = 0.3405       # nm
AR_EPS = 0.99606        # kJ/mol
AR_MASS = 39.948


def argon_moltype() -> MoleculeType:
    return MoleculeType(name="AR", types_a=[0], charges_a=[0.0],
                        masses_a=[AR_MASS])


def argon_box(n_side: int = 4, spacing: float = 0.4, seed: int = 0,
              temperature: float | None = None):
    """Simple-cubic argon lattice; returns (System, State)."""
    n = n_side ** 3
    nbfp = lj_table_from_sigma_eps([AR_SIGMA], [AR_EPS], comb_rule=3)
    system = build_system([(argon_moltype(), n)], nbfp)

    g = np.mgrid[0:n_side, 0:n_side, 0:n_side].reshape(3, -1).T
    x = (g + 0.5) * spacing
    box = np.diag([n_side * spacing] * 3).astype(np.float32)

    rng = np.random.RandomState(seed)
    if temperature is not None:
        from ..core.units import BOLTZ
        sd = np.sqrt(BOLTZ * temperature / AR_MASS)
        v = rng.normal(0.0, sd, size=(n, 3))
        v -= v.mean(0)
    else:
        v = np.zeros((n, 3))
    state = make_state(x.astype(np.float32), v.astype(np.float32), box, seed=seed)
    return system, state
