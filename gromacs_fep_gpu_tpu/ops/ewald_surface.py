"""Ewald surface-dipole corrections (non-tinfoil boundaries and the
Yeh-Berkowitz slab geometry).

reference: ewald/long_range_correction.cpp:85-215 ewald_LRcorrection —
- 3d with epsilon-surface != 0:
    E = 2 pi k_e / ((2 eps_s + eps_r) V) * |M|^2,    M = sum q_i x_i
- 3dc (slab, ewald-geometry = 3dc):
    E = 2 pi k_e / (eps_r V) * (M_z^2
        - qsum (sum_i q_i z_i^2 + qsum Lz^2 / 12))
FEP convention matches the reference: linear interpolation between the
A- and B-charge end-state energies (L1_q * corr_A + lambda * corr_B),
so jax.grad w.r.t. lambda gives exactly dvdl = E_B - E_A.  Forces come
from AD through the dipole (the reference's dipcorr loop is the
analytic gradient of the same expression)."""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from ..core import pbc as pbc_mod
from ..core.types import CoulombType, MdParams, System
from ..core.units import ONE_4PI_EPS0

TWO_PI = 2.0 * jnp.pi


def make_surface_corr_fn(system: System, params: MdParams
                         ) -> Optional[Callable]:
    """Returns e(x, box, lam_coul) -> scalar, or None when inactive."""
    if params.coulomb not in (CoulombType.PME,):
        return None
    is_3dc = params.ewald_geometry == "3dc"
    if not is_3dc and params.epsilon_surface == 0.0:
        return None          # tinfoil boundary: no correction

    q_a = system.charge_a
    q_b = system.charge_b

    def one_state(q, x, box):
        vol = pbc_mod.box_volume(box)
        M = jnp.sum(q[:, None] * x, axis=0)
        if is_3dc:
            coeff = TWO_PI * ONE_4PI_EPS0 / params.epsilon_r / vol
            e = coeff * M[2] * M[2]
            qsum = jnp.sum(q)
            sum_qz2 = jnp.sum(q * x[:, 2] * x[:, 2])
            lz = box[2, 2]
            charged = jnp.abs(qsum) > 1e-4
            e = e - jnp.where(
                charged,
                coeff * qsum * (sum_qz2 + qsum * lz * lz / 12.0), 0.0)
            return e
        # 3d + epsilon-surface (the reference uses the raw one4PiEps0
        # here, not divided by epsilon_r — matched deliberately)
        coeff = (TWO_PI * ONE_4PI_EPS0
                 / ((2.0 * params.epsilon_surface + params.epsilon_r)
                    * vol))
        return coeff * jnp.sum(M * M)

    pert = bool(jnp.any(q_a != q_b))

    def energy(x, box, lam_c):
        e_a = one_state(q_a, x, box)
        if not pert:
            return e_a
        e_b = one_state(q_b, x, box)
        return (1.0 - lam_c) * e_a + lam_c * e_b

    return energy
