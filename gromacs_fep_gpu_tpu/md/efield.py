"""Applied external electric fields (constant, oscillating, pulsed)
(reference: applied_forces/electricfield.cpp — per-dimension
E(t) = E0 cos(omega (t - t0)) exp(-(t-t0)^2 / 2 sigma^2) when sigma > 0,
E0 cos(omega t) otherwise; force f_i += q_i * c_fieldfac * E(t) with
c_fieldfac = Faraday/kilo = 96.4853 converting V/nm -> kJ/mol/nm/e).

The field force is charge-proportional and position-independent, so it
adds one vector op to the step.  FEP charges interpolate linearly with
the coulomb lambda, matching how the reference applies chargeA (it uses
the A charges only; we interpolate, which reduces to that at lam=0).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

FIELDFAC = 96.4853075              # kJ/mol/nm per (e * V/nm)


@dataclasses.dataclass(frozen=True)
class EfieldDim:
    e0: float = 0.0                # amplitude, V/nm
    omega: float = 0.0             # 1/ps
    t0: float = 0.0                # ps
    sigma: float = 0.0             # ps (0 = continuous)


def parse_efield(kv) -> Optional[Tuple[EfieldDim, EfieldDim, EfieldDim]]:
    """mdp keys electric-field-x/y/z = 'E0 omega t0 sigma'
    (reference: electricfield.cpp convertParameters)."""
    dims = []
    any_set = False
    for ax in "xyz":
        raw = kv.get(f"electric-field-{ax}", "").split()
        if len(raw) == 4:
            d = EfieldDim(*(float(v) for v in raw))
            any_set = any_set or d.e0 != 0.0
            dims.append(d)
        elif raw:
            raise ValueError(f"electric-field-{ax}: need 'E0 omega t0 "
                             "sigma'")
        else:
            dims.append(EfieldDim())
    return tuple(dims) if any_set else None


def field_strength(dims, t):
    """(3,) field in V/nm at time t (ps)."""
    out = []
    for d in dims:
        if d.sigma > 0:
            e = (d.e0 * jnp.cos(d.omega * (t - d.t0))
                 * jnp.exp(-((t - d.t0) ** 2) / (2.0 * d.sigma ** 2)))
        else:
            e = d.e0 * jnp.cos(d.omega * t)
        out.append(e)
    return jnp.stack([jnp.asarray(e, jnp.float32) for e in out])


def make_efield_force_fn(dims, charge_a, charge_b):
    """Returns f(t, lam_coul) -> (N, 3) force.  Charges interpolate with
    the coulomb lambda (a no-op for unperturbed systems)."""

    def force(t, lam_c):
        q = (1.0 - lam_c) * charge_a + lam_c * charge_b
        e = field_strength(dims, t) * FIELDFAC        # (3,)
        return q[:, None] * e[None, :]

    return force
