"""Orientation restraints (RDC refinement)
(reference: listed_forces/orires.cpp calc_orires_dev/orires).

Per step:
1. The fit group is mass-weighted-centered and a Kabsch rotation to the
   reference orientation is computed (calc_fit_R); the rotation is
   treated as constant for differentiation, as the reference does.
2. Each restraint pair contributes a 5-component D tensor
   D = 3 c / r^(2+power) * (2 x x + y y - r^2, 2 x y, 2 x z,
   2 y y + x x - r^2, 2 y z) in the rotated frame.
3. Per experiment the order tensor S is the weighted least-squares
   solution of the 5x5 system mat S5 = rhs with mat = sum w D D^T,
   rhs = sum w D obs, S5 = 1.5 mat^-1 rhs.
4. The calculated orientation is 2/3 (S . D) (the reference's
   contraction with the symmetric traceless S), and
   V = 1/2 fc sum_i w_i (calc_i - obs_i)^2.

Instantaneous only (orire-tau = 0): no time averaging, no multi-sim
ensemble averaging.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core import pbc as pbc_mod


@struct.dataclass
class OriresList:
    """atoms (n,2) i32; exp (n,) i32 experiment index (dense 0..E-1);
    power (n,) i32; c (n,); obs (n,); weight (n,); mask (n,);
    fit_idx (m,) i32 fit-group atoms; fit_mass (m,); xref (m,3)
    reference coordinates (centered at build); n_exp static."""
    atoms: jnp.ndarray
    exp: jnp.ndarray
    power: jnp.ndarray
    c: jnp.ndarray
    obs: jnp.ndarray
    weight: jnp.ndarray
    mask: jnp.ndarray
    fit_idx: jnp.ndarray
    fit_mass: jnp.ndarray
    xref: jnp.ndarray
    n_exp: int = struct.field(pytree_node=False, default=1)

    @property
    def n(self) -> int:
        return self.atoms.shape[0]


def kabsch_rotation(x, xref, mass):
    """Mass-weighted rotation matrix R with R x ~ xref (both centered;
    reference: math/do_fit.cpp calc_fit_R).  Differentiation is stopped
    through R (the reference also neglects dR/dx in the forces)."""
    w = mass[:, None]
    cov = (xref * w).T @ x                       # (3,3)
    u, s, vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(u @ vt))
    sgn = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], x.dtype)).at[2, 2].set(d)
    return jax.lax.stop_gradient(u @ sgn @ vt)


def orires_energy(x, box, od: OriresList, fc: float) -> jnp.ndarray:
    """Total orientation-restraint energy."""
    if od.n == 0:
        return jnp.zeros((), x.dtype)
    # fit-group centering + rotation to the reference orientation
    xf = x[od.fit_idx]
    mtot = jnp.sum(od.fit_mass)
    com = jnp.sum(xf * od.fit_mass[:, None], axis=0) / mtot
    R = kabsch_rotation(xf - com, od.xref, od.fit_mass)

    ai, aj = od.atoms[:, 0], od.atoms[:, 1]
    r_un = pbc_mod.pbc_dx(x[ai] - x[aj], box)
    r = r_un @ R.T                              # rotated frame
    r2 = jnp.sum(r * r, -1)
    invr = jax.lax.rsqrt(jnp.maximum(r2, 1e-12))
    # pfac = 3 c / r^(2+power)
    pfac = 3.0 * od.c * invr * invr * jnp.where(od.power > 0,
                                                invr ** od.power, 1.0)
    X, Y, Z = r[:, 0], r[:, 1], r[:, 2]
    D = jnp.stack([2 * X * X + Y * Y - r2,
                   2 * X * Y,
                   2 * X * Z,
                   2 * Y * Y + X * X - r2,
                   2 * Y * Z], axis=-1) * pfac[:, None]     # (n, 5)

    w = od.weight * od.mask
    # per-experiment 5x5 weighted LSQ (segment sums over restraints)
    wD = w[:, None] * D
    mat = jax.ops.segment_sum(wD[:, :, None] * D[:, None, :], od.exp,
                              num_segments=od.n_exp)        # (E,5,5)
    rhs = jax.ops.segment_sum(wD * od.obs[:, None], od.exp,
                              num_segments=od.n_exp)        # (E,5)
    eye = jnp.eye(5, dtype=x.dtype) * 1e-10
    s5 = 1.5 * jnp.linalg.solve(mat + eye[None], rhs[:, :, None])[:, :, 0]

    # calc = 2/3 (S . D): S00 D0 + S01 D1 + S02 D2 + S11 D3 + S12 D4
    s_per = s5[od.exp]                                      # (n,5)
    calc = (2.0 / 3.0) * jnp.sum(s_per * D, axis=-1)
    dev = calc - od.obs
    return 0.5 * fc * jnp.sum(w * dev * dev)


def fill_orires_xref(system, x):
    """Capture the reference orientation from the start coordinates
    (mass-weighted-centered fit group) — the init_orires analogue."""
    od = system.orires
    if od is None:
        return system
    x = jnp.asarray(x, jnp.float32)
    xf = x[od.fit_idx]
    com = (jnp.sum(xf * od.fit_mass[:, None], axis=0)
           / jnp.sum(od.fit_mass))
    return system.replace(orires=od.replace(xref=xf - com))
