"""Periodic-boundary-condition utilities (reference: src/gromacs/pbcutil/pbc.cpp).

The box is a 3x3 lower-triangular matrix in the GROMACS convention:
row 0 = a = (ax, 0, 0), row 1 = b = (bx, by, 0), row 2 = c = (cx, cy, cz),
with the GROMACS box restrictions (|bx| <= ax/2 etc.), under which
minimum-image vectors can be found by fractional-coordinate rounding plus
(for very skewed boxes) a small set of extra trial shifts.

All functions are pure, shape-static and jit-safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def is_rectangular(box: jnp.ndarray) -> jnp.ndarray:
    off = box[1, 0] ** 2 + box[2, 0] ** 2 + box[2, 1] ** 2
    return off == 0.0


def pbc_dx(dx: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """Minimum-image displacement for a (possibly triclinic) GROMACS box.

    dx: (..., 3) raw displacement x_i - x_j.  Returns wrapped displacement.

    Triclinic wrap follows pbc_dx_aiuc (pbc.cpp): subtract box rows in the
    order c, b, a using rounded fractional coordinates.  For boxes obeying
    the GROMACS restrictions this yields the minimum image for all
    distances below half the smallest box extent, which is what the cutoff
    machinery guarantees.
    """
    # Work in fractional space: box is lower triangular so solve back-to-front.
    shift_z = jnp.round(dx[..., 2] / box[2, 2])
    dx = dx - shift_z[..., None] * box[2]
    shift_y = jnp.round(dx[..., 1] / box[1, 1])
    dx = dx - shift_y[..., None] * box[1]
    shift_x = jnp.round(dx[..., 0] / box[0, 0])
    dx = dx - shift_x[..., None] * box[0]
    return dx


def pbc_dx_rect(dx: jnp.ndarray, box_diag: jnp.ndarray) -> jnp.ndarray:
    """Rectangular-box fast path; box_diag: (3,)."""
    return dx - jnp.round(dx / box_diag) * box_diag


def wrap_into_box(x: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """Put atoms into the primary triclinic cell [0, box)."""
    s = jnp.floor(x[..., 2] / box[2, 2])
    x = x - s[..., None] * box[2]
    s = jnp.floor(x[..., 1] / box[1, 1])
    x = x - s[..., None] * box[1]
    s = jnp.floor(x[..., 0] / box[0, 0])
    x = x - s[..., None] * box[0]
    return x


def wrap_frac_cell(x: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """Wrap atoms into the FRACTIONAL unit cell (s in [0,1) per box
    vector), recomposed elementwise off the box rows.  Identical to
    wrap_into_box for rectangular boxes; for triclinic cells this is the
    frame in which fractionally-compact atom groups are also
    Cartesian-compact — wrap_into_box's Cartesian brick splits them
    across lattice images, which breaks any machinery that assumes one
    shared periodic image per compact group (the baked-shift pair
    lists)."""
    f = frac_coords(x, box)
    f = f - jnp.floor(f)
    return (f[..., 0:1] * box[0] + f[..., 1:2] * box[1]
            + f[..., 2:3] * box[2])


def frac_coords(x: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """Fractional coordinates s with x = s @ box, by exact elementwise
    back-substitution off the lower-triangular box (x: (..., 3)).

    NOT `x @ inv3(box)`: on TPU that matmul runs on the MXU at bf16 input
    precision by default, and downstream floor()/round() of the result
    (image counts, cell assignment, periodic shifts) then misclassifies
    boundary atoms by whole box lengths — elementwise VPU math stays f32.
    Works for displacements too (the map is linear)."""
    s2 = x[..., 2] / box[2, 2]
    s1 = (x[..., 1] - s2 * box[2, 1]) / box[1, 1]
    s0 = (x[..., 0] - s1 * box[1, 0] - s2 * box[2, 0]) / box[0, 0]
    return jnp.stack([s0, s1, s2], axis=-1)


def box_volume(box: jnp.ndarray) -> jnp.ndarray:
    return box[0, 0] * box[1, 1] * box[2, 2]


def inv3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 inverse (adjugate / det).

    jnp.linalg.inv lowers to an LuDecomposition custom call on TPU —
    f64-unsupported and far more expensive than nine fused multiplies
    for the box matrices used here."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    A = e * i - f * h
    B = f * g - d * i
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = jnp.stack([
        jnp.stack([A, c * h - b * i, b * f - c * e]),
        jnp.stack([B, a * i - c * g, c * d - a * f]),
        jnp.stack([C, b * g - a * h, a * e - b * d]),
    ])
    return adj / det


def make_box(lx: float, ly: float, lz: float) -> jnp.ndarray:
    return jnp.diag(jnp.array([lx, ly, lz], dtype=jnp.float32))


def min_box_extent(box: jnp.ndarray) -> jnp.ndarray:
    """Conservative half-min-image bound (diagonal elements dominate under
    GROMACS box restrictions)."""
    return jnp.min(jnp.diag(box))
