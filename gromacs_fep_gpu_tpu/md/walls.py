"""Flat LJ walls perpendicular to z.

Reference: src/gromacs/mdlib/wall.cpp do_walls — one wall at z=0 and
(nwall=2) one at z=box_zz, each made of a pseudo atom type.  Per atom i
of type t against wall w with (c6, c12) = nbfp[wall_type_w, t]:

  9-3:  V = rho*pi/45 * c12 / r^9 - rho*pi/6 * c6 / r^3   (integrated
        half-space of LJ sites at number density rho, wall.cpp:195-197)
  10-4: V = rho*pi/5  * c12 / r^10 - rho*pi/2 * c6 / r^4  (single layer)
  12-6: plain LJ on the z distance (wall.cpp:297-304)

r < wall-r-linpot evaluates at r_linpot and continues linearly
(V += (r_linpot - r) * F, wall.cpp:257-262,309-312) so equilibration
can't blow up; perturbed atoms are handled with the (1-lambda)/lambda
two-state loop and dvdl = V_B - V_A (wall.cpp:211-233,326-330).

The energy is a differentiable function of (x, box, lambda_vdw): forces
come from AD like every other special force, and the z-box dependence
of the upper wall gives the correct virial through the strain gradient.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class WallParams:
    """mdp wall keys (reference: readir.cpp read_wall_params)."""
    nwall: int = 1                       # 1 or 2
    wall_type: str = "9-3"               # 9-3 | 10-4 | 12-6
    atomtype: Tuple[int, ...] = (0,)     # per-wall pseudo atom type index
    density: Tuple[float, ...] = (0.0,)  # nm^-3 (9-3) or nm^-2 (10-4)
    r_linpot: float = -1.0               # nm; <0 disables (error on r<=0)


_FAC = {
    # (fac_d multiplier, fac_r multiplier, dispersion power, rep power)
    "9-3": (math.pi / 6.0, math.pi / 45.0, 3, 9),
    "10-4": (math.pi / 2.0, math.pi / 5.0, 4, 10),
    "12-6": (1.0, 1.0, 6, 12),
}


def _wall_v_f(r, c6, c12, p: WallParams, w: int):
    """(V, F) with F the force magnitude along +r (wall.cpp switch)."""
    fd, fr, pd, pr = _FAC[p.wall_type]
    if p.wall_type == "12-6":
        fac_d, fac_r = 1.0, 1.0
    else:
        fac_d, fac_r = fd * p.density[w], fr * p.density[w]
    # linear continuation below r_linpot (wall.cpp:257-262); without
    # linpot the reference errors on r<=0 — here a tiny floor keeps the
    # jitted program finite (the energy blowup still signals the crash)
    floor = p.r_linpot if p.r_linpot > 0 else 1e-3
    r_eval = jnp.maximum(r, floor)
    mr = r_eval - r
    r1 = 1.0 / r_eval
    vd = fac_d * c6 * r1 ** pd
    vr = fac_r * c12 * r1 ** pr
    v = vr - vd
    f = (pr * vr - pd * vd) * r1
    return v + mr * f, f


def wall_energy(x, box, type_a, type_b, nbfp, p: WallParams,
                lam_vdw, perturbed: Optional[bool] = None) -> jnp.ndarray:
    """Total wall potential (differentiable in x, box, lam_vdw).

    nbfp: (T, T, 2) c6/c12 table; walls use row p.atomtype[w]
    (wall.cpp:243-245 reads the same fr.nbfp the pair kernels use).
    perturbed must be passed as a static bool when the type arrays are
    traced (inside jit); None means decide from the concrete arrays."""
    import numpy as _np
    z = x[:, 2]
    e = jnp.zeros((), x.dtype)
    if perturbed is None:
        perturbed = bool(_np.any(_np.asarray(type_a)
                                 != _np.asarray(type_b)))
    lam_states = ((1.0 - lam_vdw, type_a), (lam_vdw, type_b)) \
        if perturbed else ((1.0, type_a),)
    for w in range(min(p.nwall, 2)):
        r = z if w == 0 else box[2, 2] - z
        for lamfac, types in lam_states:
            c6 = nbfp[p.atomtype[w], types, 0]
            c12 = nbfp[p.atomtype[w], types, 1]
            v, _ = _wall_v_f(r, c6, c12, p, w)
            # atoms with no wall interaction contribute nothing
            live = (c6 != 0.0) | (c12 != 0.0)
            e = e + lamfac * jnp.sum(jnp.where(live, v, 0.0))
    return e


def parse_walls(kv, type_index) -> Optional[WallParams]:
    """mdp wall keys -> WallParams (reference: readir.cpp
    read_wall_params; wall-atomtype names resolve through the topology
    type table via type_index: name -> int)."""
    nwall = int(kv.get("nwall", "0"))
    if nwall <= 0:
        return None
    if nwall > 2:
        raise ValueError("nwall must be 0, 1 or 2")
    wt = kv.get("wall-type", "9-3").strip().lower()
    if wt not in _FAC:
        raise ValueError(f"wall-type = {wt} unsupported (9-3/10-4/12-6)")
    at_names = kv.get("wall-atomtype", "").split()
    if len(at_names) < nwall:
        raise ValueError("wall-atomtype: need one type name per wall")
    try:
        atomtype = tuple(int(type_index[n]) for n in at_names[:nwall])
    except KeyError as e:
        raise ValueError(f"wall-atomtype {e} not in the topology") from None
    dens = [float(v) for v in kv.get("wall-density", "").split()]
    if wt != "12-6":
        if len(dens) < nwall:
            raise ValueError("wall-density: need one value per wall")
        if any(d <= 0 for d in dens[:nwall]):
            raise ValueError("wall-density must be > 0")
    dens += [0.0] * (2 - len(dens))
    return WallParams(nwall=nwall, wall_type=wt, atomtype=atomtype,
                      density=tuple(dens[:2]),
                      r_linpot=float(kv.get("wall-r-linpot", "-1")))
