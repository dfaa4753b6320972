"""Bonded (listed) interaction energies with FEP A/B interpolation.

TPU-native counterpart of the reference's listed-forces kernels
(reference: src/gromacs/listed_forces/bonded.cpp and the fork's fused GPU
kernel listed_forces_gpu_internal.cu:779-1365 *_fep_gpu variants).

Each term is an energy-only function of (x, box, lambda_bonded); parameters
are interpolated k = (1-l) kA + l kB so that jax.grad w.r.t. lambda yields
exactly the reference's dvdl = 0.5 (kB-kA) dx^2 + (x0A-x0B) k dx form
(reference: bonded.cpp harmonic()).

All lists are padded; `mask` zeroes padding rows.  Geometry uses
minimum-image displacements so bonded terms are correct across PBC.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import pbc as pbc_mod
from ..core.types import InteractionList
from ..core.units import DEG2RAD


def _interp(pa, pb, lam):
    return (1.0 - lam) * pa + lam * pb


def _bond_vec(x, box, i, j):
    return pbc_mod.pbc_dx(x[i] - x[j], box)


def bond_energy(x, box, il: InteractionList, lam) -> jnp.ndarray:
    """Harmonic bonds: V = 1/2 k (r - b0)^2 (reference: bonded.cpp bonds())."""
    if il.n == 0:
        return jnp.zeros((), x.dtype)
    ai, aj = il.atoms[:, 0], il.atoms[:, 1]
    p = _interp(il.params_a, il.params_b, lam)
    b0, kb = p[:, 0], p[:, 1]
    dx = _bond_vec(x, box, ai, aj)
    r = jnp.sqrt(jnp.sum(dx * dx, -1) + 1e-32)
    dr = r - b0
    return jnp.sum(il.mask * 0.5 * kb * dr * dr)


def angle_energy(x, box, il: InteractionList, lam) -> jnp.ndarray:
    """Harmonic angles: V = 1/2 k (th - th0)^2, th0 stored in degrees
    (reference: bonded.cpp angles())."""
    if il.n == 0:
        return jnp.zeros((), x.dtype)
    ai, aj, ak = il.atoms[:, 0], il.atoms[:, 1], il.atoms[:, 2]
    p = _interp(il.params_a, il.params_b, lam)
    th0, kth = p[:, 0] * DEG2RAD, p[:, 1]
    rij = _bond_vec(x, box, ai, aj)
    rkj = _bond_vec(x, box, ak, aj)
    cos_th = jnp.sum(rij * rkj, -1) * jax.lax.rsqrt(
        jnp.sum(rij * rij, -1) * jnp.sum(rkj * rkj, -1) + 1e-32)
    th = jnp.arccos(jnp.clip(cos_th, -1.0 + 1e-7, 1.0 - 1e-7))
    d = th - th0
    return jnp.sum(il.mask * 0.5 * kth * d * d)


def ub_energy(x, box, il: InteractionList, lam) -> jnp.ndarray:
    """Urey-Bradley: harmonic angle + harmonic 1-3 distance
    (params: th0(deg), kth, r13, kub) (reference: bonded.cpp urey_bradley())."""
    if il.n == 0:
        return jnp.zeros((), x.dtype)
    e_ang = angle_energy(x, box, il, lam)
    ai, ak = il.atoms[:, 0], il.atoms[:, 2]
    p = _interp(il.params_a, il.params_b, lam)
    r13, kub = p[:, 2], p[:, 3]
    dx = _bond_vec(x, box, ai, ak)
    r = jnp.sqrt(jnp.sum(dx * dx, -1) + 1e-32)
    dr = r - r13
    return e_ang + jnp.sum(il.mask * 0.5 * kub * dr * dr)


def dihedral_angle(x, box, atoms):
    """Signed dihedral phi for (n,4) index rows
    (reference: bonded.cpp dih_angle())."""
    ai, aj, ak, al = atoms[:, 0], atoms[:, 1], atoms[:, 2], atoms[:, 3]
    rij = _bond_vec(x, box, ai, aj)
    rkj = _bond_vec(x, box, ak, aj)
    rkl = _bond_vec(x, box, ak, al)
    m = jnp.cross(rij, rkj)
    n = jnp.cross(rkj, rkl)
    w = jnp.cross(m, n)
    wlen = jnp.sqrt(jnp.sum(w * w, -1) + 1e-32)
    s = jnp.sum(m * n, -1)
    phi = jnp.arctan2(wlen, s)
    ipr = jnp.sum(rij * n, -1)
    sign = jnp.where(ipr < 0.0, -1.0, 1.0)
    return sign * phi


def pdih_energy(x, box, il: InteractionList, lam) -> jnp.ndarray:
    """Proper dihedrals: V = k (1 + cos(mult*phi - phi0)), phi0 in degrees
    (reference: bonded.cpp pdihs()).  Multiplicity is not interpolated."""
    if il.n == 0:
        return jnp.zeros((), x.dtype)
    phi = dihedral_angle(x, box, il.atoms)
    phi0 = _interp(il.params_a[:, 0], il.params_b[:, 0], lam) * DEG2RAD
    kphi = _interp(il.params_a[:, 1], il.params_b[:, 1], lam)
    mult = il.params_a[:, 2]
    return jnp.sum(il.mask * kphi * (1.0 + jnp.cos(mult * phi - phi0)))


def rbdih_energy(x, box, il: InteractionList, lam) -> jnp.ndarray:
    """Ryckaert-Bellemans: V = sum_n C_n cos^n(psi), psi = phi - 180deg
    (reference: bonded.cpp rbdihs())."""
    if il.n == 0:
        return jnp.zeros((), x.dtype)
    phi = dihedral_angle(x, box, il.atoms)
    cos_psi = -jnp.cos(phi)  # cos(phi - pi)
    c = _interp(il.params_a, il.params_b, lam)  # (n, 6)
    pw = jnp.stack([cos_psi**k for k in range(c.shape[1])], axis=-1)
    return jnp.sum(il.mask * jnp.sum(c * pw, -1))


def idih_energy(x, box, il: InteractionList, lam) -> jnp.ndarray:
    """Harmonic (improper) dihedrals: V = 1/2 k dphi^2 with dphi wrapped to
    (-pi, pi] (reference: bonded.cpp idihs())."""
    if il.n == 0:
        return jnp.zeros((), x.dtype)
    phi = dihedral_angle(x, box, il.atoms)
    phi0 = _interp(il.params_a[:, 0], il.params_b[:, 0], lam) * DEG2RAD
    kphi = _interp(il.params_a[:, 1], il.params_b[:, 1], lam)
    dphi = phi - phi0
    dphi = dphi - 2.0 * jnp.pi * jnp.round(dphi / (2.0 * jnp.pi))
    return jnp.sum(il.mask * 0.5 * kphi * dphi * dphi)


def posres_energy(x, box, il: InteractionList, lam) -> jnp.ndarray:
    """Position restraints: V = 1/2 sum_d k_d (x_d - x0_d)^2.
    params: (x0, y0, z0, kx, ky, kz) per state (reference:
    listed_forces/position_restraints.cpp)."""
    if il.n == 0:
        return jnp.zeros((), x.dtype)
    ai = il.atoms[:, 0]
    p = _interp(il.params_a, il.params_b, lam)
    x0, k = p[:, 0:3], p[:, 3:6]
    dx = pbc_mod.pbc_dx(x[ai] - x0, box)
    return jnp.sum(il.mask * 0.5 * jnp.sum(k * dx * dx, -1))


def dihres_energy(x, box, il: InteractionList, lam) -> jnp.ndarray:
    """Flat-bottom dihedral restraints: V = 1/2 k max(|dphi| - dphi0, 0)^2
    with phi0/dphi0/k all lambda-interpolated
    (reference: listed_forces/bonded.cpp dihres())."""
    if il.n == 0:
        return jnp.zeros((), x.dtype)
    phi = dihedral_angle(x, box, il.atoms)
    p = _interp(il.params_a, il.params_b, lam)
    phi0, dphi0, kfac = p[:, 0] * DEG2RAD, p[:, 1] * DEG2RAD, p[:, 2]
    dp = phi - phi0
    dp = dp - 2.0 * jnp.pi * jnp.round(dp / (2.0 * jnp.pi))
    ddp = jnp.sign(dp) * jnp.maximum(jnp.abs(dp) - dphi0, 0.0)
    return jnp.sum(il.mask * 0.5 * kfac * ddp * ddp)


def angres_energy(x, box, il: InteractionList, lam) -> jnp.ndarray:
    """Angle restraints between vectors j-i and l-k:
    V = k (1 - cos(mult (theta - theta0))), theta0 in degrees
    (reference: bonded.cpp low_angres + dopdihs_min)."""
    if il.n == 0:
        return jnp.zeros((), x.dtype)
    ai, aj, ak, al = (il.atoms[:, 0], il.atoms[:, 1], il.atoms[:, 2],
                      il.atoms[:, 3])
    rij = _bond_vec(x, box, aj, ai)
    rkl = _bond_vec(x, box, al, ak)
    cos_th = jnp.sum(rij * rkl, -1) * jax.lax.rsqrt(
        jnp.sum(rij * rij, -1) * jnp.sum(rkl * rkl, -1) + 1e-32)
    th = jnp.arccos(jnp.clip(cos_th, -1.0 + 1e-7, 1.0 - 1e-7))
    th0 = _interp(il.params_a[:, 0], il.params_b[:, 0], lam) * DEG2RAD
    k = _interp(il.params_a[:, 1], il.params_b[:, 1], lam)
    mult = il.params_a[:, 2]
    return jnp.sum(il.mask * k * (1.0 - jnp.cos(mult * (th - th0))))


def restrbond_energy(x, box, il: InteractionList, lam) -> jnp.ndarray:
    """Flat-bottom restraint bonds (bonds funct 10): zero in [low, up1],
    harmonic outside, linear beyond up2; params (low, up1, up2, k) per
    state (reference: bonded.cpp restraint_bonds())."""
    if il.n == 0:
        return jnp.zeros((), x.dtype)
    ai, aj = il.atoms[:, 0], il.atoms[:, 1]
    p = _interp(il.params_a, il.params_b, lam)
    low, up1, up2, k = p[:, 0], p[:, 1], p[:, 2], p[:, 3]
    dx = _bond_vec(x, box, ai, aj)
    r = jnp.sqrt(jnp.sum(dx * dx, -1) + 1e-32)
    v_low = 0.5 * k * (r - low) ** 2
    v_up1 = 0.5 * k * (r - up1) ** 2
    # beyond up2 the potential continues linearly with slope k*(up2-up1)
    v_up2 = 0.5 * k * (up2 - up1) * (2.0 * r - up2 - up1)
    v = jnp.where(r < low, v_low,
                  jnp.where(r <= up1, 0.0,
                            jnp.where(r <= up2, v_up1, v_up2)))
    return jnp.sum(il.mask * v)


def fbposres_energy(x, box, il: InteractionList, lam) -> jnp.ndarray:
    """Flat-bottomed position restraints (reference:
    listed_forces/position_restraints.cpp fbposres + fbposres.h geoms).

    params per atom: (geom, x0, y0, z0, r, k); lambda-independent.
    geom 1 = sphere, 3/4/5 = x/y/z slab, 6/7/8 = cylinder around
    x/y/z; negative r inverts (restrain to OUTSIDE radius |r|)."""
    if il.n == 0:
        return jnp.zeros((), x.dtype)
    ai = il.atoms[:, 0]
    geom = il.params_a[:, 0].astype(jnp.int32)
    x0 = il.params_a[:, 1:4]
    r = il.params_a[:, 4]
    k = il.params_a[:, 5]
    dx = pbc_mod.pbc_dx(x[ai] - x0, box)

    def dist_for(g):
        if g == 1:                       # sphere
            return jnp.sqrt(jnp.sum(dx * dx, -1) + 1e-32)
        if g in (3, 4, 5):               # x/y/z slab
            return jnp.abs(dx[:, g - 3])
        # 6/7/8: cylinder around x/y/z -> in-plane distance
        a = g - 6
        idx = [d for d in range(3) if d != a]
        return jnp.sqrt(dx[:, idx[0]] ** 2 + dx[:, idx[1]] ** 2 + 1e-32)

    dr = dist_for(1)
    for g in (3, 4, 5, 6, 7, 8):
        dr = jnp.where(geom == g, dist_for(g), dr)
    inverted = r < 0.0
    rabs = jnp.abs(r)
    dev = jnp.where(inverted,
                    jnp.maximum(rabs - dr, 0.0),     # inside the shell
                    jnp.maximum(dr - rabs, 0.0))     # outside the bottom
    return jnp.sum(il.mask * 0.5 * k * dev * dev)


def disres_energy(x, box, il: InteractionList, lam,
                  fc: float = 1000.0) -> jnp.ndarray:
    """NMR distance restraints with instantaneous r^-3 averaging over the
    pairs sharing a label (reference: listed_forces/disre.cpp ta_disres,
    conservative disre-weighting — the force is the exact gradient of the
    averaged potential, which AD provides).

    params per pair: (lo, up1, up2, weight, label); labels were remapped
    to dense 0..n-1 ids at build time (core/topology.py).  V per label:
    0 in [lo, up1], harmonic 0.5 fc dr^2 outside up to up2, linear with
    matching slope beyond up2 (disre.cpp L_r flattening)."""
    if il.n == 0:
        return jnp.zeros((), x.dtype)
    ai, aj = il.atoms[:, 0], il.atoms[:, 1]
    p = _interp(il.params_a, il.params_b, lam)
    w = p[:, 3] * il.mask
    label = il.params_a[:, 4].astype(jnp.int32)
    n = il.n
    dx = _bond_vec(x, box, ai, aj)
    r2 = jnp.sum(dx * dx, -1) + 1e-32
    rm3 = r2 ** (-1.5)
    s3 = jax.ops.segment_sum(w * rm3, label, num_segments=n)
    sw = jax.ops.segment_sum(w, label, num_segments=n)
    valid = sw > 0.0
    rav = jnp.where(valid, s3 / jnp.maximum(sw, 1e-32), 1.0) ** (-1.0 / 3.0)
    # per-label bounds (identical across a label's pairs): masked max
    def seg_first(v):
        return jax.ops.segment_max(jnp.where(il.mask > 0, v, -1e30),
                                   label, num_segments=n)
    lo, up1, up2 = seg_first(p[:, 0]), seg_first(p[:, 1]), seg_first(p[:, 2])
    v_lo = 0.5 * fc * (rav - lo) ** 2
    v_up1 = 0.5 * fc * (rav - up1) ** 2
    v_lin = 0.5 * fc * (up2 - up1) * (2.0 * rav - up2 - up1)
    v = jnp.where(rav < lo, v_lo,
                  jnp.where(rav <= up1, 0.0,
                            jnp.where(rav <= up2, v_up1, v_lin)))
    return jnp.sum(jnp.where(valid, v, 0.0))


# term registry: name -> (arity k, n params p, energy fn)
TERMS = {
    "bonds": (2, 2, bond_energy),
    "angles": (3, 2, angle_energy),
    "ub": (3, 4, ub_energy),
    "pdihs": (4, 3, pdih_energy),
    "rbdihs": (4, 6, rbdih_energy),
    "idihs": (4, 2, idih_energy),
    "posres": (1, 6, posres_energy),
    "dihres": (4, 3, dihres_energy),
    "angres": (4, 3, angres_energy),
    "restrbonds": (2, 4, restrbond_energy),
    # disres takes an extra fc argument (mdp disre-fc); the force loops
    # special-case it
    "disres": (2, 5, disres_energy),
    "fbposres": (1, 6, fbposres_energy),
}

# energy-term channel each name accumulates into (EnergyTerms field)
TERM_CHANNEL = {
    "bonds": "bonds",
    "angles": "angles",
    "ub": "angles",
    "pdihs": "dihedrals",
    "rbdihs": "dihedrals",
    "idihs": "impropers",
    "posres": "restraints",
    "dihres": "restraints",
    "angres": "restraints",
    "restrbonds": "restraints",
    "disres": "restraints",
    "fbposres": "restraints",
}

# terms whose lambda dependence follows the RESTRAINT coupling component
# (reference: ifunc.h IF_RESTRAINT-flagged types route dvdl to
# FreeEnergyPerturbationCouplingType::Restraint)
RESTRAINT_TERMS = frozenset({"posres", "dihres", "angres", "restrbonds",
                             "disres", "fbposres"})
