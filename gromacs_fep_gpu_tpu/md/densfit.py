"""Density-guided simulation (cryo-EM density fitting).

Reference: src/gromacs/applied_forces/densityfitting/
densityfittingforceprovider.cpp:255 (calculateForces: pbc-image pick,
lattice transform, Gaussian spread, similarity gradient, chain rule,
k * nst scaling, F_DENSITYFITTING energy, adaptive force scaling),
src/gromacs/math/densityfit.cpp (the three similarity measures),
src/gromacs/math/gausstransform.cpp:150 (normalized separable Gaussian),
src/gromacs/math/exponentialmovingaverage.cpp (EMA for adaptive scaling).

TPU-first redesign: the spread is a fixed-window differentiable
scatter-add and the force is the exact AD gradient of
E = -k * similarity(spread(x)) — identical math to the reference's
hand-derived force (densityfittingforce.cpp evaluateForce), but one
fused XLA program with no per-atom host loop.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

SIMILARITY_MEASURES = ("inner-product", "relative-entropy",
                       "cross-correlation")
AMPLITUDE_METHODS = ("unity", "mass", "charge")


@dataclasses.dataclass(frozen=True)
class DensfitParams:
    """Static density-guided-simulation options (mdp keys
    `density-guided-simulation-*`, densityfittingoptions.h:108-141)."""
    group: Optional[Tuple[int, ...]] = None   # atom indices; None = all
    similarity_measure: str = "inner-product"
    amplitude_method: str = "unity"
    force_constant: float = 1e9
    sigma: float = 0.2                        # spreading width, nm
    n_sigma: float = 4.0                      # spread range in sigmas
    nst: int = 1                              # apply every N steps
    normalize: bool = False
    adaptive_scaling: bool = False
    adaptive_tau_ps: float = 4.0
    shift_vector: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    transformation_matrix: Optional[Tuple[float, ...]] = None  # 9 floats
    reference_density: str = ""               # .mrc path (grompp-time)


@struct.dataclass
class DensfitState:
    """Per-run density-fitting state (checkpointed; reference:
    DensityFittingForceProviderState)."""
    adaptive_scale: jnp.ndarray     # () adaptive force-constant scale
    ema_weighted_sum: jnp.ndarray   # () EMA numerator
    ema_weighted_count: jnp.ndarray  # () EMA denominator

    @staticmethod
    def init() -> "DensfitState":
        return DensfitState(adaptive_scale=jnp.asarray(1.0, jnp.float32),
                            ema_weighted_sum=jnp.zeros((), jnp.float32),
                            ema_weighted_count=jnp.zeros((), jnp.float32))


# ---------------------------------------------------------------------------
# Similarity measures (densityfit.cpp:75-330)
# ---------------------------------------------------------------------------

def similarity_inner_product(ref, comp):
    """S = sum(ref * comp) / n_voxels (DensitySimilarityInnerProduct)."""
    return jnp.sum(ref * comp) / ref.size


def similarity_relative_entropy(ref, comp):
    """S = sum over voxels with ref>0 and comp>0 of ref*log(comp/ref)
    (relativeEntropyAtVoxel, densityfit.cpp:144-152)."""
    ok = (ref > 0) & (comp > 0)
    safe_c = jnp.where(ok, comp, 1.0)
    safe_r = jnp.where(ok, ref, 1.0)
    return jnp.sum(jnp.where(ok, ref * jnp.log(safe_c / safe_r), 0.0))


def similarity_cross_correlation(ref, comp):
    """Pearson correlation coefficient of the two voxel sets
    (DensitySimilarityCrossCorrelation)."""
    rm = ref - jnp.mean(ref)
    cm = comp - jnp.mean(comp)
    cov = jnp.sum(rm * cm)
    return cov / jnp.sqrt(jnp.sum(rm * rm) * jnp.sum(cm * cm))


_MEASURES = {
    "inner-product": similarity_inner_product,
    "relative-entropy": similarity_relative_entropy,
    "cross-correlation": similarity_cross_correlation,
}


def similarity(measure: str, ref, comp):
    return _MEASURES[measure](ref, comp)


def similarity_gradient(measure: str, ref, comp):
    """dS/d(comp), matching densityfit.cpp gradient() conventions (the
    relative-entropy/cross-correlation gradients zero out voxels the
    measure ignores — AD through the jnp.where above does the same)."""
    return jax.grad(lambda c: _MEASURES[measure](ref, c))(comp)


# ---------------------------------------------------------------------------
# Gaussian spread (gausstransform.cpp GaussTransform3D)
# ---------------------------------------------------------------------------

def spread_range(sigma_lat, n_sigma) -> Tuple[int, int, int]:
    """ceil(sigma * nSigma) lattice points per axis
    (gausstransform.cpp:296 latticeSpreadRange)."""
    return tuple(int(math.ceil(float(s) * float(n_sigma)))
                 for s in np.asarray(sigma_lat))


def spread_gaussian(x_lat, amplitudes, grid_shape_xyz, sigma_lat,
                    range_xyz):
    """Sum of normalized 3D Gaussians on the lattice -> (nz, ny, nx) grid.

    Per atom: closest lattice point c = round(x); weights over the window
    |i - c| <= range are amplitude * prod_d exp(-0.5*((i_d - x_d)/s_d)^2)
    / (s_d * sqrt(2 pi)) (gausstransform.cpp:150); windows clipped at the
    lattice edge contribute nothing outside (spreadRangeWithinLattice).
    """
    nx, ny, nz = grid_shape_xyz
    sig = jnp.asarray(sigma_lat, x_lat.dtype)
    closest = jnp.round(x_lat).astype(jnp.int32)          # (N, 3)

    def axis_w(d, r):
        off = jnp.arange(-r, r + 1, dtype=jnp.int32)      # (2r+1,)
        idx = closest[:, d, None] + off[None, :]          # (N, W)
        dx = idx.astype(x_lat.dtype) - x_lat[:, d, None]
        w = jnp.exp(-0.5 * (dx / sig[d]) ** 2) / (
            sig[d] * jnp.sqrt(2.0 * jnp.pi))
        n_d = (nx, ny, nz)[d]
        ok = (idx >= 0) & (idx < n_d)
        return jnp.where(ok, w, 0.0), jnp.clip(idx, 0, n_d - 1)

    wx, ix = axis_w(0, range_xyz[0])
    wy, iy = axis_w(1, range_xyz[1])
    wz, iz = axis_w(2, range_xyz[2])
    # (N, Wz, Wy, Wx) separable weights, amplitude folded into x
    w3 = (amplitudes[:, None] * wx)[:, None, None, :] \
        * wy[:, None, :, None] * wz[:, :, None, None]
    flat_idx = (iz[:, :, None, None] * (ny * nx)
                + iy[:, None, :, None] * nx
                + ix[:, None, None, :])
    grid = jnp.zeros((nz * ny * nx,), x_lat.dtype)
    grid = grid.at[flat_idx.reshape(-1)].add(w3.reshape(-1))
    return grid.reshape(nz, ny, nx)


# ---------------------------------------------------------------------------
# Force provider
# ---------------------------------------------------------------------------

def normalize_positive_sum(ref: np.ndarray) -> np.ndarray:
    """normalizeSumPositiveValuesToUnity (densityfitting.cpp:167)."""
    s = float(np.sum(ref[ref > 0]))
    return ref / s if s != 0.0 else ref


def make_densfit_force_fn(p: DensfitParams, ref_density: np.ndarray,
                          lattice_scale, lattice_translation,
                          mass_a, charge_a, dt: float):
    """Returns densfit(x, box, dstate) -> (force, energy, similarity,
    dstate_next).

    ref_density: (nz, ny, nx) voxels; lattice_scale/translation per
    MrcMap.lattice_transform (x_lat = scale * (x + translation)).
    The per-call force uses the effective constant
    adaptive_scale * nst * k (densityfittingforceprovider.cpp:366) and
    the reported energy is -S * k * adaptive_scale (:377-380).
    """
    ref = np.asarray(ref_density, np.float32)
    if p.normalize:
        ref = normalize_positive_sum(ref)
    ref_j = jnp.asarray(ref)
    nz, ny, nx = ref.shape
    scale = jnp.asarray(lattice_scale, jnp.float32)
    trans = jnp.asarray(lattice_translation, jnp.float32)
    sigma_lat = np.asarray(lattice_scale, np.float64) * p.sigma
    rng_xyz = spread_range(sigma_lat, p.n_sigma)
    sigma_lat = jnp.asarray(sigma_lat, jnp.float32)
    n_all = np.asarray(mass_a).shape[0]
    idx = (np.arange(n_all, dtype=np.int32) if p.group is None
           else np.asarray(p.group, np.int32))
    amp_np = {"unity": np.ones(idx.shape[0], np.float32),
              "mass": np.asarray(mass_a, np.float32)[idx],
              "charge": np.asarray(charge_a, np.float32)[idx],
              }[p.amplitude_method]
    if p.normalize:
        amp_np = amp_np / float(np.sum(amp_np))
    amp = jnp.asarray(amp_np)
    idx_j = jnp.asarray(idx)
    shift = jnp.asarray(p.shift_vector, jnp.float32)
    tmat = (jnp.asarray(p.transformation_matrix,
                        jnp.float32).reshape(3, 3)
            if p.transformation_matrix is not None else None)
    # reference-density center in pre-lattice coordinates, for picking
    # the periodic image (densityfittingforceprovider.cpp:243-252)
    center_lat = jnp.asarray([nx / 2.0, ny / 2.0, nz / 2.0], jnp.float32)
    center = center_lat / scale - trans
    inv_tau = (dt * p.nst) / p.adaptive_tau_ps  # EMA inverse time constant

    from ..core.pbc import pbc_dx

    def sim_of_x(x, box):
        xg = x[idx_j]
        if tmat is not None:
            xg = xg @ tmat.T
        xg = xg + shift
        # closest periodic image to the density center
        xg = center + pbc_dx(xg - center, box)
        x_lat = scale * (xg + trans)
        comp = spread_gaussian(x_lat, amp, (nx, ny, nz), sigma_lat,
                               rng_xyz)
        return similarity(p.similarity_measure, ref_j, comp)

    def densfit(x, box, dstate: DensfitState):
        s_val, g = jax.value_and_grad(sim_of_x)(x, box)
        k_eff = dstate.adaptive_scale * p.nst * p.force_constant
        force = k_eff * g                  # F = +k dS/dx (E = -k S)
        energy = -s_val * p.force_constant * dstate.adaptive_scale
        # adaptive force scaling via EMA of the similarity
        # (densityfittingforceprovider.cpp:383-396)
        if p.adaptive_scaling:
            wsum = s_val + (1.0 - inv_tau) * dstate.ema_weighted_sum
            wcnt = 1.0 + (1.0 - inv_tau) * dstate.ema_weighted_count
            increasing = s_val * wcnt > wsum
            new_scale = jnp.where(
                increasing,
                dstate.adaptive_scale / (1.0 + inv_tau),
                dstate.adaptive_scale * (1.0 + 2.0 * inv_tau))
            dstate = DensfitState(adaptive_scale=new_scale,
                                  ema_weighted_sum=wsum,
                                  ema_weighted_count=wcnt)
        return force, energy, s_val, dstate

    return densfit


def parse_densfit(kv, ndx=None) -> Optional[DensfitParams]:
    """mdp `density-guided-simulation-*` keys
    (densityfittingoptions.h:108-141).  The group is an index-file name
    (with ndx given) or inline 1-based atom indices; missing or
    'system' means all atoms."""
    pre = "density-guided-simulation-"
    if kv.get(pre + "active", "no").lower() not in ("yes", "true"):
        return None
    grp = kv.get(pre + "group", "system").strip()
    group = None
    if grp.lower() not in ("system", ""):
        if ndx and grp in ndx:
            group = tuple(int(i) for i in ndx[grp])
        else:
            group = tuple(int(v) - 1 for v in grp.split())
    meas = kv.get(pre + "similarity-measure", "inner-product").lower()
    if meas not in SIMILARITY_MEASURES:
        raise ValueError(f"{pre}similarity-measure = {meas}")
    ampm = kv.get(pre + "atom-spreading-weight", "unity").lower()
    if ampm not in AMPLITUDE_METHODS:
        raise ValueError(f"{pre}atom-spreading-weight = {ampm}")
    tm = kv.get(pre + "transformation-matrix", "").split()
    sv = kv.get(pre + "shift-vector", "").split()
    return DensfitParams(
        group=group,
        similarity_measure=meas,
        amplitude_method=ampm,
        force_constant=float(kv.get(pre + "force-constant", "1e9")),
        sigma=float(kv.get(
            pre + "gaussian-transform-spreading-width", "0.2")),
        n_sigma=float(kv.get(
            pre + "gaussian-transform-spreading-range-in-multiples-of-width",
            "4")),
        nst=int(kv.get(pre + "nst", "1")),
        normalize=kv.get(pre + "normalize-densities",
                         "true").lower() in ("yes", "true"),
        adaptive_scaling=kv.get(pre + "adaptive-force-scaling",
                                "no").lower() in ("yes", "true"),
        adaptive_tau_ps=float(kv.get(
            pre + "adaptive-force-scaling-time-constant", "4")),
        shift_vector=(tuple(float(v) for v in sv) if len(sv) == 3
                      else (0.0, 0.0, 0.0)),
        transformation_matrix=(tuple(float(v) for v in tm)
                               if len(tm) == 9 else None),
        reference_density=kv.get(pre + "reference-density-filename",
                                 "reference.mrc"),
    )
