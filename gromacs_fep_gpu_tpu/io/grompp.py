"""grompp-lite: assemble (System, MdParams, State) from mdp + top + gro.

This is the preprocessing front end tying together io/mdpio.py (readir
analogue), io/topio.py (topio/toppush analogue) and io/groio.py, applying
the grompp-level transforms in the reference order
(reference: src/gromacs/gmxpreprocess/grompp.cpp:1869 gmx_grompp):
couple-moltype conversion, h-bond constraint conversion, position-restraint
reference coordinates, PME grid determination (fft/calcgrid.cpp), and the
initial lambda vector (mdlib/freeenergyparameters.cpp).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.units import BOLTZ
from ..core.types import (CoulombType, FepCoupling, MdParams, State, System,
                          make_state)
from .groio import read_gro
from .mdpio import mdp_extras, mdp_to_params
from .topio import parse_top, system_from_top

# fft/calcgrid.cpp grid-size tables
_GRID_INIT = [6, 8, 10, 12, 14, 16, 20, 24, 25, 28, 32, 36, 40, 42, 44]
_GRID_BASE = [45, 48, 50, 52, 54, 56, 60, 64, 70, 72, 75, 80, 81, 84]


def gromacs_fft_dim(nmin: int) -> int:
    """Smallest GROMACS-approved FFT size >= nmin
    (reference: fft/calcgrid.cpp:100-152 calcFftGrid)."""
    if _GRID_INIT[-1] >= nmin:
        for g in _GRID_INIT:
            if g >= nmin:
                return g
    fac2 = 1
    while fac2 * _GRID_BASE[-1] < nmin:
        fac2 *= 2
    best = None
    for base in reversed(_GRID_BASE):
        attempt = fac2 * base
        if ((attempt % 4 == 0 and attempt != 140) or attempt == 90) \
                and attempt >= nmin:
            best = attempt
    return best if best is not None else fac2 * _GRID_BASE[-1]


def gromacs_pme_grid(box: np.ndarray, spacing: float, pme_order: int = 4
                     ) -> Tuple[int, int, int]:
    """PME grid dims exactly as grompp computes them
    (reference: grompp.cpp:2518 calcFftGrid with minimalPmeGridSize,
    ewald/pme.cpp:457: min = 2*(order-1); spacing measured along the box
    VECTORS, not the cartesian axes)."""
    min_size = 2 * (pme_order - 1)
    dims = []
    for d in range(3):
        length = float(np.linalg.norm(box[d]))
        nmin = max(int(length / spacing + 0.999), min_size)
        dims.append(gromacs_fft_dim(nmin))
    return tuple(dims)


def initial_lambda_vector(fep, all_lambda: Optional[np.ndarray]
                          ) -> np.ndarray:
    """(7,) lambda vector at step 0
    (reference: mdlib/freeenergyparameters.cpp currentGlobalLambda +
    interpolatedLambdas)."""
    n = 0 if all_lambda is None else all_lambda.shape[1]
    if fep.init_lambda_state > -1:
        g = (fep.init_lambda_state / (n - 1)) if n > 1 else 0.0
    elif fep.init_lambda > -1:
        g = fep.init_lambda
    else:
        g = 0.0
    g = max(g, 0.0)
    if n == 0:
        return np.full((int(FepCoupling.COUNT),), g, np.float64)
    gc = min(g, 1.0)
    left = int(math.floor(gc * (n - 1)))
    right = left if left == n - 1 else left + 1
    frac = gc * (n - 1) - left
    return (all_lambda[:, left]
            + frac * (all_lambda[:, right] - all_lambda[:, left]))


@dataclasses.dataclass
class Preprocessed:
    """The tpr analogue: everything mdrun needs."""
    system: System
    params: MdParams
    state: State
    all_lambda: Optional[np.ndarray]
    separate_dvdl: List[bool]
    extras: Dict[str, object]
    atom_names: List[str]
    res_names: List[str]


def preprocess(mdp_text: str, top_text: str, gro_path: str,
               include_dirs: Optional[List[str]] = None,
               seed: int = 1993) -> Preprocessed:
    """The gmx_grompp analogue (in-memory tpr)."""
    names, resnames, x, v, box = read_gro(gro_path)
    return preprocess_arrays(mdp_text, top_text, names, resnames, x, v, box,
                             include_dirs, seed)


def preprocess_arrays(mdp_text: str, top_text: str, names, resnames,
                      x: np.ndarray, v: Optional[np.ndarray], box: np.ndarray,
                      include_dirs: Optional[List[str]] = None,
                      seed: int = 1993,
                      couple_moltype_override: Optional[str] = None,
                      ndx_text: Optional[str] = None,
                      posres_x: Optional[np.ndarray] = None
                      ) -> Preprocessed:
    # index groups: user .ndx sections + the automatic defaults
    # (reference: topology/index.cpp analyse / do_index)
    from .ndxio import default_groups, parse_ndx
    ndx = default_groups(names, resnames) if len(names) else {}
    if ndx_text:
        ndx.update(parse_ndx(ndx_text))
    params, all_lambda = mdp_to_params(mdp_text, ndx)
    extras = mdp_extras(mdp_text)
    if couple_moltype_override:
        extras["couple_moltype"] = couple_moltype_override
    # mdp `include =` dirs extend the caller's search path
    include_dirs = list(include_dirs or []) + list(extras["include_dirs"])

    system = system_from_top(
        top_text, include_dirs=include_dirs,
        couple_moltype=extras["couple_moltype"],
        couple_lam0=extras["couple_lam0"],
        couple_lam1=extras["couple_lam1"],
        couple_intramol=extras["couple_intramol"],
        constraints=extras["constraints"],
        defines=extras["defines"],
        epsilon_r=params.epsilon_r)
    if system.n_atoms != x.shape[0]:
        raise ValueError(f"topology has {system.n_atoms} atoms, "
                         f"coordinates {x.shape[0]}")

    # flat LJ walls: wall-atomtype names resolve through the topology's
    # type table (reference: readir.cpp read_wall_params + do_wall_params)
    from .mdpio import parse_mdp
    kv_walls = parse_mdp(mdp_text)
    if int(kv_walls.get("nwall", "0").split()[0] or 0) > 0:
        from ..md.walls import parse_walls
        from .topio import parse_top as _parse_top
        parsed_top = _parse_top(top_text, include_dirs, extras["defines"])
        tindex = {n: at.index for n, at in parsed_top.atomtypes.items()}
        params = params.replace(walls=parse_walls(kv_walls, tindex))

    # energy groups (reference: readir.cpp do_egp_flag / energygrps):
    # names resolve through the index groups; honored by mdrun -rerun
    eg_names = kv_walls.get("energygrps", "").split()
    if eg_names:
        from .ndxio import resolve_group
        egs = tuple(
            (nm, tuple(int(i) for i in
                       resolve_group(nm, ndx, system.n_atoms)))
            for nm in eg_names)
        params = params.replace(energygrps=egs)

    # position-restraint reference coordinates: grompp -r file when
    # given, else the input conformation
    # (reference: gmxpreprocess/grompp.cpp gen_posres / -r option)
    xr = x if posres_x is None else np.asarray(posres_x)
    if posres_x is not None and xr.shape[0] != system.n_atoms:
        raise ValueError(f"posres reference has {xr.shape[0]} atoms, "
                         f"topology {system.n_atoms}")
    if "posres" in system.bonded:
        import jax.numpy as jnp
        il = system.bonded["posres"]
        ai = np.asarray(il.atoms[:, 0])
        pa = np.asarray(il.params_a).copy()
        pb = np.asarray(il.params_b).copy()
        pa[:, 0:3] = xr[ai]
        pb[:, 0:3] = xr[ai]
        system.bonded["posres"] = il.replace(params_a=jnp.asarray(pa),
                                             params_b=jnp.asarray(pb))
    if "fbposres" in system.bonded:
        import jax.numpy as jnp
        il = system.bonded["fbposres"]
        ai = np.asarray(il.atoms[:, 0])
        pa = np.asarray(il.params_a).copy()
        pa[:, 1:4] = xr[ai]
        system.bonded["fbposres"] = il.replace(params_a=jnp.asarray(pa),
                                               params_b=jnp.asarray(pa))

    if system.orires is not None:
        # reference orientation from the start structure
        # (reference: orires.cpp init_orires)
        from ..ops.orires import fill_orires_xref
        system = fill_orires_xref(system, x)

    if ((params.coulomb == CoulombType.PME or params.vdw_type == "pme")
            and params.pme_grid is None):
        params = params.replace(
            pme_grid=gromacs_pme_grid(box, params.fourier_spacing,
                                      params.pme_order))

    if extras.get("gen_vel"):
        # Maxwell-Boltzmann start velocities at gen-temp, COM-stopped and
        # rescaled to the exact target temperature (reference:
        # gmxpreprocess/grompp.cpp maxwell_speed/low_mspeed + stopcm_gr)
        gseed = int(extras.get("gen_seed", -1))
        if gseed < 0:
            gseed = seed
        rng = np.random.default_rng(gseed & 0x7FFFFFFF)
        masses = np.asarray(system.mass_a, np.float64)
        has_m = masses > 0
        kT = BOLTZ * float(extras.get("gen_temp", 300.0))
        sd = np.sqrt(kT / np.where(has_m, masses, 1.0))[:, None]
        v = np.where(has_m[:, None],
                     rng.normal(size=(system.n_atoms, 3)) * sd, 0.0)
        v -= (masses[:, None] * v).sum(0) / masses.sum()
        ndf = 3 * int(has_m.sum()) - 3
        t_cur = (masses[:, None] * v * v).sum() / (ndf * BOLTZ)
        v *= np.sqrt(float(extras.get("gen_temp", 300.0))
                     / max(t_cur, 1e-12))
        v = v.astype(np.float32)

    lam0 = initial_lambda_vector(params.fep, all_lambda)
    fep_state = max(params.fep.init_lambda_state, 0)
    state = make_state(x, v, box, lam=lam0.astype(np.float32),
                       fep_state=fep_state, seed=seed)
    return Preprocessed(system=system, params=params, state=state,
                        all_lambda=all_lambda,
                        separate_dvdl=extras["separate_dvdl"],
                        extras=extras, atom_names=list(names),
                        res_names=list(resnames))
