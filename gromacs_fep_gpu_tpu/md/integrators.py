"""Integrators: leapfrog, velocity-Verlet halves, Langevin (SD), Brownian.

TPU-native counterparts of the reference's propagators
(reference: src/gromacs/mdlib/update.cpp:343 updateMDLeapfrogSimple,
doSDUpdateGeneral; fork's GPU Langevin mdlib/langevin_gpu_internal.cu).
Everything is a pure function of arrays; the RNG is a jax PRNG key folded
per step (the counter-based analogue of the reference's ThreeFry usage,
random/threefry.h).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.units import BOLTZ


def leapfrog(x, v, f, invmass, dt, scale_v: Optional[jnp.ndarray] = None):
    """One leapfrog step: v(t+dt/2) = s*v(t-dt/2) + f/m dt; x += v dt.

    scale_v: optional per-atom (or scalar) thermostat velocity scaling
    applied to the old velocity (reference fuses T-coupling the same way).
    """
    vnew = v if scale_v is None else v * scale_v
    vnew = vnew + f * invmass[:, None] * dt
    xnew = x + vnew * dt
    return xnew, vnew


def velocity_verlet_1(x, v, f, invmass, dt):
    """First VV half: v(t+dt/2) = v(t) + f/m dt/2; x += v(t+dt/2) dt."""
    vh = v + f * invmass[:, None] * (0.5 * dt)
    return x + vh * dt, vh


def velocity_verlet_2(v, f, invmass, dt):
    """Second VV half: v(t+dt) = v(t+dt/2) + f/m dt/2."""
    return v + f * invmass[:, None] * (0.5 * dt)


def langevin_sd(x, v, f, invmass, dt, tau_t, ref_t, key):
    """Leapfrog Langevin, impulse formulation (reference: update.cpp
    doSDUpdateGeneral; Goga et al. JCTC 2012):

        v' = v + f/m dt
        v'' = a v' + sqrt((1-a^2) kT/m) xi,   a = exp(-dt/tau_t)
        x'  = x + (v' + v'')/2 dt
    """
    a = jnp.exp(-dt / tau_t)
    v1 = v + f * invmass[:, None] * dt
    sd = jnp.sqrt((1.0 - a * a) * BOLTZ * ref_t * invmass)[:, None]
    xi = jax.random.normal(key, v.shape, v.dtype)
    v2 = a * v1 + sd * xi
    xnew = x + 0.5 * (v1 + v2) * dt
    return xnew, v2


def brownian_bd(x, f, invmass, dt, friction, ref_t, key):
    """Brownian dynamics: x' = x + f/(m gamma) dt + sqrt(2 kT dt/(m gamma)) xi
    (reference: update.cpp doUpdateBD; friction = m*gamma or bd-fric)."""
    inv_gamma_m = invmass / friction
    xi = jax.random.normal(key, x.shape, x.dtype)
    return (x + f * inv_gamma_m[:, None] * dt
            + jnp.sqrt(2.0 * BOLTZ * ref_t * dt * inv_gamma_m)[:, None] * xi)


def kinetic_energy(v, mass):
    return 0.5 * jnp.sum(mass[:, None] * v * v)


def kinetic_energy_halfstep_avg(v_old, v_new, mass):
    """Leapfrog KE: average of the two half-step kinetic energies
    (reference: ekin_ave scheme in compute_globals)."""
    return 0.5 * (kinetic_energy(v_old, mass) + kinetic_energy(v_new, mass))


def temperature(ekin, ndf):
    return 2.0 * ekin / (ndf * BOLTZ)


def remove_com_motion(v, mass):
    p = jnp.sum(mass[:, None] * v, 0)
    return v - p / jnp.sum(mass)
