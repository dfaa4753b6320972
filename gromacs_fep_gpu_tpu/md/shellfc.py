"""Shell / Drude-particle relaxation (polarizable force fields).

The reference relaxes massless shell particles to the local energy
minimum before every integration step (SCF): each shell s attached to a
core by a harmonic "polarization" spring of stiffness k_s (k = q_s^2 *
ONE_4PI_EPS0 / alpha, listed_forces/bonded.cpp:734 polarize()) moves by
dx = f_s / k_s per iteration — the exact Newton step for the spring
term, a preconditioned steepest-descent step for the rest
(mdrun/shellfc.cpp:930 relax_shell_flexcon, :383 shell_pos_sd).

TPU-native design: the relaxation is a fixed-iteration jitted loop
(params.niter, mdp key `niter`, default 20 in the reference; we default
to the same) inside the step function — no data-dependent host control
flow, so the whole MD step stays one XLA program.  Convergence of the
harmonic-dominated problem is geometric (the spring term is solved
exactly each pass; only the anharmonic environment iterates), so a
handful of iterations reaches the reference's default emtol regime for
equilibrated liquids; the final shell force max is returned for
monitoring (the reference's df/emtol printout).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.types import ShellList, System


def n_shells(system: System) -> int:
    return 0 if system.shells is None else int(system.shells.idx.shape[0])


def make_shell_relax(system: System, force_fn: Callable,
                     n_iter: int = 5) -> Callable:
    """relax(x, box, lam) -> x with shells at their force minimum.

    force_fn(x, box, lam) -> (f, ...) — any flavor; only f is read.
    Each iteration moves every shell by f_s / k_s (shellfc.cpp:383:
    "a directional minimum for harmonic shells in one step").
    """
    sh: ShellList = system.shells
    idx = sh.idx
    inv_k = (1.0 / sh.k)[:, None]

    def relax(x, box, lam):
        def body(_, xc):
            f = force_fn(xc, box, lam)[0]
            return xc.at[idx].add(f[idx] * inv_k)

        return jax.lax.fori_loop(0, n_iter, body, x)

    return relax


def shell_force_max(system: System, force_fn: Callable, x, box, lam):
    """Max |f| over shells — the reference's convergence measure
    (shellfc.cpp rms force vs emtol)."""
    f = force_fn(x, box, lam)[0]
    return jnp.max(jnp.abs(f[system.shells.idx]))
