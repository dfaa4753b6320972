"""Energy minimizers: steepest descent and conjugate gradient
(reference: src/gromacs/mdrun/minimize.cpp:2800 do_steep, :1259 do_cg).
Both are jit-compiled lax.while_loop programs — the whole minimization
runs on device."""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.types import State


class MinimizeResult(NamedTuple):
    x: jnp.ndarray
    epot: jnp.ndarray
    fmax: jnp.ndarray
    n_steps: jnp.ndarray
    converged: jnp.ndarray


def steepest_descent(x0, box, lam, force_fn: Callable, nsteps: int = 200,
                     emtol: float = 10.0, step0: float = 0.01
                     ) -> MinimizeResult:
    """force_fn(x, box, lam) -> (f, terms).  GROMACS semantics: accept the
    trial step if energy decreased (grow step 1.2x), else shrink 0.2x
    (reference: minimize.cpp do_steep loop)."""

    def epot_f(x):
        f, terms = force_fn(x, box, lam)
        return terms.epot, f

    e0, f0 = epot_f(x0)

    def cond(carry):
        x, e, f, step, k, done = carry
        fmax = jnp.max(jnp.abs(f))
        return (k < nsteps) & (fmax > emtol) & (step > 1e-9)

    def body(carry):
        x, e, f, step, k, done = carry
        fmax = jnp.max(jnp.abs(f))
        dx = f * (step / jnp.maximum(fmax, 1e-12))
        x_try = x + dx
        e_try, f_try = epot_f(x_try)
        accept = e_try < e
        x_new = jnp.where(accept, x_try, x)
        e_new = jnp.where(accept, e_try, e)
        f_new = jnp.where(accept, f_try, f)
        step_new = jnp.where(accept, step * 1.2, step * 0.2)
        return (x_new, e_new, f_new, step_new, k + 1, done)

    x, e, f, step, k, _ = jax.lax.while_loop(
        cond, body, (x0, e0, f0, jnp.asarray(step0, x0.dtype),
                     jnp.asarray(0), jnp.asarray(False)))
    fmax = jnp.max(jnp.abs(f))
    return MinimizeResult(x=x, epot=e, fmax=fmax, n_steps=k,
                          converged=fmax <= emtol)


def conjugate_gradient(x0, box, lam, force_fn: Callable, nsteps: int = 200,
                       emtol: float = 10.0, step0: float = 0.005
                       ) -> MinimizeResult:
    """Polak-Ribiere CG with backtracking line step
    (reference: minimize.cpp do_cg; simplified line search)."""

    def epot_f(x):
        f, terms = force_fn(x, box, lam)
        return terms.epot, f

    e0, f0 = epot_f(x0)

    def cond(carry):
        x, e, f, d, step, k = carry
        return (k < nsteps) & (jnp.max(jnp.abs(f)) > emtol)

    def body(carry):
        x, e, f, d, step, k = carry
        # trial along d (normalized)
        dn = d / jnp.maximum(jnp.max(jnp.abs(d)), 1e-12)
        x_try = x + dn * step
        e_try, f_try = epot_f(x_try)
        accept = e_try < e
        # Polak-Ribiere beta on acceptance, restart (beta=0) otherwise
        beta = jnp.where(
            accept,
            jnp.maximum(jnp.sum(f_try * (f_try - f))
                        / jnp.maximum(jnp.sum(f * f), 1e-20), 0.0),
            0.0)
        d_new = jnp.where(accept, f_try + beta * d, f)
        return (jnp.where(accept, x_try, x), jnp.where(accept, e_try, e),
                jnp.where(accept, f_try, f), d_new,
                jnp.where(accept, step * 1.3, step * 0.3), k + 1)

    x, e, f, d, step, k = jax.lax.while_loop(
        cond, body, (x0, e0, f0, f0, jnp.asarray(step0, x0.dtype),
                     jnp.asarray(0)))
    fmax = jnp.max(jnp.abs(f))
    return MinimizeResult(x=x, epot=e, fmax=fmax, n_steps=k,
                          converged=fmax <= emtol)
