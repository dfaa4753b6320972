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
                     emtol: float = 10.0, step0: float = 0.01,
                     constrain_fn: Callable = None) -> MinimizeResult:
    """force_fn(x, box, lam) -> (f, terms).  GROMACS semantics: accept the
    trial step if energy decreased (grow step 1.2x), else shrink 0.2x
    (reference: minimize.cpp do_steep loop).

    constrain_fn(x_ref, x_try) -> constrained positions, applied to
    every trial step exactly like the reference's do_em_step
    constr->apply (minimize.cpp:431) — without it rigid waters deform
    during minimization."""
    if constrain_fn is None:
        constrain_fn = lambda x_ref, x_try: x_try

    def epot_f(x):
        f, terms = force_fn(x, box, lam)
        return terms.epot, f

    x0 = constrain_fn(x0, x0)
    e0, f0 = epot_f(x0)

    def cond(carry):
        x, e, f, step, k, done = carry
        fmax = jnp.max(jnp.abs(f))
        return (k < nsteps) & (fmax > emtol) & (step > 1e-9)

    def body(carry):
        x, e, f, step, k, done = carry
        fmax = jnp.max(jnp.abs(f))
        dx = f * (step / jnp.maximum(fmax, 1e-12))
        x_try = constrain_fn(x, x + dx)
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
                       emtol: float = 10.0, step0: float = 0.005,
                       constrain_fn: Callable = None) -> MinimizeResult:
    """Polak-Ribiere CG with backtracking line step
    (reference: minimize.cpp do_cg; simplified line search).
    constrain_fn as in steepest_descent."""
    if constrain_fn is None:
        constrain_fn = lambda x_ref, x_try: x_try

    def epot_f(x):
        f, terms = force_fn(x, box, lam)
        return terms.epot, f

    x0 = constrain_fn(x0, x0)
    e0, f0 = epot_f(x0)

    def cond(carry):
        x, e, f, d, step, k = carry
        return (k < nsteps) & (jnp.max(jnp.abs(f)) > emtol)

    def body(carry):
        x, e, f, d, step, k = carry
        # trial along d (normalized)
        dn = d / jnp.maximum(jnp.max(jnp.abs(d)), 1e-12)
        x_try = constrain_fn(x, x + dn * step)
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


def l_bfgs(x0, box, lam, force_fn: Callable, nsteps: int = 200,
           emtol: float = 10.0, m: int = 10, step0: float = 0.01,
           constrain_fn: Callable = None) -> MinimizeResult:
    """Limited-memory BFGS with circular (s, y) history and a
    backtracking Armijo line search, as one lax.while_loop program
    (reference: minimize.cpp:1978 do_lbfgs; the reference's cubic line
    minimization is replaced by backtracking — same fixed-memory
    two-loop recursion, reformulated for static shapes on TPU)."""
    n3 = x0.size
    if constrain_fn is None:
        _cons = lambda xr, xt: xt
    else:
        _cons = lambda xr, xt: constrain_fn(
            xr.reshape(x0.shape), xt.reshape(x0.shape)).reshape(-1)
    xf0 = _cons(x0.reshape(-1), x0.reshape(-1))

    def epot_g(xf):
        f, terms = force_fn(xf.reshape(x0.shape), box, lam)
        return terms.epot, -f.reshape(-1)      # gradient = -force

    e0, g0 = epot_g(xf0)
    S = jnp.zeros((m, n3), x0.dtype)
    Y = jnp.zeros((m, n3), x0.dtype)
    rho = jnp.zeros((m,), x0.dtype)

    def two_loop(g, S, Y, rho, k):
        """H·g via the standard two-loop recursion over the valid
        history rows (slot j holds iterate k-m+j ... circularly)."""
        q = g
        alphas = jnp.zeros((m,), x0.dtype)

        def bw(i, carry):
            q, alphas = carry
            j = (k - 1 - i) % m
            valid = (i < jnp.minimum(k, m)) & (rho[j] > 0)
            a = jnp.where(valid, rho[j] * jnp.dot(S[j], q), 0.0)
            q = q - a * Y[j]
            return q, alphas.at[j].set(a)

        q, alphas = jax.lax.fori_loop(0, m, bw, (q, alphas))
        # initial Hessian scaling gamma = s·y / y·y of the newest pair
        jn = (k - 1) % m
        yy = jnp.dot(Y[jn], Y[jn])
        gamma = jnp.where((k > 0) & (yy > 0),
                          jnp.dot(S[jn], Y[jn]) / jnp.maximum(yy, 1e-30),
                          1.0)
        r = q * gamma

        def fw(i, r):
            j = (k - jnp.minimum(k, m) + i) % m
            valid = (i < jnp.minimum(k, m)) & (rho[j] > 0)
            b = jnp.where(valid, rho[j] * jnp.dot(Y[j], r), 0.0)
            return r + (alphas[j] - b) * S[j]

        return jax.lax.fori_loop(0, m, fw, r)

    def cond(carry):
        xf, e, g, S, Y, rho, k, stalled = carry
        return (k < nsteps) & (jnp.max(jnp.abs(g)) > emtol) & (~stalled)

    def body(carry):
        xf, e, g, S, Y, rho, k, _ = carry
        d = -two_loop(g, S, Y, rho, k)
        # guard: if d is not a descent direction, restart with -g
        desc = jnp.dot(d, g)
        d = jnp.where(desc < 0, d, -g)
        # cap the first trial so no atom moves more than step0 nm
        dmax = jnp.maximum(jnp.max(jnp.abs(d)), 1e-12)
        t0 = jnp.minimum(1.0, step0 / dmax)

        def ls_body(carry2):
            t, _, _, tries = carry2
            e_t, g_t = epot_g(_cons(xf, xf + t * d))
            return t * 0.5, e_t, g_t, tries + 1

        def ls_cond(carry2):
            t, e_t, g_t, tries = carry2
            # Armijo with c1=1e-4 on the PREVIOUS trial (t*2)
            return ((e_t > e + 1e-4 * (2.0 * t) * jnp.dot(g, d))
                    & (tries < 12))

        e1, g1 = epot_g(_cons(xf, xf + t0 * d))
        t_half, e_t, g_t, tries = jax.lax.while_loop(
            ls_cond, ls_body, (t0 * 0.5, e1, g1, jnp.asarray(0)))
        t = t_half * 2.0
        ok = e_t < e
        x_new = jnp.where(ok, _cons(xf, xf + t * d), xf)
        s_vec = x_new - xf
        y_vec = g_t - g
        sy = jnp.dot(s_vec, y_vec)
        j = k % m
        S = jnp.where(ok, S.at[j].set(s_vec), S)
        Y = jnp.where(ok, Y.at[j].set(y_vec), Y)
        rho = jnp.where(ok, rho.at[j].set(
            jnp.where(sy > 1e-30, 1.0 / jnp.maximum(sy, 1e-30), 0.0)), rho)
        return (x_new, jnp.where(ok, e_t, e), jnp.where(ok, g_t, g),
                S, Y, rho, k + 1, ~ok)

    xf, e, g, S, Y, rho, k, _ = jax.lax.while_loop(
        cond, body, (xf0, e0, g0, S, Y, rho, jnp.asarray(0),
                     jnp.asarray(False)))
    fmax = jnp.max(jnp.abs(g))
    return MinimizeResult(x=xf.reshape(x0.shape), epot=e, fmax=fmax,
                          n_steps=k, converged=fmax <= emtol)


def normal_modes(x0, box, lam, force_fn: Callable, mass):
    """Mass-weighted normal-mode analysis at x0 (reference:
    minimize.cpp:3127 do_nm + eigensolver.cpp).

    Returns (eigenvalues of the mass-weighted Hessian in (nm^-2 kJ/mol
    /amu), frequencies in ps^-1 (sqrt of positive eigenvalues), and the
    (3N, 3N) eigenvector matrix).  Dense: O((3N)^2) memory — meant for
    molecules, not solvated boxes (the reference's NM is equally dense)."""

    def epot(xf):
        f, terms = force_fn(xf.reshape(x0.shape), box, lam)
        return terms.epot

    n3 = x0.size
    hess = jax.hessian(epot)(x0.reshape(-1)).reshape(n3, n3)
    inv_sqrt_m = 1.0 / jnp.sqrt(jnp.repeat(mass, 3))
    hmw = hess * inv_sqrt_m[:, None] * inv_sqrt_m[None, :]
    hmw = 0.5 * (hmw + hmw.T)
    evals, evecs = jnp.linalg.eigh(hmw)
    freqs = jnp.sqrt(jnp.maximum(evals, 0.0))
    return evals, freqs, evecs
