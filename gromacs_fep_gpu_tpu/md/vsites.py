"""Virtual interaction sites: construction + force spreading
(reference: src/gromacs/mdlib/vsite.cpp:1142 construct_vsites and the
spread_vsite_f machinery).

TPU-native design: construction is a pure function x -> x' (vsite rows
overwritten from their constructing atoms), so force spreading is exactly
the vector-Jacobian product of construction — `jax.vjp` replaces the
reference's hand-written per-type spreading kernels and is correct for
every site type by construction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import System, VirtualSites


def construct_vsites(x: jnp.ndarray, vs: VirtualSites) -> jnp.ndarray:
    """Overwrite vsite rows of x from their constructing atoms.

    kinds: 2 -> x_s = (1-a) x_i + a x_j
           3 -> x_s = x_i + a (x_j - x_i) + b (x_k - x_i)      (in-plane)
           4 -> x_s = x_i + a r_ij + b r_ik + c (r_ij x r_ik)  (3out)
    """
    if vs is None or vs.atoms.shape[0] == 0:
        return x
    site, ai, aj, ak = (vs.atoms[:, 0], vs.atoms[:, 1], vs.atoms[:, 2],
                        vs.atoms[:, 3])
    al = vs.atoms[:, 4]
    a = vs.params[:, 0:1]
    b = vs.params[:, 1:2]
    c = vs.params[:, 2:3]
    xi, xj, xk, xl = x[ai], x[aj], x[ak], x[al]
    rij = xj - xi
    rik = xk - xi
    rjk = xk - xj
    p2 = (1.0 - a) * xi + a * xj
    p3 = xi + a * rij + b * rik
    p4 = xi + a * rij + b * rik + c * jnp.cross(rij, rik)
    # 3fd (reference: vsite.cpp constr_vsite3FD:471): site at distance b
    # from i along the line i -> (point a on jk)
    t5 = rij + a * rjk
    inv5 = jax.lax.rsqrt(jnp.sum(t5 * t5, -1, keepdims=True) + 1e-30)
    p5 = xi + b * inv5 * t5
    # 3fad (constr_vsite3FAD:523): a = d cos(theta), b = d sin(theta)
    invdij = jax.lax.rsqrt(jnp.sum(rij * rij, -1, keepdims=True) + 1e-30)
    c1 = invdij * invdij * jnp.sum(rij * rjk, -1, keepdims=True)
    xp = rjk - c1 * rij
    invxp = jax.lax.rsqrt(jnp.sum(xp * xp, -1, keepdims=True) + 1e-30)
    p6 = xi + a * invdij * rij + b * invxp * xp
    # 4fdn (constr_vsite4FDN:711)
    ril = xl - xi
    rja = a * rik - rij
    rjb = b * ril - rij
    rm = jnp.cross(rja, rjb)
    invrm = jax.lax.rsqrt(jnp.sum(rm * rm, -1, keepdims=True) + 1e-30)
    p7 = xi + c * invrm * rm
    k = vs.kind[:, None]
    pos = jnp.where(k == 2, p2,
                    jnp.where(k == 3, p3,
                              jnp.where(k == 4, p4,
                                        jnp.where(k == 5, p5,
                                                  jnp.where(k == 6, p6,
                                                            p7)))))
    pos = jnp.where(vs.mask[:, None] > 0, pos, x[site])
    return x.at[site].set(pos)


def spread_vsite_forces(x: jnp.ndarray, f: jnp.ndarray,
                        vs: VirtualSites) -> jnp.ndarray:
    """Move forces acting on vsites onto their constructing atoms:
    f_real = (d construct / d x)^T f.  Vsite rows of the result are zero
    (constructed positions do not depend on the old vsite coordinates)."""
    if vs is None or vs.atoms.shape[0] == 0:
        return f
    _, vjp_fn = jax.vjp(lambda xx: construct_vsites(xx, vs), x)
    (f_spread,) = vjp_fn(f)
    return f_spread


def n_vsites(system: System) -> int:
    if system.vsites is None:
        return 0
    return int(system.vsites.atoms.shape[0])
