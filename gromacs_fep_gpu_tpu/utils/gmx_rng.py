"""GROMACS-compatible counter-based RNG: ThreeFry2x64 with 20 rounds
(reference: src/gromacs/random/threefry.h ThreeFry2x64<0>;
uniform conversion per uniformrealdistribution.h generateCanonical:
u = word / 2^64, word 0 drawn first).

Implemented as pairs of uint32 operations so it runs identically under
jit on TPU (no uint64 there) and in x64 mode on CPU.  Verified bit-exact
against the reference header (see tests/test_expanded.py).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_ROT = (16, 42, 12, 31, 16, 32, 24, 21)
_KS2_HI = np.uint32(0x1BD11BDA)
_KS2_LO = np.uint32(0xA9FC1A22)

# RandomDomain values (reference: random/seed.h)
DOMAIN_EXPANDED_ENSEMBLE = 0x00008000
DOMAIN_REPLICA_EXCHANGE = 0x00007000
DOMAIN_AWH_BIASING = 0x00009000


def _add64(alo, ahi, blo, bhi):
    lo = alo + blo
    carry = (lo < alo).astype(jnp.uint32)
    return lo, ahi + bhi + carry


def _rotl64(lo, hi, n):
    if n == 0:
        return lo, hi
    if n < 32:
        nlo = (lo << n) | (hi >> (32 - n))
        nhi = (hi << n) | (lo >> (32 - n))
        return nlo, nhi
    if n == 32:
        return hi, lo
    n -= 32
    # full swap then rotate by n
    nlo = (hi << n) | (lo >> (32 - n))
    nhi = (lo << n) | (hi >> (32 - n))
    return nlo, nhi


def threefry2x64_20(key0, key1, ctr0, ctr1):
    """One ThreeFry2x64 (20 rounds) block.

    All inputs are python/numpy uint64-representable ints or traced uint32
    pairs given as (lo, hi).  Here we accept python ints for key (static)
    and traced values for the counter as (lo, hi) uint32 pairs.
    Returns ((x0lo, x0hi), (x1lo, x1hi)).
    """
    k0lo, k0hi = jnp.uint32(key0 & 0xFFFFFFFF), jnp.uint32((key0 >> 32) & 0xFFFFFFFF)
    k1lo, k1hi = jnp.uint32(key1 & 0xFFFFFFFF), jnp.uint32((key1 >> 32) & 0xFFFFFFFF)
    k2lo = _KS2_LO ^ k0lo ^ k1lo
    k2hi = _KS2_HI ^ k0hi ^ k1hi
    ks = [(k0lo, k0hi), (k1lo, k1hi), (jnp.uint32(k2lo), jnp.uint32(k2hi))]

    c0lo, c0hi = ctr0
    c1lo, c1hi = ctr1
    x0lo, x0hi = _add64(jnp.uint32(c0lo), jnp.uint32(c0hi), ks[0][0], ks[0][1])
    x1lo, x1hi = _add64(jnp.uint32(c1lo), jnp.uint32(c1hi), ks[1][0], ks[1][1])

    for r in range(20):
        x0lo, x0hi = _add64(x0lo, x0hi, x1lo, x1hi)
        x1lo, x1hi = _rotl64(x1lo, x1hi, _ROT[r % 8])
        x1lo = x1lo ^ x0lo
        x1hi = x1hi ^ x0hi
        if (r + 1) % 4 == 0:
            s = (r + 1) // 4
            a = ks[s % 3]
            b = ks[(s + 1) % 3]
            x0lo, x0hi = _add64(x0lo, x0hi, a[0], a[1])
            x1lo, x1hi = _add64(x1lo, x1hi, b[0], b[1])
            x1lo, x1hi = _add64(x1lo, x1hi, jnp.uint32(s), jnp.uint32(0))
    return (x0lo, x0hi), (x1lo, x1hi)


def _to_unit(lo, hi, dtype):
    return (hi.astype(dtype) * jnp.asarray(2.0 ** -32, dtype)
            + lo.astype(dtype) * jnp.asarray(2.0 ** -64, dtype))


def gmx_uniform_pair(seed: int, domain: int, ctr0, ctr1=0,
                     dtype=jnp.float64):
    """(r1, r2) uniforms exactly as gmx's UniformRealDistribution draws
    them from ThreeFry2x64<0>(seed, domain).restart(ctr0, ctr1).

    ctr0 may be a traced integer (e.g. the step counter)."""
    def split64(c):
        c = jnp.asarray(c)
        lo = c.astype(jnp.uint32)
        if c.dtype.itemsize <= 4:     # 32-bit counters have no high word
            hi = jnp.zeros_like(lo)
        else:
            hi = (c // jnp.asarray(2 ** 32, c.dtype)).astype(jnp.uint32)
        return lo, hi

    c0lo, c0hi = split64(ctr0)
    c1lo, c1hi = split64(ctr1)
    (x0lo, x0hi), (x1lo, x1hi) = threefry2x64_20(
        seed, domain, (c0lo, c0hi), (c1lo, c1hi))
    return _to_unit(x0lo, x0hi, dtype), _to_unit(x1lo, x1hi, dtype)
