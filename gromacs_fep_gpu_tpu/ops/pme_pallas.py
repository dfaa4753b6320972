"""Pallas TPU kernels for the PME atom-side passes (spread + gather).

The XLA matmul spread (ops/pme.py spread_charges) materializes a
(n, K2*K3) one-hot outer-product intermediate in HBM (~87 MB at 12k
atoms / 42^3) and the gather pass does a 197k-row gather of short phi
z-lines — together ~1.6 ms/step, dominated by HBM traffic and per-row
gather overhead, not FLOPs.  These kernels keep the intermediate in
VMEM and ride the MXU end to end:

    u[c, k23] = ohy[c, k2(k23)] * ohz[c, k3(k23)]
              = (ohy @ E2) * (ohz @ E3)

with STATIC 0/1 expansion matrices E2[k2, k23] = [k23//K3 == k2],
E3[k3, k23] = [k23%K3 == k3] — the per-lane k23->k2/k3 index map that a
vector unit cannot gather becomes two exact selection matmuls.

  spread:  grid[k1, k23] += qwx^T[k1, c] @ u[c, k23]      (per chunk)
  gather:  D[c, k1] = u @ phi^T;  forces/dEdq from small contractions
           with the x-axis (derivative) weights

Precision: the MXU is driven in explicit bf16 passes with fp32
accumulation (Mosaic supports only DEFAULT/HIGHEST dot precision).
A fp32 operand is split a = hi + lo with hi = bf16(a); selection
matmuls against 0/1 matrices need 2 passes (hi, lo), value-by-value
products need 3 (hi*hi + lo*hi + hi*lo) — the same bf16x3 scheme XLA
uses for Precision.HIGH, ~1e-7 relative.

(reference: ewald/pme_spread.cpp, pme_gather.cpp, CUDA pme_spread.cu /
pme_gather.cu — the shared-memory-atomic scatter design replaced by a
systolic-array formulation).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import pbc as pbc_mod
from .pme import bspline_weights, bspline_dweights


@functools.lru_cache(maxsize=16)
def _expand_mats_np(K2: int, K3: int):
    k23 = np.arange(K2 * K3)
    E2 = (k23[None, :] // K3 == np.arange(K2)[:, None])
    E3 = (k23[None, :] % K3 == np.arange(K3)[:, None])
    return (E2.astype(np.float32), E3.astype(np.float32))


def _chunk_for(K23: int, budget_bytes: int = 4 << 20) -> int:
    c = budget_bytes // (4 * K23)
    c = max(64, min(512, c))
    return (c // 64) * 64


def _split(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _bdot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _sel_dot(a, e_hi):
    """a @ E for an exactly-bf16-representable 0/1 matrix E: 2 passes."""
    hi, lo = _split(a)
    return _bdot(hi, e_hi) + _bdot(lo, e_hi)


def _val_dot(a, b):
    """a @ b for fp32 operands: 3 bf16 passes (~Precision.HIGH)."""
    ahi, alo = _split(a)
    bhi, blo = _split(b)
    return _bdot(ahi, bhi) + _bdot(alo, bhi) + _bdot(ahi, blo)


def _onehot(ws, idx, K):
    """(n, order) weights + cells -> dense (n, K) one-hot-weighted rows."""
    cells = jnp.arange(K, dtype=jnp.int32)
    o = jnp.zeros((ws.shape[0], K), ws.dtype)
    for j in range(ws.shape[1]):
        o = o + ws[:, j:j + 1] * (idx[:, j:j + 1] == cells[None, :])
    return o


def _spline_onehots(x, box, grid_shape, order, derivatives: bool):
    Kv = jnp.array(grid_shape)
    s = pbc_mod.frac_coords(x, box)
    s = s - jnp.floor(s)
    u = s * Kv.astype(x.dtype)
    gi = jnp.floor(u).astype(jnp.int32)
    w = u - gi.astype(x.dtype)
    jj = jnp.arange(order)
    idx = [(gi[:, d:d + 1] - jj[None, :]) % grid_shape[d] for d in range(3)]
    ws = [bspline_weights(w[:, d], order) for d in range(3)]
    oh = [_onehot(ws[d], idx[d], grid_shape[d]) for d in range(3)]
    if not derivatives:
        return oh, None
    dws = [bspline_dweights(w[:, d], order) for d in range(3)]
    doh = [_onehot(dws[d], idx[d], grid_shape[d]) for d in range(3)]
    return oh, doh


def _spread_kernel(qwxT_ref, ohy_ref, ohz_ref, e2_ref, e3_ref, out_ref):
    c = pl.program_id(0)
    ey = _sel_dot(ohy_ref[...], e2_ref[...])
    ez = _sel_dot(ohz_ref[...], e3_ref[...])
    u = ey * ez
    part = _val_dot(qwxT_ref[...], u)

    @pl.when(c == 0)
    def _init():
        out_ref[...] = part

    @pl.when(c > 0)
    def _acc():
        out_ref[...] += part


def spread_charges_pallas(x, box, charges, grid_shape, order: int = 4,
                          interpret: bool = False):
    """Charge grid (K1, K2, K3) via the VMEM-resident expansion kernel."""
    n = x.shape[0]
    K1, K2, K3 = grid_shape
    K23 = K2 * K3
    chunk = _chunk_for(K23)
    nc = -(-n // chunk)
    npad = nc * chunk
    oh, _ = _spline_onehots(x, box, grid_shape, order, False)
    qwxT = (charges[:, None] * oh[0]).T                      # (K1, n)
    qwxT = jnp.pad(qwxT, ((0, 0), (0, npad - n)))
    ohy = jnp.pad(oh[1], ((0, npad - n), (0, 0)))
    ohz = jnp.pad(oh[2], ((0, npad - n), (0, 0)))
    E2, E3 = _expand_mats_np(K2, K3)

    grid = pl.pallas_call(
        _spread_kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((K1, chunk), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, K2), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, K3), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, K23), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K3, K23), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K1, K23), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K1, K23), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(qwxT, ohy, ohz,
      jnp.asarray(E2, jnp.bfloat16), jnp.asarray(E3, jnp.bfloat16))
    return grid.reshape(K1, K2, K3)


def _gather_kernel(phiT_hi_ref, phiT_lo_ref, wx_ref, dwx_ref, q_ref,
                   ohy_ref, dohy_ref, ohz_ref, dohz_ref,
                   e2_ref, e3_ref,
                   fxu_ref, fyu_ref, fzu_ref, dedq_ref):
    phiT_hi = phiT_hi_ref[...]
    phiT_lo = phiT_lo_ref[...]
    chunk = wx_ref.shape[0]

    def phi_dot(u):
        hi, lo = _split(u)
        return (_bdot(hi, phiT_hi) + _bdot(lo, phiT_hi)
                + _bdot(hi, phiT_lo))

    # batch [value; derivative] expansions and the three phi dots into
    # single larger matmuls — same FLOPs, a third of the dot dispatches
    eyd = _sel_dot(jnp.concatenate([ohy_ref[...], dohy_ref[...]], axis=0),
                   e2_ref[...])
    ey, edy = eyd[:chunk], eyd[chunk:]
    ezd = _sel_dot(jnp.concatenate([ohz_ref[...], dohz_ref[...]], axis=0),
                   e3_ref[...])
    ez, edz = ezd[:chunk], ezd[chunk:]
    Ds = phi_dot(jnp.concatenate([ey * ez, edy * ez, ey * edz], axis=0))
    D, Dy, Dz = Ds[:chunk], Ds[chunk:2 * chunk], Ds[2 * chunk:]
    wx = wx_ref[...]
    q = q_ref[...]
    dedq_ref[...] = jnp.sum(wx * D, axis=1, keepdims=True)
    fxu_ref[...] = q * jnp.sum(dwx_ref[...] * D, axis=1, keepdims=True)
    fyu_ref[...] = q * jnp.sum(wx * Dy, axis=1, keepdims=True)
    fzu_ref[...] = q * jnp.sum(wx * Dz, axis=1, keepdims=True)


def phi_gather_pallas(x, box, charges, phi, grid_shape, order: int = 4,
                      interpret: bool = False):
    """Per-atom (forces, dE/dq) from the potential grid phi = dE/dQ —
    drop-in twin of ops/pme.phi_gather."""
    n = x.shape[0]
    K1, K2, K3 = grid_shape
    K23 = K2 * K3
    chunk = _chunk_for(K23, budget_bytes=3 << 20)
    nc = -(-n // chunk)
    npad = nc * chunk
    oh, doh = _spline_onehots(x, box, grid_shape, order, True)

    def padn(a):
        return jnp.pad(a, ((0, npad - n), (0, 0)))

    phiT = phi.reshape(K1, K23).T                            # (K23, K1)
    phiT_hi = phiT.astype(jnp.bfloat16)
    phiT_lo = (phiT - phiT_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    E2, E3 = _expand_mats_np(K2, K3)
    q2 = jnp.pad(charges[:, None], ((0, npad - n), (0, 0)))

    cblk = lambda w: pl.BlockSpec((chunk, w), lambda c: (c, 0),
                                  memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _gather_kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((K23, K1), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K23, K1), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            cblk(K1), cblk(K1), cblk(1),
            cblk(K2), cblk(K2), cblk(K3), cblk(K3),
            pl.BlockSpec((K2, K23), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K3, K23), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[cblk(1) for _ in range(4)],
        out_shape=[jax.ShapeDtypeStruct((npad, 1), jnp.float32)
                   for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(phiT_hi, phiT_lo, padn(oh[0]), padn(doh[0]), q2,
      padn(oh[1]), padn(doh[1]), padn(oh[2]), padn(doh[2]),
      jnp.asarray(E2, jnp.bfloat16), jnp.asarray(E3, jnp.bfloat16))

    fxu, fyu, fzu, dedq = (o[:n, 0] for o in outs)
    Kv = jnp.array(grid_shape)
    binv = pbc_mod.inv3(box)
    dEdu = jnp.stack([fxu, fyu, fzu], axis=1)
    forces = -jnp.einsum('nd,ed->ne', dEdu * Kv.astype(x.dtype),
                         binv, precision=jax.lax.Precision.HIGHEST)
    return forces, dedq


def pme_pallas_ok(grid_shape, dtype=jnp.float32) -> bool:
    """Whether the Pallas PME kernels apply (VMEM-resident phi, f32)."""
    K1, K2, K3 = grid_shape
    return (dtype == jnp.float32
            and K1 * K2 * K3 * 4 <= (6 << 20)
            and K2 * K3 * 4 * 64 <= (4 << 20))
