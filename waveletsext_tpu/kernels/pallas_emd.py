"""Fused EMD pair-merge + CDF-integral kernel for TPU.

The general-weight earth mover's distance between two PRESORTED weighted
signatures (ldb.py:_emd_presorted, reference ldb_measures.jl:327-360) is a
bitonic merge of the two supports followed by a signed-weight cumsum and a
weighted interval sum.  The XLA formulation runs the log2(M) merge stages as
separate fusions with reshape barriers between them (~25 us/stage at the LDB
fit sizes, plus the cumsum); this kernel runs the WHOLE tail — merge, prefix
sum, |CDF| integral — in one VMEM trip per 128-row tile.

Layout: rows (class-pair x coordinate) ride the LANE axis, the merge axis
lives on SUBLANES (Mosaic supports sublane reshapes/rolls but no lane
splits, no `rev`, no `cumsum` — see pallas_wpt.py).  Consequences:
  * the descending half of the bitonic input is produced by an XLA lane
    flip BEFORE the kernel (the merge network itself needs no reversals);
  * the prefix sum is log2(2M) roll-and-masked-add doubling steps;
  * every merge stage is a blocked sublane compare-exchange
    (reshape (blocks, 2, w, TB), min/max, stack back).

Key pads must equal the per-row MERGED maximum on both sides so the padded
tail contributes only zero-width intervals (weight pads are 0); the wrapper
below handles that plus row padding to the 128-lane tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _merge_stages(Z, U, M2):
    """Bitonic merge of the (M2, TB) key/value pair (keys bitonic on the
    sublane axis): log2(M2) blocked compare-exchange stages -> ascending."""
    TB = Z.shape[-1]
    w = M2 // 2
    while w >= 1:
        zs = Z.reshape(-1, 2, w, TB)
        us = U.reshape(-1, 2, w, TB)
        zlo, zhi = zs[:, 0], zs[:, 1]
        ulo, uhi = us[:, 0], us[:, 1]
        swap = zlo > zhi
        nzlo = jnp.where(swap, zhi, zlo)
        nzhi = jnp.where(swap, zlo, zhi)
        nulo = jnp.where(swap, uhi, ulo)
        nuhi = jnp.where(swap, ulo, uhi)
        Z = jnp.stack([nzlo, nzhi], axis=1).reshape(M2, TB)
        U = jnp.stack([nulo, nuhi], axis=1).reshape(M2, TB)
        w //= 2
    return Z, U


def _cumsum_sublane(U, M2):
    """Inclusive prefix sum along sublanes via roll-doubling (Mosaic has no
    cumsum primitive)."""
    TB = U.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (M2, TB), 0)
    s = U
    sh = 1
    while sh < M2:
        s = s + jnp.where(idx >= sh, jnp.roll(s, sh, axis=0), 0.0)
        sh *= 2
    return s


def _make_kernel(M: int, TB: int):
    M2 = 2 * M

    def kernel(p_ref, wp_ref, q_ref, wq_ref, o_ref):
        # q arrives lane-flipped (descending) with negated weights
        Z = jnp.concatenate([p_ref[:].T, q_ref[:].T], axis=0)  # (2M, TB)
        U = jnp.concatenate([wp_ref[:].T, wq_ref[:].T], axis=0)
        Z, U = _merge_stages(Z, U, M2)
        cdf = _cumsum_sublane(U, M2)
        dz = jnp.concatenate([Z[1:] - Z[:-1], jnp.zeros((1, TB), Z.dtype)],
                             axis=0)
        o_ref[:] = jnp.sum(jnp.abs(cdf) * dz, axis=0, keepdims=True)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def emd_presorted_pallas(p, wp, q, wq, interpret: bool = False):
    """EMD tail for presorted weighted signatures, batched over rows.

    ``p``/``q``: (R, N) ASCENDING-sorted supports; ``wp``/``wq``: aligned
    positive weights.  Returns (R,) — identical to
    ``ldb._emd_presorted(p, wp, q, wq)`` (parity-tested)."""
    R, N = p.shape
    M = max(8, 1 << (N - 1).bit_length())
    big = jnp.maximum(p[:, -1:], q[:, -1:])  # per-row merged max

    def padded(k, v):
        m = M - N
        if not m:
            return k, v
        return (jnp.concatenate([k, jnp.broadcast_to(big, (R, m))], -1),
                jnp.concatenate([v, jnp.zeros((R, m), v.dtype)], -1))

    pk, pv = padded(p, wp)
    qk, qv = padded(q, wq)
    qk = jnp.flip(qk, axis=-1)          # descending half of the bitonic in
    qv = -jnp.flip(qv, axis=-1)         # signed weights: q subtracts
    TB = 128
    Rp = -(-R // TB) * TB
    if Rp != R:
        padrow = lambda a: jnp.concatenate(
            [a, jnp.zeros((Rp - R, M), a.dtype)], 0)
        pk, pv, qk, qv = padrow(pk), padrow(pv), padrow(qk), padrow(qv)
    kernel = _make_kernel(M, TB)
    spec = pl.BlockSpec((TB, M), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(Rp // TB,),
        in_specs=[spec, spec, spec, spec],
        out_specs=pl.BlockSpec((1, TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Rp), p.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )(pk, pv, qk, qv)
    emd = out[0, :R]
    return emd / (jnp.sum(wp, axis=-1) + jnp.sum(wq, axis=-1))
