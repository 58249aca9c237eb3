"""Fused EMD pair-merge + CDF-integral kernel for TPU.

The general-weight earth mover's distance between two PRESORTED weighted
signatures (ldb.py:_emd_presorted, reference ldb_measures.jl:327-360) is a
bitonic merge of the two supports followed by a signed-weight cumsum and a
weighted interval sum.  The XLA formulation runs the log2(M) merge stages as
separate fusions with reshape barriers between them (~25 us/stage at the LDB
fit sizes, plus the cumsum); this kernel runs the WHOLE tail — merge, prefix
sum, |CDF| integral — in one VMEM trip per 128-row tile.

Layout: rows (class-pair x coordinate) ride the LANE axis, the merge axis
lives on SUBLANES (Mosaic supports sublane rolls but no lane splits, no
`rev`, no `cumsum` — see pallas_wpt.py).  Consequences:
  * the descending half of the bitonic input is produced by an XLA lane
    flip BEFORE the kernel (the merge network itself needs no reversals);
  * every merge stage is a roll-based compare-exchange on flat (M, TB)
    arrays (`_cmpx_roll` — the blocked-reshape form pads the w axis to 8
    sublanes and blows the scoped-VMEM stack ~8x at low w);
  * the prefix sum is a triangular-matmul block prefix (`_cumsum_block` —
    a roll-doubling prefix composed after the merge stages triggers a ~6x
    Mosaic lowering pathology, measured in BENCHMARKS.md r5).

Key pads must equal the per-row MERGED maximum on both sides so the padded
tail contributes only zero-width intervals (weight pads are 0); the wrapper
below handles that plus row padding to the 128-lane tile.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cmpx_roll(Z, U, w, pos, dirv=None):
    """One bitonic compare-exchange stage at sublane distance ``w`` on flat
    (M, TB) arrays, via rolls + parity masks.  (The blocked-reshape
    formulation pads the w axis to 8 sublanes, blowing Mosaic's scoped VMEM
    stack ~8x at the low-w stages; rolls keep every temporary flat.)
    ``dirv`` True marks descending blocks (alternating-direction cascade);
    None = all ascending.  Pair (i, i+w), i with (i & w) == 0: both sides
    take the partner iff key_low > key_high (XOR direction) — consistent
    under ties."""
    low = (pos & w) == 0
    Zp = jnp.roll(Z, -w, axis=0)  # partner seen from the low side
    Up = jnp.roll(U, -w, axis=0)
    Zq = jnp.roll(Z, w, axis=0)   # partner seen from the high side
    Uq = jnp.roll(U, w, axis=0)
    take_lo = Z > Zp              # low side: partner is smaller
    take_hi = Zq > Z              # high side: low partner is bigger
    if dirv is not None:
        take_lo = take_lo ^ dirv
        take_hi = take_hi ^ dirv
    # logical combine, not where-on-bools (Mosaic: i1 select unsupported)
    take = (low & take_lo) | (~low & take_hi)
    Zn = jnp.where(low, Zp, Zq)
    Un = jnp.where(low, Up, Uq)
    return (jnp.where(take, Zn, Z), jnp.where(take, Un, U))


def _merge_stages(Z, U, M2):
    """Bitonic merge of the (M2, TB) key/value pair (keys bitonic on the
    sublane axis): log2(M2) compare-exchange stages -> ascending."""
    pos = jax.lax.broadcasted_iota(jnp.int32, Z.shape, 0)
    w = M2 // 2
    while w >= 1:
        Z, U = _cmpx_roll(Z, U, w, pos)
        w //= 2
    return Z, U


def _cumsum_block(U, M2, Ltri):
    """Inclusive prefix sum along sublanes: per-128-block triangular-matmul
    prefixes (exact f32 via HIGHEST) + sequential block-offset chaining.
    Mosaic has no cumsum primitive, and a roll-doubling prefix composed
    after the merge stages triggers a ~6x lowering pathology (measured —
    see BENCHMARKS.md r5); the MXU block prefix composes cleanly."""
    TB = U.shape[-1]
    bs = Ltri.shape[0]
    prefs = [jax.lax.dot(Ltri, U[i * bs:(i + 1) * bs, :],
                         precision=jax.lax.Precision.HIGHEST)
             for i in range(M2 // bs)]
    off = jnp.zeros((1, TB), U.dtype)
    outs = []
    for pr in prefs:
        outs.append(pr + off)
        off = off + pr[bs - 1:bs, :]
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _make_kernel(M: int, TB: int):
    M2 = 2 * M

    def kernel(p_ref, wp_ref, q_ref, wq_ref, l_ref, o_ref):
        # q arrives lane-flipped (descending) with negated weights
        Z = jnp.concatenate([p_ref[:].T, q_ref[:].T], axis=0)  # (2M, TB)
        U = jnp.concatenate([wp_ref[:].T, wq_ref[:].T], axis=0)
        Z, U = _merge_stages(Z, U, M2)
        cdf = _cumsum_block(U, M2, l_ref[:])
        dz = jnp.concatenate([Z[1:] - Z[:-1], jnp.zeros((1, TB), Z.dtype)],
                             axis=0)
        o_ref[:] = jnp.sum(jnp.abs(cdf) * dz, axis=0, keepdims=True)

    return kernel


_CHUNK = 256  # XLA's TPU row sort has a ~3x fast path at length <= 256


def _make_cascade_kernel(M: int, TB: int, chunk: int):
    """Bitonic merge cascade: chunks of ``chunk`` arrive sorted in
    ALTERNATING directions (even asc, odd desc — the XLA wrapper pre-flips
    the odd ones); each round merges adjacent blocks with the standard
    alternating-direction bitonic network (direction = parity of the
    output block, statically derived from the sublane iota), ending fully
    ascending."""

    def kernel(k_ref, v_ref, ko_ref, vo_ref):
        Z = k_ref[:].T  # (M, TB)
        U = v_ref[:].T
        pos = jax.lax.broadcasted_iota(jnp.int32, Z.shape, 0)
        W = 2 * chunk
        while W <= M:
            dirv = (pos // W) % 2 == 1  # True = descending output block
            w = W // 2
            while w >= 1:
                Z, U = _cmpx_roll(Z, U, w, pos, dirv)
                w //= 2
            W *= 2
        ko_ref[:] = Z.T
        vo_ref[:] = U.T

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def sort_rows_pallas(keys, vals, interpret: bool = False):
    """Row-sort (keys ascending, vals carried) tuned for LONG rows on TPU:
    XLA sorts 256-lane chunks (its fast path), then a Pallas bitonic merge
    cascade combines the chunks in VMEM.  Returns (keys_sorted, vals).
    Pads keys with the per-row max (callers relying on zero-width-interval
    padding semantics get them for free); output keeps the padded width
    M = next power-of-two multiple of 256."""
    R, N = keys.shape
    M = _CHUNK
    while M < N:
        M *= 2
    big = keys[:, -1:] * 0 + jnp.max(keys, axis=-1, keepdims=True)
    if M != N:
        keys = jnp.concatenate(
            [keys, jnp.broadcast_to(big, (R, M - N))], -1)
        vals = jnp.concatenate([vals, jnp.zeros((R, M - N), vals.dtype)], -1)
    C = M // _CHUNK
    kc = keys.reshape(R, C, _CHUNK)
    vc = vals.reshape(R, C, _CHUNK)
    ks, vs = jax.lax.sort([kc, vc], num_keys=1)  # fast-path 256-lane rows
    if C == 1:
        return ks.reshape(R, M), vs.reshape(R, M)
    odd = (jnp.arange(C) % 2 == 1)[None, :, None]
    ks = jnp.where(odd, jnp.flip(ks, -1), ks).reshape(R, M)
    vs = jnp.where(odd, jnp.flip(vs, -1), vs).reshape(R, M)
    # Mosaic allocates the cascade's per-stage temporaries on the scoped
    # VMEM stack (~stages * 2 * M * TB * 4B) — TB=64 keeps the ~30-stage
    # cascade under the 96 MB scoped limit at M=2048
    TB = 64
    Rp = -(-R // TB) * TB
    if Rp != R:
        ks = jnp.concatenate([ks, jnp.zeros((Rp - R, M), ks.dtype)], 0)
        vs = jnp.concatenate([vs, jnp.zeros((Rp - R, M), vs.dtype)], 0)
    kernel = _make_cascade_kernel(M, TB, _CHUNK)
    spec = pl.BlockSpec((TB, M), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ko, vo = pl.pallas_call(
        kernel,
        grid=(Rp // TB,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((Rp, M), keys.dtype),
                   jax.ShapeDtypeStruct((Rp, M), vals.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )(ks, vs)
    return ko[:R], vo[:R]


@functools.partial(jax.jit, static_argnames=("interpret",))
def emd_presorted_pallas(p, wp, q, wq, interpret: bool = False):
    """EMD tail for presorted weighted signatures, batched over rows.

    ``p``/``q``: (R, N) ASCENDING-sorted supports; ``wp``/``wq``: aligned
    positive weights.  Returns (R,) — identical to
    ``ldb._emd_presorted(p, wp, q, wq)`` (parity-tested)."""
    R, N = p.shape
    if q.shape != p.shape or wp.shape != p.shape or wq.shape != p.shape:
        raise ValueError(
            f"emd_presorted_pallas expects equal-shaped (R, N) inputs, got "
            f"p={p.shape} wp={wp.shape} q={q.shape} wq={wq.shape} (pad "
            f"unequal supports with weight-0 entries first)")
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
    bs = min(128, 2 * M)
    Ltri = jnp.asarray(np.tril(np.ones((bs, bs), np.float32)))
    kernel = _make_kernel(M, TB)
    spec = pl.BlockSpec((TB, M), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(Rp // TB,),
        in_specs=[spec, spec, spec, spec,
                  pl.BlockSpec((bs, bs), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Rp), p.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )(pk, pv, qk, qv, Ltri)
    emd = out[0, :R]
    return emd / (jnp.sum(wp, axis=-1) + jnp.sum(wq, axis=-1))
