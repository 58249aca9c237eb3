"""Pallas fused WPT kernel for TPU.

One batch tile makes a single trip through VMEM: the shallow packet levels
(nodes larger than the matmul cutoff) run as window-correlates on the VPU,
then every remaining level collapses into one composed per-node orthogonal
operator contraction on the MXU (kernels/operators.py).  HBM traffic is one
read + one write of the signal tile — the XLA path materializes every level.

Mosaic constraints shape the layout (probed on this toolchain): lane-dim
splits and strided slices are unsupported, but sublane splits, transposes and
plain sublane slices are fine.  So the kernel works *signal-on-sublanes*:
the (TB, n) tile is transposed to (n, TB) inside VMEM, node windows are
sublane slices, decimation is a sublane-split reshape select, and the deep
composed operator applies as ``A^T @ node``.

Numerically equivalent to transforms.dwt.wpt up to f32 summation-order noise;
used by the benchmark fast path (TPU only).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..filters import wavelet as _wavelet
from . import operators as _ops
from . import conv as _conv


def _node_level(node, lo, hi):
    """(m, TB) node -> (w1, w2) each (m//2, TB), signal on sublanes.

    Polyphase: split the node into even/odd sublane cosets first, then
    correlate each coset with the matching filter parity — half the VPU fma
    volume of correlating at full length and discarding odd outputs
    (w1[i] = sum_p lo[2p]·xe[i+p] + lo[2p+1]·xo[i+p], and w2 likewise with
    a 1−F/2 coset offset since its full-rate offset 2−F is even)."""
    m = node.shape[0]
    F = len(lo)
    h = m // 2
    if F % 2 or F // 2 > h:  # odd-length filter / tiny node: full-rate path
        xall = jnp.concatenate([node[m - (F - 2):], node, node[:F]], axis=0)
        a1 = None
        a2 = None
        for t in range(F):
            w1t = float(lo[t]) * xall[F - 2 + t: F - 2 + t + m]
            a1 = w1t if a1 is None else a1 + w1t
            w2t = float(hi[t]) * xall[t: t + m]
            a2 = w2t if a2 is None else a2 + w2t
        w1 = a1.reshape(h, 2, a1.shape[-1])[:, 0, :]
        w2 = a2.reshape(h, 2, a2.shape[-1])[:, 0, :]
        return w1, w2
    cos = node.reshape(h, 2, node.shape[-1])
    xe, xo = cos[:, 0, :], cos[:, 1, :]
    w1 = (_sublane_correlate(xe, np.asarray(lo[0::2]), 0)
          + _sublane_correlate(xo, np.asarray(lo[1::2]), 0))
    w2 = (_sublane_correlate(xe, np.asarray(hi[0::2]), 1 - F // 2)
          + _sublane_correlate(xo, np.asarray(hi[1::2]), 1 - F // 2))
    return w1, w2


def _sublane_correlate(w, taps, off: int):
    """Stride-1 circular correlate on the sublane (first) axis:
    out[j] = sum_t taps[t] * w[(j + t + off) % h]."""
    h = w.shape[0]
    F = len(taps)
    lpad = max(0, -off)
    rpad = max(0, off + F - 1)
    parts = []
    if lpad:
        parts.append(w[h - lpad:])
    parts.append(w)
    if rpad:
        parts.append(w[:rpad])
    xall = jnp.concatenate(parts, axis=0) if len(parts) > 1 else w
    acc = None
    for t in range(F):
        s = lpad + off + t
        term = float(taps[t]) * xall[s: s + h]
        acc = term if acc is None else acc + term
    return acc


def _node_level_inv(node, lo, hi):
    """(m, TB) packed [w1 | w2] node -> (m, TB) parent, signal on sublanes
    (the polyphase synthesis of conv._synthesis_conv in sublane form)."""
    m = node.shape[0]
    F = len(lo)
    h = m // 2
    w1, w2 = node[:h], node[h:]
    outs = []
    for e in (0, 1):
        lo_e = np.asarray(lo[e::2])[::-1]
        hi_e = np.asarray(hi[e::2])[::-1]
        ve = _sublane_correlate(w1, lo_e, -(len(lo_e) - 1))
        ve = ve + _sublane_correlate(w2, hi_e, F // 2 - 1 - (len(hi_e) - 1))
        outs.append(ve)
    # interleave parities: (h, TB) x2 -> (h, 2, TB) -> (m, TB)
    return jnp.stack(outs, axis=1).reshape(m, node.shape[1])


def _make_kernel_inv(n: int, L: int, shallow: int, lo, hi, precision):
    def kernel(y_ref, s_ref, x_ref):
        # Compute in f32 regardless of the storage dtype: bf16 inputs pay
        # only at the HBM boundary (the point of the mode is bandwidth), and
        # a DEFAULT-precision dot rounds f32 operands to bf16 internally
        # anyway, so this costs no MXU passes.
        cur = y_ref[:].T.astype(jnp.float32)  # (n, TB), signal on sublanes
        if shallow < L:
            m0 = n >> shallow
            st = s_ref[:].astype(jnp.float32)  # (m0, m0) = S^T
            prec = precision
            if prec == jax.lax.Precision.HIGH:
                prec = jax.lax.Precision.HIGHEST
            pieces = []
            for b in range(1 << shallow):
                node = cur[b * m0:(b + 1) * m0]
                pieces.append(jnp.dot(st, node,
                                      preferred_element_type=jnp.float32,
                                      precision=prec))
            cur = jnp.concatenate(pieces, axis=0)
        for d in range(shallow - 1, -1, -1):
            m = n >> d
            outs = []
            for b in range(1 << d):
                outs.append(_node_level_inv(cur[b * m:(b + 1) * m], lo, hi))
            cur = jnp.concatenate(outs, axis=0)
        x_ref[:] = cur.T.astype(x_ref.dtype)
    return kernel


def iwpt_pallas(y, wt: str, L: int, block_b: int = 128, precision=None,
                in_cutoff: int | None = None, interpret: bool = False):
    """Fused 1-D inverse WPT (int levels) for (B, n) float32/bfloat16 on TPU
    — the mirror of :func:`wpt_pallas`: one composed per-node synthesis
    contraction on the MXU for the deep levels, then the shallow inverse
    window levels on the VPU, one VMEM trip per batch tile.

    ``precision=None`` resolves conv.MATMUL_PRECISION *here*, in this
    un-jitted wrapper, so the resolved value is the jit static key and
    set_matmul_precision() re-traces direct top-level calls too.
    ``interpret=True`` runs the kernel through the Pallas interpreter
    (CPU-capable; used by the off-chip parity tests)."""
    precision = _conv.MATMUL_PRECISION if precision is None else precision
    return _iwpt_pallas_jit(y, wt, L, block_b, precision, in_cutoff,
                            interpret)


@functools.partial(jax.jit,
                   static_argnames=("wt", "L", "block_b", "precision",
                                    "in_cutoff", "interpret"),
                   inline=True)
def _iwpt_pallas_jit(y, wt, L: int, block_b: int, precision,
                     in_cutoff: int | None, interpret: bool):
    w = _wavelet(wt) if isinstance(wt, str) else wt
    B, n = y.shape
    cutoff = (_default_in_cutoff(precision, inverse=True)
              if in_cutoff is None else in_cutoff)
    shallow = 0
    while shallow < L and (n >> shallow) > cutoff:
        shallow += 1
    if shallow < L:
        m0 = n >> shallow
        S = _ops.composed_synthesis_operator(
            _ops.taps_key(w.lo, w.hi), m0, L - shallow)
        St = jnp.asarray(np.ascontiguousarray(S.T), y.dtype)
    else:
        St = jnp.zeros((8, 128), y.dtype)  # unused
    tb = min(block_b, B)
    assert B % tb == 0, (B, tb)
    kernel = _make_kernel_inv(n, L, shallow, w.lo, w.hi, precision)
    flops = 2 * B * n * (len(w.lo) * 2 * shallow + (n >> shallow))
    return pl.pallas_call(
        kernel,
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tb, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(St.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n), y.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * B * n * y.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(y, St)


def _default_in_cutoff(precision, inverse: bool = False) -> int:
    """Precision-keyed in-kernel matmul cutoff (round-4 probes,
    benchmarks/probe_wpt1.py + interleaved A/Bs, guarded slope method,
    B=1024 n=4096 L=8):

      * DEFAULT (1-pass bf16 MXU): throughput rises with the
        composed-operator size — forward cut512 29-34, cut1024 35-42 Gsps
        (2048 flat: interleaved medians 36.9 vs 36.3); the INVERSE keeps
        rising to 2048 (interleaved medians 27.4 / 38.0 / 42.4 at
        512/1024/2048, tight bands) — so fwd=1024, inv=2048.
      * HIGHEST (6-pass f32): large operators drown in MXU passes — cut1024
        measured 12.5 Gsps vs 21-32 at 256/512; 128..512 are inside the
        variance band under interleaving, keep 512 (rounds 2-3 value).

    The round-3 precision_ladder.json 68.5 Gsps DEFAULT row was a pre-guard
    slope artifact; the guarded ceiling is ~38-42 Gsps (BENCHMARKS.md r4)."""
    if precision == jax.lax.Precision.DEFAULT:
        # the inverse's measured optimum is 2x the forward's; both scale
        # down together when the user lowers the global matmul cutoff
        return (min(2048, 2 * _ops.MATMUL_CUTOFF) if inverse
                else min(1024, _ops.MATMUL_CUTOFF))
    return min(512, _ops.MATMUL_CUTOFF)


def _make_kernel(n: int, L: int, shallow: int, lo, hi, precision):
    def kernel(x_ref, a_ref, y_ref):
        # f32 compute regardless of storage dtype (see _make_kernel_inv).
        cur = x_ref[:].T.astype(jnp.float32)  # (n, TB), signal on sublanes
        for d in range(shallow):
            m = n >> d
            outs = []
            for b in range(1 << d):
                w1, w2 = _node_level(cur[b * m:(b + 1) * m], lo, hi)
                outs.append(w1)
                outs.append(w2)
            cur = jnp.concatenate(outs, axis=0)
        if shallow < L:
            m0 = n >> shallow
            at = a_ref[:].astype(jnp.float32)  # (m0, m0) = A^T
            pieces = []
            for b in range(1 << shallow):
                node = cur[b * m0:(b + 1) * m0]
                # Mosaic supports only DEFAULT/HIGHEST dot precision; map the
                # XLA-only HIGH (bf16_3x) to HIGHEST inside the kernel
                prec = precision
                if prec == jax.lax.Precision.HIGH:
                    prec = jax.lax.Precision.HIGHEST
                pieces.append(jnp.dot(at, node,
                                      preferred_element_type=jnp.float32,
                                      precision=prec))
            cur = jnp.concatenate(pieces, axis=0)
        y_ref[:] = cur.T.astype(y_ref.dtype)
    return kernel


def wpt_pallas(x, wt: str, L: int, block_b: int = 128, precision=None,
               in_cutoff: int | None = None, interpret: bool = False):
    """Fused 1-D WPT (int levels) for (B, n) float32/bfloat16 on TPU.

    ``precision=None`` resolves conv.MATMUL_PRECISION *here*, in this
    un-jitted wrapper, so the resolved value is the jit static key and
    set_matmul_precision() re-traces direct top-level calls too (apijit
    callers already re-trace via their own precision-keyed cache).
    ``interpret=True`` runs through the Pallas interpreter (CPU tests)."""
    precision = _conv.MATMUL_PRECISION if precision is None else precision
    return _wpt_pallas_jit(x, wt, L, block_b, precision, in_cutoff,
                           interpret)


@functools.partial(jax.jit,
                   static_argnames=("wt", "L", "block_b", "precision",
                                    "in_cutoff", "interpret"),
                   inline=True)
def _wpt_pallas_jit(x, wt, L: int, block_b: int, precision,
                    in_cutoff: int | None, interpret: bool):
    w = _wavelet(wt) if isinstance(wt, str) else wt
    B, n = x.shape
    # The in-kernel cutoff differs from the XLA path's MATMUL_CUTOFF: shallow
    # window levels are cheap on the VPU here, so trading MXU flops
    # (2*n*m0/signal in the composed dot) for more window levels wins at
    # HIGHEST, while DEFAULT's 1-pass MXU prefers a bigger operator — the
    # cutoff is precision-keyed (see _default_in_cutoff).
    cutoff = (_default_in_cutoff(precision) if in_cutoff is None
              else in_cutoff)
    shallow = 0
    while shallow < L and (n >> shallow) > cutoff:
        shallow += 1
    if shallow < L:
        m0 = n >> shallow
        A = _ops.composed_analysis_operator(
            _ops.taps_key(w.lo, w.hi), m0, L - shallow)
        At = jnp.asarray(np.ascontiguousarray(A.T), x.dtype)
    else:
        At = jnp.zeros((8, 128), x.dtype)  # unused
    tb = min(block_b, B)
    assert B % tb == 0, (B, tb)
    kernel = _make_kernel(n, L, shallow, w.lo, w.hi, precision)
    flops = 2 * B * n * (len(w.lo) * 2 * shallow + (n >> shallow))
    return pl.pallas_call(
        kernel,
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tb, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(At.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * B * n * x.dtype.itemsize,
            transcendentals=0),
        # fp32-accurate (6-pass) MXU dots need extra scratch beyond the
        # default 16MB scoped-vmem budget; v5e has 128MB physical VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(x, At)
