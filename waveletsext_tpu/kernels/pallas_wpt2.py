"""Pallas fused 2-D WPT kernels for TPU.

The 2-D packet transform is separable and its column/row ops commute across
levels (the same fact the XLA composed path exploits, transforms/dwt.py
_composed_fwd2), so one batch tile makes a single trip through VMEM:

* the shallow levels (blocks larger than the in-kernel cutoff) run as
  polyphase window correlates on the VPU — always along the sublane axis,
  with one transpose per pass so the row pass reuses the identical
  sublane-correlate form (Mosaic on this toolchain supports transposes and
  sublane slices but not lane-dim splits; see pallas_wpt.py);
* every remaining level collapses into one composed per-node orthogonal
  operator contraction per axis on the MXU (kernels/operators.py).

HBM traffic is one read + one write of the image tile; the XLA path
materializes every level (or, for the pure composed path, the intermediate
of the two full-size matmuls).  Cost model (v5e, HIGHEST = 6-pass f32 MXU):
the pure composed path at n=512 spends 2·n·m·(n+m) MXU flops/image; two
shallow VPU levels cut the composed side to 128-blocks — 4x fewer MXU flops
for 2·2·F·nm VPU flops/level, a large win when the MXU runs multi-pass.

Reference semantics: dwt_one_level.jl:319-354 (columns then rows per level);
numerically equivalent to transforms.dwt.wpt2 up to f32 summation order.
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
from .pallas_wpt import _node_level, _node_level_inv


def _mosaic_prec(precision):
    # Mosaic supports only DEFAULT/HIGHEST dot precision; map the XLA-only
    # HIGH (bf16_3x) to HIGHEST inside the kernel
    if precision == jax.lax.Precision.HIGH:
        return jax.lax.Precision.HIGHEST
    return precision


def _make_kernel2(n: int, m: int, L: int, shallow: int, lo, hi, precision):
    prec = _mosaic_prec(precision)

    def kernel(x_ref, an_ref, am_ref, y_ref):
        # f32 compute regardless of storage dtype (see pallas_wpt.py)
        cur = x_ref[0].astype(jnp.float32)  # (n, m)
        dims = (n, m)
        for d in range(shallow):
            for axis in range(2):  # columns pass, then (transposed) rows pass
                bs = dims[axis] >> d
                pieces = []
                for p in range(1 << d):
                    w1, w2 = _node_level(cur[p * bs:(p + 1) * bs, :], lo, hi)
                    pieces.append(w1)
                    pieces.append(w2)
                cur = jnp.concatenate(pieces, axis=0).T
        if shallow < L:
            for axis in range(2):
                bs = dims[axis] >> shallow
                at = (an_ref if axis == 0 else am_ref)[:].astype(jnp.float32)
                pieces = []
                for p in range(1 << shallow):
                    node = cur[p * bs:(p + 1) * bs, :]
                    pieces.append(jnp.dot(at, node,
                                          preferred_element_type=jnp.float32,
                                          precision=prec))
                cur = jnp.concatenate(pieces, axis=0).T
        y_ref[0] = cur.astype(y_ref.dtype)
    return kernel


def _make_kernel2_inv(n: int, m: int, L: int, shallow: int, lo, hi,
                      precision):
    prec = _mosaic_prec(precision)

    def kernel(y_ref, sn_ref, sm_ref, x_ref):
        cur = y_ref[0].astype(jnp.float32)  # (n, m)
        dims = (n, m)
        if shallow < L:
            for axis in range(2):
                bs = dims[axis] >> shallow
                st = (sn_ref if axis == 0 else sm_ref)[:].astype(jnp.float32)
                pieces = []
                for p in range(1 << shallow):
                    node = cur[p * bs:(p + 1) * bs, :]
                    pieces.append(jnp.dot(st, node,
                                          preferred_element_type=jnp.float32,
                                          precision=prec))
                cur = jnp.concatenate(pieces, axis=0).T
        for d in range(shallow - 1, -1, -1):
            for axis in range(2):
                bs = dims[axis] >> d
                pieces = []
                for p in range(1 << d):
                    pieces.append(_node_level_inv(
                        cur[p * bs:(p + 1) * bs, :], lo, hi))
                cur = jnp.concatenate(pieces, axis=0).T
        x_ref[0] = cur.astype(x_ref.dtype)
    return kernel


def _default_cutoff2(precision) -> int:
    """In-kernel cutoff for the composed contractions, by dot precision
    (benchmarks/probe_wpt2.json, v5e, 512x512 db4 L=4):

    * HIGHEST (6-pass f32-accurate MXU): composed flops are expensive, so
      trade them for VPU window levels — 256 best (20.6 Gsps vs 15.8 at
      512, 15.3 at 128).
    * DEFAULT/HIGH (1-pass bf16 MXU): the MXU is nearly free and the VPU
      becomes the bound — pure composed at 512 wins big (77.9 Gsps vs 30.4
      at 256).
    """
    return 256 if precision == jax.lax.Precision.HIGHEST else 512


def _shallow_levels(n: int, m: int, L: int, cutoff: int) -> int:
    s = 0
    while s < L and (min(n, m) >> s) > cutoff:
        s += 1
    return s


def _composed_pair(w, n, m, shallow, L, dtype, synthesis: bool):
    """(op_n^T, op_m^T) composed deep operators as jnp constants (transposed:
    the kernels contract ``op^T @ node`` with the signal on sublanes)."""
    tk = _ops.taps_key(w.lo, w.hi)
    make = (_ops.composed_synthesis_operator if synthesis
            else _ops.composed_analysis_operator)
    bn, bm = n >> shallow, m >> shallow
    On = make(tk, bn, L - shallow)
    Om = On if bm == bn else make(tk, bm, L - shallow)
    OnT = jnp.asarray(np.ascontiguousarray(On.T), dtype)
    OmT = OnT if Om is On else jnp.asarray(np.ascontiguousarray(Om.T), dtype)
    return OnT, OmT


def _flops2(B, n, m, F, shallow, deep_bs):
    # per image: shallow VPU passes (2 axes x 2 filters x F fmas per sample
    # per level) + composed contractions (2 sides x 2*n*m*bs)
    return 2 * B * n * m * (2 * F * 2 * shallow + 2 * deep_bs)


def wpt2_pallas(x, wt: str, L: int, precision=None,
                in_cutoff: int | None = None, interpret: bool = False):
    """Fused 2-D WPT (int levels) for (B, n, m) float32/bfloat16 on TPU.

    ``precision=None`` resolves conv.MATMUL_PRECISION here (un-jitted), so
    the resolved value is the jit static key and set_matmul_precision()
    re-traces direct calls.  ``interpret=True`` runs the Pallas interpreter
    (CPU parity tests)."""
    precision = _conv.MATMUL_PRECISION if precision is None else precision
    return _wpt2_pallas_jit(x, wt, L, precision, in_cutoff, interpret)


@functools.partial(jax.jit,
                   static_argnames=("wt", "L", "precision", "in_cutoff",
                                    "interpret"),
                   inline=True)
def _wpt2_pallas_jit(x, wt, L: int, precision, in_cutoff: int | None,
                     interpret: bool):
    w = _wavelet(wt) if isinstance(wt, str) else wt
    B, n, m = x.shape
    cutoff = (_default_cutoff2(precision) if in_cutoff is None
              else in_cutoff)
    shallow = _shallow_levels(n, m, L, cutoff)
    if shallow < L:
        AnT, AmT = _composed_pair(w, n, m, shallow, L, x.dtype, False)
    else:
        AnT = AmT = jnp.zeros((8, 128), x.dtype)  # unused
    kernel = _make_kernel2(n, m, L, shallow, w.lo, w.hi, precision)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(AnT.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(AmT.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, m), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=_flops2(B, n, m, len(w.lo), shallow, min(n, m) >> shallow),
            bytes_accessed=2 * B * n * m * x.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )(x, AnT, AmT)


def _make_kernel2_stack(n: int, m: int, L: int, lo, hi):
    """All-levels 2-D packet stack kernel: one VMEM trip emits every level
    plane (the wpd2 layout).  Every level runs as polyphase window
    correlates on the VPU — with all planes needed there is no multi-level
    operator to compose, and the one-level (bs, bs) matmul at HIGHEST is
    6-pass MXU work the VPU beats (see transforms.dwt._level2_cutoff)."""

    def kernel(x_ref, y_ref):
        cur = x_ref[0].astype(jnp.float32)  # (n, m)
        y_ref[0, 0] = cur.astype(y_ref.dtype)
        dims = (n, m)
        for d in range(L):
            for axis in range(2):  # columns pass, then (transposed) rows
                bs = dims[axis] >> d
                pieces = []
                for p in range(1 << d):
                    w1, w2 = _node_level(cur[p * bs:(p + 1) * bs, :], lo, hi)
                    pieces.append(w1)
                    pieces.append(w2)
                cur = jnp.concatenate(pieces, axis=0).T
            y_ref[0, d + 1] = cur.astype(y_ref.dtype)
    return kernel


def wpd2_pallas(x, wt: str, L: int, interpret: bool = False):
    """Fused 2-D wavelet packet stack for (B, n, m) f32/bf16 on TPU:
    (B, n, m) -> (B, L+1, n, m) (transforms.dwt.wpd2 layout, level 0 = the
    image).  Reference semantics: DWT.jl:164-209."""
    return _wpd2_pallas_jit(x, wt, L, interpret)


@functools.partial(jax.jit, static_argnames=("wt", "L", "interpret"),
                   inline=True)
def _wpd2_pallas_jit(x, wt, L: int, interpret: bool):
    w = _wavelet(wt) if isinstance(wt, str) else wt
    B, n, m = x.shape
    kernel = _make_kernel2_stack(n, m, L, w.lo, w.hi)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, n, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, L + 1, n, m), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L + 1, n, m), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n * m * 2 * len(w.lo) * 2 * L,
            bytes_accessed=B * n * m * (L + 2) * x.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )(x)


def iwpt2_pallas(y, wt: str, L: int, precision=None,
                 in_cutoff: int | None = None, interpret: bool = False):
    """Fused 2-D inverse WPT — mirror of :func:`wpt2_pallas` (composed
    synthesis contractions on the MXU, then the shallow inverse window
    levels on the VPU, one VMEM trip per image)."""
    precision = _conv.MATMUL_PRECISION if precision is None else precision
    return _iwpt2_pallas_jit(y, wt, L, precision, in_cutoff, interpret)


@functools.partial(jax.jit,
                   static_argnames=("wt", "L", "precision", "in_cutoff",
                                    "interpret"),
                   inline=True)
def _iwpt2_pallas_jit(y, wt, L: int, precision, in_cutoff: int | None,
                      interpret: bool):
    w = _wavelet(wt) if isinstance(wt, str) else wt
    B, n, m = y.shape
    cutoff = (_default_cutoff2(precision) if in_cutoff is None
              else in_cutoff)
    shallow = _shallow_levels(n, m, L, cutoff)
    if shallow < L:
        SnT, SmT = _composed_pair(w, n, m, shallow, L, y.dtype, True)
    else:
        SnT = SmT = jnp.zeros((8, 128), y.dtype)  # unused
    kernel = _make_kernel2_inv(n, m, L, shallow, w.lo, w.hi, precision)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(SnT.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(SmT.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, m), y.dtype),
        cost_estimate=pl.CostEstimate(
            flops=_flops2(B, n, m, len(w.lo), shallow, min(n, m) >> shallow),
            bytes_accessed=2 * B * n * m * y.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )(y, SnT, SmT)
