"""Pallas fused 2-D stationary (à-trous) kernels for TPU.

2-D analog of ``pallas_swt.py``: the separable 2-D à-trous step
(swt_one_level.jl:334-370; columns then rows on analysis, rows then columns
on the average inverse — kernels/conv.sdwt_step2 / isdwt_step2_average) runs
entirely inside VMEM, one image per grid step.  Every dilated correlate is a
stride-1 sublane window sum over offsets pre-reduced mod the axis length
(a dilation D·t is a fixed circular shift), with one transpose per axis pass
(Mosaic supports transposes and sublane slices, not lane-dim splits).

The inverse uses the same adjoint identity as the 1-D kernel — the
average-based inverse step equals ``(A_loᵀ w1 + A_hiᵀ w2) / 2`` per axis,
i.e. dilated correlates with negated offsets and halved taps — applied rows
first then columns, and optionally fuses per-image hard/soft thresholding of
every plane as it is consumed (``undersmooth`` spares the slot-0 LL plane),
mirroring :func:`waveletsext_tpu.denoising.swt_denoise_pipeline2`.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..filters import wavelet as _wavelet
from .pallas_swt import _sublane_circ, _fwd_offsets, _plane_threshold


def _inv_offsets(n: int, F: int, D: int):
    lo = [(-D * (t - 1)) % n for t in range(F)]
    hi = [(-D * (t - F + 1)) % n for t in range(F)]
    return lo, hi


def _make_sdwt2_kernel(n: int, m: int, L: int, lo, hi):
    F = len(lo)

    def kernel(x_ref, y_ref):
        cur = x_ref[0].astype(jnp.float32)  # (n, m)
        for d in range(L):
            D = 1 << d
            lo_n = _fwd_offsets(n, F, D, -1)
            hi_n = _fwd_offsets(n, F, D, -(F - 1))
            lo_m = _fwd_offsets(m, F, D, -1)
            hi_m = _fwd_offsets(m, F, D, -(F - 1))
            t1 = _sublane_circ(cur, lo, lo_n).T  # columns pass -> (m, n)
            t2 = _sublane_circ(cur, hi, hi_n).T
            w1 = _sublane_circ(t1, lo, lo_m)     # rows pass on sublane m
            w2 = _sublane_circ(t1, hi, hi_m)
            w3 = _sublane_circ(t2, lo, lo_m)
            w4 = _sublane_circ(t2, hi, hi_m)
            base = 3 * (L - d)
            y_ref[0, base - 2] = w2.T.astype(y_ref.dtype)
            y_ref[0, base - 1] = w3.T.astype(y_ref.dtype)
            y_ref[0, base] = w4.T.astype(y_ref.dtype)
            cur = w1.T                           # LL back to (n, m)
        y_ref[0, 0] = cur.astype(y_ref.dtype)
    return kernel


def _make_isdwt2_kernel(n: int, m: int, L: int, lo, hi, has_t: bool,
                        soft: bool, undersmooth: bool):
    F = len(lo)
    lo_h = [0.5 * float(c) for c in lo]  # fold the per-axis 0.5 averaging
    hi_h = [0.5 * float(c) for c in hi]

    def kernel(y_ref, t_ref, x_ref):
        # t_ref holds the full (B, 128) replicated threshold table (a
        # (1, 128) per-image block is not tile-aligned); slice this image's
        # row by grid position
        t = None
        if has_t:
            row = t_ref[pl.dslice(pl.program_id(0), 1), :]  # (1, 128)
            t = jnp.max(row.astype(jnp.float32), axis=1, keepdims=True)

        def plane(j, thresh):
            p = y_ref[0, j].astype(jnp.float32)  # (n, m)
            if has_t and thresh:
                p = _plane_threshold(p, t, soft)
            return p

        cur = plane(0, not undersmooth)
        for d in range(L - 1, -1, -1):
            D = 1 << d
            base = 3 * (L - d)
            w2 = plane(base - 2, True)
            w3 = plane(base - 1, True)
            w4 = plane(base, True)
            ilo_m, ihi_m = _inv_offsets(m, F, D)
            ilo_n, ihi_n = _inv_offsets(n, F, D)
            # rows pass (sublane m): t1 from (LL, LH), t2 from (HL, HH)
            t1 = (_sublane_circ(cur.T, lo_h, ilo_m)
                  + _sublane_circ(w2.T, hi_h, ihi_m))   # (m, n)
            t2 = (_sublane_circ(w3.T, lo_h, ilo_m)
                  + _sublane_circ(w4.T, hi_h, ihi_m))
            # columns pass (sublane n)
            cur = (_sublane_circ(t1.T, lo_h, ilo_n)
                   + _sublane_circ(t2.T, hi_h, ihi_n))  # (n, m)
        x_ref[0] = cur.astype(x_ref.dtype)
    return kernel


@functools.partial(jax.jit, static_argnames=("wt", "L", "interpret"),
                   inline=True)
def sdwt2_pallas(x, wt, L: int, interpret: bool = False):
    """Fused 2-D stationary DWT stack for (B, n, m) f32/bf16 on TPU:
    one VMEM trip per image computes all 3L+1 planes
    (layout of transforms.swt.sdwt2)."""
    w = _wavelet(wt) if isinstance(wt, str) else wt
    B, n, m = x.shape
    kernel = _make_sdwt2_kernel(n, m, L, w.lo, w.hi)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, n, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3 * L + 1, n, m), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3 * L + 1, n, m), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )(x)


@functools.partial(jax.jit,
                   static_argnames=("wt", "has_t", "soft", "undersmooth",
                                    "interpret"),
                   inline=True)
def isdwt2_pallas(xw, wt, t=0.0, has_t: bool = False, soft: bool = False,
                  undersmooth: bool = False, interpret: bool = False):
    """Fused average-based inverse 2-D SDWT for (B, 3L+1, n, m), with
    optional per-image threshold fusion (``has_t``): every plane is
    hard/soft-thresholded as consumed, the slot-0 LL plane spared when
    ``undersmooth``."""
    w = _wavelet(wt) if isinstance(wt, str) else wt
    B, P, n, m = xw.shape
    L = (P - 1) // 3
    kernel = _make_isdwt2_kernel(n, m, L, w.lo, w.hi, has_t, soft,
                                 undersmooth)
    # scalar t (the documented default) broadcasts to a per-image column;
    # per-image arrays may arrive as (B,) or (B, 1) — ravel first.
    ta = jnp.asarray(t if has_t else jnp.zeros(B), jnp.float32)
    t_col = jnp.broadcast_to(ta.reshape(-1) if ta.ndim else ta, (B,))
    t_rep = jnp.broadcast_to(jnp.reshape(t_col, (B, 1)), (B, 128))
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P, n, m), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, m), xw.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )(xw, t_rep)
