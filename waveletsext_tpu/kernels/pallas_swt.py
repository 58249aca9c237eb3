"""Pallas fused stationary/autocorrelation (à-trous) kernels for TPU.

The redundant 1-D transforms are stacks of *dilated circular correlations*
(swt_one_level.jl:99-127, acwt_one_level.jl:101-128).  On TPU the XLA path
(kernels/conv.py) runs each level as a coset-reshaped matmul/conv — at the
reference's sizes that is ~2L tiny dispatch-bound ops per pipeline plus a
full HBM stack materialization.  These kernels instead keep the whole
(L+1, n) stack in VMEM, signal-on-sublanes, and run every level as stride-1
sublane window sums over a doubled buffer with the tap offsets pre-reduced
mod n (a dilation D*t is a fixed circular shift, so no coset reshape and no
strided access is ever needed).

The average-based SWT inverse uses the adjoint identity

    isdwt_step_average(w1, w2, d) == (A_lo^T w1 + A_hi^T w2) / 2

(the two decimated shift-branch syntheses are exactly the even/odd row
halves of the adjoint, and the analysis pair is orthogonal per coset), i.e.
two more dilated correlates with negated offsets — verified to machine
precision against conv.isdwt_step_average in tests/test_pallas_swt.py.

Denoise fusion: the inverse kernels optionally apply per-signal hard/soft
thresholds to every stack slot as it is consumed (Denoising.jl:544-565
semantics; ``undersmooth`` spares slot 0), so threshold + reconstruct is one
VMEM trip.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..filters import wavelet as _wavelet

SQRT2_INV = float(1.0 / np.sqrt(2.0))


def _sublane_circ(w, taps, offs):
    """out[j] = sum_t taps[t] * w[(j + offs[t]) % h] on the sublane axis;
    ``offs`` pre-reduced to [0, h)."""
    h = w.shape[0]
    xall = jnp.concatenate([w, w], axis=0)
    acc = None
    for c, r in zip(taps, offs):
        term = float(c) * xall[r: r + h]
        acc = term if acc is None else acc + term
    return acc


def _fwd_offsets(n, F, D, off):
    return [(D * (t + off)) % n for t in range(F)]


def _make_sdwt_kernel(n: int, L: int, lo, hi):
    F = len(lo)

    def kernel(x_ref, y_ref):
        cur = x_ref[:].T.astype(jnp.float32)  # (n, TB)
        for d in range(L):
            D = 1 << d
            w2 = _sublane_circ(cur, hi, _fwd_offsets(n, F, D, -(F - 1)))
            cur = _sublane_circ(cur, lo, _fwd_offsets(n, F, D, -1))
            y_ref[:, L - d, :] = w2.T.astype(y_ref.dtype)
        y_ref[:, 0, :] = cur.T.astype(y_ref.dtype)
    return kernel


def _make_acdwt_kernel(n: int, L: int, ac_lo, ac_hi):
    F = len(ac_lo)
    off = -(F // 2)  # acwt phase shift in coset units (conv.acdwt_step)

    def kernel(x_ref, y_ref):
        cur = x_ref[:].T.astype(jnp.float32)
        for d in range(L):
            D = 1 << d
            offs = _fwd_offsets(n, F, D, off)
            w2 = _sublane_circ(cur, ac_hi, offs)
            cur = _sublane_circ(cur, ac_lo, offs)
            y_ref[:, L - d, :] = w2.T.astype(y_ref.dtype)
        y_ref[:, 0, :] = cur.T.astype(y_ref.dtype)
    return kernel


def _plane_threshold(plane, t, soft: bool):
    """Hard/soft-threshold a (TB, n) plane with the (TB, 1) per-signal
    threshold column ``t`` (hoisted out of the level loop by the caller)."""
    if soft:
        return jnp.sign(plane) * jnp.maximum(jnp.abs(plane) - t, 0.0)
    return jnp.where(jnp.abs(plane) > t, plane, 0.0)


def _threshold_column(t_ref):
    """t_ref holds the threshold replicated across its 128 lanes; a lane-
    axis max recovers the (TB, 1) column without lane slicing."""
    return jnp.max(t_ref[:].astype(jnp.float32), axis=1, keepdims=True)


def _make_isdwt_kernel(n: int, L: int, lo, hi, has_t: bool, soft: bool,
                       undersmooth: bool):
    F = len(lo)
    # fold the per-level 0.5 averaging into the synthesis taps: each level
    # scales its output by 0.5 either way, so halved taps are equivalent
    # and save one full-plane multiply per level
    lo_h = [0.5 * float(c) for c in lo]
    hi_h = [0.5 * float(c) for c in hi]

    def kernel(y_ref, t_ref, x_ref):
        t = _threshold_column(t_ref) if has_t else None

        def plane(j, thresh):
            p = y_ref[:, j, :].astype(jnp.float32)
            if has_t and thresh:
                p = _plane_threshold(p, t, soft)
            return p.T  # (n, TB)

        cur = plane(0, not undersmooth)
        for d in range(L - 1, -1, -1):
            D = 1 << d
            w2 = plane(L - d, True)
            cur = (
                _sublane_circ(cur, lo_h, [(-D * (t_ - 1)) % n
                                          for t_ in range(F)])
                + _sublane_circ(w2, hi_h, [(-D * (t_ - F + 1)) % n
                                           for t_ in range(F)]))
        x_ref[:] = cur.T.astype(x_ref.dtype)
    return kernel


def _make_iacdwt_kernel(n: int, L: int, has_t: bool, soft: bool,
                        undersmooth: bool):
    def kernel(y_ref, t_ref, x_ref):
        t = _threshold_column(t_ref) if has_t else None

        def plane(j, thresh):
            p = y_ref[:, j, :].astype(jnp.float32)
            if has_t and thresh:
                p = _plane_threshold(p, t, soft)
            return p

        cur = plane(0, not undersmooth)
        for d in range(L - 1, -1, -1):
            cur = (cur + plane(L - d, True)) * SQRT2_INV
        x_ref[:] = cur.astype(x_ref.dtype)
    return kernel


def _pick_tb(B: int, block_b: int):
    tb = min(block_b, B)
    while tb > 8 and B % tb:
        tb //= 2
    return tb if B % tb == 0 else None


def _stack_call(kernel, x, n_out_planes, interpret, extra=None):
    """pallas_call plumbing shared by the forward stack kernels:
    (B, n) -> (B, P, n)."""
    B = x.shape[0]
    n = x.shape[-1]
    tb = _pick_tb(B, 128)
    assert tb is not None, B
    return pl.pallas_call(
        kernel,
        grid=(B // tb,),
        in_specs=[pl.BlockSpec((tb, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tb, n_out_planes, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_out_planes, n), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )(x)


@functools.partial(jax.jit, static_argnames=("wt", "L", "interpret"),
                   inline=True)
def sdwt_pallas(x, wt, L: int, interpret: bool = False):
    """Fused 1-D stationary DWT stack for (B, n) f32/bf16 on TPU:
    one VMEM trip computes all L+1 planes (layout of transforms.swt.sdwt)."""
    w = _wavelet(wt) if isinstance(wt, str) else wt
    B, n = x.shape
    kernel = _make_sdwt_kernel(n, L, w.lo, w.hi)
    return _stack_call(kernel, x, L + 1, interpret)


@functools.partial(jax.jit, static_argnames=("wt", "L", "interpret"),
                   inline=True)
def acdwt_pallas(x, wt, L: int, interpret: bool = False):
    """Fused 1-D autocorrelation DWT stack (layout of transforms.acwt.acdwt)."""
    w = _wavelet(wt) if isinstance(wt, str) else wt
    B, n = x.shape
    kernel = _make_acdwt_kernel(n, L, w.ac_lo, w.ac_hi)
    return _stack_call(kernel, x, L + 1, interpret)


def _inv_call(kernel, xw, t, interpret):
    B, P, n = xw.shape
    tb = _pick_tb(B, 128)
    assert tb is not None, B
    # scalar t (the documented default) broadcasts to a per-signal column;
    # per-signal arrays may arrive as (B,) or the (B, 1) sigma columns the
    # fused pipelines produce via [..., None] — ravel before broadcasting.
    ta = jnp.asarray(t, jnp.float32)
    t_col = jnp.broadcast_to(ta.reshape(-1) if ta.ndim else ta, (B,))
    t_rep = jnp.broadcast_to(jnp.reshape(t_col, (B, 1)), (B, 128))
    return pl.pallas_call(
        kernel,
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tb, P, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n), xw.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )(xw, t_rep)


@functools.partial(jax.jit,
                   static_argnames=("wt", "has_t", "soft", "undersmooth",
                                    "interpret"),
                   inline=True)
def isdwt_pallas(xw, wt, t=0.0, has_t: bool = False, soft: bool = False,
                 undersmooth: bool = False, interpret: bool = False):
    """Fused average-based inverse SDWT for (B, L+1, n), with optional
    per-signal threshold fusion (``has_t``): every slot is hard/soft-
    thresholded as consumed, slot 0 spared when ``undersmooth``."""
    w = _wavelet(wt) if isinstance(wt, str) else wt
    B, P, n = xw.shape
    kernel = _make_isdwt_kernel(n, P - 1, w.lo, w.hi, has_t, soft,
                                undersmooth)
    return _inv_call(kernel, xw, t if has_t else jnp.zeros(B), interpret)


@functools.partial(jax.jit,
                   static_argnames=("has_t", "soft", "undersmooth",
                                    "interpret"),
                   inline=True)
def iacdwt_pallas(xw, t=0.0, has_t: bool = False, soft: bool = False,
                  undersmooth: bool = False, interpret: bool = False):
    """Fused filterless inverse ACDWT with optional threshold fusion."""
    B, P, n = xw.shape
    kernel = _make_iacdwt_kernel(n, P - 1, has_t, soft, undersmooth)
    return _inv_call(kernel, xw, t if has_t else jnp.zeros(B), interpret)
