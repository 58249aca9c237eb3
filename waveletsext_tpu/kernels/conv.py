"""Periodic filter-bank convolution primitives.

Every inner loop of the reference is an instance of one circular correlation

    w[..., i] = sum_t f[t] * x[..., (stride*i + dilation*t + offset) mod n]

-- the decimated analysis step (/root/reference/src/mod/dwt/dwt_one_level.jl:
79-107), the a-trous SWT step (swt_one_level.jl:99-127), the ACWT step with its
phase shift (acwt_one_level.jl:101-128), and (via polyphase decomposition) all
of the synthesis steps.  This module implements that one primitive as a stack
of static strided slices over a doubled buffer — fully fusible by XLA, no
gathers, no dynamic shapes — plus the analysis/synthesis step pairs built on
it.  Filters arrive as host numpy arrays and are folded into the program as
constants.

Pallas fast paths for the hot batched cases live in ``pallas_wpt.py`` /
``pallas_wpt2.py`` (fused decimated stacks) and ``pallas_swt.py`` /
``pallas_swt2.py`` (redundant stacks); the implementations here are the
reference-accurate (float64-capable) ground truth.
"""

from __future__ import annotations

import contextlib as _contextlib

import numpy as np
import jax
import jax.numpy as jnp

from . import operators as _ops

# Matmul precision for the dense per-node operator path.  On TPU the default
# f32 matmul precision is bf16 passes, which costs ~1e-2 absolute error per
# round trip through the (m, m) operators — unacceptable for a library whose
# reference semantics are exact float64 reconstruction.  HIGHEST requests the
# fp32-accurate MXU mode; override (e.g. Precision.DEFAULT for speed over
# accuracy) via set_matmul_precision().
MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def set_matmul_precision(p):
    """Set the MXU precision used by the dense operator fast paths.

    Takes effect immediately for every public transform AND the fused
    pipeline entry points (basis.bestbasis_pipeline, the denoise pipelines):
    all go through the apijit dispatch layer (_jit.apijit), which keys its
    jit cache on this global, so a precision change re-traces on the next
    call instead of silently reusing old executables.
    """
    global MATMUL_PRECISION
    MATMUL_PRECISION = jax.lax.Precision(p) if isinstance(p, str) else p


@_contextlib.contextmanager
def matmul_precision(p):
    """Scoped precision override (restores the previous value on exit)::

        with wx.matmul_precision("default"):   # ~2.5-4x transform throughput
            y = wx.wpt2(images, "db4", 4)      # at ~2e-3 rel-rms error

    Equivalent to ``set_matmul_precision`` + try/finally; see that function
    for the re-trace semantics."""
    global MATMUL_PRECISION
    prev = MATMUL_PRECISION
    set_matmul_precision(p)
    try:
        yield
    finally:
        MATMUL_PRECISION = prev


def periodic_filter(x, taps, stride: int = 1, dilation: int = 1, offset: int = 0):
    """w[..., i] = sum_t taps[t] * x[..., (stride*i + dilation*t + offset) % n].

    ``stride`` must divide ``n``; output length is ``n // stride``.  ``taps``
    is a host numpy array (static), folded in as constants.

    Implementation: pre-roll by ``offset``, circular-pad on the right by the
    filter span, then one ``conv_general_dilated`` (stride = ``stride``,
    rhs_dilation = ``dilation``).  XLA's conv path is the fast lowering on
    both TPU (MXU/VPU tiled) and CPU; per-tap strided slices lower
    pathologically on TPU (measured ~5 GB/s vs ~140 GB/s for conv).
    """
    n = x.shape[-1]
    assert n % stride == 0, (n, stride)
    nout = n // stride
    F = len(taps)
    if dilation < 0:
        # flip identity: sum_t f[t] x[si - |d|t + o] == sum_t f'[t] x[si + |d|t + o']
        taps = np.asarray(taps)[::-1]
        offset = offset + dilation * (F - 1)
        dilation = -dilation
    if offset % n != 0:
        x = jnp.roll(x, -offset, axis=-1)
    span = dilation * (F - 1)
    if span > 0:
        reps = [x]
        left = span
        while left > 0:
            take = min(left, n)
            reps.append(x[..., :take])
            left -= take
        xp = jnp.concatenate(reps, axis=-1)
    else:
        xp = x
    lead = x.shape[:-1]
    xr = xp.reshape((-1, 1, xp.shape[-1]))
    filt = jnp.asarray(np.asarray(taps), x.dtype).reshape(1, 1, F)
    out = jax.lax.conv_general_dilated(
        xr, filt,
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[..., 0, :nout].reshape(*lead, nout)


def _window_correlate(x, taps, offset: int):
    """Full-length circular correlation on the last axis:
    w[..., j] = sum_t taps[t] * x[..., (j + t + offset) % n].

    Contiguous-window formulation (circular pad + static slices + fma) — the
    fastest XLA lowering measured on TPU for stride-1 dense filters; strided
    selections are done by the caller via trailing reshape, never by strided
    slices."""
    F = len(taps)
    n = x.shape[-1]
    lpad = max(0, -offset)
    rpad = max(0, offset + F - 1)
    assert lpad <= n and rpad <= n
    parts = []
    if lpad:
        parts.append(x[..., n - lpad:])
    parts.append(x)
    if rpad:
        parts.append(x[..., :rpad])
    xall = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else x
    acc = None
    for t in range(F):
        start = lpad + offset + t
        sl = jax.lax.slice_in_dim(xall, start, start + n, axis=-1)
        term = float(taps[t]) * sl
        acc = term if acc is None else acc + term
    return acc


def _circ_correlate(x, taps, offset: int):
    """Window correlate with a periodic_filter fallback when the circular
    pad would exceed the signal length (tiny signals / long filters)."""
    F = len(taps)
    n = x.shape[-1]
    if max(0, -offset) <= n and max(0, offset + F - 1) <= n:
        return _window_correlate(x, taps, offset)
    return periodic_filter(x, taps, stride=1, dilation=1, offset=offset)


def _even(x):
    """Select even positions of the last axis via a trailing reshape (avoids
    pathological strided-slice lowerings)."""
    return x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)[..., 0]


# ---------------------------------------------------------------------------
# Decimated (DWT/WPT) steps — dwt_one_level.jl conventions
# ---------------------------------------------------------------------------

def analysis_step(v, lo: np.ndarray, hi: np.ndarray, cutoff: int | None = None):
    """One decimated analysis step on the last axis (batched elsewhere).

    Equals the reference ``dwt_step!`` (dwt_one_level.jl:79-107) with
    ``lo = scaling filter`` and ``hi`` its mirror (see filters.py).
    Returns ``(w1, w2)`` of length n/2 each.  Dispatch (operator matmul vs
    conv) lives in :func:`analysis_step_packed` — the single source of the
    cutoff rule."""
    m = v.shape[-1]
    out = analysis_step_packed(v, lo, hi, cutoff)
    return out[..., : m // 2], out[..., m // 2:]


def analysis_step_packed(nodes, lo: np.ndarray, hi: np.ndarray,
                         cutoff: int | None = None):
    """Packed one-level analysis: node blocks ``(..., m)`` -> ``[w1 | w2]``
    concatenated on the last axis ``(..., m)``.

    This is THE place encoding the small-node cutoff rule (the per-node
    (m, m) MXU operator matmul at or below the cutoff — default
    ``operators.MATMUL_CUTOFF`` — the conv lowering above it); the wpt/wpd
    level sweeps call this directly so the packed layout skips a
    split/concat round-trip, and :func:`analysis_step` slices it for the
    (w1, w2) interface.  ``cutoff`` overrides the global for callers whose
    flop balance differs (e.g. the SIWT engine at scale, where the 6-pass
    HIGHEST matmul on big nodes dominates — see transforms/siwt_dense.py)."""
    m = nodes.shape[-1]
    if m <= (_ops.MATMUL_CUTOFF if cutoff is None else cutoff):
        A = jnp.asarray(_ops.analysis_operator(_ops.taps_key(lo, hi), m),
                        nodes.dtype)
        return jnp.matmul(nodes, A, precision=MATMUL_PRECISION)
    L = len(lo)
    h = m // 2
    if L % 2 == 0 and L // 2 <= h:
        # Polyphase: correlate the even/odd input cosets with the matching
        # filter parity — half the fma volume of the full-rate correlate +
        # even-select (w1[i] = Σ_p lo[2p]·xe[i+p] + lo[2p+1]·xo[i+p]; w2's
        # full-rate offset 2−L is even so its coset offset is 1−L/2).
        cos = nodes.reshape(*nodes.shape[:-1], h, 2)
        xe, xo = cos[..., 0], cos[..., 1]
        w1 = (_circ_correlate(xe, np.asarray(lo[0::2]), 0)
              + _circ_correlate(xo, np.asarray(lo[1::2]), 0))
        w2 = (_circ_correlate(xe, np.asarray(hi[0::2]), 1 - L // 2)
              + _circ_correlate(xo, np.asarray(hi[1::2]), 1 - L // 2))
        return jnp.concatenate([w1, w2], axis=-1)
    w1 = _even(_window_correlate(nodes, lo, 0))
    w2 = _even(_window_correlate(nodes, hi, 2 - L))
    return jnp.concatenate([w1, w2], axis=-1)


def synthesis_step_packed(nodes, lo: np.ndarray, hi: np.ndarray,
                          cutoff: int | None = None):
    """Inverse of :func:`analysis_step_packed`: ``[w1 | w2]`` -> parent.
    Single source of the synthesis cutoff dispatch (``cutoff`` as in
    :func:`analysis_step_packed`)."""
    m = nodes.shape[-1]
    if m <= (_ops.MATMUL_CUTOFF if cutoff is None else cutoff):
        S = jnp.asarray(_ops.synthesis_operator(_ops.taps_key(lo, hi), m),
                        nodes.dtype)
        return jnp.matmul(nodes, S, precision=MATMUL_PRECISION)
    half = m // 2
    return _synthesis_conv(nodes[..., :half], nodes[..., half:], lo, hi)


def _synthesis_conv(w1, w2, lo: np.ndarray, hi: np.ndarray):
    """Polyphase conv synthesis:

        v[j] = sum_t lo[t]*u1[(j-t) % n] + sum_s hi[s]*u2[(j-s+L-2) % n]

    with u1/u2 the zero-stuffed upsamplings of w1/w2.  Splitting j and the tap
    indices by parity gives two plain circular correlations per branch."""
    L = len(lo)
    half = w1.shape[-1]
    outs = []
    for e in (0, 1):
        lo_e = np.asarray(lo[e::2])
        hi_e = np.asarray(hi[e::2])
        # flip identity turns the negative-step reads into plain windows
        ve = _window_correlate(w1, lo_e[::-1], -(len(lo_e) - 1))
        ve = ve + _window_correlate(w2, hi_e[::-1],
                                    L // 2 - 1 - (len(hi_e) - 1))
        outs.append(ve)
    return jnp.stack(outs, axis=-1).reshape(*w1.shape[:-1], 2 * half)


def synthesis_step(w1, w2, lo: np.ndarray, hi: np.ndarray,
                   cutoff: int | None = None):
    """Inverse of :func:`analysis_step` (dwt_one_level.jl:192-223).  Dispatch
    lives in :func:`synthesis_step_packed`."""
    half = w1.shape[-1]
    if 2 * half <= (_ops.MATMUL_CUTOFF if cutoff is None else cutoff):
        return synthesis_step_packed(jnp.concatenate([w1, w2], axis=-1),
                                     lo, hi, cutoff)
    return _synthesis_conv(w1, w2, lo, hi)


# ---------------------------------------------------------------------------
# A-trous (SWT) steps — swt_one_level.jl conventions
# ---------------------------------------------------------------------------

def _atrous_pair(v, D: int, lo, hi, off1: int, off2: int):
    """Dilated filter pair with offsets that are multiples of the dilation:
    w[i] = sum_t f[t] * v[(i + D*t + D*off) mod n].  Decomposes into D
    independent stride-1 circular correlations over the cosets i mod D —
    reshape, filter along the coset axis, reshape back.  Short cosets use a
    dense (c, 2c) operator matmul."""
    n = v.shape[-1]
    if D == 1:
        return (_circ_correlate(v, lo, off1), _circ_correlate(v, hi, off2))
    c = n // D
    cos = jnp.moveaxis(v.reshape(*v.shape[:-1], c, D), -1, -2)  # (..., D, c)
    F = len(lo)
    if c <= _ops.MATMUL_CUTOFF // 2 or c < F:
        M = jnp.asarray(_ops.atrous_operator(_ops.taps_key(lo, hi), c,
                                             off1, off2), v.dtype)
        out = jnp.matmul(cos, M, precision=MATMUL_PRECISION)  # (..., D, 2c)
        w1c = out[..., :c]
        w2c = out[..., c:]
    else:
        w1c = _window_correlate(cos, lo, off1)
        w2c = _window_correlate(cos, hi, off2)
    w1 = jnp.moveaxis(w1c, -2, -1).reshape(*v.shape[:-1], n)
    w2 = jnp.moveaxis(w2c, -2, -1).reshape(*v.shape[:-1], n)
    return w1, w2


def sdwt_step(v, d: int, lo: np.ndarray, hi: np.ndarray):
    """One stationary (a-trous) analysis step at depth ``d``
    (swt_one_level.jl:99-127).  Output length == input length."""
    L = len(lo)
    return _atrous_pair(v, 1 << d, lo, hi, -1, -(L - 1))


def isdwt_step_shift(v_shape_n: int, w1, w2, d: int, sv: int, sw: int,
                     lo: np.ndarray, hi: np.ndarray):
    """Shift-based inverse SWT step (swt_one_level.jl:279-318).

    Children are read on coset ``sw`` (stride 2^(d+1)); the reconstruction is
    the decimated synthesis of those subsequences, scattered onto parent coset
    ``sv`` (stride 2^d).  When ``sw == sv`` the reference writes outputs at
    ``m - 2^d`` — a circular shift by one slot in the strided domain.

    Returns a length-n array that is zero off the ``sv`` coset.
    """
    n = v_shape_n
    assert 0 <= sv < (1 << d)
    assert sv <= sw < (1 << (d + 1))
    sc = 1 << (d + 1)
    c1 = w1[..., sw::sc]
    c2 = w2[..., sw::sc]
    y = synthesis_step(c1, c2, lo, hi)  # length n / 2^d
    if sw == sv:
        y = jnp.roll(y, -1, axis=-1)
    v = jnp.zeros(w1.shape[:-1] + (n,), dtype=w1.dtype)
    v = v.at[..., sv:: (1 << d)].set(y)
    return v


def isdwt_step_average(w1, w2, d: int, lo: np.ndarray, hi: np.ndarray):
    """Average-based inverse SWT step (swt_one_level.jl:257-277): for every
    parent coset sv, average the sw=sv and sw=sv+2^d shift reconstructions.

    Vectorized: run the decimated synthesis on *all* 2^(d+1) child cosets at
    once, then combine.
    """
    n = w1.shape[-1]
    sc = 1 << (d + 1)
    nd = 1 << d
    m = n // sc
    # cosets[..., s, k] = w[..., k*sc + s]
    c1 = jnp.moveaxis(w1.reshape(*w1.shape[:-1], m, sc), -1, -2)
    c2 = jnp.moveaxis(w2.reshape(*w2.shape[:-1], m, sc), -1, -2)
    y = synthesis_step(c1, c2, lo, hi)  # (..., sc, n/2^d)
    y_noshift = jnp.roll(y[..., :nd, :], -1, axis=-1)  # sw == sv branch
    y_shift = y[..., nd:, :]                           # sw == sv + 2^d branch
    v_cosets = 0.5 * (y_noshift + y_shift)             # (..., 2^d, n/2^d)
    v = jnp.moveaxis(v_cosets, -2, -1).reshape(*w1.shape[:-1], n)
    return v


# ---------------------------------------------------------------------------
# Autocorrelation (ACWT) steps — acwt_one_level.jl conventions
# ---------------------------------------------------------------------------

def acdwt_step(v, d: int, ac_lo: np.ndarray, ac_hi: np.ndarray):
    """One autocorrelation-wavelet analysis step (acwt_one_level.jl:101-128).

    w[(i + (L//2+1)*2^d) % n] = sum_k f[k] * v[(i + (k+1)*2^d) % n]
    i.e. a dilated correlation with a half-filter phase shift.
    """
    Lac = len(ac_lo)
    off = -(Lac // 2)  # in coset units: s - (Lac//2 + 1)*s == -s*(Lac//2)
    return _atrous_pair(v, 1 << d, ac_lo, ac_hi, off, off)


def iacdwt_step(w1, w2):
    """Filterless ACWT inverse: (w1 + w2)/sqrt(2) (acwt_one_level.jl:217-224)."""
    return (w1 + w2) * float(1.0 / np.sqrt(2.0))


# ---------------------------------------------------------------------------
# Separable 2-D wrappers (columns = axis -2, rows = axis -1, matching the
# reference's Julia column-major order: columns first on analysis,
# rows first on synthesis)
# ---------------------------------------------------------------------------

def _on_cols(fn, arrays, *args, **kwargs):
    """Apply a last-axis op along axis -2 by transposing every array operand."""
    swapped = [jnp.swapaxes(a, -1, -2) for a in arrays]
    out = fn(*swapped, *args, **kwargs)
    if isinstance(out, tuple):
        return tuple(jnp.swapaxes(o, -1, -2) for o in out)
    return jnp.swapaxes(out, -1, -2)


def analysis_step2(v, lo, hi):
    """2-D decimated step (dwt_one_level.jl:319-354): columns then rows.
    Returns (w1, w2, w3, w4) = (LL, LH, HL, HH) quadrants, each (r/2, c/2)."""
    t1, t2 = _on_cols(analysis_step, [v], lo, hi)  # low/high on columns
    w1, w2 = analysis_step(t1, lo, hi)
    w3, w4 = analysis_step(t2, lo, hi)
    return w1, w2, w3, w4


def synthesis_step2(w1, w2, w3, w4, lo, hi):
    """2-D decimated inverse (dwt_one_level.jl:401-436): rows then columns."""
    t1 = synthesis_step(w1, w2, lo, hi)
    t2 = synthesis_step(w3, w4, lo, hi)
    return _on_cols(synthesis_step, [t1, t2], lo, hi)


def sdwt_step2(v, d, lo, hi):
    """2-D a-trous step (swt_one_level.jl:334-370)."""
    t1, t2 = _on_cols(sdwt_step, [v], d, lo, hi)
    w1, w2 = sdwt_step(t1, d, lo, hi)
    w3, w4 = sdwt_step(t2, d, lo, hi)
    return w1, w2, w3, w4


def isdwt_step2_average(w1, w2, w3, w4, d, lo, hi):
    t1 = isdwt_step_average(w1, w2, d, lo, hi)
    t2 = isdwt_step_average(w3, w4, d, lo, hi)
    return _on_cols(isdwt_step_average, [t1, t2], d, lo, hi)


def isdwt_step2_shift(n_rows, n_cols, w1, w2, w3, w4, d, sv, sw, lo, hi):
    t1 = isdwt_step_shift(n_cols, w1, w2, d, sv, sw, lo, hi)
    t2 = isdwt_step_shift(n_cols, w3, w4, d, sv, sw, lo, hi)
    return _on_cols(
        lambda a, b: isdwt_step_shift(n_rows, a, b, d, sv, sw, lo, hi),
        [t1, t2])


def acdwt_step2(v, d, ac_lo, ac_hi):
    """2-D ACWT step (acwt_one_level.jl:228-322)."""
    t1, t2 = _on_cols(acdwt_step, [v], d, ac_lo, ac_hi)
    w1, w2 = acdwt_step(t1, d, ac_lo, ac_hi)
    w3, w4 = acdwt_step(t2, d, ac_lo, ac_hi)
    return w1, w2, w3, w4


def iacdwt_step2(w1, w2, w3, w4):
    t1 = iacdwt_step(w1, w2)
    t2 = iacdwt_step(w3, w4)
    return _on_cols(iacdwt_step, [t1, t2])
