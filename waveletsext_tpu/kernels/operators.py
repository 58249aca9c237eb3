"""Dense per-node level operators for small packet nodes.

A one-level decimated analysis/synthesis step on a length-m node is a fixed
orthogonal (m, m) linear map.  For small m the fastest TPU execution by far is
a dense matmul on the MXU — measured ~900 GB/s effective (HBM roofline) versus
pathological small-window conv lowerings.  The operators are built once on the
host with a numpy mirror of the periodic-filter conventions (see
kernels/conv.py and /root/reference/src/mod/dwt/dwt_one_level.jl) and folded
into jitted programs as constants.

``MATMUL_CUTOFF`` sets the node length at or below which the matmul path is
used; above it, the conv_general_dilated path wins.
"""

from __future__ import annotations

import functools

import numpy as np

MATMUL_CUTOFF = 1024


def _np_periodic_filter(x: np.ndarray, taps, stride=1, dilation=1, offset=0):
    """Rows of ``x`` filtered exactly like conv.periodic_filter."""
    n = x.shape[-1]
    nout = n // stride
    idx = (stride * np.arange(nout)[:, None]
           + dilation * np.arange(len(taps))[None, :] + offset) % n
    return np.einsum("rnt,t->rn", x[:, idx], np.asarray(taps))


def _np_analysis_step(v, lo, hi):
    F = len(lo)
    w1 = _np_pf(v, lo, 2, 1, 0)
    w2 = _np_pf(v, hi, 2, 1, 2 - F)
    return w1, w2


# patch: support negative dilation like conv.periodic_filter
def _np_pf(x, taps, stride=1, dilation=1, offset=0):
    taps = np.asarray(taps)
    if dilation < 0:
        taps = taps[::-1]
        offset = offset + dilation * (len(taps) - 1)
        dilation = -dilation
    return _np_periodic_filter(x, taps, stride, dilation, offset)


def _np_synth(w1, w2, lo, hi):
    F = len(lo)
    outs = []
    for e in (0, 1):
        ve = _np_pf(w1, lo[e::2], 1, -1, 0)
        ve = ve + _np_pf(w2, hi[e::2], 1, -1, F // 2 - 1)
        outs.append(ve)
    m = w1.shape[-1]
    return np.stack(outs, axis=-1).reshape(-1, 2 * m)


@functools.lru_cache(maxsize=None)
def analysis_operator(taps_key, m: int) -> np.ndarray:
    """(m, m) map: node row -> [w1 | w2] packed children row."""
    lo, hi = _unpack(taps_key)
    eye = np.eye(m)
    w1, w2 = _np_analysis_step(eye, lo, hi)
    return np.concatenate([w1, w2], axis=1)


@functools.lru_cache(maxsize=None)
def synthesis_operator(taps_key, m: int) -> np.ndarray:
    """(m, m) map: [w1 | w2] packed row -> parent node row."""
    lo, hi = _unpack(taps_key)
    eye = np.eye(m)
    h = m // 2
    return _np_synth(eye[:, :h], eye[:, h:], lo, hi)


def _unpack(taps_key):
    lo = np.frombuffer(taps_key[0], dtype=np.float64)
    hi = np.frombuffer(taps_key[1], dtype=np.float64)
    return lo, hi


def taps_key(lo, hi):
    return (np.asarray(lo, np.float64).tobytes(),
            np.asarray(hi, np.float64).tobytes())


@functools.lru_cache(maxsize=None)
def composed_analysis_operator(tkey, m: int, depth: int) -> np.ndarray:
    """(m, m) map taking a node row straight to its packed coefficients
    ``depth`` levels deeper — the whole deep part of a wpt collapses into a
    single MXU matmul (verified against step-by-step composition to 1e-15)."""
    lo, hi = _unpack(tkey)
    A = np.eye(m)
    for dd in range(depth):
        sub = 1 << dd
        blocks = A.reshape(m * sub, m // sub)
        w1, w2 = _np_analysis_step(blocks, lo, hi)
        A = np.concatenate([w1, w2], axis=1).reshape(m, m)
    return A


@functools.lru_cache(maxsize=None)
def composed_synthesis_operator(tkey, m: int, depth: int) -> np.ndarray:
    """(m, m) inverse of :func:`composed_analysis_operator`, built by
    composing the numpy synthesis steps (not a transpose, so it matches the
    reference inverse arithmetic)."""
    lo, hi = _unpack(tkey)
    S = np.eye(m)
    for dd in range(depth - 1, -1, -1):
        sub = 1 << dd
        mm = m // sub
        blocks = S.reshape(m * sub, mm)
        v = _np_synth(blocks[:, : mm // 2], blocks[:, mm // 2:], lo, hi)
        S = v.reshape(m, m)
    return S


@functools.lru_cache(maxsize=None)
def atrous_operator(tkey, c: int, off1: int, off2: int) -> np.ndarray:
    """(c, 2c) per-coset operator for one a-trous step on length-c cosets:
    out = [w1 | w2] with w_k[q] = sum_t f_k[t] x[(q + t + off_k) mod c]."""
    lo, hi = _unpack(tkey)
    eye = np.eye(c)
    w1 = _np_pf(eye, lo, 1, 1, off1)
    w2 = _np_pf(eye, hi, 1, 1, off2)
    return np.concatenate([w1, w2], axis=1)
