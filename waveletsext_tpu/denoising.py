"""Wavelet shrinkage denoising.

Re-implements /root/reference/src/mod/Denoising.jl: threshold operators
(Wavelets.jl HardTH/SoftTH), VisuShrink / SureShrink / RelErrorShrink
threshold selection (:124-166, :44-103), MAD noise estimation ``noisest``
(:214-232), the relative-error elbow search (:285-381), and the 7-input-type
``denoise``/``denoiseall`` drivers (:483-712).

Everything is batched (leading axes) and device-side: noise estimates, SURE
risk minimization and the elbow search are fixed-shape sort/cumsum/argmin
programs, so a whole batch denoises in one jitted call.  ``bestTH``
aggregation (mean/median across the batch) is one tiny cross-batch reduction
(a psum/all-reduce under a dp mesh).

Layouts: ``:dwt``/``:wpt`` coefficients are flat ``(..., n)``;
``:sdwt``/``:acdwt`` are ``(..., L+1, n)``; ``:swpd``/``:acwpd`` are
all-node tables ``(..., 2^(L+1)-1, n)`` (see transforms/).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ._jit import apijit
from .trees import maketree, maxtransformlevels, getleaf
from .utils import coarsestscalingrange, finestdetailrange, nodelength
from .transforms import dwt as _dwt_mod
from .transforms import swt as _swt_mod
from .transforms import acwt as _acwt_mod

# XLA's TPU row sort is ~3x faster at row length <= 256 (one-tile fast
# path; measured in BENCHMARKS.md round 3) — the subsampled SURE selector
# sizes its sorted subsample against this.
_SORT_FAST_LEN = 256


# ---------------------------------------------------------------------------
# Threshold operators (Wavelets.jl HardTH / SoftTH / SteinTH)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class HardTH:
    pass


@dataclasses.dataclass(frozen=True)
class SoftTH:
    pass


@dataclasses.dataclass(frozen=True)
class SteinTH:
    pass


def threshold(x, th, t):
    """Apply threshold operator ``th`` with (broadcast) threshold ``t``."""
    if isinstance(th, HardTH):
        return jnp.where(jnp.abs(x) > t, x, 0.0)
    if isinstance(th, SoftTH):
        return jnp.sign(x) * jnp.maximum(jnp.abs(x) - t, 0.0)
    if isinstance(th, SteinTH):
        return x * jnp.maximum(1.0 - (t ** 2) / jnp.maximum(x ** 2, 1e-300),
                               0.0)
    raise TypeError(f"unknown threshold type {th!r}")


# ---------------------------------------------------------------------------
# Shrink configurations (DNFT analogs)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class VisuShrink:
    """t = sqrt(2 log n) (Denoising.jl:124-126)."""
    th: object = HardTH()
    t: float = 1.0


def visushrink(n: int, th=HardTH()) -> VisuShrink:
    return VisuShrink(th, float(np.sqrt(2 * np.log(n))))


@dataclasses.dataclass(frozen=True)
class SureShrink:
    th: object = HardTH()
    t: float = 1.0


@dataclasses.dataclass(frozen=True)
class RelErrorShrink:
    """(Denoising.jl:44-50)."""
    th: object = HardTH()
    t: float = 1.0


def sureshrink(xw, redundant: bool = False, tree=None, th=HardTH(),
               subsample: int = 1):
    """Data-driven SureShrink constructor (Denoising.jl:63-103).  For batched
    input the ``t`` attribute is an array of per-signal values."""
    t = surethreshold(xw, redundant, tree, subsample=subsample)
    return SureShrink(th, t)


# ---------------------------------------------------------------------------
# Coefficient extraction helper for redundant tables
# ---------------------------------------------------------------------------

def _relevant_coefs(coef, redundant, tree):
    """Flatten the coefficients a threshold selector should look at
    (Denoising.jl:149-157, :287-295).

    Pinned to the reference source: for ``redundant=False`` (dwt/wpt input)
    the tree is *ignored* — Denoising.jl:151 is literally ``y = coef`` —
    because a decimated wpt output of length n IS the basis-coefficient set
    for any tree.  Only the redundant all-node tables (swpd/acwpd) restrict
    to the tree's leaf rows (Denoising.jl:155-157).  Tested in
    tests/test_denoise.py::test_surethreshold_decimated_tree_ignored."""
    if not redundant:
        return coef.reshape(*coef.shape[:-1], -1) if coef.ndim else coef
    if tree is None:
        return coef.reshape(*coef.shape[:-2], -1)
    leaves = np.nonzero(getleaf(np.asarray(tree, bool), "binary"))[0]
    return coef[..., leaves, :].reshape(*coef.shape[:-2], -1)


# ---------------------------------------------------------------------------
# Threshold selection
# ---------------------------------------------------------------------------

@apijit("redundant", "tree", "subsample", "fast_sort")
def surethreshold(coef, redundant: bool = False, tree=None,
                  subsample: int = 1, fast_sort: bool = True):
    """SURE risk minimization over sorted squared coefficients
    (Denoising.jl:146-166).  Batched over leading axes.

    ``subsample=1`` (default) is the exact formulation.  ``subsample=s > 1``
    minimizes the SURE risk estimated from a uniform subsample of the
    coefficients — the threshold is still a real coefficient magnitude, and
    the risk of the chosen threshold is within O(1/sqrt(m_eff)) of the exact
    minimum (the risk curve is an empirical average, so subsampling adds
    estimator noise of the same order as the SURE estimate itself).

    **Fast-sort floor** (``fast_sort=True``, the default): once you opt into
    ``s > 1``, the effective stride is ``max(s, ceil(n/256))`` so the sorted
    subsample stays on XLA's TPU row-sort fast path (rows of <= 256 lanes
    sort ~3x faster than any longer row; see BENCHMARKS.md).  The sampled
    count is therefore ``m_eff = min(n // s, 256)`` — for large ``n`` the
    estimate uses 256 coefficients regardless of ``s``.  Pass
    ``fast_sort=False`` to keep a mild user-chosen stride exactly (the
    estimate then uses all ``n // s`` coefficients at the slower sort), or
    ``subsample=1`` for the exact all-coefficient formulation.  The point of the mode: XLA's TPU sort is
    the entire cost of this selector at framework batch sizes (sorting
    (256, 2304) = 0.27 ms, sorting the s=8 subsample = 0.02 ms), and a
    histogram-bisection rewrite measured *slower* (compare-reduce tensors
    materialize; see BENCHMARKS.md).  Subsampling uses the trailing-reshape
    select, never a strided slice.
    """
    y = _relevant_coefs(coef, redundant, tree)
    n = y.shape[-1]
    if subsample >= n:  # degenerate: fall back to the exact formulation
        subsample = 1
    a2full = jnp.abs(y) ** 2
    a2 = a2full
    if subsample > 1:
        # XLA's TPU sort has a fast path for rows of <= 256 lanes (measured
        # at B=4096: sort of (B, 256) = 0.15 ms vs 0.39-0.45 ms for any
        # length in 288..512) — once the user opts into the subsampled
        # estimate, raise the stride so the sorted subsample stays on it.
        stride = (max(subsample, -(-n // _SORT_FAST_LEN)) if fast_sort
                  else subsample)
        m = (n // stride) * stride
        # middle phase of each stride-s block: a systematic phase-0 sample
        # can alias with structured layouts (per-level positions in a
        # flattened sdwt table); the mid phase decorrelates it from block
        # boundaries.  Trailing-reshape select, never a strided slice.
        a2 = a2[..., :m].reshape(*a2.shape[:-1], m // stride,
                                 stride)[..., stride // 2]
    m = a2.shape[-1]
    scale = n / m
    a = jnp.sort(a2, axis=-1)
    b = jnp.cumsum(a, axis=-1) * scale
    ks = jnp.arange(1, m + 1, dtype=a.dtype) * scale
    risk = (n - 2 * ks + b + (n - ks) * a) / n
    i = jnp.argmin(risk, axis=-1)
    rmin = jnp.take_along_axis(risk, i[..., None], axis=-1)[..., 0]
    t = jnp.take_along_axis(a, i[..., None], axis=-1)[..., 0]
    if subsample > 1:
        # the subsample misses the extreme tail, where the keep-nothing
        # optimum of sparse/pure-noise inputs lives — evaluate that one
        # candidate (t = max, rank = n) exactly: risk = (sum(a) - n)/n
        amax = jnp.max(a2full, axis=-1)
        rmax = (jnp.sum(a2full, axis=-1) - n) / n
        t = jnp.where(rmax < rmin, amax, t)
    return jnp.sqrt(t)


def _kth_smallest_vshaped(d, k: int):
    """k-th smallest (0-indexed) of ``d`` along the last axis, where ``d``
    is V-shaped (non-increasing then non-decreasing).  The k+1 smallest
    values of a V-shaped sequence occupy a contiguous index window, so the
    k-th smallest equals the minimum over all length-(k+1) windows of the
    window's endpoint maximum — two shifted views + max + min-reduce, no
    second sort."""
    m = d.shape[-1]
    return jnp.min(jnp.maximum(d[..., : m - k], d[..., k:]), axis=-1)


def _median_sorted(s):
    """Median along the last axis of an already-sorted array (matches
    jnp.median: mean of the two middles for even length)."""
    m = s.shape[-1]
    if m % 2:
        return s[..., m // 2]
    return 0.5 * (s[..., m // 2 - 1] + s[..., m // 2])


def _mad_subsample(dr, s: int):
    """Mid-phase every-s-th subsample along the last axis (the sureshrink
    pattern: trailing-reshape select, never a strided slice).  A MAD from
    m/s samples has relative error O(1/sqrt(m/s)) — immaterial for a
    threshold *scale* once m/s is a few thousand, while sorting the full
    row dominates whole pipelines (a (4, 65536) sort measured 2.4 ms)."""
    m = dr.shape[-1]
    if s <= 1 or m // s < 16:
        return dr
    mm = (m // s) * s
    return dr[..., :mm].reshape(*dr.shape[:-1], mm // s, s)[..., s // 2]


def _mad_sigma(dr):
    """sigma = median(|dr - median(dr)|) / 0.6745 from ONE sort along the
    last axis (the V-shaped order-statistic trick of :func:`noisest`;
    exactly equal to the two-median formulation)."""
    s = jnp.sort(dr, axis=-1)
    med = _median_sorted(s)
    d = jnp.abs(s - med[..., None])
    m = d.shape[-1]
    if m % 2:
        mad = _kth_smallest_vshaped(d, m // 2)
    else:
        mad = 0.5 * (_kth_smallest_vshaped(d, m // 2 - 1)
                     + _kth_smallest_vshaped(d, m // 2))
    return mad / 0.6745


@apijit("redundant", "tree", "subsample")
def noisest(x, redundant: bool = False, tree=None, subsample: int = 1):
    """MAD-based noise sigma from the finest detail coefficients
    (Denoising.jl:214-232).  Batched over leading axes.

    One sort instead of two medians: ``median(|dr - med|)`` is recovered
    from the sorted plane via :func:`_kth_smallest_vshaped` (the distances
    to the median of a sorted sequence are V-shaped) — jnp.median lowers to
    a sort each, and sorts are the cost of this selector on TPU.

    ``subsample=s > 1`` estimates the MAD from a uniform mid-phase
    subsample of the detail row (sigma is a threshold *scale*; the
    O(1/sqrt(m/s)) estimator noise is immaterial next to it, and TPU sort
    time scales ~linearly with row length below 256 lanes — (4096, 256) =
    177 us vs (4096, 64) = 26 us).  Default 1 = the exact reference
    estimator."""
    n = x.shape[-1]
    if not redundant and tree is None:
        dr = x[..., n // 2:]
    elif not redundant:
        dr = x[..., finestdetailrange(n, np.asarray(tree, bool))]
    elif tree is None:
        dr = x[..., -1, :]
    else:
        _, node = finestdetailrange(n, np.asarray(tree, bool), True)
        dr = x[..., node - 1, :]
    return _mad_sigma(_mad_subsample(dr, subsample))


def _findelbow(x, y, valid_n):
    """Index of the elbow of the (x, y) curve restricted to the first
    ``valid_n`` points (Denoising.jl:367-381), batched; masked positions get
    -inf distance."""
    npts = x.shape[-1]
    idx = jnp.arange(npts)
    x1 = x[..., :1]
    y1 = y[..., :1]
    xe = jnp.take_along_axis(x, (valid_n - 1)[..., None], axis=-1)
    ye = jnp.take_along_axis(y, (valid_n - 1)[..., None], axis=-1)
    vx = xe - x1
    vy = ye - y1
    vn = jnp.sqrt(vx ** 2 + vy ** 2)
    vx = vx / vn
    vy = vy / vn
    dx = x - x1
    dy = y - y1
    H2 = dx ** 2 + dy ** 2
    A = dx * vx + dy * vy
    O = jnp.sqrt(jnp.abs(H2 - A ** 2))
    O = jnp.where(idx < valid_n[..., None], O, -jnp.inf)
    return jnp.argmax(O, axis=-1)


@apijit("redundant", "tree", "elbows")
def relerrorthreshold(coef, redundant: bool = False, tree=None,
                      elbows: int = 2):
    """Relative-error elbow threshold (Denoising.jl:285-328), batched."""
    c = _relevant_coefs(coef, redundant, tree)
    n = c.shape[-1]
    xs = jnp.sort(jnp.abs(c), axis=-1)[..., ::-1]
    o = jnp.sort(c ** 2, axis=-1)[..., ::-1]
    tot = jnp.sum(o, axis=-1, keepdims=True)
    r = jnp.sqrt(jnp.abs(tot - jnp.cumsum(o, axis=-1))) / jnp.sqrt(tot)
    # append x->0, prepend r[0]; reverse; normalize
    xs = jnp.concatenate([xs, jnp.zeros_like(xs[..., :1])], axis=-1)
    r = jnp.concatenate([r[..., :1], r], axis=-1)
    xs = xs[..., ::-1]
    ys = r[..., ::-1]
    xmax = jnp.max(xs, axis=-1, keepdims=True)
    ymax = jnp.max(ys, axis=-1, keepdims=True)
    xn = xs / xmax
    yn = ys / ymax
    valid = jnp.full(xn.shape[:-1], n + 1, dtype=jnp.int32)
    ix = None
    for _ in range(elbows):
        ix = _findelbow(xn, yn, valid)
        valid = (ix + 1).astype(jnp.int32)
    chosen = jnp.take_along_axis(xn, ix[..., None], axis=-1)[..., 0]
    return chosen * xmax[..., 0]


# ---------------------------------------------------------------------------
# denoise / denoiseall
# ---------------------------------------------------------------------------

_INPUTTYPES = ("sig", "dwt", "wpt", "sdwt", "swpd", "acdwt", "acwpd")


def _try_pallas_redundant_denoise(x, t, th, smooth, inputtype, wt):
    """Fuse threshold + average inverse of the sdwt/acdwt denoise branch
    into one Pallas VMEM trip when supported (TPU, f32/bf16, aligned dims,
    Hard/Soft threshold).  ``t`` is the resolved sigma*dnt.t (scalar or
    per-signal); semantics identical to threshold-then-inverse (tested in
    tests/test_pallas_swt.py)."""
    from .transforms.swt import _pallas_stack_ok
    if x.ndim < 3 or not _pallas_stack_ok(x):
        return None
    if not isinstance(th, (HardTH, SoftTH)):
        return None
    if inputtype == "sdwt" and wt is None:
        return None
    P, n = x.shape[-2:]
    lead = x.shape[:-2]
    B = int(np.prod(lead))
    tv = jnp.broadcast_to(jnp.asarray(t, jnp.float32), lead).reshape(B)
    xf = x.reshape(B, P, n)
    soft = isinstance(th, SoftTH)
    under = smooth == "undersmooth"
    if inputtype == "sdwt":
        from .kernels.pallas_swt import isdwt_pallas
        from .transforms.dwt import _wt as _resolve_wt
        out = isdwt_pallas(xf, _resolve_wt(wt), tv, has_t=True, soft=soft,
                           undersmooth=under)
    else:
        from .kernels.pallas_swt import iacdwt_pallas
        out = iacdwt_pallas(xf, tv, has_t=True, soft=soft, undersmooth=under)
    return out.reshape(*lead, n)


def _estimate_sigma(coefs, inputtype, tree, estnoise):
    if not callable(estnoise):
        return jnp.asarray(estnoise)
    if inputtype in ("dwt",):
        return estnoise(coefs, False, None)
    if inputtype == "wpt":
        return estnoise(coefs, False, tree)
    if inputtype in ("sdwt", "acdwt"):
        return estnoise(coefs, True, None)
    return estnoise(coefs, True, tree)


def denoise(x, inputtype: str, wt, L: int | None = None, tree=None,
            dnt=None, estnoise=None, smooth: str = "regular",
            bestTH: str | None = None):
    """Denoise signals/coefficients of the given input type
    (Denoising.jl:483-597), batched over leading axes.

    ``estnoise`` may be a selector function (``noisest``, ``surethreshold``-
    style, ``relerrorthreshold``) or a precomputed scalar/array of sigmas.
    ``bestTH`` in {None, 'mean', 'median'} aggregates per-signal thresholds
    across the batch (Denoising.jl:684-703).
    """
    if smooth not in ("regular", "undersmooth"):
        raise ValueError(f"smooth must be 'regular' or 'undersmooth', "
                         f"got {smooth!r}")
    if inputtype not in _INPUTTYPES:
        raise ValueError(f"inputtype {inputtype!r} not in "
                         f"{sorted(_INPUTTYPES)}")
    if inputtype == "sig":
        n = x.shape[-1]
        L = maxtransformlevels(n) if L is None else L
        x = _dwt_mod.dwt(x, wt, L)
        inputtype = "dwt"
    n = x.shape[-1]
    L = maxtransformlevels(n) if L is None else L
    if tree is None and inputtype in ("wpt", "swpd", "acwpd"):
        tree = maketree(n, L, "dwt")
    if dnt is None:
        dnt = visushrink(n)
    if estnoise is None:
        estnoise = noisest

    sigma = _estimate_sigma(x, inputtype, tree, estnoise)
    if bestTH is not None:
        agg = jnp.mean if bestTH == "mean" else jnp.median
        sigma = agg(jnp.asarray(sigma))
    t = jnp.asarray(sigma) * dnt.t

    if inputtype == "dwt":
        tb = t[..., None] if jnp.ndim(t) else t
        if smooth == "regular":
            xs = threshold(x, dnt.th, tb)
        else:
            n0 = nodelength(n, L)
            xs = jnp.concatenate(
                [x[..., :n0], threshold(x[..., n0:], dnt.th, tb)], axis=-1)
        return _dwt_mod.idwt(xs, wt, L) if wt is not None else xs

    if inputtype == "wpt":
        tb = t[..., None] if jnp.ndim(t) else t
        if smooth == "regular":
            xs = threshold(x, dnt.th, tb)
        else:
            crng = coarsestscalingrange(n, np.asarray(tree, bool))
            mask = np.zeros(n, dtype=bool)
            mask[crng] = True
            xs = jnp.where(jnp.asarray(mask), x, threshold(x, dnt.th, tb))
        return _dwt_mod.iwpt(xs, wt, tree) if wt is not None else xs

    tb = t[..., None, None] if jnp.ndim(t) else t
    if inputtype in ("sdwt", "acdwt"):
        fused = _try_pallas_redundant_denoise(x, t, dnt.th, smooth,
                                              inputtype, wt)
        if fused is not None:
            return fused
        if smooth == "regular":
            xs = threshold(x, dnt.th, tb)
        else:
            xs = threshold(x, dnt.th, tb).at[..., 0, :].set(x[..., 0, :])
        if inputtype == "sdwt":
            return _swt_mod.isdwt(xs, wt) if wt is not None else xs
        return _acwt_mod.iacdwt(xs)

    # swpd / acwpd
    leaves = np.nonzero(getleaf(np.asarray(tree, bool), "binary"))[0]
    if smooth == "undersmooth":
        _, coarsest = coarsestscalingrange(n, np.asarray(tree, bool), True)
        leaves = np.setdiff1d(leaves, [coarsest - 1])
    mask = np.zeros(x.shape[-2], dtype=bool)
    mask[leaves] = True
    maskj = jnp.asarray(mask)[:, None]
    xs = jnp.where(maskj, threshold(x, dnt.th, tb), x)
    if inputtype == "swpd":
        return _swt_mod.iswpd(xs, wt, tree) if wt is not None else xs
    return _acwt_mod.iacwpd(xs, tree)


def denoiseall(x, inputtype: str, wt, **kwargs):
    """Batch denoising (Denoising.jl:651-712).  Identical to :func:`denoise`
    (everything is batched here); kept for API parity."""
    return denoise(x, inputtype, wt, **kwargs)


# ---------------------------------------------------------------------------
# Fused best-basis denoising — transform -> best basis -> threshold ->
# inverse as ONE XLA program (no reference counterpart: Denoising.jl composes
# these as separate host phases with per-signal loops)
# ---------------------------------------------------------------------------

import functools as _functools


@apijit("wt", "L", "method", "soft", "smooth", "mad_subsample")
def bestbasis_denoise_pipeline(x, wt, L=None, method=None, soft: bool = False,
                               smooth: str = "regular",
                               mad_subsample: int = 1):
    """VisuShrink denoising in the best basis, fully fused.

    Streamed costs -> device CW selection (JBB shared tree, or per-signal
    BB trees when ``method=BB()``) -> streamed leaf-mask extraction (the
    ``(L+1, n)`` wpd stack is never materialized — see basis._stream_costs;
    the 2-D twin gained >2x from the same move) -> MAD sigma from a
    recomputed level-1 detail half (the reference's ``noisest`` on a dwt
    layout, Denoising.jl:214-232) -> VisuShrink t = sigma*sqrt(2 ln n)
    (Denoising.jl:124-126) -> hard/soft threshold (``smooth="undersmooth"``
    spares the coarsest scaling band, Denoising.jl:561-565) -> dynamic-tree
    inverse.  Returns the denoised batch; per-signal trees reconstruct in
    the same program.

    ``mad_subsample`` (default 1 = exact MAD, matching previous behavior)
    estimates sigma from every s-th detail coefficient, as in the 2-D twin
    — the selector sort scales ~linearly with row length on TPU.
    """
    from .basis import (_stream_costs, _stream_extract,
                        bestbasis_treeselection_dev, JBB, BB,
                        _jbb_costs_covariance, _operator_extract,
                        _operator_inverse, _operator_pipeline_min_batch,
                        OPERATOR_PIPELINE_MAX_N)
    from .transforms.dwt import _wpt_level_fwd, _default_levels, _wt
    method = JBB() if method is None else method
    n = x.shape[-1]
    L = _default_levels(n, L)
    lead = x.shape[:-1]
    x = x.reshape((-1, n))  # flatten batch dims (JBB joins the lot)
    # big-batch shared-tree collapse (round 5, see basis._operator_extract):
    # covariance costs + X @ G_tree extraction + shrunk @ G_inv inverse —
    # the whole denoise becomes a few batch matmuls around the elementwise
    # threshold
    use_op = (isinstance(method, JBB)
              and x.shape[0] >= _operator_pipeline_min_batch()
              and n <= OPERATOR_PIPELINE_MAX_N)
    if use_op:
        costs = _jbb_costs_covariance(x, _wt(wt), L, method.cost)
        tree = bestbasis_treeselection_dev(costs, n)
        coefs = _operator_extract(x, wt, L, tree)
    else:
        costs = _stream_costs(x, wt, L, method, False)
        tree = bestbasis_treeselection_dev(costs, n)
        coefs = _stream_extract(x, wt, L, tree, False)
    # sigma: MAD of the finest-detail coefficients (level-1 high half),
    # recomputed from one level step (cheap next to the stack it replaces)
    w = _wt(wt)
    dr = _wpt_level_fwd(x, 0, w.lo, w.hi)[..., n // 2:]
    sigma = _mad_sigma(_mad_subsample(dr, mad_subsample))[..., None]
    t = sigma * np.sqrt(2.0 * np.log(n))
    if soft:
        shrunk = jnp.sign(coefs) * jnp.maximum(jnp.abs(coefs) - t, 0.0)
    else:
        shrunk = jnp.where(jnp.abs(coefs) > t, coefs, 0.0)
    if smooth == "undersmooth":
        # spare the coarsest scaling band: positions [0, n >> leaf_level(0)).
        # position 0's leaf depth = run of marked left-spine nodes (static
        # tiny gather; never materialize a per-position depth map)
        D = int(np.log2(n))
        spine_idx = np.array([(1 << d) - 1 for d in range(D)
                              if (1 << d) - 1 < tree.shape[-1]])
        spine = tree[..., spine_idx].astype(jnp.int32)
        lvl0 = jnp.sum(jnp.cumprod(spine, axis=-1), axis=-1, keepdims=True)
        band = (n >> lvl0)                    # (..., 1) scaling-leaf length
        pos = jnp.arange(n)
        shrunk = jnp.where(pos < band, coefs, shrunk)
    if use_op:
        return _operator_inverse(shrunk, wt, L, tree).reshape(lead + (n,))
    return _dwt_mod.iwpt_dyn(shrunk, wt, tree,
                             levels=L).reshape(lead + (n,))


@apijit("wt", "L", "method", "soft", "smooth", "mad_subsample")
def bestbasis_denoise_pipeline2(x, wt, L=None, method=None,
                                soft: bool = False, smooth: str = "regular",
                                mad_subsample: int = 16):
    """2-D analog of :func:`bestbasis_denoise_pipeline` for image batches
    ``(..., n, m)`` (any leading batch shape, or a single image): streamed
    quadtree costs -> device CW selection -> streamed leaf-mask extraction
    (the wpd2 stack is never materialized; see basis._stream_costs) -> MAD
    sigma from a recomputed level-1 HH quadrant -> VisuShrink
    t = sigma*sqrt(2 ln(n m)) -> threshold -> dynamic quadtree inverse,
    one XLA program.

    ``mad_subsample`` (default 16) estimates sigma from a uniform subsample
    of the HH quadrant instead of all n*m/4 coefficients — the round-3
    default changed from exact MAD (1) to 16 because the selector sort
    dominated the pipeline; pass ``mad_subsample=1`` to restore the exact
    estimator (outputs differ slightly between the two)."""
    from .basis import (_pipeline_costs,
                        bestbasis_treeselection_dev, JBB, BB)
    from .transforms.dwt import _wpt_level_fwd2, _default_levels, _wt
    method = JBB() if method is None else method
    n, m = x.shape[-2:]
    L = _default_levels(min(n, m), L)
    lead = x.shape[:-2]
    xf = x.reshape((-1, n, m))  # flatten batch dims (JBB joins the lot)
    costs, coefs_fn = _pipeline_costs(xf, wt, L, method, True)
    tree = bestbasis_treeselection_dev(costs, n, m)
    coefs = coefs_fn(tree)
    # sigma: MAD of the finest-detail (level-1 HH quadrant) coefficients,
    # recomputed from one level step (cheap next to the stack it replaces)
    w = _wt(wt)
    lvl1 = _wpt_level_fwd2(xf, 0, w.lo, w.hi)
    dr = lvl1[..., n // 2:, m // 2:].reshape(xf.shape[0], -1)
    sigma = _mad_sigma(_mad_subsample(dr, mad_subsample))[..., None, None]
    t = sigma * np.sqrt(2.0 * np.log(n * m))
    if soft:
        shrunk = jnp.sign(coefs) * jnp.maximum(jnp.abs(coefs) - t, 0.0)
    else:
        shrunk = jnp.where(jnp.abs(coefs) > t, coefs, 0.0)
    if smooth == "undersmooth":
        # spare the coarsest scaling block: its size follows the run of
        # marked top-left-spine quadtree nodes (child of node i = 4i-2)
        spine_idx = []
        i = 1
        while i - 1 < tree.shape[-1]:
            spine_idx.append(i - 1)
            i = 4 * i - 2
        spine = tree[..., np.array(spine_idx)].astype(jnp.int32)
        lvl0 = jnp.sum(jnp.cumprod(spine, axis=-1), axis=-1)[..., None, None]
        rows = jnp.arange(n)[:, None]
        cols = jnp.arange(m)[None, :]
        keep = (rows < (n >> lvl0)) & (cols < (m >> lvl0))
        shrunk = jnp.where(keep, coefs, shrunk)
    out = _dwt_mod.iwpt2_dyn(shrunk, wt, tree, levels=L)
    return out.reshape(lead + (n, m))


@apijit("wt", "L", "soft", "smooth", "mad_subsample")
def swt_denoise_pipeline2(x, wt, L: int | None = None, soft: bool = False,
                          smooth: str = "regular", mad_subsample: int = 16):
    """Fused 2-D stationary denoise for image batches ``(..., n, m)``:
    sdwt2 -> MAD sigma from the finest diagonal (HH, slot 3L) slice ->
    VisuShrink t = sigma*sqrt(2 ln(n m)) -> hard/soft threshold of every
    coefficient slice (``undersmooth`` spares the slot-0 LL plane, mirroring
    the 1-D ``denoise(..., "sdwt")`` flow) -> average-based inverse, one XLA
    program.  TPU-added convenience: the reference's denoise drivers are
    1-D (Denoising.jl:483-597); the 2-D stationary pieces exist there only
    as separate transforms (SWT.jl:132-158, :286-355).

    ``mad_subsample``: the sigma estimate reads every s-th HH coefficient
    (pass 1 for the exact full-plane MAD — sorting the full n*m row is the
    single most expensive op of this pipeline on TPU)."""
    if smooth not in ("regular", "undersmooth"):
        raise ValueError(f"smooth must be 'regular' or 'undersmooth', "
                         f"got {smooth!r}")
    from .trees import maxtransformlevels as _mtl
    n, m = x.shape[-2:]
    L = _mtl(min(n, m)) if L is None else L
    lead = x.shape[:-2]
    xf = x.reshape((-1, n, m))
    xw = _swt_mod.sdwt2(xf, wt, L)                 # (B, 3L+1, n, m)
    dr = xw[..., 3 * L, :, :].reshape(xf.shape[0], -1)
    sigma = _mad_sigma(_mad_subsample(dr, mad_subsample))
    tv = sigma * np.sqrt(2.0 * np.log(n * m))
    from .transforms.swt import _pallas_stack2_ok
    if _pallas_stack2_ok(xw):
        # threshold fused into the inverse kernel: one VMEM trip per image
        from .kernels.pallas_swt2 import isdwt2_pallas
        from .transforms.dwt import _wt as _resolve_wt
        out = isdwt2_pallas(xw, _resolve_wt(wt), tv, has_t=True, soft=soft,
                            undersmooth=(smooth == "undersmooth"))
        return out.reshape(lead + (n, m))
    t = tv[..., None, None, None]
    th = SoftTH() if soft else HardTH()
    xs = threshold(xw, th, t)
    if smooth == "undersmooth":
        xs = xs.at[..., 0, :, :].set(xw[..., 0, :, :])
    out = _swt_mod.isdwt2(xs, wt)
    return out.reshape(lead + (n, m))
