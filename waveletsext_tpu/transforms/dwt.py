"""Decimated wavelet transforms: dwt/wpt/wpd and inverses, 1-D and 2-D.

Re-design of /root/reference/src/mod/DWT.jl (wpd! level/node loops at :131-209,
tree-driven wpt at :500-548, inverses at :340-401,662-710) and of the
Wavelets.jl base dwt/wpt the reference builds on.

TPU-first layout: all functions are batched over arbitrary leading axes and
jit-friendly.  1-D signals live on the last axis ``(..., n)``; 2-D images on
the last two ``(..., n, m)``.  A wavelet-packet decomposition keeps the
reference's level-stack layout — ``wpd`` returns ``(..., L+1, n)`` (level 0 is
the raw signal), the 2-D version ``(..., L+1, n, m)`` — so level slices equal
``wpt`` outputs exactly as in the reference tests (test/transforms.jl:29,42).

Within a level slice, the 2^d nodes at depth d are contiguous blocks in
natural (binary/quad tree) order; one level step runs the filter pair over
*all* nodes at once by folding the node axis into the batch.

Trees are host numpy bool arrays (see trees.py) and act as static arguments:
tree-driven reconstruction unrolls into a fixed sequence of vectorized level
sweeps.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .._jit import apijit
from ..filters import Wavelet, wavelet as _wavelet
from ..trees import (maketree, maketree2d, maxtransformlevels, getdepth,
                     tree_depth, getleaf, gettreelength)
from ..kernels import conv
from ..kernels import operators as _kops


def _wt(wt) -> Wavelet:
    return _wavelet(wt) if isinstance(wt, str) else wt


def _tpu_backend() -> bool:
    import os
    if os.environ.get("WAVELETSEXT_TPU_NO_PALLAS"):
        return False
    try:
        import jax
        plat = jax.devices()[0].platform.lower()
    except Exception:
        return False
    return plat.startswith("tpu") or plat == "axon"


def _try_pallas_wpt(x, w, L: int):
    """Dispatch to the fused Pallas kernel when profitable and supported:
    TPU backend, f32/bf16, flat batch divisible by a tile, deep enough that
    fusion pays.  Returns None to fall through to the XLA path."""
    n = x.shape[-1]
    if (x.ndim < 2 or x.dtype not in (jnp.float32, jnp.bfloat16)
            or n <= _kops.MATMUL_CUTOFF or (n >> L) < 2
            or not _tpu_backend()):
        return None
    B = int(np.prod(x.shape[:-1]))
    block = next((b for b in (128, 64, 32, 16, 8) if B % b == 0), None)
    if block is None:
        return None
    from ..kernels.pallas_wpt import wpt_pallas
    # precision resolved HERE (static jit arg) so set_matmul_precision
    # re-traces the Pallas path too
    out = wpt_pallas(x.reshape(B, n), w.name, L, block,
                     precision=conv.MATMUL_PRECISION)
    return out.reshape(*x.shape[:-1], n)


def _try_pallas_iwpt(y, w, L: int):
    """Mirror of :func:`_try_pallas_wpt` for the fused inverse kernel."""
    n = y.shape[-1]
    if (y.ndim < 2 or y.dtype not in (jnp.float32, jnp.bfloat16)
            or n <= _kops.MATMUL_CUTOFF or (n >> L) < 2
            or not _tpu_backend()):
        return None
    B = int(np.prod(y.shape[:-1]))
    block = next((b for b in (128, 64, 32, 16, 8) if B % b == 0), None)
    if block is None:
        return None
    from ..kernels.pallas_wpt import iwpt_pallas
    out = iwpt_pallas(y.reshape(B, n), w.name, L, block,
                      precision=conv.MATMUL_PRECISION)
    return out.reshape(*y.shape[:-1], n)


def _try_pallas_wpt2(x, w, L: int):
    """2-D analog of :func:`_try_pallas_wpt`: fused Pallas kernel for image
    batches when supported (TPU, f32/bf16, tile-aligned dims)."""
    if x.ndim < 3 or x.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    n, m = x.shape[-2:]
    if (L < 1 or (min(n, m) >> L) < 2 or n % 8 or m % 128
            or not _tpu_backend()):
        return None
    from ..kernels.pallas_wpt2 import wpt2_pallas
    B = int(np.prod(x.shape[:-2]))
    out = wpt2_pallas(x.reshape(B, n, m), w.name, L,
                      precision=conv.MATMUL_PRECISION)
    return out.reshape(*x.shape[:-2], n, m)


def _pallas_wpd2_ok(x, w, L: int) -> bool:
    """Would the fused 2-D stack kernel engage?  (Shared with the best-basis
    pipelines, which pick stack-based costs/extraction when it does.)"""
    if x.ndim < 3 or x.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    n, m = x.shape[-2:]
    F = len(w.lo)
    return (1 <= L <= 6 and (min(n, m) >> L) >= 2 * F and F % 2 == 0
            and n % 8 == 0 and m % 128 == 0 and _tpu_backend())


def _try_pallas_wpd2(x, w, L: int):
    """Dispatch wpd2 to the all-levels Pallas stack kernel (one VMEM trip
    emits every level plane) when supported AND profitable: the kernel is
    all-VPU, so it only beats the streamed XLA levels at HIGHEST, where the
    per-level matmuls are 6-pass (r3: 0.67 vs 0.98-1.22 ms at HIGHEST but
    0.72 vs 0.42-0.52 at DEFAULT — same precision rule as the fused
    pipelines' _pipeline_costs)."""
    import jax as _jax
    if conv.MATMUL_PRECISION != _jax.lax.Precision.HIGHEST:
        return None
    if not _pallas_wpd2_ok(x, w, L):
        return None
    from ..kernels.pallas_wpt2 import wpd2_pallas
    n, m = x.shape[-2:]
    B = int(np.prod(x.shape[:-2]))
    out = wpd2_pallas(x.reshape(B, n, m), w.name, L)
    return out.reshape(*x.shape[:-2], L + 1, n, m)


def _try_pallas_iwpt2(y, w, L: int):
    if y.ndim < 3 or y.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    n, m = y.shape[-2:]
    if (L < 1 or (min(n, m) >> L) < 2 or n % 8 or m % 128
            or not _tpu_backend()):
        return None
    from ..kernels.pallas_wpt2 import iwpt2_pallas
    B = int(np.prod(y.shape[:-2]))
    out = iwpt2_pallas(y.reshape(B, n, m), w.name, L,
                       precision=conv.MATMUL_PRECISION)
    return out.reshape(*y.shape[:-2], n, m)


def _default_levels(n: int, L) -> int:
    L0 = maxtransformlevels(n)
    if L is None:
        return L0
    if not 0 <= L <= L0:
        raise ValueError(f"L must be in 0..{L0}, got {L}")
    return L


# ---------------------------------------------------------------------------
# Level steps over packed packet slices
# ---------------------------------------------------------------------------

def _wpt_level_fwd(cur, d: int, lo, hi):
    """One packet level: split all 2^d nodes of the packed slice ``cur``
    (..., n) into their children, producing the packed depth-(d+1) slice.

    Nodes at or below the matmul cutoff run as one per-node (s, s) analysis
    operator on the MXU (kernels/operators.py) — the same dispatch wpt uses,
    so wpd/iwpd level sweeps get the fast path too."""
    n = cur.shape[-1]
    s = n >> d
    nodes = cur.reshape(*cur.shape[:-1], 1 << d, s)
    out = conv.analysis_step_packed(nodes, lo, hi)  # [low | high] per node
    return out.reshape(*cur.shape[:-1], n)


def _wpt_level_inv(nxt, d: int, lo, hi):
    """Merge all depth-(d+1) children in packed slice ``nxt`` back to depth d."""
    n = nxt.shape[-1]
    s = n >> d
    nodes = nxt.reshape(*nxt.shape[:-1], 1 << d, s)
    v = conv.synthesis_step_packed(nodes, lo, hi)
    return v.reshape(*nxt.shape[:-1], n)


def _level2_cutoff() -> int:
    """Per-level-step 2-D matmul cutoff, keyed on the dot precision.

    On-chip sweep of the streamed 2-D JBB pipeline (c4, BENCHMARKS.md round
    3): at HIGHEST (6-pass f32 MXU) the separable window/conv path beats the
    per-node An^T @ node @ Am matmuls for big nodes — cutoff 64 measured
    0.78 vs 0.97 ms at 512 — while the 1-D level step prefers matmuls at
    every size (5,590 vs 3,127 Msps), so this cutoff is 2-D only.  At
    DEFAULT/HIGH the 1-pass MXU is nearly free and matmuls win again."""
    import jax
    if conv.MATMUL_PRECISION == jax.lax.Precision.HIGHEST:
        return 64
    return _kops.MATMUL_CUTOFF


def _wpt_level_fwd2(cur, d: int, lo, hi):
    """2-D packet level on (..., n, m): split each of the 4^d nodes into 4.

    Separable: for nodes at or below the matmul cutoff the whole level is
    An^T @ node @ Am with the one-level analysis operators (two MXU matmuls
    per node instead of column+row filter passes)."""
    n, m = cur.shape[-2:]
    g = 1 << d
    bn, bm = n // g, m // g
    nodes = cur.reshape(*cur.shape[:-2], g, bn, g, bm)
    nodes = jnp.moveaxis(nodes, -2, -3)  # (..., g, g, bn, bm)
    if max(bn, bm) <= _level2_cutoff():
        tk = _kops.taps_key(lo, hi)
        An = _kops.analysis_operator(tk, bn)
        Am = An if bm == bn else _kops.analysis_operator(tk, bm)
        AnT = jnp.asarray(np.ascontiguousarray(An.T), cur.dtype)
        t = jnp.matmul(nodes, jnp.asarray(Am, cur.dtype),
                       precision=conv.MATMUL_PRECISION)
        quad = jnp.matmul(AnT, t, precision=conv.MATMUL_PRECISION)
    else:
        w1, w2, w3, w4 = conv.analysis_step2(nodes, lo, hi)
        # reassemble children: parent (j,k) -> children at (2j+a, 2k+b)
        top = jnp.concatenate([w1, w2], axis=-1)     # (..., g, g, bn/2, bm)
        bot = jnp.concatenate([w3, w4], axis=-1)
        quad = jnp.concatenate([top, bot], axis=-2)  # (..., g, g, bn, bm)
    quad = jnp.moveaxis(quad, -3, -2)            # (..., g, bn, g, bm)
    return quad.reshape(*cur.shape[:-2], n, m)


def _wpt_level_inv2(nxt, d: int, lo, hi):
    n, m = nxt.shape[-2:]
    g = 1 << d
    bn, bm = n // g, m // g
    nodes = nxt.reshape(*nxt.shape[:-2], g, bn, g, bm)
    nodes = jnp.moveaxis(nodes, -2, -3)          # (..., g, g, bn, bm)
    # NB: the forward's precision-keyed low cutoff does NOT apply here —
    # the conv synthesis lowering measured ~10x slower than the matmuls at
    # c4 sizes (6.9 vs 1.3 ms through iwpt2_dyn), so the inverse keeps the
    # matmul path at every precision
    if max(bn, bm) <= _kops.MATMUL_CUTOFF:
        tk = _kops.taps_key(lo, hi)
        Sn = _kops.synthesis_operator(tk, bn)
        Sm = Sn if bm == bn else _kops.synthesis_operator(tk, bm)
        SnT = jnp.asarray(np.ascontiguousarray(Sn.T), nxt.dtype)
        t = jnp.matmul(nodes, jnp.asarray(Sm, nxt.dtype),
                       precision=conv.MATMUL_PRECISION)
        v = jnp.matmul(SnT, t, precision=conv.MATMUL_PRECISION)
    else:
        hn, hm = bn // 2, bm // 2
        w1 = nodes[..., :hn, :hm]
        w2 = nodes[..., :hn, hm:]
        w3 = nodes[..., hn:, :hm]
        w4 = nodes[..., hn:, hm:]
        v = conv.synthesis_step2(w1, w2, w3, w4, lo, hi)
    v = jnp.moveaxis(v, -3, -2)
    return v.reshape(*nxt.shape[:-2], n, m)


# ---------------------------------------------------------------------------
# WPD: full level-stacked decomposition
# ---------------------------------------------------------------------------

@apijit("wt", "L")
def wpd(x, wt, L: int | None = None):
    """1-D wavelet packet decomposition -> (..., L+1, n).

    Level slice d holds the packed depth-d packet coefficients (reference
    layout, DWT.jl:131-161 transposed to row-major)."""
    w = _wt(wt)
    n = x.shape[-1]
    L = _default_levels(n, L)
    slices = [x]
    cur = x
    for d in range(L):
        cur = _wpt_level_fwd(cur, d, w.lo, w.hi)
        slices.append(cur)
    return jnp.stack(slices, axis=-2)


@apijit("wt", "L")
def wpd2(x, wt, L: int | None = None):
    """2-D wavelet packet decomposition -> (..., L+1, n, m) (DWT.jl:164-209)."""
    w = _wt(wt)
    n, m = x.shape[-2:]
    L = _default_levels(min(n, m), L)
    fused = _try_pallas_wpd2(x, w, L)
    if fused is not None:
        return fused
    slices = [x]
    cur = x
    for d in range(L):
        cur = _wpt_level_fwd2(cur, d, w.lo, w.hi)
        slices.append(cur)
    return jnp.stack(slices, axis=-3)


def _tree_split_levels(tree: np.ndarray, n: int, quad: bool = False):
    """Per-level boolean masks (over the depth-d node axis) of which nodes are
    split at that level."""
    assert not quad
    depth = tree_depth(tree, "binary")
    masks = []
    for d in range(depth):
        g = 1 << d
        mask = np.zeros(g, dtype=bool)
        first = 1 << d  # 1-based index of leftmost depth-d node
        for j in range(g):
            idx = first + j
            if idx - 1 < len(tree) and tree[idx - 1]:
                mask[j] = True
        masks.append(mask)
    return masks


@apijit("wt", "tree_or_L")
def iwpd(xw, wt, tree_or_L=None):
    """Inverse 1-D WPD from the level stack (DWT.jl:340-351).

    ``tree_or_L`` may be an int level (reconstruct from full level L), a tree
    bool array, or None (full depth)."""
    w = _wt(wt)
    n = xw.shape[-1]
    Lmax = xw.shape[-2] - 1
    if tree_or_L is None or isinstance(tree_or_L, (int, np.integer)):
        L = Lmax if tree_or_L is None else int(tree_or_L)
        cur = xw[..., L, :]
        for d in range(L - 1, -1, -1):
            cur = _wpt_level_inv(cur, d, w.lo, w.hi)
        return cur
    tree = np.asarray(tree_or_L, dtype=bool)
    masks = _tree_split_levels(tree, n, quad=False)
    depth = len(masks)
    cur = xw[..., depth, :]
    for d in range(depth - 1, -1, -1):
        merged = _wpt_level_inv(cur, d, w.lo, w.hi)
        level = xw[..., d, :]
        posmask = np.repeat(masks[d], n >> d)  # per-position: node split?
        cur = jnp.where(jnp.asarray(posmask), merged, level)
    return cur


@apijit("wt", "tree_or_L")
def iwpd2(xw, wt, tree_or_L=None):
    """Inverse 2-D WPD (DWT.jl:354-401)."""
    w = _wt(wt)
    n, m = xw.shape[-2:]
    Lmax = xw.shape[-3] - 1
    if tree_or_L is None or isinstance(tree_or_L, (int, np.integer)):
        L = Lmax if tree_or_L is None else int(tree_or_L)
        cur = xw[..., L, :, :]
        for d in range(L - 1, -1, -1):
            cur = _wpt_level_inv2(cur, d, w.lo, w.hi)
        return cur
    tree = np.asarray(tree_or_L, dtype=bool)
    from ..utils import quad_split_masks
    masks = quad_split_masks(tree, n, m)
    depth = len(masks)
    cur = xw[..., depth, :, :]
    for d in range(depth - 1, -1, -1):
        merged = _wpt_level_inv2(cur, d, w.lo, w.hi)
        level = xw[..., d, :, :]
        cur = jnp.where(jnp.asarray(masks[d]), merged, level)
    return cur


# ---------------------------------------------------------------------------
# WPT: packet transform to a level or a tree (flat output)
# ---------------------------------------------------------------------------

@apijit("wt", "tree_or_L")
def wpt(x, wt, tree_or_L=None):
    """1-D wavelet packet transform -> (..., n) flat packed coefficients.

    With an int/None argument: the packed depth-L slice.  With a tree: the
    basis coefficients of the tree's leaves (reference 2-arg ``wpt`` with tree,
    Wavelets.jl semantics / DWT.jl:500-548)."""
    w = _wt(wt)
    n = x.shape[-1]
    if tree_or_L is None or isinstance(tree_or_L, (int, np.integer)):
        L = _default_levels(n, None if tree_or_L is None else int(tree_or_L))
        fused = _try_pallas_wpt(x, w, L)
        if fused is not None:
            return fused
        cur = x
        d = 0
        while d < L and (n >> d) > _kops.MATMUL_CUTOFF:
            cur = _wpt_level_fwd(cur, d, w.lo, w.hi)
            d += 1
        if d < L:
            # collapse all remaining levels into one per-node MXU matmul
            m = n >> d
            A = jnp.asarray(_kops.composed_analysis_operator(
                _kops.taps_key(w.lo, w.hi), m, L - d), cur.dtype)
            nodes = cur.reshape(*cur.shape[:-1], 1 << d, m)
            cur = jnp.matmul(nodes, A,
                             precision=conv.MATMUL_PRECISION
                             ).reshape(*cur.shape[:-1], n)
        return cur
    tree = np.asarray(tree_or_L, dtype=bool)
    depth = tree_depth(tree, "binary")
    xw = wpd(x, wt, depth)
    from ..utils import getbasiscoef
    return getbasiscoef(xw, tree)


@apijit("wt", "tree_or_L")
def iwpt(y, wt, tree_or_L=None):
    """Inverse 1-D WPT from flat packed coefficients."""
    w = _wt(wt)
    n = y.shape[-1]
    if tree_or_L is None or isinstance(tree_or_L, (int, np.integer)):
        L = _default_levels(n, None if tree_or_L is None else int(tree_or_L))
        fused = _try_pallas_iwpt(y, w, L)
        if fused is not None:
            return fused
        # collapse the deep (small-node) levels into one composed synthesis
        # matmul per depth-dcut node, mirroring the forward fast path
        dcut = 0
        while dcut < L and (n >> dcut) > _kops.MATMUL_CUTOFF:
            dcut += 1
        cur = y
        if dcut < L:
            m0 = n >> dcut
            S = jnp.asarray(_kops.composed_synthesis_operator(
                _kops.taps_key(w.lo, w.hi), m0, L - dcut), cur.dtype)
            nodes = cur.reshape(*cur.shape[:-1], 1 << dcut, m0)
            cur = jnp.matmul(nodes, S, precision=conv.MATMUL_PRECISION
                             ).reshape(*cur.shape[:-1], n)
        for d in range(dcut - 1, -1, -1):
            cur = _wpt_level_inv(cur, d, w.lo, w.hi)
        return cur
    tree = np.asarray(tree_or_L, dtype=bool)
    masks = _tree_split_levels(tree, n, quad=False)
    depth = len(masks)
    cur = y
    for d in range(depth - 1, -1, -1):
        merged = _wpt_level_inv(cur, d, w.lo, w.hi)
        posmask = np.repeat(masks[d], n >> d)
        cur = jnp.where(jnp.asarray(posmask), merged, cur)
    return cur


@apijit("wt", "tree_or_L")
def wpt2(x, wt, tree_or_L=None):
    """2-D wavelet packet transform -> (..., n, m)."""
    w = _wt(wt)
    n, m = x.shape[-2:]
    if tree_or_L is None or isinstance(tree_or_L, (int, np.integer)):
        L = _default_levels(min(n, m), None if tree_or_L is None else int(tree_or_L))
        fused = _try_pallas_wpt2(x, w, L)
        if fused is not None:
            return fused
        cur = x
        d = 0
        while d < L and (min(n, m) >> d) > _kops.MATMUL_CUTOFF:
            cur = _wpt_level_fwd2(cur, d, w.lo, w.hi)
            d += 1
        if d < L:
            # The 2-D packet transform is separable across levels: the column
            # ops and row ops of every remaining level commute, so they
            # collapse into ONE composed 1-D operator per axis applied as
            # An^T @ node @ Am per depth-d node (two MXU matmuls instead of
            # 2(L-d) filter passes with materialized intermediates).
            cur = _composed_fwd2(cur, w, d, L, n, m)
        return cur
    tree = np.asarray(tree_or_L, dtype=bool)
    depth = tree_depth(tree, "quad")
    xw = wpd2(x, wt, depth)
    from ..utils import getbasiscoef2
    return getbasiscoef2(xw, tree)


def _composed_fwd2(cur, w, d: int, L: int, n: int, m: int):
    g = 1 << d
    bn, bm = n // g, m // g
    tk = _kops.taps_key(w.lo, w.hi)
    An = _kops.composed_analysis_operator(tk, bn, L - d)
    Am = An if bm == bn else _kops.composed_analysis_operator(tk, bm, L - d)
    AnT = jnp.asarray(np.ascontiguousarray(An.T), cur.dtype)
    Amj = jnp.asarray(Am, cur.dtype)
    nodes = cur.reshape(*cur.shape[:-2], g, bn, g, bm)
    nodes = jnp.moveaxis(nodes, -2, -3)  # (..., g, g, bn, bm)
    t = jnp.matmul(nodes, Amj, precision=conv.MATMUL_PRECISION)
    t = jnp.matmul(AnT, t, precision=conv.MATMUL_PRECISION)
    t = jnp.moveaxis(t, -3, -2)
    return t.reshape(*cur.shape[:-2], n, m)


def _composed_inv2(cur, w, d: int, L: int, n: int, m: int):
    g = 1 << d
    bn, bm = n // g, m // g
    tk = _kops.taps_key(w.lo, w.hi)
    Sn = _kops.composed_synthesis_operator(tk, bn, L - d)
    Sm = Sn if bm == bn else _kops.composed_synthesis_operator(tk, bm, L - d)
    SnT = jnp.asarray(np.ascontiguousarray(Sn.T), cur.dtype)
    Smj = jnp.asarray(Sm, cur.dtype)
    nodes = cur.reshape(*cur.shape[:-2], g, bn, g, bm)
    nodes = jnp.moveaxis(nodes, -2, -3)
    t = jnp.matmul(nodes, Smj, precision=conv.MATMUL_PRECISION)
    t = jnp.matmul(SnT, t, precision=conv.MATMUL_PRECISION)
    t = jnp.moveaxis(t, -3, -2)
    return t.reshape(*cur.shape[:-2], n, m)


@apijit("wt", "tree_or_L")
def iwpt2(y, wt, tree_or_L=None):
    w = _wt(wt)
    n, m = y.shape[-2:]
    if tree_or_L is None or isinstance(tree_or_L, (int, np.integer)):
        L = _default_levels(min(n, m), None if tree_or_L is None else int(tree_or_L))
        fused = _try_pallas_iwpt2(y, w, L)
        if fused is not None:
            return fused
        dcut = 0
        while dcut < L and (min(n, m) >> dcut) > _kops.MATMUL_CUTOFF:
            dcut += 1
        cur = y
        if dcut < L:
            cur = _composed_inv2(cur, w, dcut, L, n, m)
        for d in range(dcut - 1, -1, -1):
            cur = _wpt_level_inv2(cur, d, w.lo, w.hi)
        return cur
    tree = np.asarray(tree_or_L, dtype=bool)
    from ..utils import quad_split_masks
    masks = quad_split_masks(tree, n, m)
    depth = len(masks)
    cur = y
    for d in range(depth - 1, -1, -1):
        merged = _wpt_level_inv2(cur, d, w.lo, w.hi)
        cur = jnp.where(jnp.asarray(masks[d]), merged, cur)
    return cur


# ---------------------------------------------------------------------------
# Dynamic-tree inverses: the same masked level sweeps with *device* trees,
# so (transform -> best basis -> threshold -> inverse) fuses into one XLA
# program — and a batch of per-signal trees reconstructs in ONE call (the
# reference loops signals, dwt_all.jl:324-342)
# ---------------------------------------------------------------------------

def _dyn_depth(nt: int, n: int, quad: bool) -> int:
    """Number of split levels representable by an ``(nt,)`` tree on size n."""
    t = "quad" if quad else "binary"
    Dt = getdepth(nt, t)  # marks exist for depths 0..Dt
    lim = 0
    while (n >> (lim + 1)) >= 1 and lim + 1 <= Dt + 1:
        lim += 1
    return min(Dt + 1, lim)


def iwpt_dyn(y, wt, tree, levels: int | None = None):
    """:func:`iwpt` under a device tree — ``(nt,)`` shared or ``(..., nt)``
    per-signal bool.  ``levels``: callers that know the decomposition depth
    (the fused pipelines) pass it to skip sweep levels whose marks are
    structurally false — a full-size synthesis level each."""
    w = _wt(wt)
    n = y.shape[-1]
    depth = _dyn_depth(tree.shape[-1], n, quad=False)
    if levels is not None:
        depth = min(depth, levels)
    lead = jnp.broadcast_shapes(y.shape[:-1], tree.shape[:-1])
    cur = jnp.broadcast_to(y, lead + (n,))
    for d in range(depth - 1, -1, -1):
        merged = _wpt_level_inv(cur, d, w.lo, w.hi)
        marks = tree[..., (1 << d) - 1: (1 << (d + 1)) - 1]
        # select in the blocked node view: a jnp.repeat position mask lowers
        # to scalar-path gathers on TPU (see utils.leaf_masks_dyn)
        g, s = 1 << d, n >> d
        mb = merged.reshape(lead + (g, s))
        cb = cur.reshape(lead + (g, s))
        cur = jnp.where(marks[..., :, None], mb, cb).reshape(lead + (n,))
    return cur


def iwpt2_dyn(y, wt, tree, levels: int | None = None):
    """:func:`iwpt2` under a device quadtree (Z-order node layout).
    ``levels`` as in :func:`iwpt_dyn`."""
    w = _wt(wt)
    n, m = y.shape[-2:]
    depth = _dyn_depth(tree.shape[-1], min(n, m), quad=True)
    if levels is not None:
        depth = min(depth, levels)
    lead = jnp.broadcast_shapes(y.shape[:-2], tree.shape[:-1])
    cur = jnp.broadcast_to(y, lead + (n, m))
    for d in range(depth - 1, -1, -1):
        merged = _wpt_level_inv2(cur, d, w.lo, w.hi)
        g = 1 << d
        i0 = (4 ** d - 1) // 3
        marks = tree[..., i0: i0 + g * g]
        from ..basis import _zorder_perm
        inv = np.argsort(_zorder_perm(d))
        rm = marks[..., inv].reshape(*marks.shape[:-1], g, g)
        bn, bm = n // g, m // g
        blk = lead + (g, bn, g, bm)
        mb = merged.reshape(blk)
        cb = cur.reshape(blk)
        cur = jnp.where(rm[..., :, None, :, None], mb, cb).reshape(
            lead + (n, m))
    return cur


# ---------------------------------------------------------------------------
# Plain DWT (recursive on the approximation branch only)
# ---------------------------------------------------------------------------

@apijit("wt", "L")
def dwt(x, wt, L: int | None = None):
    """Standard 1-D DWT, Wavelets.jl layout:
    [approx_L | detail_L | detail_{L-1} | ... | detail_1]."""
    w = _wt(wt)
    n = x.shape[-1]
    L = _default_levels(n, L)
    out = x
    for d in range(L):
        head = out[..., : n >> d]
        w1, w2 = conv.analysis_step(head, w.lo, w.hi)
        out = jnp.concatenate([w1, w2, out[..., n >> d:]], axis=-1)
    return out


@apijit("wt", "L")
def idwt(y, wt, L: int | None = None):
    w = _wt(wt)
    n = y.shape[-1]
    L = _default_levels(n, L)
    out = y
    for d in range(L - 1, -1, -1):
        half = n >> (d + 1)
        v = conv.synthesis_step(out[..., :half], out[..., half: 2 * half],
                                w.lo, w.hi)
        out = jnp.concatenate([v, out[..., 2 * half:]], axis=-1)
    return out


@apijit("wt", "L")
def dwt2(x, wt, L: int | None = None):
    """Standard 2-D DWT == wpt2 with the :dwt quadtree (test/transforms.jl:43)."""
    n, m = x.shape[-2:]
    L = _default_levels(min(n, m), L)
    return wpt2(x, wt, maketree2d(n, m, L, "dwt"))


@apijit("wt", "L")
def idwt2(y, wt, L: int | None = None):
    n, m = y.shape[-2:]
    L = _default_levels(min(n, m), L)
    return iwpt2(y, wt, maketree2d(n, m, L, "dwt"))
