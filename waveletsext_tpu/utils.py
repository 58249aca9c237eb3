"""Coefficient indexing/extraction utilities.

Re-implements /root/reference/src/mod/Utils.jl: ``nodelength`` (:242),
``packet`` (:269-273), ``main2depthshift`` (:297-305), basis-coefficient
extraction ``getbasiscoef``/``getbasiscoefall`` (:101-225), coarsest/finest
ranges (:345-436) and the quadtree spatial maps ``getrowrange``/``getcolrange``
(:465-542).

All index computation is host-side numpy over static trees; the only
device work is a single gather per extraction (``take_along_axis`` picking,
for every position, the level where the basis leaf covering it lives).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ._jit import apijit
from .trees import (maxtransformlevels, getdepth, getleaf, getchildindex,
                    gettreelength, tree_depth)


def nodelength(N: int, L: int) -> int:
    return N >> L


def packet(d: int, b: int, n: int) -> slice:
    """0-based slice of block ``b`` at depth ``d`` (Utils.jl:269-273)."""
    size = n >> d
    return slice(b * size, (b + 1) * size)


def main2depthshift(sm: int, L: int) -> np.ndarray:
    """Cumulative per-depth shifts for an overall shift ``sm``
    (Utils.jl:297-305).  Returns length L+1, entry d = shift at depth d."""
    if not 0 <= sm < (1 << L):
        raise ValueError(f"shift sm={sm} must be in [0, 2^{L})")
    sb = [(sm >> d) & 1 for d in range(L)]
    sd = np.cumsum([sb[d] << d for d in range(L)])
    return np.concatenate([[0], sd]).astype(int)


# ---------------------------------------------------------------------------
# Quadtree spatial ranges
# ---------------------------------------------------------------------------

def getrowrange(n: int, idx: int) -> slice:
    """0-based row slice for quadtree node ``idx`` (1-based; Utils.jl:465-505).
    Children 4i-2/4i-1 (UL/UR) take the upper half; 4i/4i+1 the lower."""
    if idx == 1:
        return slice(0, n)
    parent = (idx + 2) // 4
    prng = getrowrange(n, parent)
    mid = (prng.start + prng.stop) // 2
    if idx < 4 * parent:
        return slice(prng.start, mid)
    return slice(mid, prng.stop)


def getcolrange(n: int, idx: int) -> slice:
    """0-based column slice for quadtree node ``idx`` (Utils.jl:508-542).
    Even child ids (4i-2, 4i) take the left half; odd the right."""
    if idx == 1:
        return slice(0, n)
    parent = (idx + 2) // 4
    prng = getcolrange(n, parent)
    mid = (prng.start + prng.stop) // 2
    if idx % 2 == 0:
        return slice(prng.start, mid)
    return slice(mid, prng.stop)


def quad_split_masks(tree: np.ndarray, n: int, m: int) -> list:
    """Per-level (n, m) boolean masks: True where the covering depth-d node is
    split.  Drives the vectorized tree reconstruction in transforms/dwt.py."""
    tree = np.asarray(tree, dtype=bool)
    depth = tree_depth(tree, "quad")
    masks = []
    for d in range(depth):
        mask = np.zeros((n, m), dtype=bool)
        first = ((1 << (2 * d)) - 1) // 3 + 1  # first 1-based index at depth d
        count = 1 << (2 * d)
        for i in range(first, first + count):
            if i - 1 < len(tree) and tree[i - 1]:
                mask[getrowrange(n, i), getcolrange(m, i)] = True
        masks.append(mask)
    return masks


# ---------------------------------------------------------------------------
# Basis coefficient extraction
# ---------------------------------------------------------------------------

def _leaf_level_map(tree: np.ndarray, n: int) -> np.ndarray:
    """For each packed position, the depth of the basis leaf covering it."""
    tree = np.asarray(tree, dtype=bool)
    leaf = getleaf(tree, "binary")
    lvl = np.zeros(n, dtype=np.int32)
    for i0, isleaf in enumerate(leaf):
        if isleaf:
            i = i0 + 1
            d = getdepth(i, "binary")
            nn = i - (1 << d)
            n0 = n >> d
            lvl[nn * n0:(nn + 1) * n0] = d
    return lvl


def _leaf_level_map2(tree: np.ndarray, n: int, m: int) -> np.ndarray:
    tree = np.asarray(tree, dtype=bool)
    leaf = getleaf(tree, "quad")
    lvl = np.zeros((n, m), dtype=np.int32)
    for i0, isleaf in enumerate(leaf):
        if isleaf:
            i = i0 + 1
            d = getdepth(i, "quad")
            lvl[getrowrange(n, i), getcolrange(m, i)] = d
    return lvl


@apijit("tree")
def getbasiscoef(xw, tree) -> jnp.ndarray:
    """Extract flat basis coefficients from a 1-D WPD stack ``(..., L+1, n)``
    for a static ``tree`` (Utils.jl:101-134)."""
    n = xw.shape[-1]
    k = xw.shape[-2]
    lvl = _leaf_level_map(tree, n)
    if int(lvl.max(initial=0)) >= k:
        raise ValueError("Not enough decomposition levels in xw.")
    idx = jnp.asarray(lvl)[None, :].astype(jnp.int32)
    idx = jnp.broadcast_to(idx, xw.shape[:-2] + (1, n))
    return jnp.take_along_axis(xw, idx, axis=-2)[..., 0, :]


@apijit("tree")
def getbasiscoef2(xw, tree) -> jnp.ndarray:
    """2-D version over ``(..., L+1, n, m)`` (Utils.jl getbasiscoef N==3)."""
    n, m = xw.shape[-2:]
    k = xw.shape[-3]
    lvl = _leaf_level_map2(tree, n, m)
    if int(lvl.max(initial=0)) >= k:
        raise ValueError("Not enough decomposition levels in xw.")
    idx = jnp.asarray(lvl)[None, :, :].astype(jnp.int32)
    idx = jnp.broadcast_to(idx, xw.shape[:-3] + (1, n, m))
    return jnp.take_along_axis(xw, idx, axis=-3)[..., 0, :, :]


@apijit("trees")
def getbasiscoefall(xw, trees) -> jnp.ndarray:
    """Per-signal trees: ``xw`` is ``(N, L+1, n)`` and ``trees`` an ``(N, nt)``
    bool array (host or device).  Mirrors Utils.jl:169-225 (BitMatrix case),
    vectorized as one gather."""
    trees = np.asarray(trees)
    if trees.ndim == 1:
        return getbasiscoef(xw, trees)
    n = xw.shape[-1]
    lvls = np.stack([_leaf_level_map(t, n) for t in trees])  # (N, n)
    idx = jnp.asarray(lvls)[:, None, :].astype(jnp.int32)
    return jnp.take_along_axis(xw, idx, axis=-2)[..., 0, :]


# ---------------------------------------------------------------------------
# Dynamic (device-tree) coefficient extraction — lets the whole
# wpd -> costs -> CW selection -> extraction pipeline stay in one XLA
# program (no host round trip; the reference has no analog)
# ---------------------------------------------------------------------------

def leaf_level_map_dyn(tree, n: int):
    """Per-position leaf depth from a *device* bool tree ``(..., nt)``.

    A valid tree's marks form a prefix along every root-to-leaf path, so the
    leaf depth of position ``p`` is simply the number of marked ancestors —
    one `repeat`+add per level, fully traceable."""
    nt = tree.shape[-1]
    lead = tree.shape[:-1]
    t = tree.reshape((-1, nt)).astype(jnp.int32)
    lvl = jnp.zeros((t.shape[0], n), dtype=jnp.int32)
    d = 0
    while (1 << d) - 1 < nt and (n >> d) >= 1:
        i0 = (1 << d) - 1
        i1 = min((1 << (d + 1)) - 1, nt)
        marks = t[:, i0:i1]
        if i1 - i0 < (1 << d):
            marks = jnp.pad(marks, ((0, 0), (0, (1 << d) - (i1 - i0))))
        lvl = lvl + jnp.repeat(marks, n >> d, axis=1)
        d += 1
    return lvl.reshape(lead + (n,))


def leaf_level_map2_dyn(tree, n: int, m: int):
    """2-D analog of :func:`leaf_level_map_dyn` over quadtrees: ``(..., nt)``
    bool -> ``(..., n, m)`` int32 leaf depths (Z-order node layout)."""
    from .basis import _zorder_perm
    nt = tree.shape[-1]
    lead = tree.shape[:-1]
    t = tree.reshape((-1, nt)).astype(jnp.int32)
    lvl = jnp.zeros((t.shape[0], n, m), dtype=jnp.int32)
    d = 0
    while (4 ** d - 1) // 3 < nt and (n >> d) >= 1 and (m >> d) >= 1:
        g = 1 << d
        i0 = (4 ** d - 1) // 3
        i1 = min(i0 + g * g, nt)
        marks = t[:, i0:i1]
        if i1 - i0 < g * g:
            marks = jnp.pad(marks, ((0, 0), (0, g * g - (i1 - i0))))
        inv = np.argsort(_zorder_perm(d))  # node order -> row-major grid
        rm = marks[:, inv].reshape(-1, g, g)
        rm = jnp.repeat(jnp.repeat(rm, n >> d, axis=1), m >> d, axis=2)
        lvl = lvl + rm
        d += 1
    return lvl.reshape(lead + (n, m))


def leaf_masks_dyn(tree, L: int):
    """Per-depth leaf masks from a *device* bool tree: ``masks[d]`` is
    ``(..., 2^d)`` bool — whether the depth-d node covering each position
    block is a leaf of the tree.

    This is the TPU-fast form of the leaf-depth map: the masks live in the
    *node* domain (tiny, <= 2^L entries) and broadcast into position planes
    inside the consumer's blocked view, instead of materializing an (n,)
    or (n, m) int32 map (whose ``jnp.repeat`` chain lowers to scalar-unit
    gathers — measured 467 us for one (512, 512) map on TPU v5e, the
    single most expensive op of the fused 2-D JBB pipeline)."""
    nt = tree.shape[-1]
    lead = tree.shape[:-1]
    alive = jnp.ones(lead + (1,), bool)
    masks = []
    for d in range(L + 1):
        if d == L:  # deepest stack level: every still-alive block is a leaf
            masks.append(alive)
            break
        g = 1 << d
        i0, i1 = g - 1, min(2 * g - 1, nt)
        if i0 < nt:
            split = tree[..., i0:i1]
            if i1 - i0 < g:
                split = jnp.pad(split,
                                [(0, 0)] * len(lead) + [(0, g - (i1 - i0))])
        else:
            split = jnp.zeros(lead + (g,), bool)
        masks.append(alive & ~split)
        nxt = (alive & split)[..., :, None]
        alive = jnp.broadcast_to(nxt, nxt.shape[:-1] + (2,)).reshape(
            lead + (2 * g,))
    return masks


def leaf_masks2_dyn(tree, L: int):
    """Quadtree analog of :func:`leaf_masks_dyn`: ``masks[d]`` is
    ``(..., g, g)`` bool over the row-major depth-d block grid."""
    from .basis import _zorder_perm
    nt = tree.shape[-1]
    lead = tree.shape[:-1]
    alive = jnp.ones(lead + (1, 1), bool)
    masks = []
    for d in range(L + 1):
        if d == L:  # deepest stack level
            masks.append(alive)
            break
        g = 1 << d
        i0 = (4 ** d - 1) // 3
        i1 = min(i0 + g * g, nt)
        if i0 < nt:
            split = tree[..., i0:i1]
            if i1 - i0 < g * g:
                split = jnp.pad(
                    split, [(0, 0)] * len(lead) + [(0, g * g - (i1 - i0))])
        else:
            split = jnp.zeros(lead + (g * g,), bool)
        inv = np.argsort(_zorder_perm(d))   # node order -> row-major grid
        split = split[..., inv].reshape(lead + (g, g))
        masks.append(alive & ~split)
        nxt = (alive & split)[..., :, None, :, None]
        alive = jnp.broadcast_to(
            nxt, nxt.shape[:-3] + (2,) + nxt.shape[-2:-1] + (2,)).reshape(
            lead + (2 * g, 2 * g))
    return masks


def getbasiscoef_dyn(xw, tree) -> jnp.ndarray:
    """:func:`getbasiscoef` for device trees — ``tree`` may be ``(nt,)``
    (shared) or have leading batch dims matching ``xw``'s.

    Implemented as per-level leaf-mask selects in the blocked node view
    (see :func:`leaf_masks_dyn`); L+1 fused selects lower far better on TPU
    than a take_along_axis with n indices or an int32 leaf-depth map."""
    n = xw.shape[-1]
    k = xw.shape[-2]
    masks = leaf_masks_dyn(tree, k - 1)
    lead = jnp.broadcast_shapes(xw.shape[:-2], tree.shape[:-1])
    acc = jnp.zeros(lead + (n,), xw.dtype)
    for d in range(k):
        g = 1 << d
        s = n >> d
        blk = xw[..., d, :].reshape(xw.shape[:-2] + (g, s))
        sel = jnp.where(masks[d][..., :, None], blk, 0.0)
        acc = acc + sel.reshape(sel.shape[:-2] + (n,))
    return acc


def getbasiscoef2_dyn(xw, tree) -> jnp.ndarray:
    """:func:`getbasiscoef2` for device trees (per-level quadtree leaf-mask
    selects in the blocked view)."""
    n, m = xw.shape[-2:]
    k = xw.shape[-3]
    masks = leaf_masks2_dyn(tree, k - 1)
    lead = jnp.broadcast_shapes(xw.shape[:-3], tree.shape[:-1])
    acc = jnp.zeros(lead + (n, m), xw.dtype)
    for d in range(k):
        g = 1 << d
        bn, bm = n >> d, m >> d
        blk = xw[..., d, :, :].reshape(xw.shape[:-3] + (g, bn, g, bm))
        sel = jnp.where(masks[d][..., :, None, :, None], blk, 0.0)
        acc = acc + sel.reshape(sel.shape[:-4] + (n, m))
    return acc


# ---------------------------------------------------------------------------
# Coarsest-scaling / finest-detail ranges (noise estimation entry points)
# ---------------------------------------------------------------------------

def coarsestscalingrange(n: int, tree: np.ndarray, redundant: bool = False):
    """Utils.jl:345-375.  Non-redundant: 0-based slice into the flat basis
    coefficients.  Redundant: (slice(0, n), node_index_1based)."""
    tree = np.asarray(tree, dtype=bool)
    i, j = 1, 0
    while i < len(tree) and tree[i - 1]:
        i = getchildindex(i, "left")
        j += 1
    if not redundant:
        return slice(0, n >> j)
    return (slice(0, n), i)


def finestdetailrange(n: int, tree: np.ndarray, redundant: bool = False):
    """Utils.jl:416-436."""
    tree = np.asarray(tree, dtype=bool)
    i, j = 1, 0
    while i <= len(tree) and tree[i - 1]:
        i = getchildindex(i, "right")
        j += 1
    if not redundant:
        n0 = nodelength(n, j)
        return slice(n - n0, n)
    return (slice(0, n), i)
