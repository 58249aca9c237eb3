"""Packed binary/quad tree representation and index arithmetic.

Mirrors the semantics of the reference tree utilities
(/root/reference/src/mod/utils/utils_tree.jl:57-293 and Wavelets.jl's
``maketree``/``isvalidtree``), re-expressed over host-side numpy bool arrays.
Trees are tiny (O(2^L)) and act as *static* arguments to jitted transforms, so
they live on the host; batched per-signal trees (BitMatrix analogs) are device
bool arrays handled by the vectorized routines in ``basis.py``.

Indexing is 1-based to match the reference exactly (array slot ``i-1`` holds
node ``i``): binary children of ``i`` are ``2i``/``2i+1``
(utils_tree.jl:60-63), quad children are ``4i-2 .. 4i+1`` (utils_tree.jl:64-75).
"""

from __future__ import annotations

import numpy as np


def maxtransformlevels(n) -> int:
    """Largest L with n divisible by 2^L (Wavelets.jl convention; extended
    dim-aware at /root/reference/src/mod/Utils.jl:66-71)."""
    if hasattr(n, "shape"):
        n = min(s for s in n.shape) if n.ndim > 0 else int(n)
    n = int(n)
    if n <= 0:
        raise ValueError("n must be positive")
    L = 0
    while n % 2 == 0:
        n //= 2
        L += 1
    return L


def gettreelength(n: int, m: int | None = None) -> int:
    """Length of the packed tree array (utils_tree.jl:285-293)."""
    if m is None:
        L = maxtransformlevels(n)
        return (1 << L) - 1
    L = maxtransformlevels(min(n, m))
    return ((1 << (2 * L)) - 1) // 3


def getchildindex(idx: int, child: str) -> int:
    """1-based child index (utils_tree.jl:57-99)."""
    if child == "left":
        return idx << 1
    if child == "right":
        return (idx << 1) + 1
    if child == "topleft":
        return 4 * idx - 2
    if child == "topright":
        return 4 * idx - 1
    if child == "bottomleft":
        return 4 * idx
    if child == "bottomright":
        return 4 * idx + 1
    raise ValueError(f"Invalid child {child}")


def getparentindex(idx: int, tree_type: str = "binary") -> int:
    if tree_type == "binary":
        return idx >> 1
    if tree_type == "quad":
        return (idx + 2) // 4
    raise ValueError(f"Invalid tree type {tree_type}")


def getdepth(idx: int, tree_type: str = "binary") -> int:
    """Depth of node ``idx`` (0 for root; utils_tree.jl:252-263)."""
    if idx <= 0:
        raise ValueError("idx must be positive")
    if tree_type == "binary":
        return int(np.floor(np.log2(idx)))
    if tree_type == "quad":
        return int(np.floor(np.log(3 * idx - 2) / np.log(4) + 1e-12))
    raise ValueError(f"Invalid tree type {tree_type}")


def maketree(n: int, L: int | None = None, kind: str = "full") -> np.ndarray:
    """Binary tree over a length-``n`` signal (Wavelets.jl semantics).

    ``tree[i-1]`` is True iff node ``i`` is split (has children).
    """
    L0 = maxtransformlevels(n)
    if L is None:
        L = L0
    if not 0 <= L <= L0:
        raise ValueError(f"L must be in 0..{L0}, got {L}")
    nt = (1 << L0) - 1
    tree = np.zeros(nt, dtype=bool)
    if kind == "full":
        tree[: (1 << L) - 1] = True
    elif kind == "dwt":
        for d in range(L):
            tree[(1 << d) - 1] = True
    else:
        raise ValueError(f"unknown tree kind {kind}")
    return tree


def maketree2d(n: int, m: int, L: int | None = None, kind: str = "full") -> np.ndarray:
    """Quadtree over an (n, m) signal (utils_tree.jl:193-222)."""
    L0 = maxtransformlevels(min(n, m))
    if L is None:
        L = L0
    if not 0 <= L <= L0:
        raise ValueError(f"L must be in 0..{L0}, got {L}")
    nq = gettreelength(n, m)
    tree = np.zeros(nq, dtype=bool)
    if kind == "full":
        tree[: sum(4 ** d for d in range(L))] = True
    elif kind == "dwt":
        if L >= 1:
            tree[0] = True
        for i in range(L - 1):
            idx = ((1 << (2 * i + 2)) + 2) // 3  # sum(4^(0:i)) + 1, 1-based
            tree[idx - 1] = True
    else:
        raise ValueError(f"unknown tree kind {kind}")
    return tree


def isvalidtree(tree: np.ndarray, tree_type: str = "binary") -> bool:
    """A node with children must itself be marked (utils_tree.jl:13-29 and the
    Wavelets.jl binary analog)."""
    tree = np.asarray(tree, dtype=bool)
    nt = len(tree)
    if tree_type == "binary":
        L0 = getdepth(nt, "binary") if nt > 0 else 0
        if (1 << (L0 + 1)) - 1 != nt:
            return False
        ns = (1 << L0) - 1  # internal nodes that can have children in-array
        for i in range(1, ns + 1):
            haschild = tree[2 * i - 1] or tree[2 * i]
            if haschild and not tree[i - 1]:
                return False
        return True
    if tree_type == "quad":
        L0 = getdepth(nt, "quad")
        if ((1 << (2 * L0 + 2)) - 1) // 3 != nt:
            return False
        ns = ((1 << (2 * L0)) - 1) // 3
        for i in range(1, ns + 1):
            haschild = any(
                tree[getchildindex(i, c) - 1]
                for c in ("topleft", "topright", "bottomleft", "bottomright")
            )
            if haschild and not tree[i - 1]:
                return False
        return True
    raise ValueError(f"Invalid tree type {tree_type}")


def getleaf(tree: np.ndarray, tree_type: str = "binary") -> np.ndarray:
    """Leaf mask over nodes plus one extra level (utils_tree.jl:122-157).

    For a binary tree of packed length 2^(L0+1)-1 the result has length
    2^(L0+2)-1 (i.e. ``n + nt`` slots with ``n = 2^(L0+1)``).
    """
    tree = np.asarray(tree, dtype=bool)
    nt = len(tree)
    L0 = getdepth(nt, tree_type)
    if tree_type == "binary":
        expected = (1 << (L0 + 1)) - 1
        n = 1 << (L0 + 1)
    else:
        expected = ((1 << (2 * L0 + 2)) - 1) // 3
        n = 1 << (2 * L0 + 2)
    if expected != nt:
        raise ValueError("malformed tree length")
    if not isvalidtree(tree, tree_type):
        raise ValueError("invalid tree")
    result = np.zeros(n + nt, dtype=bool)
    result[0] = True
    children = (
        ("left", "right")
        if tree_type == "binary"
        else ("topleft", "topright", "bottomleft", "bottomright")
    )
    for i in range(1, nt + 1):
        if tree[i - 1]:
            result[i - 1] = False
            for c in children:
                result[getchildindex(i, c) - 1] = True
    return result


def delete_subtree(tree: np.ndarray, i: int, tree_type: str = "binary") -> None:
    """In-place removal of node ``i``'s subtree
    (/root/reference/src/mod/BestBasis.jl:128-140 semantics)."""
    nt = len(tree)
    tree[i - 1] = False
    children = (
        ("left", "right")
        if tree_type == "binary"
        else ("topleft", "topright", "bottomleft", "bottomright")
    )
    for c in children:
        ci = getchildindex(i, c)
        if ci <= nt and tree[ci - 1]:
            delete_subtree(tree, ci, tree_type)


def tree_depth(tree: np.ndarray, tree_type: str = "binary") -> int:
    """Deepest level reached by any leaf of the (valid) basis tree."""
    tree = np.asarray(tree, dtype=bool)
    idxs = np.nonzero(tree)[0]
    if len(idxs) == 0:
        return 0
    return getdepth(int(idxs[-1]) + 1, tree_type) + 1
