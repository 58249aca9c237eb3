"""Shift-invariant wavelet packet decomposition (Cohen-Raz-Malah), 1-D.

Re-design of /root/reference/src/mod/SIWT.jl + src/mod/siwt/*: the node set of
an SIWPD is *deterministic* given (L, d, n) — only the best-basis pruning is
data dependent — so the host owns the tiny tree metadata (node dict, budgets,
best tree) while every coefficient computation runs through the same jitted
periodic-filter step kernels as the decimated transforms (cached per shape).

The shifted analysis step (siwt_one_level.jl:71-98) is the decimated step with
the input circularly pre-shifted by 1:

    w1[i] = sum_t lo[t] * v[(2i + t - s) mod n]
    w2[i] = sum_u hi[u] * v[(2i + 2 - F + u - s) mod n]

and the shifted synthesis (siwt_one_level.jl:154-185) is the decimated
synthesis followed by a circular left-shift of the output by ``s``.

The node key is ``(depth, index_at_depth, transform_shift)`` exactly as in the
reference (siwt_utls.jl:23-51); costs are Shannon entropy against the root
signal norm (siwt_utls.jl:111-119).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..filters import Wavelet, wavelet as _wavelet
from ..trees import maxtransformlevels
from ..kernels import conv


def _wt(wt) -> Wavelet:
    return _wavelet(wt) if isinstance(wt, str) else wt


@functools.partial(jax.jit, static_argnames=("wtname", "s"), inline=True)
def _sidwt_step(v, wtname: str, s: int):
    w = _wavelet(wtname)
    F = len(w.lo)
    w1 = conv.periodic_filter(v, w.lo, stride=2, dilation=1, offset=-s)
    w2 = conv.periodic_filter(v, w.hi, stride=2, dilation=1,
                              offset=2 - F - s)
    return w1, w2


@functools.partial(jax.jit, static_argnames=("wtname", "s"), inline=True)
def _isidwt_step(w1, w2, wtname: str, s: int):
    w = _wavelet(wtname)
    v = conv.synthesis_step(w1, w2, w.lo, w.hi)
    return jnp.roll(v, -s, axis=-1) if s else v


@jax.jit
def _shannon_cost(x, nrm):
    s = (x / nrm) ** 2
    return -jnp.sum(jnp.where(s == 0, 0.0, s * jnp.log(s)))


class SiwtNode:
    """(siwt_utls.jl:23-51)."""

    __slots__ = ("depth", "index_at_depth", "transform_shift", "cost", "value")

    def __init__(self, depth, index_at_depth, transform_shift, cost, value):
        value = jnp.asarray(value)
        if value.ndim == 2:
            raise ValueError("2D SIWT not available yet.")
        if value.ndim > 2:
            raise ValueError("Coefficient array has dimension larger than 2.")
        max_idx = (1 << depth) - 1
        if index_at_depth > max_idx or transform_shift > max_idx:
            raise ValueError(
                "Invalid IndexAtDepth or TransformShift for 1D coefficients.")
        self.depth = depth
        self.index_at_depth = index_at_depth
        self.transform_shift = transform_shift
        self.cost = cost
        self.value = value

    @property
    def key(self):
        return (self.depth, self.index_at_depth, self.transform_shift)


def make_node(data, depth, index_at_depth, transform_shift, nrm=None):
    """Outer constructor computing the Shannon cost
    (siwt_utls.jl:111-119)."""
    data = jnp.asarray(data)
    if nrm is None:
        nrm = jnp.linalg.norm(data)
    cost = float(_shannon_cost(data, nrm))
    return SiwtNode(depth, index_at_depth, transform_shift, cost, data)


class SiwtObject:
    """(siwt_utls.jl:82-96)."""

    def __init__(self, signal, wt, max_transform_level: int = 0,
                 max_shifted_transform_levels: int = 0):
        signal = jnp.asarray(signal)
        if signal.ndim != 1:
            raise ValueError("only 1D SIWT is supported")
        n = signal.shape[0]
        if not 0 <= max_transform_level <= maxtransformlevels(n):
            raise ValueError("Provided MaxTransformLevels is too large.")
        if not 0 <= max_shifted_transform_levels < n:
            raise ValueError("Provided MaxShiftedTransformLevels is too large.")
        root = make_node(signal, 0, 0, 0)
        self.nodes = {root.key: root}
        self.signal_size = n
        self.max_transform_level = max_transform_level
        self.max_shifted_transform_levels = max_shifted_transform_levels
        self.wavelet = _wt(wt)
        self.min_cost = root.cost
        self.best_tree = [root.key]

    # -- tree ops ----------------------------------------------------------

    def _children_keys(self, key, shifted: bool):
        d, b, s = key
        cs = s + ((1 << d) if shifted else 0)
        return (d + 1, b << 1, cs), (d + 1, (b << 1) + 1, cs)

    def delete_node(self, key):
        """(siwt_utls.jl:215-242) — removes key and its subtree."""
        if key not in self.nodes:
            return
        del self.nodes[key]
        self.best_tree = [k for k in self.best_tree if k != key]
        for shifted in (False, True):
            for ck in self._children_keys(key, shifted):
                self.delete_node(ck)

    def isvalidtree(self) -> bool:
        """(siwt_utls.jl:182-207)."""
        nodeset = set(self.best_tree)
        if set(self.nodes.keys()) != nodeset:
            return False
        for key in nodeset:
            d, b, s = key
            is_root = key == (0, 0, 0)
            # A node's parent is (d-1, b>>1, s) when it was created by the
            # unshifted step, or (d-1, b>>1, s - 2^(d-1)) when shift-created.
            # (The reference checks only the first form, siwt_utls.jl:193,
            # which mis-flags any selected shifted subtree.)
            has_parent = (d - 1, b >> 1, s) in nodeset or (
                d >= 1 and s >= (1 << (d - 1))
                and (d - 1, b >> 1, s - (1 << (d - 1))) in nodeset)
            kids = all(k in nodeset for k in self._children_keys(key, False))
            skids = all(k in nodeset for k in self._children_keys(key, True))
            is_leaf = not kids and not skids
            if not ((is_root ^ has_parent) and (is_leaf ^ kids ^ skids)):
                return False
        return True


def siwpd(x, wt, L: int | None = None, d: int | None = None) -> SiwtObject:
    """Shift-invariant WPD (SIWT.jl:57-70).

    The node set is computed by the dense masked level sweep
    (transforms/siwt_dense.py) in ONE jitted program — the reference's
    per-node recursion (SIWT.jl:93-136) would cost one device dispatch per
    node.  The host object holds the same ``(depth, index, shift) -> node``
    dict as the reference (siwt_utls.jl:82-96), populated from the fetched
    dense arrays; batched work should use :mod:`.siwt_dense` directly.
    """
    from . import siwt_dense
    x = jnp.asarray(x)
    n = x.shape[-1]
    L = maxtransformlevels(n) if L is None else L
    d = L if d is None else d
    assert 0 <= L <= maxtransformlevels(n)
    assert 1 <= d <= L
    obj = SiwtObject(x, wt, L, d)
    vals, costs = siwt_dense.siwpd_dense(x, obj.wavelet, L, d)
    valid, _ = siwt_dense.shift_masks(L, d)
    for dd in range(1, L + 1):
        vnp = np.asarray(vals[dd])
        cnp = np.asarray(costs[dd])
        for b in range(1 << dd):
            for s in np.nonzero(valid[dd])[0]:
                node = SiwtNode(dd, int(b), int(s), float(cnp[b, s]),
                                vnp[b, s])
                obj.nodes[node.key] = node
                obj.best_tree.append(node.key)
    return obj


def bestbasistree(obj: SiwtObject):
    """In-place SIWT best-basis selection (siwt_bestbasis.jl:28-35)."""
    _treeselect(obj, (0, 0, 0))
    obj.min_cost = obj.nodes[(0, 0, 0)].cost
    assert obj.isvalidtree()
    return obj.best_tree


def _treeselect(obj: SiwtObject, key):
    """(siwt_bestbasis.jl:50-103): 3-way min(parent, unshifted children,
    shifted children) with subtree deletion."""
    if key not in obj.best_tree:
        return None
    node_cost = obj.nodes[key].cost
    kids = obj._children_keys(key, False)
    skids = obj._children_keys(key, True)
    costs = [_treeselect(obj, k) for k in kids]
    scosts = [_treeselect(obj, k) for k in skids]
    unshifted = None if all(c is None for c in costs) else sum(costs)
    shifted = None if all(c is None for c in scosts) else sum(scosts)
    has_u, has_s = unshifted is not None, shifted is not None
    # the reference's boolean structure (siwt_bestbasis.jl:74-88)
    is_node_lt_u = has_u and node_cost < unshifted
    is_node_lt_s = has_s and node_cost < shifted
    is_u_lt_s = (has_u and not has_s) or (has_u and has_s
                                          and unshifted < shifted)
    node_min = (not has_u and not has_s) or (is_node_lt_u and is_node_lt_s)
    u_min = not node_min and is_u_lt_s
    if node_min:
        for k in kids + skids:
            obj.delete_node(k)
    elif u_min:
        for k in skids:
            obj.delete_node(k)
        obj.nodes[key].cost = unshifted
    else:
        for k in kids:
            obj.delete_node(k)
        obj.nodes[key].cost = shifted
    return obj.nodes[key].cost


def _isiwpd_subtree(obj: SiwtObject, key):
    """(SIWT.jl:192-231)."""
    kids = obj._children_keys(key, False)
    skids = obj._children_keys(key, True)
    has_u = kids[0] in obj.best_tree
    has_s = skids[0] in obj.best_tree
    if not (has_u or has_s):
        return
    assert has_u ^ has_s
    c1, c2 = kids if has_u else skids
    _isiwpd_subtree(obj, c1)
    _isiwpd_subtree(obj, c2)
    node = obj.nodes[key]
    n1, n2 = obj.nodes[c1], obj.nodes[c2]
    assert n1.transform_shift == n2.transform_shift
    # NOTE: children created by a *shifted* forward step (their shift differs
    # from the parent's) must be inverted with the shifted synthesis.  The
    # reference compares the other way around (siwt_one_level.jl:126), which
    # does not satisfy its own round-trip test (test/transforms.jl:261-267);
    # verified numerically — we implement the reconstructing convention.
    shifted = int(node.transform_shift != n1.transform_shift)
    node.value = _isidwt_step(n1.value, n2.value, obj.wavelet.name, shifted)
    obj.delete_node(c1)
    obj.delete_node(c2)


def isiwpd(obj: SiwtObject):
    """Inverse SIWPD; consumes the tree bottom-up (SIWT.jl:168-175)."""
    _isiwpd_subtree(obj, (0, 0, 0))
    return obj.nodes[(0, 0, 0)].value
