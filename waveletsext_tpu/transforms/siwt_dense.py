"""Dense batched shift-invariant WPD (TPU-native SIWT).

The reference SIWT (/root/reference/src/mod/SIWT.jl:93-136) recurses over a
host ``Dict`` of nodes, dispatching one convolution per node — O(2^L * shifts)
dispatches for a single signal.  This module re-expresses the whole
decomposition as the masked dense (depth, node, shift) level sweep planned in
SURVEY.md §7: depth ``d`` is one tensor of shape

    (batch..., 2^d nodes, 2^d shifts, n / 2^d)

and one level step computes *all* children of *all* (node, shift) pairs in two
batched analysis calls (unshifted + input-rolled-by-1), so a whole batch
decomposes in ONE XLA program.  Node existence depends only on (depth, shift)
and the shift budget (SIWT.jl:119-121 recursion rule), so validity masks are
static host constants:

    node (d, b, s) exists  iff  s == 0, or with d1 = lowest set bit of s,
                                 d - d1 <= min(budget, L - d1)

Best basis is the masked 3-way min sweep of siwt_bestbasis.jl:50-103 run
bottom-up over the per-depth cost tensors (strict ``<`` tie semantics pinned
by tests/test_siwt.py golden costs); the inverse is the mirrored bottom-up
synthesis sweep selecting per-node among {keep, unshifted children, shifted
children}.  ``siwt.SiwtObject`` (the API-parity host view) is built from
these dense arrays — see transforms/siwt.py.

Shifted-step conventions match transforms/siwt.py: the shifted analysis is
the decimated step on the input circularly pre-shifted by 1
(siwt_one_level.jl:71-98), and the shifted synthesis is the decimated
synthesis followed by a circular left-shift (siwt_one_level.jl:154-185, with
the reference's inverted shift flag corrected — see siwt.py docstring).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .._jit import apijit
from ..filters import Wavelet, wavelet as _wavelet
from ..trees import maxtransformlevels
from ..kernels import conv


def _wt(wt) -> Wavelet:
    return _wavelet(wt) if isinstance(wt, str) else wt


@functools.lru_cache(maxsize=None)
def shift_masks(L: int, budget: int):
    """Static (valid, has_children) masks per depth.

    ``valid[d]`` is a bool ``(2^d,)`` array over shifts — whether node
    (d, *, s) exists; ``has_children[d]`` — whether it expands (creating all
    four children: both unshifted and both shifted, which always co-occur
    because the shift budget gates both the same way, SIWT.jl:119-133).
    """
    valid = [np.ones(1, bool)]
    has_children = []
    for d in range(L):
        v = valid[d]
        Sd = 1 << d
        hk = np.zeros(Sd, bool)
        for s in range(Sd):
            if not v[s]:
                continue
            if s == 0:
                hk[s] = True
            else:
                d1 = (s & -s).bit_length() - 1
                rd = min(budget, L - d1) - (d - d1)
                hk[s] = rd > 0
        has_children.append(hk)
        nv = np.concatenate([hk, hk])
        valid.append(nv)
    has_children.append(np.zeros(1 << L, bool))
    return valid, has_children


_masks_np = shift_masks


def _shannon_costs(v, nrm):
    """Per-(node, shift) Shannon cost of the trailing axis
    (siwt_utls.jl:111-119): -sum s*log(s), s = (x/nrm)^2, 0 log 0 = 0."""
    s = (v / nrm[..., None, None, None]) ** 2
    return -jnp.sum(jnp.where(s == 0, 0.0, s * jnp.log(s)), axis=-1)


def _decompose(x, wtname: str, L: int, cutoff: int | None = None):
    """Level sweep -> tuple of L+1 per-depth value tensors.

    values[d] has shape (batch..., 2^d, 2^d, n/2^d); slot (b, s) holds node
    (d, b, s) of the reference node dict (garbage in never-created slots —
    mask with shift_masks).
    """
    w = _wavelet(wtname)
    vals = [x[..., None, None, :]]  # depth 0: (.., 1, 1, n)
    for d in range(L):
        V = vals[d]
        # shift axis doubles: low half = unshifted step, high half = the
        # step on the input circularly pre-shifted by 1
        X = jnp.concatenate([V, jnp.roll(V, 1, axis=-1)], axis=-2)
        w1, w2 = conv.analysis_step(X, w.lo, w.hi, cutoff)
        child = jnp.stack([w1, w2], axis=-3)  # (.., Nd, 2, 2Sd, nd/2)
        sh = child.shape
        vals.append(child.reshape(*sh[:-4], sh[-4] * 2, sh[-2], sh[-1]))
    return tuple(vals)


def siwpd_dense(x, wt, L: int | None = None, d: int | None = None):
    """Batched dense SIWPD.  Returns ``(values, costs)`` tuples of L+1
    per-depth arrays — values[d] ``(batch..., 2^d, 2^d, n/2^d)``, costs[d]
    ``(batch..., 2^d, 2^d)``.  One jitted program for the whole batch."""
    x = jnp.asarray(x)
    n = x.shape[-1]
    L = maxtransformlevels(n) if L is None else L
    d = L if d is None else d
    assert 0 <= L <= maxtransformlevels(n)
    assert L == 0 or 1 <= d <= L
    return _siwpd_dense_jit(x, _wt(wt).name, L)


@apijit("wtname", "L")
def _siwpd_dense_jit(x, wtname: str, L: int):
    vals = _decompose(x, wtname, L)
    nrm = jnp.linalg.norm(x, axis=-1)
    costs = tuple(_shannon_costs(v, nrm) for v in vals)
    return vals, costs


def _bestbasis_sweep(costs, L: int, budget: int):
    """Masked bottom-up 3-way min (siwt_bestbasis.jl:50-103 semantics).

    Returns (decisions, cstar_root): decisions[d] int8 (batch..., 2^d, 2^d)
    with 0 = keep node, 1 = unshifted children, 2 = shifted children;
    cstar_root = minimal subtree cost at the root (--> obj.min_cost).
    """
    _, has_kids = _masks_np(L, budget)
    cstar = costs[L]
    decisions = [None] * (L + 1)
    decisions[L] = jnp.zeros(costs[L].shape, jnp.int8)
    for d in range(L - 1, -1, -1):
        Sd = 1 << d
        sh = cstar.shape  # (.., 2Nd, 2Sd)
        pair = cstar.reshape(*sh[:-2], sh[-2] // 2, 2, sh[-1]).sum(axis=-2)
        u = pair[..., :Sd]          # unshifted children sums
        s = pair[..., Sd:]          # shifted children sums
        c = costs[d]
        # strict-< ties: node==children -> children win; u==s -> shifted wins
        node_min = (c < u) & (c < s)
        u_min = (~node_min) & (u < s)
        dec = jnp.where(node_min, jnp.int8(0),
                        jnp.where(u_min, jnp.int8(1), jnp.int8(2)))
        best = jnp.where(node_min, c, jnp.where(u_min, u, s))
        hk = jnp.asarray(has_kids[d])  # (Sd,) static
        dec = jnp.where(hk, dec, jnp.int8(0))
        cstar = jnp.where(hk, best, c)
        decisions[d] = dec
    return tuple(decisions), cstar[..., 0, 0]


def bestbasis_dense(costs, L: int | None = None, d: int | None = None):
    """Device best-basis selection over dense cost tensors."""
    L = len(costs) - 1 if L is None else L
    d = L if d is None else d
    return _bestbasis_dense_jit(costs, L, d)


@apijit("L", "budget")
def _bestbasis_dense_jit(costs, L: int, budget: int):
    return _bestbasis_sweep(costs, L, budget)


def _reconstruct_sweep(vals, decisions, wtname: str, L: int,
                       cutoff: int | None = None):
    """Bottom-up synthesis selecting per node among keep / unshifted /
    shifted children.  R[d] holds the best-basis reconstruction of every
    node's subtree; the root slot is the final signal."""
    w = _wavelet(wtname)
    R = vals[L]
    for d in range(L - 1, -1, -1):
        Sd = 1 << d
        sh = R.shape  # (.., 2Nd, 2Sd, nd/2)
        pair = R.reshape(*sh[:-3], sh[-3] // 2, 2, sh[-2], sh[-1])
        y = conv.synthesis_step(pair[..., 0, :, :], pair[..., 1, :, :],
                                w.lo, w.hi, cutoff)  # (.., Nd, 2Sd, nd)
        y_u = y[..., :Sd, :]
        y_s = jnp.roll(y[..., Sd:, :], -1, axis=-1)  # shifted synthesis
        dec = decisions[d][..., None]
        R = jnp.where(dec == 0, vals[d], jnp.where(dec == 1, y_u, y_s))
    return R[..., 0, 0, :]


def isiwpd_dense(vals, decisions, wt):
    """Inverse SIWPD from dense values + best-basis decisions."""
    L = len(vals) - 1
    return _isiwpd_dense_jit(vals, decisions, _wt(wt).name, L)


@apijit("wtname", "L")
def _isiwpd_dense_jit(vals, decisions, wtname: str, L: int):
    return _reconstruct_sweep(vals, decisions, wtname, L)


# ---------------------------------------------------------------------------
# Budget-aware packed sweep: the dense tensors above carry all 2^d shift
# slots per depth even though a shift budget ``d`` only ever creates the
# budget-valid ones (garbage slots are masked in the sweeps).  The packed
# twin keeps, per depth, ONLY the valid shifts — a static list — so memory
# and flops scale with the budget (e.g. budget 2 at depth 12: 4 packed
# shifts vs 4096 dense slots).  Numerically identical to the dense sweep
# (tests/test_siwt.py::test_packed_pipeline_matches_dense); the fused
# pipeline below always uses it (at budget == L the packed layout holds
# exactly the 2^d valid shifts, so nothing is lost there either).
# ---------------------------------------------------------------------------

def _expands(d: int, s: int, L: int, budget: int) -> bool:
    """SIWT.jl:119-133 recursion rule: does node (d, *, s) create children?"""
    if s == 0:
        return True
    d1 = (s & -s).bit_length() - 1
    return min(budget, L - d1) - (d - d1) > 0


@functools.lru_cache(maxsize=None)
def packed_shifts(L: int, budget: int):
    """Static packed-shift metadata: ``shifts[d]`` the valid shift values in
    packed order ([unshifted kids | shifted kids] of the previous depth);
    ``kid_pos[d]`` the packed positions that expand; ``inv[d]`` for each
    packed position its index into ``kid_pos[d]`` (0 where none — callers
    guard with ``has_kid[d]``)."""
    shifts = [(0,)]
    kid_pos, inv, has_kid = [], [], []
    for d in range(L):
        cur = shifts[d]
        kp = tuple(i for i, s in enumerate(cur)
                   if _expands(d, s, L, budget))
        kid_pos.append(kp)
        lookup = {p: k for k, p in enumerate(kp)}
        inv.append(tuple(lookup.get(p, 0) for p in range(len(cur))))
        has_kid.append(tuple(p in lookup for p in range(len(cur))))
        kids = tuple(cur[i] for i in kp)
        shifts.append(kids + tuple(s + (1 << d) for s in kids))
    return shifts, kid_pos, inv, has_kid


def _decompose_packed(x, wtname: str, L: int, budget: int,
                      cutoff: int | None = None):
    """Budget-packed level sweep: values[d] is (batch..., 2^d, P_d, n/2^d)
    with P_d = #valid shifts at depth d (packed order of packed_shifts)."""
    w = _wavelet(wtname)
    _, kid_pos, _, _ = packed_shifts(L, budget)
    vals = [x[..., None, None, :]]
    for d in range(L):
        V = vals[d]
        kp = np.asarray(kid_pos[d])
        P = V if len(kp) == V.shape[-2] else jnp.take(V, kp, axis=-2)
        X = jnp.concatenate([P, jnp.roll(P, 1, axis=-1)], axis=-2)
        w1, w2 = conv.analysis_step(X, w.lo, w.hi, cutoff)
        child = jnp.stack([w1, w2], axis=-3)
        sh = child.shape
        vals.append(child.reshape(*sh[:-4], sh[-4] * 2, sh[-2], sh[-1]))
    return tuple(vals)


def _bestbasis_sweep_packed(costs, L: int, budget: int):
    """Packed twin of :func:`_bestbasis_sweep`: same 3-way strict-< min,
    but child sums live on the kid subset and expand to the parent axis via
    a tiny static take; no-kid slots see +inf children and keep the node."""
    _, kid_pos, inv, has_kid = packed_shifts(L, budget)
    cstar = costs[L]
    decisions = [None] * (L + 1)
    decisions[L] = jnp.zeros(costs[L].shape, jnp.int8)
    for d in range(L - 1, -1, -1):
        K = len(kid_pos[d])
        sh = cstar.shape  # (.., 2Nd, 2K)
        pair = cstar.reshape(*sh[:-2], sh[-2] // 2, 2, sh[-1]).sum(axis=-2)
        u_k = pair[..., :K]
        s_k = pair[..., K:]
        hk = jnp.asarray(np.asarray(has_kid[d]))
        iv = np.asarray(inv[d])
        inf = jnp.asarray(np.inf, pair.dtype)
        u = jnp.where(hk, jnp.take(u_k, iv, axis=-1), inf)
        s = jnp.where(hk, jnp.take(s_k, iv, axis=-1), inf)
        c = costs[d]
        node_min = (c < u) & (c < s)
        u_min = (~node_min) & (u < s)
        dec = jnp.where(node_min, jnp.int8(0),
                        jnp.where(u_min, jnp.int8(1), jnp.int8(2)))
        cstar = jnp.where(node_min, c, jnp.where(u_min, u, s))
        decisions[d] = dec
    return tuple(decisions), cstar[..., 0, 0]


def _reconstruct_sweep_packed(vals, decisions, wtname: str, L: int,
                              budget: int, cutoff: int | None = None):
    w = _wavelet(wtname)
    _, kid_pos, inv, has_kid = packed_shifts(L, budget)
    R = vals[L]
    for d in range(L - 1, -1, -1):
        K = len(kid_pos[d])
        sh = R.shape  # (.., 2Nd, 2K, nd/2)
        pair = R.reshape(*sh[:-3], sh[-3] // 2, 2, sh[-2], sh[-1])
        y = conv.synthesis_step(pair[..., 0, :, :], pair[..., 1, :, :],
                                w.lo, w.hi, cutoff)  # (.., Nd, 2K, nd)
        y_u = y[..., :K, :]
        y_s = jnp.roll(y[..., K:, :], -1, axis=-1)
        iv = np.asarray(inv[d])
        dec = decisions[d][..., None]  # dec == 0 wherever has_kid is False
        R = jnp.where(dec == 0, vals[d],
                      jnp.where(dec == 1, jnp.take(y_u, iv, axis=-2),
                                jnp.take(y_s, iv, axis=-2)))
    return R[..., 0, 0, :]


# ---------------------------------------------------------------------------
# Deep layout: samples-on-sublanes, nodes-on-lanes.
#
# In the packed layout above, depth-d values are (..., 2^d, P_d, nd) with the
# per-node signal nd on the LANE axis.  On TPU the lane axis pads to 128, so
# once nd < 128 the physical tensors blow up (64x at nd == 2) and every deep
# level costs ~constant time despite geometrically shrinking logical work
# (measured: the L=12 n=4096 pipeline spends ~1.1 of its 1.5 ms on depths
# >= 6).  Below ``_DEEP_ND`` the pipeline therefore transposes into
#
#     (..., P_d, nd, K=2^d)   # nd on sublanes, the BIG node axis on lanes
#
# and runs each level as one MXU operator contraction over the sublane axis
# (kernels/operators.analysis_operator).  Children are appended in HALVES
# order — [all lo-children | all hi-children] along the lane axis — so the
# best-basis pair reduction is a contiguous half-sum, never a strided or
# trailing-2 select.  The halves order is internal: decompose, sweep and
# reconstruct all use it consistently, and the reconstruction re-enters the
# natural-order shallow sweep at the transition depth.
# ---------------------------------------------------------------------------

_DEEP_ND = 128


def _deep_transition(n: int, L: int) -> int | None:
    """First depth whose node length drops below the lane tile, i.e. where
    the deep layout engages; None when it never pays.  On-chip d0 sweep
    (B=64 n=4096 budget 2, v5e): the transposed zone only beats the shallow
    layout's padding waste once it spans >= ~4 levels (L=10: 1.14 -> 0.91
    ms at d0=5; L=12: 1.36 -> 1.19 at d0=6; L=8 prefers all-shallow), so
    require a substantial deep zone."""
    if n < 2048:
        return None
    d0 = max(0, n.bit_length() - _DEEP_ND.bit_length())  # nd(d0) == 128
    return d0 if L - d0 >= 4 else None


# Transition node-length for the FUSED KERNEL path (kernels/pallas_siwt.py),
# keyed by matmul precision.  The kernel holds the whole zone in VMEM, so
# unlike the XLA hybrid its transition is not pinned to the 128-lane tile:
# earlier transitions trade more (cheap, 1-pass) MXU flops in the kernel for
# fewer XLA shallow levels and their HBM traffic.  On-chip two-run
# interleaved sweep (c6b B=256 n=4096 L=12 budget=2, BENCHMARKS.md r5):
# nd0=256 is best or tied-best in every (precision, run) cell — 986/861
# Msps DEFAULT, 757/929 HIGHEST vs 780-847 at 512 and 672-824 at 128.
# nd0=1024 is excluded structurally: the 4 (D, nd0, nd0) operator banks
# alone would exceed VMEM.
_DEEP_ND_KERNEL = {"default": 256, "highest": 256}


def _kernel_nd() -> int:
    import jax as _jax
    key = ("default" if conv.MATMUL_PRECISION == _jax.lax.Precision.DEFAULT
           else "highest")
    return _DEEP_ND_KERNEL[key]


def _deep_transition_kernel(n: int, L: int) -> int | None:
    """Kernel-path twin of :func:`_deep_transition` (precision-keyed
    transition length, same n/zone-span gates)."""
    if n < 2048:
        return None
    nd = _kernel_nd()
    d0 = max(0, n.bit_length() - nd.bit_length())
    return d0 if L - d0 >= 4 else None


def _op(make, wtname: str, nd: int, dtype):
    w = _wavelet(wtname)
    return jnp.asarray(make(conv._ops.taps_key(w.lo, w.hi), nd), dtype)


def _deep_decompose(W, wtname: str, L: int, d0: int, budget: int):
    """Deep-zone level sweep from the transition tensor ``W`` at depth d0
    (layout (..., P, nd, K), natural node order) to depth L (halves order).
    Returns the per-depth deep value tensors for depths d0..L."""
    _, kid_pos, _, _ = packed_shifts(L, budget)
    deep = [W]
    for d in range(d0, L):
        V = deep[-1]
        kp = np.asarray(kid_pos[d])
        if len(kp) != V.shape[-3]:
            V = jnp.take(V, kp, axis=-3)
        X = jnp.concatenate([V, jnp.roll(V, 1, axis=-2)], axis=-3)
        nd = X.shape[-2]
        A = _op(conv._ops.analysis_operator, wtname, nd, X.dtype)
        C = jnp.einsum("ts,...tk->...sk", A, X,
                       precision=conv.MATMUL_PRECISION)
        h = nd // 2
        deep.append(jnp.concatenate([C[..., :h, :], C[..., h:, :]], axis=-1))
    return deep


def _deep_sweep(costs_deep, L: int, d0: int, budget: int):
    """Bottom-up 3-way min over the deep zone (layouts (..., P, K)); returns
    (decisions for depths d0..L in deep/halves order, cstar at depth d0 in
    deep layout, natural order)."""
    _, kid_pos, inv, has_kid = packed_shifts(L, budget)
    costs = costs_deep
    cstar = costs[L - d0]
    decisions = [None] * (L - d0 + 1)
    decisions[L - d0] = jnp.zeros(cstar.shape, jnp.int8)
    for d in range(L - 1, d0 - 1, -1):
        Kp = len(kid_pos[d])
        K = cstar.shape[-1] // 2
        pair = cstar[..., :K] + cstar[..., K:]
        u_k = pair[..., :Kp, :]
        s_k = pair[..., Kp:, :]
        hk = jnp.asarray(np.asarray(has_kid[d]))[:, None]
        iv = np.asarray(inv[d])
        inf = jnp.asarray(np.inf, pair.dtype)
        u = jnp.where(hk, jnp.take(u_k, iv, axis=-2), inf)
        s = jnp.where(hk, jnp.take(s_k, iv, axis=-2), inf)
        c = costs[d - d0]
        node_min = (c < u) & (c < s)
        u_min = (~node_min) & (u < s)
        dec = jnp.where(node_min, jnp.int8(0),
                        jnp.where(u_min, jnp.int8(1), jnp.int8(2)))
        cstar = jnp.where(node_min, c, jnp.where(u_min, u, s))
        decisions[d - d0] = dec
    return decisions, cstar


def _deep_reconstruct(deep_vals, decisions, wtname: str, L: int, d0: int,
                      budget: int):
    """Mirror of :func:`_deep_decompose`: bottom-up synthesis through the
    deep zone, returning the depth-d0 tensor in deep layout."""
    _, kid_pos, inv, _ = packed_shifts(L, budget)
    R = deep_vals[L - d0]
    for d in range(L - 1, d0 - 1, -1):
        Kp = len(kid_pos[d])
        K = R.shape[-1] // 2
        h = R.shape[-2]
        C = jnp.concatenate([R[..., :K], R[..., K:]], axis=-2)  # [w1; w2]
        S = _op(conv._ops.synthesis_operator, wtname, 2 * h, C.dtype)
        y = jnp.einsum("st,...sk->...tk", S, C,
                       precision=conv.MATMUL_PRECISION)
        y_u = y[..., :Kp, :, :]
        y_s = jnp.roll(y[..., Kp:, :, :], -1, axis=-2)
        iv = np.asarray(inv[d])
        y_u = jnp.take(y_u, iv, axis=-3)
        y_s = jnp.take(y_s, iv, axis=-3)
        dec = decisions[d - d0][..., None, :]  # (..., P, 1, K)
        R = jnp.where(dec == 0, deep_vals[d - d0],
                      jnp.where(dec == 1, y_u, y_s))
    return R


def _shannon_costs_deep(v, nrm):
    """Deep-layout twin of :func:`_shannon_costs` (signal on axis -2)."""
    s = (v / nrm[..., None, None, None]) ** 2
    return -jnp.sum(jnp.where(s == 0, 0.0, s * jnp.log(s)), axis=-2)


def _threshold_vals(vals, t, soft: bool):
    if t is None:
        return vals

    def tb(v):
        if not jnp.ndim(t):
            return t
        return t.reshape(t.shape + (1,) * (v.ndim - t.ndim))

    if soft:
        return tuple(jnp.sign(v) * jnp.maximum(jnp.abs(v) - tb(v), 0.0)
                     for v in vals)
    return tuple(jnp.where(jnp.abs(v) > tb(v), v, 0.0) for v in vals)


@apijit("wtname", "L", "budget", "soft", "cutoff", "deep_kernel",
        "interpret", "d0")
def _pipeline_jit(x, t, wtname: str, L: int, budget: int, soft: bool,
                  cutoff: int | None = None, deep_kernel: bool = False,
                  interpret: bool = False, d0: int | None = None):
    # NB: apijit (not plain jax.jit) so set_matmul_precision re-traces this
    # pipeline like every other public entry point (the r3 regression
    # class), and the probed step cutoff participates in the dispatch key.
    n = x.shape[-1]
    if d0 is None:
        vals = _decompose_packed(x, wtname, L, budget, cutoff)
        nrm = jnp.linalg.norm(x, axis=-1)
        costs = tuple(_shannon_costs(v, nrm) for v in vals)
        decisions, mincost = _bestbasis_sweep_packed(costs, L, budget)
        vals = _threshold_vals(vals, t, soft)
        return (_reconstruct_sweep_packed(vals, decisions, wtname, L,
                                          budget, cutoff),
                mincost)

    # hybrid: shallow packed layout to depth d0, deep layout beyond
    nrm = jnp.linalg.norm(x, axis=-1)
    shallow = _decompose_packed(x, wtname, d0, budget, cutoff)  # 0..d0
    # NB: packed_shifts(d0, budget) and packed_shifts(L, budget) agree on
    # depths < d0 (the expansion rule only consults budget and the lowest
    # set bit), EXCEPT that min(budget, L - d1) can differ when L - d1 <
    # budget near the tail — guard by asserting the prefix matches.
    s_L = packed_shifts(L, budget)[0]
    s_d0 = packed_shifts(d0, budget)[0]
    if tuple(s_L[:d0 + 1]) != tuple(s_d0):
        # rare tail case: rebuild the shallow zone with the L-consistent
        # masks by decomposing at full L metadata
        shallow = _decompose_packed_prefix(x, wtname, L, budget, d0,
                                           cutoff)
    costs_sh = tuple(_shannon_costs(v, nrm) for v in shallow[:-1])
    if deep_kernel:
        # fused Pallas deep zone: decompose+costs+sweep+threshold+
        # reconstruct in ONE VMEM trip (kernels/pallas_siwt.py) — the deep
        # per-depth tensors never touch HBM
        from ..kernels.pallas_siwt import siwt_deep_pipeline
        lead = x.shape[:-1]
        K0, P0, nd0 = shallow[d0].shape[-3:]
        Wb = shallow[d0].reshape((-1, K0, P0, nd0))
        has_t = t is not None
        t_b = (jnp.broadcast_to(t, lead).reshape(-1) if has_t
               else jnp.zeros((Wb.shape[0],), jnp.float32))
        R_kernel, cst_b = siwt_deep_pipeline(
            Wb, nrm.reshape(-1), t_b, wtname, L, d0, budget, has_t, soft,
            interpret)
        R_kernel = R_kernel.reshape(lead + (K0, P0, nd0))
        cstar = cst_b.reshape(lead + (K0, P0))  # (..., K0, P)
    else:
        W0 = jnp.moveaxis(shallow[d0], -3, -1)  # (..., P, nd0, K0)
        deep = _deep_decompose(W0, wtname, L, d0, budget)
        costs_dp = tuple(_shannon_costs_deep(v, nrm) for v in deep)
        dec_dp, cstar_d0 = _deep_sweep(costs_dp, L, d0, budget)
        # continue the shallow packed sweep from depth d0 with the deep seed
        cstar = jnp.moveaxis(cstar_d0, -2, -1)  # (..., K0, P)
    _, kid_pos, inv, has_kid = packed_shifts(L, budget)
    decisions_sh = [None] * d0
    for d in range(d0 - 1, -1, -1):
        K = len(kid_pos[d])
        sh = cstar.shape
        pair = cstar.reshape(*sh[:-2], sh[-2] // 2, 2, sh[-1]).sum(axis=-2)
        u_k = pair[..., :K]
        s_k = pair[..., K:]
        hk = jnp.asarray(np.asarray(has_kid[d]))
        iv = np.asarray(inv[d])
        inf = jnp.asarray(np.inf, pair.dtype)
        u = jnp.where(hk, jnp.take(u_k, iv, axis=-1), inf)
        s = jnp.where(hk, jnp.take(s_k, iv, axis=-1), inf)
        c = costs_sh[d]
        node_min = (c < u) & (c < s)
        u_min = (~node_min) & (u < s)
        decisions_sh[d] = jnp.where(node_min, jnp.int8(0),
                                    jnp.where(u_min, jnp.int8(1),
                                              jnp.int8(2)))
        cstar = jnp.where(node_min, c, jnp.where(u_min, u, s))
    mincost = cstar[..., 0, 0]

    shallow = _threshold_vals(shallow, t, soft)
    if deep_kernel:
        R = R_kernel
    else:
        deep = _threshold_vals(deep, t, soft)
        R_d0 = _deep_reconstruct(deep, dec_dp, wtname, L, d0, budget)
        R = jnp.moveaxis(R_d0, -1, -3)  # back to (..., K0, P, nd0)
    w = _wavelet(wtname)
    for d in range(d0 - 1, -1, -1):
        K = len(kid_pos[d])
        sh = R.shape
        pair = R.reshape(*sh[:-3], sh[-3] // 2, 2, sh[-2], sh[-1])
        y = conv.synthesis_step(pair[..., 0, :, :], pair[..., 1, :, :],
                                w.lo, w.hi, cutoff)
        y_u = y[..., :K, :]
        y_s = jnp.roll(y[..., K:, :], -1, axis=-1)
        iv = np.asarray(inv[d])
        dec = decisions_sh[d][..., None]
        R = jnp.where(dec == 0, shallow[d],
                      jnp.where(dec == 1, jnp.take(y_u, iv, axis=-2),
                                jnp.take(y_s, iv, axis=-2)))
    return R[..., 0, 0, :], mincost


def _decompose_packed_prefix(x, wtname: str, L: int, budget: int, d0: int,
                             cutoff: int | None = None):
    """First d0+1 depths of the L-deep packed decomposition (used when the
    d0-truncated shift metadata would disagree with the full-L metadata)."""
    w = _wavelet(wtname)
    _, kid_pos, _, _ = packed_shifts(L, budget)
    vals = [x[..., None, None, :]]
    for d in range(d0):
        V = vals[d]
        kp = np.asarray(kid_pos[d])
        P = V if len(kp) == V.shape[-2] else jnp.take(V, kp, axis=-2)
        X = jnp.concatenate([P, jnp.roll(P, 1, axis=-1)], axis=-2)
        w1, w2 = conv.analysis_step(X, w.lo, w.hi, cutoff)
        child = jnp.stack([w1, w2], axis=-3)
        sh = child.shape
        vals.append(child.reshape(*sh[:-4], sh[-4] * 2, sh[-2], sh[-1]))
    return tuple(vals)


def siwt_bestbasis_pipeline(x, wt, L: int | None = None, d: int | None = None,
                            t=None, soft: bool = False,
                            step_cutoff: int | None = None,
                            deep_kernel: bool | None = None):
    """Fused siwpd -> best basis -> [threshold ->] isiwpd as ONE program.

    ``t`` (optional scalar or per-signal array) hard/soft-thresholds every
    coefficient table before reconstruction (selection runs on the
    unthresholded costs).  Returns ``(reconstruction, min_cost)``.

    ``deep_kernel`` (default auto): run the deep zone through the fused
    Pallas VMEM kernel (TPU, engages with the hybrid layout and small shift
    budgets); pass True on CPU to force the interpreter-mode kernel (tests).
    """
    x = jnp.asarray(x)
    n = x.shape[-1]
    L = maxtransformlevels(n) if L is None else L
    d = L if d is None else d
    t = None if t is None else jnp.asarray(t)
    if step_cutoff is None:
        step_cutoff = _default_step_cutoff()
    d0 = _deep_transition(n, L)
    from .dwt import _tpu_backend
    on_tpu = _tpu_backend()
    if deep_kernel is None:
        deep_kernel = on_tpu and d0 is not None
    if deep_kernel:
        # the fused kernel swallows the whole zone in VMEM, so it prefers
        # an EARLIER transition than the XLA hybrid's lane-tile point
        dk0 = _deep_transition_kernel(n, L)
        if dk0 is not None:
            from ..kernels.pallas_siwt import deep_pipeline_ok
            if deep_pipeline_ok(L, dk0, d, n >> dk0):
                d0 = dk0
            else:
                deep_kernel = False
        else:
            deep_kernel = False
    else:
        deep_kernel = False
    return _pipeline_jit(x, t, _wt(wt).name, L, d, soft, step_cutoff,
                         deep_kernel, deep_kernel and not on_tpu, d0)


def _default_step_cutoff() -> int | None:
    """Precision-keyed SIWT step cutoff (on-chip sweep, probe_siwt.py, c6b
    B=256 n=4096 L=12 budget=2): at HIGHEST the mid-depth per-node operator
    matmuls are 6-pass and the polyphase conv path wins from ~64 up
    (249 -> 300 Msps); at DEFAULT the 1-pass MXU keeps the global cutoff
    best (424 vs 384 Msps at 256).  None = fall through to
    operators.MATMUL_CUTOFF."""
    import jax as _jax
    if conv.MATMUL_PRECISION == _jax.lax.Precision.HIGHEST:
        return 64
    return None
