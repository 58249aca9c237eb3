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


def _decompose(x, wtname: str, L: int):
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
        w1, w2 = conv.analysis_step(X, w.lo, w.hi)
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


@functools.partial(jax.jit, static_argnames=("wtname", "L"), inline=True)
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


@functools.partial(jax.jit, static_argnames=("L", "budget"), inline=True)
def _bestbasis_dense_jit(costs, L: int, budget: int):
    return _bestbasis_sweep(costs, L, budget)


def _reconstruct_sweep(vals, decisions, wtname: str, L: int):
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
                                w.lo, w.hi)        # (.., Nd, 2Sd, nd)
        y_u = y[..., :Sd, :]
        y_s = jnp.roll(y[..., Sd:, :], -1, axis=-1)  # shifted synthesis
        dec = decisions[d][..., None]
        R = jnp.where(dec == 0, vals[d], jnp.where(dec == 1, y_u, y_s))
    return R[..., 0, 0, :]


def isiwpd_dense(vals, decisions, wt):
    """Inverse SIWPD from dense values + best-basis decisions."""
    L = len(vals) - 1
    return _isiwpd_dense_jit(vals, decisions, _wt(wt).name, L)


@functools.partial(jax.jit, static_argnames=("wtname", "L"), inline=True)
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


def _decompose_packed(x, wtname: str, L: int, budget: int):
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
        w1, w2 = conv.analysis_step(X, w.lo, w.hi)
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
                              budget: int):
    w = _wavelet(wtname)
    _, kid_pos, inv, has_kid = packed_shifts(L, budget)
    R = vals[L]
    for d in range(L - 1, -1, -1):
        K = len(kid_pos[d])
        sh = R.shape  # (.., 2Nd, 2K, nd/2)
        pair = R.reshape(*sh[:-3], sh[-3] // 2, 2, sh[-2], sh[-1])
        y = conv.synthesis_step(pair[..., 0, :, :], pair[..., 1, :, :],
                                w.lo, w.hi)          # (.., Nd, 2K, nd)
        y_u = y[..., :K, :]
        y_s = jnp.roll(y[..., K:, :], -1, axis=-1)
        iv = np.asarray(inv[d])
        dec = decisions[d][..., None]  # dec == 0 wherever has_kid is False
        R = jnp.where(dec == 0, vals[d],
                      jnp.where(dec == 1, jnp.take(y_u, iv, axis=-2),
                                jnp.take(y_s, iv, axis=-2)))
    return R[..., 0, 0, :]


@functools.partial(jax.jit,
                   static_argnames=("wtname", "L", "budget", "soft"))
def _pipeline_jit(x, t, wtname: str, L: int, budget: int, soft: bool):
    vals = _decompose_packed(x, wtname, L, budget)
    nrm = jnp.linalg.norm(x, axis=-1)
    costs = tuple(_shannon_costs(v, nrm) for v in vals)
    decisions, mincost = _bestbasis_sweep_packed(costs, L, budget)
    if t is not None:
        tb = t[..., None, None, None] if jnp.ndim(t) else t
        if soft:
            vals = tuple(jnp.sign(v) * jnp.maximum(jnp.abs(v) - tb, 0.0)
                         for v in vals)
        else:
            vals = tuple(jnp.where(jnp.abs(v) > tb, v, 0.0) for v in vals)
    return (_reconstruct_sweep_packed(vals, decisions, wtname, L, budget),
            mincost)


def siwt_bestbasis_pipeline(x, wt, L: int | None = None, d: int | None = None,
                            t=None, soft: bool = False):
    """Fused siwpd -> best basis -> [threshold ->] isiwpd as ONE program.

    ``t`` (optional scalar or per-signal array) hard/soft-thresholds every
    coefficient table before reconstruction (selection runs on the
    unthresholded costs).  Returns ``(reconstruction, min_cost)``.
    """
    x = jnp.asarray(x)
    n = x.shape[-1]
    L = maxtransformlevels(n) if L is None else L
    d = L if d is None else d
    t = None if t is None else jnp.asarray(t)
    return _pipeline_jit(x, t, _wt(wt).name, L, d, soft)
