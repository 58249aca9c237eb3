"""Sequence/context parallelism: WPD with the signal axis sharded over a mesh.

New TPU-native design (the reference has no parallelism; SURVEY §5).  A long
signal is split across the ``sp`` mesh axis in contiguous position chunks.
One decimated packet level at node length m with S shards (chunk n_loc = n/S):

* ``m >= 2*n_loc`` — nodes span device *groups* of g = m/n_loc devices.  The
  step needs (a) a filter-support halo exchange: F-2 samples from the right
  neighbor for the low-pass outputs and F-2 from the left for the high-pass,
  with periodic wrap *within the node group* (the device ring restricted to
  each group — a single static ``ppermute``); and (b) a packed-layout
  compaction: device j's local w1 belongs at group slot j//2 half 0/1, its w2
  at group slot g/2 + j//2 — four partial ``ppermute``s of half-chunks.
* ``m <= n_loc`` — every node lives on one device: all deeper levels are
  communication-free local transforms.

So exactly log2(S) levels touch the ICI, each moving O(F + n_loc) bytes per
device — the Ulysses-style position->subband reshard of SURVEY §5 emerges
naturally from the packed layout (once 2^d == S, position chunks *are*
subbands).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..filters import wavelet as _wavelet
from ..kernels import conv


def _group_ring_perm(S: int, g: int, direction: int):
    """Ring permutation within consecutive groups of size g (wrap inside the
    group).  direction=+1: send to right neighbor."""
    perm = []
    for j in range(S):
        base = (j // g) * g
        dst = base + (j - base + direction) % g
        perm.append((j, dst))
    return perm


def _compaction_perms(S: int, g: int):
    """Partial permutations routing local w1/w2 half-chunks into the packed
    next-level layout (see module docstring).  Returns four lists of (src,
    dst) pairs: w1 from even/odd in-group slots, w2 from even/odd slots."""
    w1_even, w1_odd, w2_even, w2_odd = [], [], [], []
    for j in range(S):
        base = (j // g) * g
        jin = j - base
        dst1 = base + jin // 2
        dst2 = base + g // 2 + jin // 2
        (w1_even if jin % 2 == 0 else w1_odd).append((j, dst1))
        (w2_even if jin % 2 == 0 else w2_odd).append((j, dst2))
    return w1_even, w1_odd, w2_even, w2_odd


def _cp_level(cur, d: int, n: int, S: int, lo, hi, axis: str):
    """One packet level on position-sharded local chunks ``cur`` (..., n_loc).
    Returns the next level's local chunk (same shape)."""
    n_loc = cur.shape[-1]
    m = n >> d
    F = len(lo)
    if m <= n_loc:
        # node-local: reshape into this device's nodes and split them
        nodes_here = n_loc // m
        nodes = cur.reshape(*cur.shape[:-1], nodes_here, m)
        w1, w2 = conv.analysis_step(nodes, lo, hi)
        out = jnp.concatenate([w1, w2], axis=-1)
        return out.reshape(*cur.shape[:-1], n_loc)

    g = m // n_loc
    assert n_loc >= F, "shard smaller than filter support"
    # (a) halo exchange with periodic wrap inside the node group
    right = jax.lax.ppermute(cur[..., : F - 2], axis,
                             _group_ring_perm(S, g, -1))
    left = jax.lax.ppermute(cur[..., -(F - 2):], axis,
                            _group_ring_perm(S, g, +1))
    ext = jnp.concatenate([left, cur, right], axis=-1)
    # (b) local decimated outputs: w1[i] over window [2i, 2i+F), w2[i] over
    # [2i+2-F, 2i+2); in ext coordinates everything shifts by F-2
    w1 = conv.periodic_filter(ext, lo, stride=1, dilation=1, offset=F - 2)
    w1 = jax.lax.slice_in_dim(w1, 0, n_loc, stride=2, axis=-1)
    w2 = conv.periodic_filter(ext, hi, stride=1, dilation=1, offset=0)
    w2 = jax.lax.slice_in_dim(w2, 0, n_loc, stride=2, axis=-1)
    # (c) compaction into the packed layout
    p1e, p1o, p2e, p2o = _compaction_perms(S, g)
    half = n_loc // 2
    lo_half = (jax.lax.ppermute(w1, axis, p1e)
               + jax.lax.ppermute(w2, axis, p2e))
    hi_half = (jax.lax.ppermute(w1, axis, p1o)
               + jax.lax.ppermute(w2, axis, p2o))
    return jnp.concatenate([lo_half, hi_half], axis=-1)


def wpd_cp(x, wt, L: int, mesh: Mesh, axis: str = "sp"):
    """Signal-axis-sharded WPD: x (..., n) with the last axis sharded over
    ``axis``; returns the (..., L+1, n) level stack, position-sharded."""
    w = _wavelet(wt) if isinstance(wt, str) else wt
    n = x.shape[-1]
    S = mesh.shape[axis]
    lead = len(x.shape) - 1

    in_spec = P(*([None] * lead), axis)
    out_spec = P(*([None] * lead), None, axis)

    def inner(xl):
        cur = xl
        levels = [cur]
        for d in range(L):
            cur = _cp_level(cur, d, n, S, w.lo, w.hi, axis)
            levels.append(cur)
        return jnp.stack(levels, axis=-2)

    fn = shard_map(inner, mesh=mesh, in_specs=(in_spec,),
                   out_specs=out_spec)
    return fn(x)


# ---------------------------------------------------------------------------
# Redundant (a-trous / SWT) context parallelism
#
# One a-trous level at depth d reads a dilated window of span (F-1)*2^d, so:
#   * shallow levels  ((F-1)*2^d << n_loc): ring halo exchange — two
#     ppermutes moving (F-1)*2^d samples, periodic over the WHOLE signal
#     (the full device ring), then a local dilated correlation;
#   * deep levels ((F-1)*2^d ~ n_loc): the halo would copy most of the
#     neighbor, so re-shard position -> coset with an explicit all_to_all
#     (SURVEY §5's Ulysses-style fallback): depth d splits into 2^d
#     independent stride-1 cosets of length n/2^d; each device takes 2^d/S
#     whole cosets, filters them LOCALLY with zero halo (periodic within the
#     coset), and an inverse all_to_all restores position sharding.
# ---------------------------------------------------------------------------

def _coset_reshard(xl, D: int, S: int, axis: str):
    """Local position chunk (..., n_loc) -> this device's (..., D/S, n/D)
    whole cosets, via one all_to_all.  Requires S <= D <= n_loc."""
    n_loc = xl.shape[-1]
    assert D % S == 0 and n_loc % D == 0, (D, S, n_loc)
    xr = xl.reshape(*xl.shape[:-1], n_loc // D, S, D // S)
    xr = jnp.moveaxis(xr, -2, 0)               # (S, ..., n_loc/D, D/S)
    y = jax.lax.all_to_all(xr, axis, 0, 0)     # leading S = source device
    y = jnp.moveaxis(y, 0, -3)                 # (..., S_src, n_loc/D, D/S)
    y = y.reshape(*xl.shape[:-1], (n_loc // D) * S, D // S)  # (..., n/D, D/S)
    return jnp.swapaxes(y, -1, -2)             # (..., D/S, n/D)


def _coset_unshard(yl, D: int, S: int, axis: str):
    """Inverse of :func:`_coset_reshard`: (..., D/S, n/D) -> (..., n_loc)."""
    nD = yl.shape[-1]
    n_loc = nD * D // S
    y = jnp.swapaxes(yl, -1, -2)               # (..., n/D, D/S)
    y = y.reshape(*y.shape[:-2], S, n_loc // D, D // S)
    y = jnp.moveaxis(y, -3, 0)
    x = jax.lax.all_to_all(y, axis, 0, 0)      # leading S = coset group
    x = jnp.moveaxis(x, 0, -2)                 # (..., n_loc/D, S, D/S)
    return x.reshape(*yl.shape[:-2], n_loc)


def _atrous_level_cp(cur, d: int, S: int, lo, hi, axis: str,
                     force: str | None = None,
                     off1: int | None = None, off2: int | None = None):
    """One position-sharded a-trous analysis level.  ``off1``/``off2`` are
    the filter offsets in coset units (w[p] = sum_t f[t] v[p + D(t+off)]):
    defaults are the SWT step's (-1, -(F-1)) (swt_one_level.jl:99-127); the
    ACWT step passes its half-filter phase shift (acwt_one_level.jl:101-128).
    Returns (w1_local, w2_local), both position-sharded like ``cur``."""
    D = 1 << d
    F = len(lo)
    n_loc = cur.shape[-1]
    off1 = -1 if off1 is None else off1
    off2 = -(F - 1) if off2 is None else off2
    halo_l = D * max(-off1, -off2, 0)
    halo_r = D * max(off1 + F - 1, off2 + F - 1, 0)
    # the coset reshard needs whole cosets per device (S | D) and whole
    # coset rows per position chunk (D | n_loc); shallow levels (D < S)
    # always go through the halo path
    can_coset = D % S == 0 and n_loc % D == 0
    if force == "halo":
        use_halo = True
    elif force == "cosets":
        use_halo = not can_coset
    else:  # automatic: halo while it is small relative to the shard
        use_halo = 2 * halo_l <= n_loc or not can_coset
    if use_halo:
        assert max(halo_l, halo_r) <= n_loc, "halo exceeds shard; use cosets"
        ring_l = [(j, (j + 1) % S) for j in range(S)]   # send to right
        ring_r = [(j, (j - 1) % S) for j in range(S)]   # send to left
        parts = []
        if halo_l:
            parts.append(jax.lax.ppermute(cur[..., n_loc - halo_l:], axis,
                                          ring_l))
        parts.append(cur)
        if halo_r:
            parts.append(jax.lax.ppermute(cur[..., :halo_r], axis, ring_r))
        ext = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else cur
        w1 = conv.periodic_filter(ext, lo, stride=1, dilation=D,
                                  offset=halo_l + D * off1)[..., :n_loc]
        w2 = conv.periodic_filter(ext, hi, stride=1, dilation=D,
                                  offset=halo_l + D * off2)[..., :n_loc]
        return w1, w2
    # explicit all_to_all coset path
    cos = _coset_reshard(cur, D, S, axis)      # (..., D/S, n/D) full cosets
    w1c = conv._circ_correlate(cos, lo, off1)
    w2c = conv._circ_correlate(cos, hi, off2)
    return (_coset_unshard(w1c, D, S, axis),
            _coset_unshard(w2c, D, S, axis))


def _check_cp_depth(n: int, L: int, S: int):
    """Every level needs either a single-neighbor halo or a whole-coset
    layout; both require dilation 2^d <= n/S, so the sharded transforms
    support L <= log2(n/S) + 1 (deeper needs multi-hop halos — reshard to
    fewer/wider chunks instead)."""
    n_loc = n // S
    if L > 0 and (1 << (L - 1)) > n_loc:
        raise ValueError(
            f"L={L} too deep for {S} position shards of length {n_loc}: "
            f"level {L - 1} has dilation {1 << (L - 1)} > shard; max "
            f"L = {int(np.log2(n_loc)) + 1}")


def sdwt_cp(x, wt, L: int, mesh: Mesh, axis: str = "sp",
            force: str | None = None):
    """Position-sharded stationary DWT -> (..., L+1, n) stack (slot 0 =
    coarsest approx, transforms/swt.py layout), signal axis sharded over
    ``axis``.  ``force`` in {None, 'halo', 'cosets'} pins the per-level
    strategy (None = automatic by halo-to-shard ratio).  Depth is bounded
    by the shard length: L <= log2(n / n_shards) + 1 (see _check_cp_depth).
    """
    w = _wavelet(wt) if isinstance(wt, str) else wt
    S = mesh.shape[axis]
    _check_cp_depth(x.shape[-1], L, S)
    lead = len(x.shape) - 1
    in_spec = P(*([None] * lead), axis)
    out_spec = P(*([None] * lead), None, axis)

    def inner(xl):
        cur = xl
        details = []
        for d in range(L):
            cur, w2 = _atrous_level_cp(cur, d, S, w.lo, w.hi, axis, force)
            details.append(w2)
        return jnp.stack([cur] + details[::-1], axis=-2)

    return shard_map(inner, mesh=mesh, in_specs=(in_spec,),
                     out_specs=out_spec)(x)


def swpd_cp(x, wt, L: int, mesh: Mesh, axis: str = "sp",
            force: str | None = None):
    """Position-sharded stationary WPD -> all-node table
    (..., 2^(L+1)-1, n) (transforms/swt.py swpd layout: 1-based node i at
    slot i-1).  Depth bound: L <= log2(n / n_shards) + 1."""
    w = _wavelet(wt) if isinstance(wt, str) else wt
    S = mesh.shape[axis]
    _check_cp_depth(x.shape[-1], L, S)
    lead = len(x.shape) - 1
    in_spec = P(*([None] * lead), axis)
    out_spec = P(*([None] * lead), None, axis)

    def inner(xl):
        slots = [xl]
        for d in range(L):
            nxt = []
            for node in slots[-(1 << d):]:
                w1, w2 = _atrous_level_cp(node, d, S, w.lo, w.hi, axis,
                                          force)
                nxt.extend([w1, w2])
            slots.extend(nxt)
        return jnp.stack(slots, axis=-2)

    return shard_map(inner, mesh=mesh, in_specs=(in_spec,),
                     out_specs=out_spec)(x)


def sdwt2_cp(x, wt, L: int, mesh: Mesh, axis: str = "sp",
             force: str | None = None):
    """Column-sharded 2-D stationary DWT -> (..., 3L+1, n, m) stack
    (transforms/swt.py sdwt2 layout), with the LAST (column) axis sharded
    over ``axis``.

    Separable: the row-direction filter pass works on full local rows (no
    communication); the column-direction pass is the 1-D a-trous CP level —
    halo ppermutes or the coset all_to_all — applied with the row axis
    folded into the batch.  Depth bound: L <= log2(m / n_shards) + 1."""
    w = _wavelet(wt) if isinstance(wt, str) else wt
    S = mesh.shape[axis]
    from ..trees import maxtransformlevels
    Lmax = maxtransformlevels(min(x.shape[-2:]))
    if not 1 <= L <= Lmax:
        raise ValueError(f"L must be in 1..{Lmax} for {x.shape[-2:]} images,"
                         f" got {L}")
    _check_cp_depth(x.shape[-1], L, S)
    lead = len(x.shape) - 2
    in_spec = P(*([None] * (lead + 1)), axis)
    out_spec = P(*([None] * (lead + 1)), None, axis)

    def level2(cur, d):
        # reference order (swt_one_level.jl:334-370): first the axis -2
        # pass — local, every device holds whole columns of its slice —
        # then the sharded last-axis pass through the 1-D CP level.  Both
        # subbands go through ONE CP call (stacked on a new leading axis)
        # so each level pays one set of collectives, not two.
        t1, t2 = (jnp.swapaxes(r, -1, -2) for r in conv.sdwt_step(
            jnp.swapaxes(cur, -1, -2), d, w.lo, w.hi))
        tlo, thi = _atrous_level_cp(jnp.stack([t1, t2]), d, S, w.lo, w.hi,
                                    axis, force)
        return tlo[0], thi[0], tlo[1], thi[1]

    def inner(xl):
        cur = xl
        slots = {}
        for d in range(L):
            w1, w2, w3, w4 = level2(cur, d)
            base = 3 * (L - d)
            slots[base - 2], slots[base - 1], slots[base] = w2, w3, w4
            cur = w1
        slots[0] = cur
        return jnp.stack([slots[j] for j in range(3 * L + 1)], axis=-3)

    return shard_map(inner, mesh=mesh, in_specs=(in_spec,),
                     out_specs=out_spec)(x)


def acdwt_cp(x, wt, L: int, mesh: Mesh, axis: str = "sp",
             force: str | None = None):
    """Position-sharded autocorrelation DWT -> (..., L+1, n) stack
    (transforms/acwt.py acdwt layout: slot 0 = coarsest approx).  Same
    halo / coset strategies as :func:`sdwt_cp`; the ACWT inverse is the
    filterless pairwise average and needs no communication at all."""
    w = _wavelet(wt) if isinstance(wt, str) else wt
    S = mesh.shape[axis]
    _check_cp_depth(x.shape[-1], L, S)
    ac_lo, ac_hi = w.ac_lo, w.ac_hi
    off = -(len(ac_lo) // 2)
    lead = len(x.shape) - 1
    in_spec = P(*([None] * lead), axis)
    out_spec = P(*([None] * lead), None, axis)

    def inner(xl):
        cur = xl
        details = []
        for d in range(L):
            cur, w2 = _atrous_level_cp(cur, d, S, ac_lo, ac_hi, axis, force,
                                       off1=off, off2=off)
            details.append(w2)
        return jnp.stack([cur] + details[::-1], axis=-2)

    return shard_map(inner, mesh=mesh, in_specs=(in_spec,),
                     out_specs=out_spec)(x)


def _wpt2_cp_level(cur, d: int, m: int, S: int, lo, hi, axis: str):
    """One column-sharded 2-D decimated packet level (..., n, m_loc).

    Separable split of dwt_one_level.jl:319-354: the axis -2 pass is local
    (every device holds whole columns of its slice) via the packed 1-D level
    step; the sharded last-axis pass is exactly the 1-D decimated CP level
    (_cp_level) with the row axis folded into the batch — halo ppermutes +
    packed-layout compaction, or node-local once 2^d >= n_shards."""
    from ..transforms.dwt import _wpt_level_fwd
    t = jnp.swapaxes(cur, -1, -2)
    t = _wpt_level_fwd(t, d, lo, hi)
    cur = jnp.swapaxes(t, -1, -2)
    return _cp_level(cur, d, m, S, lo, hi, axis)


def _wpd2_cp_specs(x, axis):
    lead = len(x.shape) - 2
    in_spec = P(*([None] * (lead + 1)), axis)
    stack_spec = P(*([None] * (lead + 1)), None, axis)
    return in_spec, stack_spec


def _check_cp2_levels(x, L, S):
    from ..trees import maxtransformlevels
    n, m = x.shape[-2:]
    Lmax = maxtransformlevels(min(n, m))
    if not 1 <= L <= Lmax:
        raise ValueError(f"L must be in 1..{Lmax} for {x.shape[-2:]} images,"
                         f" got {L}")
    if m % S:
        raise ValueError(f"column axis {m} not divisible by {S} shards")


def wpd2_cp(x, wt, L: int, mesh: Mesh, axis: str = "sp"):
    """Column-sharded 2-D WPD -> (..., L+1, n, m) level stack
    (transforms/dwt.py wpd2 layout) with the LAST (column) axis sharded over
    ``axis`` — the SURVEY §5 long-signal strategy applied to large images
    (no reference counterpart; the reference transforms whole images
    serially, DWT.jl:164-209)."""
    w = _wavelet(wt) if isinstance(wt, str) else wt
    S = mesh.shape[axis]
    _check_cp2_levels(x, L, S)
    m = x.shape[-1]
    in_spec, out_spec = _wpd2_cp_specs(x, axis)

    def inner(xl):
        cur = xl
        slices = [cur]
        for d in range(L):
            cur = _wpt2_cp_level(cur, d, m, S, w.lo, w.hi, axis)
            slices.append(cur)
        return jnp.stack(slices, axis=-3)

    return shard_map(inner, mesh=mesh, in_specs=(in_spec,),
                     out_specs=out_spec)(x)


def wpt2_cp(x, wt, L: int, mesh: Mesh, axis: str = "sp"):
    """Column-sharded 2-D WPT (leaf slice only) -> (..., n, m)."""
    w = _wavelet(wt) if isinstance(wt, str) else wt
    S = mesh.shape[axis]
    _check_cp2_levels(x, L, S)
    m = x.shape[-1]
    in_spec, _ = _wpd2_cp_specs(x, axis)

    def inner(xl):
        cur = xl
        for d in range(L):
            cur = _wpt2_cp_level(cur, d, m, S, w.lo, w.hi, axis)
        return cur

    return shard_map(inner, mesh=mesh, in_specs=(in_spec,),
                     out_specs=in_spec)(x)


@functools.partial(jax.jit, static_argnames=("wt", "L", "mesh", "axis"))
def wpt_cp(x, wt, L: int, mesh: Mesh, axis: str = "sp"):
    """Signal-axis-sharded WPT (leaf slice only)."""
    w = _wavelet(wt) if isinstance(wt, str) else wt
    n = x.shape[-1]
    S = mesh.shape[axis]
    lead = len(x.shape) - 1
    in_spec = P(*([None] * lead), axis)

    def inner(xl):
        cur = xl
        for d in range(L):
            cur = _cp_level(cur, d, n, S, w.lo, w.hi, axis)
        return cur

    fn = shard_map(inner, mesh=mesh, in_specs=(in_spec,), out_specs=in_spec)
    return fn(x)
