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
    # (a) halo exchange with periodic wrap inside the node group (NB: guard
    # the F=2 case — cur[..., -0:] would be the whole chunk, not an empty
    # halo)
    if F > 2:
        right = jax.lax.ppermute(cur[..., : F - 2], axis,
                                 _group_ring_perm(S, g, -1))
        left = jax.lax.ppermute(cur[..., -(F - 2):], axis,
                                _group_ring_perm(S, g, +1))
        ext = jnp.concatenate([left, cur, right], axis=-1)
    else:
        ext = cur
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


def acdwt2_cp(x, wt, L: int, mesh: Mesh, axis: str = "sp",
              force: str | None = None):
    """Column-sharded 2-D autocorrelation DWT -> (..., 3L+1, n, m) stack
    (transforms/acwt.py acdwt2 layout), LAST axis sharded over ``axis``.

    Separable mirror of :func:`sdwt2_cp` with the symmetric ac filters and
    their half-filter phase offsets; the inverse is the filterless pairwise
    average (iacdwt2) and runs locally on the sharded stack with no
    communication."""
    w = _wavelet(wt) if isinstance(wt, str) else wt
    S = mesh.shape[axis]
    from ..trees import maxtransformlevels
    Lmax = maxtransformlevels(min(x.shape[-2:]))
    if not 1 <= L <= Lmax:
        raise ValueError(f"L must be in 1..{Lmax} for {x.shape[-2:]} images,"
                         f" got {L}")
    _check_cp_depth(x.shape[-1], L, S)
    ac_lo, ac_hi = w.ac_lo, w.ac_hi
    off = -(len(ac_lo) // 2)
    lead = len(x.shape) - 2
    in_spec = P(*([None] * (lead + 1)), axis)
    out_spec = P(*([None] * (lead + 1)), None, axis)

    def level2(cur, d):
        t1, t2 = (jnp.swapaxes(r, -1, -2) for r in conv.acdwt_step(
            jnp.swapaxes(cur, -1, -2), d, ac_lo, ac_hi))
        tlo, thi = _atrous_level_cp(jnp.stack([t1, t2]), d, S, ac_lo, ac_hi,
                                    axis, force, off1=off, off2=off)
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


# ---------------------------------------------------------------------------
# Sequence-parallel inverses.  The reference pairs every analysis with a
# synthesis (idwt_step! dwt_one_level.jl:192-223, average-based isdwt_step!
# swt_one_level.jl:257-277); these are their CP-ring mirrors, so a denoise
# workload on a position-sharded long signal round-trips entirely through
# explicit collectives (forward -> local threshold -> inverse).
# ---------------------------------------------------------------------------

def _valid_correlate(ext, taps, start: int, out_len: int):
    """out[j] = sum_t taps[t] * ext[..., j + start + t] — plain windowed
    correlate on a halo-extended buffer (no wrap; the halos cover the
    support)."""
    acc = None
    for t in range(len(taps)):
        sl = jax.lax.slice_in_dim(ext, start + t, start + t + out_len,
                                  axis=-1)
        term = float(taps[t]) * sl
        acc = term if acc is None else acc + term
    return acc


def _icp_level(nxt, d: int, n: int, S: int, lo, hi, axis: str):
    """Inverse of :func:`_cp_level`: packed depth-(d+1) local chunks ->
    depth-d local chunks (same shape).

    For node-spanning levels (m = n >> d >= 2 * n_loc) the forward's packed
    compaction is reversed with the transposed partial ``ppermute``s (each
    device recovers its n_loc/2 w1 and w2 samples in node order), then the
    polyphase synthesis v[2q+e] = sum_t lo_e~[t] w1[q-(F/2-1)+t]
    + sum_t hi_e~[t] w2[q+t] (conv._synthesis_conv) runs locally after a
    single group-ring halo exchange of F/2-1 samples per side."""
    n_loc = nxt.shape[-1]
    m = n >> d
    F = len(lo)
    if m <= n_loc:
        nodes_here = n_loc // m
        nodes = nxt.reshape(*nxt.shape[:-1], nodes_here, m)
        v = conv.synthesis_step_packed(nodes, lo, hi)
        return v.reshape(*nxt.shape[:-1], n_loc)
    g = m // n_loc
    assert F % 2 == 0, "decimated CP needs even-length filters"
    half = n_loc // 2
    p1e, p1o, p2e, p2o = _compaction_perms(S, g)
    rev = lambda pairs: [(dst, src) for (src, dst) in pairs]
    lo_half, hi_half = nxt[..., :half], nxt[..., half:]
    w1 = (jax.lax.ppermute(lo_half, axis, rev(p1e))
          + jax.lax.ppermute(hi_half, axis, rev(p1o)))
    w2 = (jax.lax.ppermute(lo_half, axis, rev(p2e))
          + jax.lax.ppermute(hi_half, axis, rev(p2o)))
    Fe = F // 2
    h = Fe - 1
    z = jnp.stack([w1, w2])
    if h:
        left = jax.lax.ppermute(z[..., n_loc // 2 - h:], axis,
                                _group_ring_perm(S, g, +1))
        right = jax.lax.ppermute(z[..., :h], axis,
                                 _group_ring_perm(S, g, -1))
        z = jnp.concatenate([left, z, right], axis=-1)
    e1, e2 = z[0], z[1]
    outs = []
    for e in (0, 1):
        lo_e = np.asarray(lo[e::2])[::-1]
        hi_e = np.asarray(hi[e::2])[::-1]
        # ext index of w[q] is q + h; the w1 term reads w1[q-(Fe-1)+t]
        # (ext start 0) and the w2 term reads w2[q+t] (ext start h)
        ve = _valid_correlate(e1, lo_e, 0, half)
        ve = ve + _valid_correlate(e2, hi_e, h, half)
        outs.append(ve)
    return jnp.stack(outs, axis=-1).reshape(*nxt.shape[:-1], n_loc)


@functools.partial(jax.jit, static_argnames=("wt", "L", "mesh", "axis"))
def iwpt_cp(y, wt, L: int, mesh: Mesh, axis: str = "sp"):
    """Signal-axis-sharded inverse WPT (mirror of :func:`wpt_cp`): the leaf
    slice ``(..., n)`` position-sharded over ``axis`` reconstructs to the
    signal, position-sharded the same way."""
    w = _wavelet(wt) if isinstance(wt, str) else wt
    n = y.shape[-1]
    S = mesh.shape[axis]
    lead = len(y.shape) - 1
    in_spec = P(*([None] * lead), axis)

    def inner(yl):
        cur = yl
        for d in range(L - 1, -1, -1):
            cur = _icp_level(cur, d, n, S, w.lo, w.hi, axis)
        return cur

    return shard_map(inner, mesh=mesh, in_specs=(in_spec,),
                     out_specs=in_spec)(y)


def _atrous_apply_cp(parts, d: int, S: int, taps_offs, groups, axis: str,
                     force: str | None = None):
    """Grouped sums of dilated circular correlations on position-sharded
    chunks: for each group G in ``groups`` returns
    ``sum_{i in G} corr(parts[i], taps_i, off_i)`` where
    ``corr(v, f, off)[p] = sum_t f[t] v[(p + D(t+off)) mod n]``, D = 2^d.

    ONE set of collectives serves every part (they are stacked on a new
    leading axis): ring halo ppermutes while the halo is small, else the
    position->coset all_to_all (the same strategy switch as the forward
    :func:`_atrous_level_cp`)."""
    D = 1 << d
    n_loc = parts[0].shape[-1]
    halo_l = D * max(max(-off, 0) for _, off in taps_offs)
    halo_r = D * max(max(off + len(taps) - 1, 0) for taps, off in taps_offs)
    can_coset = D % S == 0 and n_loc % D == 0
    if force == "halo":
        use_halo = True
    elif force == "cosets":
        use_halo = not can_coset
    else:
        use_halo = 2 * max(halo_l, halo_r) <= n_loc or not can_coset
    z = jnp.stack(parts)
    if use_halo:
        assert max(halo_l, halo_r) <= n_loc, "halo exceeds shard; use cosets"
        ring_l = [(j, (j + 1) % S) for j in range(S)]
        ring_r = [(j, (j - 1) % S) for j in range(S)]
        segs = []
        if halo_l:
            segs.append(jax.lax.ppermute(z[..., n_loc - halo_l:], axis,
                                         ring_l))
        segs.append(z)
        if halo_r:
            segs.append(jax.lax.ppermute(z[..., :halo_r], axis, ring_r))
        ext = jnp.concatenate(segs, axis=-1) if len(segs) > 1 else z
        filtered = [conv.periodic_filter(ext[i], taps, stride=1, dilation=D,
                                         offset=halo_l + D * off)[..., :n_loc]
                    for i, (taps, off) in enumerate(taps_offs)]
    else:
        cos = _coset_reshard(z, D, S, axis)
        fc = [conv._circ_correlate(cos[i], taps, off)
              for i, (taps, off) in enumerate(taps_offs)]
        filtered = list(_coset_unshard(jnp.stack(fc), D, S, axis))
    return [sum(filtered[i] for i in G) for G in groups]


def _avg_inv_taps(w):
    """Adjoint-form average inverse taps/offsets: isdwt_step_average(w1, w2,
    d) == corr(w1, lo~/2, 2-F) + corr(w2, hi~/2, 0) with dilation 2^d (the
    two decimated shift-branch syntheses are the even/odd row halves of the
    adjoint — see kernels/pallas_swt.py, verified vs conv.isdwt_step_average
    in tests)."""
    F = len(w.lo)
    lo_r = 0.5 * np.asarray(w.lo, np.float64)[::-1]
    hi_r = 0.5 * np.asarray(w.hi, np.float64)[::-1]
    return [(lo_r, 2 - F), (hi_r, 0)]


@functools.partial(jax.jit, static_argnames=("wt", "mesh", "axis", "force"))
def isdwt_cp(xw, wt, mesh: Mesh, axis: str = "sp",
             force: str | None = None):
    """Position-sharded average-based inverse stationary DWT: the
    ``(..., L+1, n)`` stack (transforms/swt.py sdwt layout, signal axis
    sharded over ``axis``) reconstructs to ``(..., n)``, position-sharded.

    Mirrors the reference's average-based ``isdwt`` (SWT.jl:317-334) via the
    adjoint identity (see :func:`_avg_inv_taps`), so every level is one
    grouped à-trous CP application — halo ppermutes or the coset
    all_to_all, exactly like the forward."""
    w = _wavelet(wt) if isinstance(wt, str) else wt
    S = mesh.shape[axis]
    L = xw.shape[-2] - 1
    _check_cp_depth(xw.shape[-1], L, S)
    taps_offs = _avg_inv_taps(w)
    lead = len(xw.shape) - 2
    in_spec = P(*([None] * lead), None, axis)
    out_spec = P(*([None] * lead), axis)

    def inner(yl):
        cur = yl[..., 0, :]
        for d in range(L - 1, -1, -1):
            w2 = yl[..., L - d, :]
            (cur,) = _atrous_apply_cp([cur, w2], d, S, taps_offs, [(0, 1)],
                                      axis, force)
        return cur

    return shard_map(inner, mesh=mesh, in_specs=(in_spec,),
                     out_specs=out_spec)(xw)


@functools.partial(jax.jit, static_argnames=("wt", "mesh", "axis", "force"))
def isdwt2_cp(xw, wt, mesh: Mesh, axis: str = "sp",
              force: str | None = None):
    """Column-sharded average-based inverse 2-D stationary DWT: the
    ``(..., 3L+1, n, m)`` stack (transforms/swt.py sdwt2 layout, LAST axis
    sharded) reconstructs to ``(..., n, m)``.

    Separable mirror of :func:`sdwt2_cp`: the sharded last-axis pass merges
    (LL,LH) and (HL,HH) pairs through ONE grouped à-trous CP application
    (all four planes share one halo exchange / all_to_all), then the
    column-direction average inverse runs locally on whole columns."""
    w = _wavelet(wt) if isinstance(wt, str) else wt
    S = mesh.shape[axis]
    P_slots = xw.shape[-3]
    L = (P_slots - 1) // 3
    _check_cp_depth(xw.shape[-1], L, S)
    taps_offs = _avg_inv_taps(w)
    to4 = taps_offs + taps_offs   # [(lo~,2-F),(hi~,0)] x {t1-pair, t2-pair}
    lead = len(xw.shape) - 3
    in_spec = P(*([None] * (lead + 1)), None, axis)
    out_spec = P(*([None] * (lead + 1)), axis)

    def inner(yl):
        cur = yl[..., 0, :, :]
        for d in range(L - 1, -1, -1):
            base = 3 * (L - d)
            w2 = yl[..., base - 2, :, :]
            w3 = yl[..., base - 1, :, :]
            w4 = yl[..., base, :, :]
            t1, t2 = _atrous_apply_cp([cur, w2, w3, w4], d, S, to4,
                                      [(0, 1), (2, 3)], axis, force)
            cur = conv._on_cols(conv.isdwt_step_average, [t1, t2], d,
                                w.lo, w.hi)
        return cur

    return shard_map(inner, mesh=mesh, in_specs=(in_spec,),
                     out_specs=out_spec)(xw)


@functools.partial(jax.jit, static_argnames=("wt", "L", "mesh", "axis"))
def iwpt2_cp(y, wt, L: int, mesh: Mesh, axis: str = "sp"):
    """Column-sharded 2-D inverse WPT (mirror of :func:`wpt2_cp`): sharded
    last-axis inverse level first (:func:`_icp_level` with rows folded into
    the batch), then the local column-direction inverse on whole columns —
    the reverse of the forward's separable order."""
    from ..transforms.dwt import _wpt_level_inv
    w = _wavelet(wt) if isinstance(wt, str) else wt
    S = mesh.shape[axis]
    _check_cp2_levels(y, L, S)
    m = y.shape[-1]
    in_spec, _ = _wpd2_cp_specs(y, axis)

    def inner(yl):
        cur = yl
        for d in range(L - 1, -1, -1):
            cur = _icp_level(cur, d, m, S, w.lo, w.hi, axis)
            t = jnp.swapaxes(cur, -1, -2)
            t = _wpt_level_inv(t, d, w.lo, w.hi)
            cur = jnp.swapaxes(t, -1, -2)
        return cur

    return shard_map(inner, mesh=mesh, in_specs=(in_spec,),
                     out_specs=in_spec)(y)


def iswpd_cp(xw, wt, tree, mesh: Mesh, axis: str = "sp",
             force: str | None = None):
    """Position-sharded tree-driven average-based inverse SWPD: the
    all-node table ``(..., 2^(L+1)-1, n)`` (transforms/swt.py swpd layout,
    signal axis sharded over ``axis``) reconstructs by the host ``tree``
    (1-based node semantics; mirrors transforms.swt.iswpd's
    level-synchronous merge -> select, SWT.jl:1138-1164).

    Every depth merges ALL node pairs through ONE grouped à-trous CP
    application (a single halo exchange / all_to_all for the whole level),
    then selects merged-vs-table per node with the static tree mask."""
    from .._jit import StaticTree
    tree = tree if isinstance(tree, StaticTree) else StaticTree(tree)
    return _iswpd_cp_jit(xw, wt, tree, mesh, axis, force)


@functools.partial(jax.jit,
                   static_argnames=("wt", "tree", "mesh", "axis", "force"))
def _iswpd_cp_jit(xw, wt, tree, mesh: Mesh, axis: str, force):
    from ..trees import getdepth
    w = _wavelet(wt) if isinstance(wt, str) else wt
    S = mesh.shape[axis]
    tr = np.asarray(tree, bool)
    Lmax = int(np.log2(xw.shape[-2] + 1)) - 1
    _check_cp_depth(xw.shape[-1], Lmax, S)
    depth = min(getdepth(tr.shape[-1], "binary") + 1, Lmax)
    taps_offs = _avg_inv_taps(w)
    lead = len(xw.shape) - 2
    in_spec = P(*([None] * lead), None, axis)
    out_spec = P(*([None] * lead), axis)

    def inner(yl):
        def block(d):  # depth-d level block (..., 2^d, n_loc)
            return yl[..., (1 << d) - 1: (1 << (d + 1)) - 1, :]
        cur = block(depth)
        for d in range(depth - 1, -1, -1):
            parts = [cur[..., j, :] for j in range(1 << (d + 1))]
            to = taps_offs * (1 << d)
            groups = [(2 * j, 2 * j + 1) for j in range(1 << d)]
            merged = jnp.stack(
                _atrous_apply_cp(parts, d, S, to, groups, axis, force),
                axis=-2)
            marks = jnp.asarray(tr[(1 << d) - 1: (1 << (d + 1)) - 1])
            cur = jnp.where(marks[..., None], merged, block(d))
        return cur[..., 0, :]

    return shard_map(inner, mesh=mesh, in_specs=(in_spec,),
                     out_specs=out_spec)(xw)


@functools.partial(jax.jit,
                   static_argnames=("wt", "L", "mesh", "axis", "soft",
                                    "undersmooth", "force"))
def swt_denoise_cp(x, wt, L: int, t, mesh: Mesh, axis: str = "sp",
                   soft: bool = False, undersmooth: bool = False,
                   force: str | None = None):
    """Fused position-sharded stationary denoise round trip: sdwt ->
    hard/soft threshold (local, ``t`` scalar or per-signal ``(..., 1)``)
    -> average-based inverse, ONE shard_map program over the explicit CP
    ring (the sharded analog of denoising.swt_denoise pipelines; reference
    flow Denoising.jl:544-565).  ``undersmooth`` spares the coarsest
    approx slot."""
    w = _wavelet(wt) if isinstance(wt, str) else wt
    S = mesh.shape[axis]
    _check_cp_depth(x.shape[-1], L, S)
    taps_offs = _avg_inv_taps(w)
    lead = len(x.shape) - 1
    in_spec = P(*([None] * lead), axis)
    t = jnp.asarray(t, x.dtype)
    t_spec = P(*([None] * t.ndim))  # thresholds replicate

    def thresh(p, tv):
        if soft:
            return jnp.sign(p) * jnp.maximum(jnp.abs(p) - tv, 0.0)
        return jnp.where(jnp.abs(p) > tv, p, 0.0)

    def inner(xl, tv):
        cur = xl
        details = []
        for d in range(L):
            cur, w2 = _atrous_level_cp(cur, d, S, w.lo, w.hi, axis, force)
            details.append(thresh(w2, tv))
        if not undersmooth:
            cur = thresh(cur, tv)
        for d in range(L - 1, -1, -1):
            (cur,) = _atrous_apply_cp([cur, details[d]], d, S, taps_offs,
                                      [(0, 1)], axis, force)
        return cur

    return shard_map(inner, mesh=mesh, in_specs=(in_spec, t_spec),
                     out_specs=in_spec)(x, t)
