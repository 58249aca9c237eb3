"""Stationary (undecimated) wavelet transforms: sdwt/swpt/swpd + inverses.

Re-design of /root/reference/src/mod/SWT.jl.  Layouts (row-major, batch-first):

* ``sdwt``  -> ``(..., L+1, n)``: slot 0 = level-L scaling; slot j>=1 = detail
  produced from the depth-(L-j) parent (SWT.jl:109-130 transposed).
* ``swpt``  -> ``(..., 2^L, n)``: depth-L packet leaves in natural binary
  order (SWT.jl:439-472).
* ``swpd``  -> ``(..., 2^(L+1)-1, n)``: every node of the full binary tree,
  1-based node i at slot i-1 (SWT.jl:840-868).
* 2-D versions append ``(n, m)`` instead of ``(n,)`` with 3L+1 / 4^L /
  (4^(L+1)-1)/3 node slots and quad ordering.

Inverses come in two flavors exactly as in the reference: *average-based*
(default; average the two interleaved shift reconstructions at every depth,
swt_one_level.jl:257-277) and *shift-based* (pick one overall shift ``sm``,
decomposed into per-depth shifts by ``main2depthshift``, SWT.jl:259-284).

Everything is batched over leading axes and node axes simultaneously; each
level is a constant number of fused XLA ops regardless of node count.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .._jit import apijit
from ..filters import Wavelet, wavelet as _wavelet
from ..trees import maketree, maketree2d, maxtransformlevels, tree_depth
from ..utils import main2depthshift
from ..kernels import conv
from .dwt import _tree_split_levels


def _wt(wt) -> Wavelet:
    return _wavelet(wt) if isinstance(wt, str) else wt


def _levels(n, L):
    L0 = maxtransformlevels(n)
    if L is None:
        return L0
    if not 1 <= L <= L0:
        raise ValueError(f"L must be in 1..{L0}, got {L}")
    return L


def _pallas_stack_ok(x, n_axis: int = -1):
    """Shared dispatch guard for the fused à-trous Pallas kernels."""
    from .dwt import _tpu_backend
    n = x.shape[n_axis]
    if x.dtype not in (jnp.float32, jnp.bfloat16) or n % 128:
        return False
    B = int(np.prod(x.shape[:n_axis], dtype=np.int64)) if x.ndim > 1 else 0
    return B >= 8 and B % 8 == 0 and _tpu_backend()


def _try_pallas_sdwt(x, w, L: int):
    if x.ndim < 2 or not _pallas_stack_ok(x):
        return None
    from ..kernels.pallas_swt import sdwt_pallas
    n = x.shape[-1]
    B = int(np.prod(x.shape[:-1]))
    out = sdwt_pallas(x.reshape(B, n), w, L)
    return out.reshape(*x.shape[:-1], L + 1, n)


def _try_pallas_isdwt(xw, w):
    if xw.ndim < 3 or not _pallas_stack_ok(xw):
        return None
    from ..kernels.pallas_swt import isdwt_pallas
    P, n = xw.shape[-2:]
    B = int(np.prod(xw.shape[:-2]))
    out = isdwt_pallas(xw.reshape(B, P, n), w)
    return out.reshape(*xw.shape[:-2], n)


def _pallas_stack2_ok(x) -> bool:
    """Dispatch guard for the fused 2-D à-trous kernels: (..., [P,] n, m)
    image layouts, f32/bf16, lane-aligned m, on TPU."""
    from .dwt import _tpu_backend
    n, m = x.shape[-2:]
    return (x.dtype in (jnp.float32, jnp.bfloat16) and n % 8 == 0
            and m % 128 == 0 and _tpu_backend())


def _try_pallas_sdwt2(x, w, L: int):
    if x.ndim < 3 or not _pallas_stack2_ok(x):
        return None
    from ..kernels.pallas_swt2 import sdwt2_pallas
    n, m = x.shape[-2:]
    B = int(np.prod(x.shape[:-2]))
    out = sdwt2_pallas(x.reshape(B, n, m), w, L)
    return out.reshape(*x.shape[:-2], 3 * L + 1, n, m)


def _try_pallas_isdwt2(xw, w):
    if xw.ndim < 4 or not _pallas_stack2_ok(xw):
        return None
    from ..kernels.pallas_swt2 import isdwt2_pallas
    P, n, m = xw.shape[-3:]
    B = int(np.prod(xw.shape[:-3]))
    out = isdwt2_pallas(xw.reshape(B, P, n, m), w)
    return out.reshape(*xw.shape[:-3], n, m)


def _shift_merge(w1, w2, d, sv, sw, lo, hi):
    """Shift-based inverse step writing onto base ``w1`` (the reference's
    in-place discipline: only the sv-coset is rewritten; other positions keep
    w1's values and are never read downstream)."""
    sc = 1 << (d + 1)
    c1 = w1[..., sw::sc]
    c2 = w2[..., sw::sc]
    y = conv.synthesis_step(c1, c2, lo, hi)
    if sw == sv:
        y = jnp.roll(y, -1, axis=-1)
    return w1.at[..., sv:: (1 << d)].set(y)


def _shift_merge2(w1, w2, w3, w4, d, sv, sw, lo, hi):
    """2-D shift-based inverse step: valid data lives on the (sv,sv) subgrid;
    children are read on the (sw,sw) subgrid (see SWT.jl:433-469 dataflow)."""
    sc = 1 << (d + 1)
    sp = 1 << d

    def rows_merge(a, b):
        c1 = a[..., sw::sc]
        c2 = b[..., sw::sc]
        y = conv.synthesis_step(c1, c2, lo, hi)
        if sw == sv:
            y = jnp.roll(y, -1, axis=-1)
        return y  # strided along last axis: parent coset values only

    # rows pass on the sw-coset rows of each child pair
    t1 = rows_merge(w1[..., sw::sc, :], w2[..., sw::sc, :])
    t2 = rows_merge(w3[..., sw::sc, :], w4[..., sw::sc, :])
    # columns pass: merge t1 (scaling) and t2 (detail) along the row axis
    t1c = jnp.swapaxes(t1, -1, -2)
    t2c = jnp.swapaxes(t2, -1, -2)
    yc = conv.synthesis_step(t1c, t2c, lo, hi)
    if sw == sv:
        yc = jnp.roll(yc, -1, axis=-1)
    y = jnp.swapaxes(yc, -1, -2)  # (..., n/2^d rows, n/2^d cols) subgrid
    return w1.at[..., sv::sp, sv::sp].set(y)


# ---------------------------------------------------------------------------
# SDWT
# ---------------------------------------------------------------------------

@apijit("wt", "L")
def sdwt(x, wt, L: int | None = None):
    """1-D stationary DWT -> (..., L+1, n) (SWT.jl:109-130)."""
    w = _wt(wt)
    L = _levels(x.shape[-1], L)
    fused = _try_pallas_sdwt(x, w, L)
    if fused is not None:
        return fused
    cur = x
    details = []
    for d in range(L):
        cur, w2 = conv.sdwt_step(cur, d, w.lo, w.hi)
        details.append(w2)
    return jnp.stack([cur] + details[::-1], axis=-2)


@apijit("wt", "L")
def sdwt2(x, wt, L: int | None = None):
    """2-D stationary DWT -> (..., 3L+1, n, m) (SWT.jl:132-158): slice
    3(L-d)-2..3(L-d)+1 hold (LL, LH, HL, HH) from the depth-d parent; slot 0 is
    the final LL."""
    w = _wt(wt)
    L = _levels(min(x.shape[-2:]), L)
    fused = _try_pallas_sdwt2(x, w, L)
    if fused is not None:
        return fused
    cur = x
    slots = {}
    for d in range(L):
        w1, w2, w3, w4 = conv.sdwt_step2(cur, d, w.lo, w.hi)
        base = 3 * (L - d)
        slots[base - 2], slots[base - 1], slots[base] = w2, w3, w4
        cur = w1
    slots[0] = cur
    return jnp.stack([slots[j] for j in range(3 * L + 1)], axis=-3)


@apijit("wt", "sm")
def isdwt(xw, wt, sm: int | None = None):
    """Inverse 1-D SDWT; average-based when ``sm`` is None, else shift-based
    (SWT.jl:259-334)."""
    w = _wt(wt)
    L = xw.shape[-2] - 1
    if sm is None:
        fused = _try_pallas_isdwt(xw, w)
        if fused is not None:
            return fused
    x = xw[..., 0, :]
    sd = None if sm is None else main2depthshift(sm, L)
    for d in range(L - 1, -1, -1):
        w2 = xw[..., L - d, :]
        if sd is None:
            x = conv.isdwt_step_average(x, w2, d, w.lo, w.hi)
        else:
            x = _shift_merge(x, w2, d, int(sd[d]), int(sd[d + 1]), w.lo, w.hi)
    return x


@apijit("wt", "sm")
def isdwt2(xw, wt, sm: int | None = None):
    """Inverse 2-D SDWT (SWT.jl:286-355)."""
    w = _wt(wt)
    L = (xw.shape[-3] - 1) // 3
    if sm is None:
        fused = _try_pallas_isdwt2(xw, w)
        if fused is not None:
            return fused
    x = xw[..., 0, :, :]
    sd = None if sm is None else main2depthshift(sm, L)
    for d in range(L - 1, -1, -1):
        base = 3 * (L - d)
        w2 = xw[..., base - 2, :, :]
        w3 = xw[..., base - 1, :, :]
        w4 = xw[..., base, :, :]
        if sd is None:
            x = conv.isdwt_step2_average(x, w2, w3, w4, d, w.lo, w.hi)
        else:
            x = _shift_merge2(x, w2, w3, w4, d, int(sd[d]), int(sd[d + 1]),
                              w.lo, w.hi)
    return x


# ---------------------------------------------------------------------------
# SWPT (full packet table, leaves only)
# ---------------------------------------------------------------------------

def _swpt_levels(x, w, L):
    """All packet levels: list of (..., 2^d, n) arrays for d = 0..L."""
    cur = x[..., None, :]  # (..., 1, n)
    out = [cur]
    for d in range(L):
        w1, w2 = conv.sdwt_step(cur, d, w.lo, w.hi)
        cur = jnp.stack([w1, w2], axis=-2).reshape(
            *cur.shape[:-2], 2 * cur.shape[-2], cur.shape[-1])
        out.append(cur)
    return out


def _swpt_levels2(x, w, L):
    cur = x[..., None, :, :]
    out = [cur]
    for d in range(L):
        w1, w2, w3, w4 = conv.sdwt_step2(cur, d, w.lo, w.hi)
        cur = jnp.stack([w1, w2, w3, w4], axis=-3).reshape(
            *cur.shape[:-3], 4 * cur.shape[-3], *cur.shape[-2:])
        out.append(cur)
    return out


@apijit("wt", "L")
def swpt(x, wt, L: int | None = None):
    """1-D stationary WPT -> (..., 2^L, n) leaves in natural order
    (SWT.jl:439-472)."""
    w = _wt(wt)
    L = _levels(x.shape[-1], L)
    return _swpt_levels(x, w, L)[-1]


@apijit("wt", "L")
def swpt2(x, wt, L: int | None = None):
    """2-D stationary WPT -> (..., 4^L, n, m) (SWT.jl:474-513)."""
    w = _wt(wt)
    L = _levels(min(x.shape[-2:]), L)
    return _swpt_levels2(x, w, L)[-1]


def _merge_level(cur, d, w, sd):
    """Merge (..., 2^(d+1), n) -> (..., 2^d, n)."""
    pairs = cur.reshape(*cur.shape[:-2], cur.shape[-2] // 2, 2, cur.shape[-1])
    w1 = pairs[..., 0, :]
    w2 = pairs[..., 1, :]
    if sd is None:
        return conv.isdwt_step_average(w1, w2, d, w.lo, w.hi)
    return _shift_merge(w1, w2, d, int(sd[d]), int(sd[d + 1]), w.lo, w.hi)


def _merge_level2(cur, d, w, sd):
    quads = cur.reshape(*cur.shape[:-3], cur.shape[-3] // 4, 4, *cur.shape[-2:])
    w1, w2, w3, w4 = (quads[..., i, :, :] for i in range(4))
    if sd is None:
        return conv.isdwt_step2_average(w1, w2, w3, w4, d, w.lo, w.hi)
    return _shift_merge2(w1, w2, w3, w4, d, int(sd[d]), int(sd[d + 1]),
                         w.lo, w.hi)


@apijit("wt", "sm")
def iswpt(xw, wt, sm: int | None = None):
    """Inverse 1-D SWPT (SWT.jl:613-647)."""
    w = _wt(wt)
    L = int(np.log2(xw.shape[-2]))
    sd = None if sm is None else main2depthshift(sm, L)
    cur = xw
    for d in range(L - 1, -1, -1):
        cur = _merge_level(cur, d, w, sd)
    return cur[..., 0, :]


@apijit("wt", "sm")
def iswpt2(xw, wt, sm: int | None = None):
    """Inverse 2-D SWPT (SWT.jl:649-744)."""
    w = _wt(wt)
    L = int(round(np.log(xw.shape[-3]) / np.log(4)))
    sd = None if sm is None else main2depthshift(sm, L)
    cur = xw
    for d in range(L - 1, -1, -1):
        cur = _merge_level2(cur, d, w, sd)
    return cur[..., 0, :, :]


# ---------------------------------------------------------------------------
# SWPD (all nodes kept)
# ---------------------------------------------------------------------------

@apijit("wt", "L")
def swpd(x, wt, L: int | None = None):
    """1-D stationary WPD -> (..., 2^(L+1)-1, n), node i (1-based) at slot i-1
    (SWT.jl:840-868)."""
    w = _wt(wt)
    L = _levels(x.shape[-1], L)
    return jnp.concatenate(_swpt_levels(x, w, L), axis=-2)


@apijit("wt", "L")
def swpd2(x, wt, L: int | None = None):
    """2-D stationary WPD -> (..., (4^(L+1)-1)/3, n, m) (SWT.jl:870-902)."""
    w = _wt(wt)
    L = _levels(min(x.shape[-2:]), L)
    return jnp.concatenate(_swpt_levels2(x, w, L), axis=-3)


def _swpd_level_blocks(xw, L, quad=False):
    """Split the all-node table into per-depth blocks."""
    blocks = []
    off = 0
    for d in range(L + 1):
        cnt = (4 ** d) if quad else (1 << d)
        blocks.append(xw[..., off: off + cnt, :, :] if quad
                      else xw[..., off: off + cnt, :])
        off += cnt
    return blocks


@apijit("wt", "tree_or_L", "sm")
def iswpd(xw, wt, tree_or_L=None, sm: int | None = None):
    """Inverse 1-D SWPD by level or tree, average- or shift-based
    (SWT.jl:1063-1164)."""
    w = _wt(wt)
    n = xw.shape[-1]
    Lmax = int(np.log2(xw.shape[-2] + 1)) - 1
    if tree_or_L is None or isinstance(tree_or_L, (int, np.integer)):
        L = Lmax if tree_or_L is None else int(tree_or_L)
        tree = maketree(n if Lmax == maxtransformlevels(n) else 1 << Lmax,
                        L, "full")
    else:
        tree = np.asarray(tree_or_L, dtype=bool)
    masks = _tree_split_levels(tree, n)
    depth = len(masks)
    sd = None if sm is None else main2depthshift(sm, Lmax)
    blocks = _swpd_level_blocks(xw, Lmax)
    cur = blocks[depth]
    for d in range(depth - 1, -1, -1):
        merged = _merge_level(cur, d, w, sd)
        keep = jnp.asarray(masks[d])[..., None]
        cur = jnp.where(keep, merged, blocks[d])
    return cur[..., 0, :]


def iswpd_dyn(xw, wt, tree, sm: int | None = None):
    """:func:`iswpd` under a *device* tree — ``(nt,)`` shared or ``(..., nt)``
    per-signal bool — so swpd -> best basis -> threshold -> inverse fuses
    into one XLA program (the reference's per-signal host loop is
    swt_all.jl:350-392)."""
    from ..trees import getdepth
    w = _wt(wt)
    Lmax = int(np.log2(xw.shape[-2] + 1)) - 1
    depth = min(getdepth(tree.shape[-1], "binary") + 1, Lmax)
    sd = None if sm is None else main2depthshift(sm, Lmax)
    blocks = _swpd_level_blocks(xw, Lmax)
    cur = blocks[depth]
    for d in range(depth - 1, -1, -1):
        merged = _merge_level(cur, d, w, sd)
        marks = tree[..., (1 << d) - 1: (1 << (d + 1)) - 1]
        cur = jnp.where(marks[..., None], merged, blocks[d])
    return cur[..., 0, :]


@apijit("wt", "tree_or_L", "sm")
def iswpd2(xw, wt, tree_or_L=None, sm: int | None = None):
    """Inverse 2-D SWPD (SWT.jl:1097-1199)."""
    w = _wt(wt)
    n, m = xw.shape[-2:]
    k = xw.shape[-3]
    Lmax = 0
    while ((4 ** (Lmax + 1)) - 1) // 3 < k:
        Lmax += 1
    if tree_or_L is None or isinstance(tree_or_L, (int, np.integer)):
        L = Lmax if tree_or_L is None else int(tree_or_L)
        tree = maketree2d(1 << Lmax, 1 << Lmax, L, "full") \
            if maxtransformlevels(min(n, m)) != Lmax else maketree2d(n, m, L, "full")
    else:
        tree = np.asarray(tree_or_L, dtype=bool)
    masks = _quad_tree_split_levels(tree)
    depth = len(masks)
    sd = None if sm is None else main2depthshift(sm, Lmax)
    blocks = _swpd_level_blocks(xw, Lmax, quad=True)
    cur = blocks[depth]
    for d in range(depth - 1, -1, -1):
        merged = _merge_level2(cur, d, w, sd)
        keep = jnp.asarray(masks[d])[..., None, None]
        cur = jnp.where(keep, merged, blocks[d])
    return cur[..., 0, :, :]


def _quad_tree_split_levels(tree):
    """Per-level split masks over the depth-d quad node axis (natural order)."""
    tree = np.asarray(tree, dtype=bool)
    depth = tree_depth(tree, "quad")
    masks = []
    for d in range(depth):
        cnt = 4 ** d
        first = ((1 << (2 * d)) - 1) // 3 + 1
        mask = np.zeros(cnt, dtype=bool)
        for b in range(cnt):
            idx = first + b
            if idx - 1 < len(tree) and tree[idx - 1]:
                mask[b] = True
        masks.append(mask)
    return masks
