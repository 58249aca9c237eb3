"""Autocorrelation (Saito-Beylkin) redundant wavelet transforms.

Re-design of /root/reference/src/mod/ACWT.jl: ``acdwt``/``acwpt``/``acwpd``
share the SWT layouts (acdwt (..., L+1, n) / 2-D (..., 3L+1, n, m); acwpt
(..., 2^L, n) / (..., 4^L, n, m); acwpd all-node tables), built on the
dilated+phase-shifted autocorrelation step (acwt_one_level.jl:101-128).

Inverses need no filter: one merge is ``(w1 + w2)/sqrt(2)``
(acwt_one_level.jl:217-224), so reconstruction is a pure elementwise
reduction over the tree — essentially free on TPU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .._jit import apijit
from ..filters import Wavelet, wavelet as _wavelet
from ..trees import maketree, maketree2d, maxtransformlevels, tree_depth
from ..kernels import conv
from .dwt import _tree_split_levels
from .swt import _swpd_level_blocks, _quad_tree_split_levels


def _wt(wt) -> Wavelet:
    return _wavelet(wt) if isinstance(wt, str) else wt


def _levels(n, L):
    L0 = maxtransformlevels(n)
    if L is None:
        return L0
    if not 1 <= L <= L0:
        raise ValueError(f"L must be in 1..{L0}, got {L}")
    return L


# ---------------------------------------------------------------------------
# ACDWT
# ---------------------------------------------------------------------------

@apijit("wt", "L")
def acdwt(x, wt, L: int | None = None):
    """1-D autocorrelation DWT -> (..., L+1, n) (ACWT.jl:109-133)."""
    w = _wt(wt)
    L = _levels(x.shape[-1], L)
    from .swt import _pallas_stack_ok
    if x.ndim >= 2 and _pallas_stack_ok(x):
        from ..kernels.pallas_swt import acdwt_pallas
        n = x.shape[-1]
        B = int(np.prod(x.shape[:-1]))
        return acdwt_pallas(x.reshape(B, n), w, L).reshape(
            *x.shape[:-1], L + 1, n)
    cur = x
    details = []
    for d in range(L):
        cur, w2 = conv.acdwt_step(cur, d, w.ac_lo, w.ac_hi)
        details.append(w2)
    return jnp.stack([cur] + details[::-1], axis=-2)


@apijit("wt", "L")
def acdwt2(x, wt, L: int | None = None):
    """2-D autocorrelation DWT -> (..., 3L+1, n, m) (ACWT.jl:135-157)."""
    w = _wt(wt)
    L = _levels(min(x.shape[-2:]), L)
    cur = x
    slots = {}
    for d in range(L):
        w1, w2, w3, w4 = conv.acdwt_step2(cur, d, w.ac_lo, w.ac_hi)
        base = 3 * (L - d)
        slots[base - 2], slots[base - 1], slots[base] = w2, w3, w4
        cur = w1
    slots[0] = cur
    return jnp.stack([slots[j] for j in range(3 * L + 1)], axis=-3)


@apijit()
def iacdwt(xw):
    """Inverse 1-D ACDWT — filterless pairwise averaging (ACWT.jl:244-318)."""
    L = xw.shape[-2] - 1
    x = xw[..., 0, :]
    for d in range(L - 1, -1, -1):
        x = conv.iacdwt_step(x, xw[..., L - d, :])
    return x


@apijit()
def iacdwt2(xw):
    """Inverse 2-D ACDWT (ACWT.jl 2-D branch)."""
    L = (xw.shape[-3] - 1) // 3
    x = xw[..., 0, :, :]
    for d in range(L - 1, -1, -1):
        base = 3 * (L - d)
        x = conv.iacdwt_step2(x, xw[..., base - 2, :, :],
                              xw[..., base - 1, :, :], xw[..., base, :, :])
    return x


# ---------------------------------------------------------------------------
# ACWPT / ACWPD
# ---------------------------------------------------------------------------

def _acwpt_levels(x, w, L):
    cur = x[..., None, :]
    out = [cur]
    for d in range(L):
        w1, w2 = conv.acdwt_step(cur, d, w.ac_lo, w.ac_hi)
        cur = jnp.stack([w1, w2], axis=-2).reshape(
            *cur.shape[:-2], 2 * cur.shape[-2], cur.shape[-1])
        out.append(cur)
    return out


def _acwpt_levels2(x, w, L):
    cur = x[..., None, :, :]
    out = [cur]
    for d in range(L):
        w1, w2, w3, w4 = conv.acdwt_step2(cur, d, w.ac_lo, w.ac_hi)
        cur = jnp.stack([w1, w2, w3, w4], axis=-3).reshape(
            *cur.shape[:-3], 4 * cur.shape[-3], *cur.shape[-2:])
        out.append(cur)
    return out


@apijit("wt", "L")
def acwpt(x, wt, L: int | None = None):
    """1-D autocorrelation WPT -> (..., 2^L, n) (ACWT.jl:427-472)."""
    w = _wt(wt)
    return _acwpt_levels(x, w, _levels(x.shape[-1], L))[-1]


@apijit("wt", "L")
def acwpt2(x, wt, L: int | None = None):
    """2-D autocorrelation WPT -> (..., 4^L, n, m) (ACWT.jl:474-533)."""
    w = _wt(wt)
    return _acwpt_levels2(x, w, _levels(min(x.shape[-2:]), L))[-1]


def _ac_merge_level(cur):
    pairs = cur.reshape(*cur.shape[:-2], cur.shape[-2] // 2, 2, cur.shape[-1])
    return conv.iacdwt_step(pairs[..., 0, :], pairs[..., 1, :])


def _ac_merge_level2(cur):
    quads = cur.reshape(*cur.shape[:-3], cur.shape[-3] // 4, 4, *cur.shape[-2:])
    return conv.iacdwt_step2(*(quads[..., i, :, :] for i in range(4)))


@apijit()
def iacwpt(xw):
    """Inverse 1-D ACWPT (ACWT.jl:537-593)."""
    L = int(np.log2(xw.shape[-2]))
    cur = xw
    for _ in range(L):
        cur = _ac_merge_level(cur)
    return cur[..., 0, :]


@apijit()
def iacwpt2(xw):
    """Inverse 2-D ACWPT (ACWT.jl:595-641)."""
    L = int(round(np.log(xw.shape[-3]) / np.log(4)))
    cur = xw
    for _ in range(L):
        cur = _ac_merge_level2(cur)
    return cur[..., 0, :, :]


@apijit("wt", "L")
def acwpd(x, wt, L: int | None = None):
    """1-D autocorrelation WPD (all nodes) -> (..., 2^(L+1)-1, n)
    (ACWT.jl:733-775)."""
    w = _wt(wt)
    L = _levels(x.shape[-1], L)
    return jnp.concatenate(_acwpt_levels(x, w, L), axis=-2)


@apijit("wt", "L")
def acwpd2(x, wt, L: int | None = None):
    """2-D autocorrelation WPD -> (..., (4^(L+1)-1)/3, n, m)
    (ACWT.jl:777-806)."""
    w = _wt(wt)
    L = _levels(min(x.shape[-2:]), L)
    return jnp.concatenate(_acwpt_levels2(x, w, L), axis=-3)


@apijit("tree_or_L")
def iacwpd(xw, tree_or_L=None):
    """Inverse 1-D ACWPD by level or tree (ACWT.jl:845-931)."""
    n = xw.shape[-1]
    Lmax = int(np.log2(xw.shape[-2] + 1)) - 1
    if tree_or_L is None or isinstance(tree_or_L, (int, np.integer)):
        L = Lmax if tree_or_L is None else int(tree_or_L)
        tree = maketree(1 << Lmax, L, "full")
    else:
        tree = np.asarray(tree_or_L, dtype=bool)
    masks = _tree_split_levels(tree, n)
    depth = len(masks)
    blocks = _swpd_level_blocks(xw, Lmax)
    cur = blocks[depth]
    for d in range(depth - 1, -1, -1):
        merged = _ac_merge_level(cur)
        keep = jnp.asarray(masks[d])[..., None]
        cur = jnp.where(keep, merged, blocks[d])
    return cur[..., 0, :]


@apijit("tree_or_L")
def iacwpd2(xw, tree_or_L=None):
    """Inverse 2-D ACWPD (ACWT.jl:933-990)."""
    k = xw.shape[-3]
    Lmax = 0
    while ((4 ** (Lmax + 1)) - 1) // 3 < k:
        Lmax += 1
    if tree_or_L is None or isinstance(tree_or_L, (int, np.integer)):
        L = Lmax if tree_or_L is None else int(tree_or_L)
        tree = maketree2d(1 << Lmax, 1 << Lmax, L, "full")
    else:
        tree = np.asarray(tree_or_L, dtype=bool)
    masks = _quad_tree_split_levels(tree)
    depth = len(masks)
    blocks = _swpd_level_blocks(xw, Lmax, quad=True)
    cur = blocks[depth]
    for d in range(depth - 1, -1, -1):
        merged = _ac_merge_level2(cur)
        keep = jnp.asarray(masks[d])[..., None, None]
        cur = jnp.where(keep, merged, blocks[d])
    return cur[..., 0, :, :]
