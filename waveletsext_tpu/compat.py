"""Reference-name compatibility surface.

The reference exposes per-signal functions plus ``*all`` batch wrappers that
serially loop ``eachslice`` (/root/reference/src/mod/dwt/dwt_all.jl:39-54 and
the swt/acwt analogs).  In this framework *every* transform is natively
batched over leading axes, so each ``*all`` name simply aliases the batched
core — one jitted program instead of a serial loop.  Layout note: the
reference stacks signals on the LAST axis (Julia column-major); here the
batch axis is FIRST (row-major TPU layout).

This module exists so a WaveletsExt.jl user can find every reference export
under its familiar name.
"""

from .transforms.dwt import (dwt, idwt, dwt2, idwt2, wpt, iwpt, wpt2, iwpt2,
                             wpd, iwpd, wpd2, iwpd2)
from .transforms.swt import (sdwt, sdwt2, isdwt, isdwt2, swpt, swpt2, iswpt,
                             iswpt2, swpd, swpd2, iswpd, iswpd2)
from .transforms.acwt import (acdwt, acdwt2, iacdwt, iacdwt2, acwpt, acwpt2,
                              iacwpt, iacwpt2, acwpd, acwpd2, iacwpd, iacwpd2)

# --- batch "all" aliases (batched natively; dwt_all.jl:39-54 etc.) ---------
dwtall, idwtall = dwt, idwt
wptall, iwptall = wpt, iwpt
wpdall, iwpdall = wpd, iwpd
sdwtall, isdwtall = sdwt, isdwt
swptall, iswptall = swpt, iswpt
swpdall, iswpdall = swpd, iswpd
acdwtall, iacdwtall = acdwt, iacdwt
acwptall, iacwptall = acwpt, iacwpt
acwpdall, iacwpdall = acwpd, iacwpd

# 2-D variants
dwt2all, idwt2all = dwt2, idwt2
wpt2all, iwpt2all = wpt2, iwpt2
wpd2all, iwpd2all = wpd2, iwpd2

# --- one-level step kernels under reference names and argument order -------
# Reference signatures take (g, h) = WT.makereverseqmfpair(wt, true) filters;
# this framework's pinned (lo, hi) are those reversed (filters.py
# makereverseqmfpair).
import numpy as _np

from .kernels import conv as _conv
from .filters import makereverseqmfpair  # noqa: F401  (re-exported)


def dwt_step(v, h, g):
    """One decimated analysis step, reference signature
    (dwt_one_level.jl:34-48): returns ``(w1, w2)``."""
    return _conv.analysis_step(v, _np.asarray(g)[::-1], _np.asarray(h)[::-1])


def idwt_step(w1, w2, h, g):
    """One decimated synthesis step (dwt_one_level.jl:133-160)."""
    return _conv.synthesis_step(w1, w2, _np.asarray(g)[::-1],
                                _np.asarray(h)[::-1])


def sdwt_step(v, d, h, g):
    """One a-trous analysis step at depth ``d`` (swt_one_level.jl:40-66)."""
    return _conv.sdwt_step(v, d, _np.asarray(g)[::-1], _np.asarray(h)[::-1])


def isdwt_step(w1, w2, d, h, g, sv=None, sw=None):
    """Inverse a-trous step: average-based when no shifts are given,
    shift-based otherwise (swt_one_level.jl:129-318)."""
    lo, hi = _np.asarray(g)[::-1], _np.asarray(h)[::-1]
    if sv is None:
        return _conv.isdwt_step_average(w1, w2, d, lo, hi)
    return _conv.isdwt_step_shift(w1.shape[-1], w1, w2, d, sv, sw, lo, hi)


# --- SIWT long-form reference type/function names ---------------------------
from .transforms.siwt import (SiwtNode as ShiftInvariantWaveletTransformNode,
                              SiwtObject as ShiftInvariantWaveletTransformObject,
                              bestbasistree as siwt_bestbasistree,
                              siwpd, isiwpd)


# --- Julia-style function forms of the LDB estimator API --------------------
# (LDB.jl exports fit!, fitdec!, transform, fit_transform, inverse_transform,
# change_nfeatures as plain functions over the mutable struct)

def fit(f, X, y):
    """LDB.jl ``fit!(f, X, y)``."""
    return f.fit(X, y)


def fitdec(f, Xw, y):
    """LDB.jl ``fitdec!(f, Xw, y)``."""
    return f.fitdec(Xw, y)


def transform(f, X):
    """LDB.jl ``transform(f, X)``."""
    return f.transform(X)


def fit_transform(f, X, y):
    """LDB.jl ``fit_transform(f, X, y)``."""
    return f.fit_transform(X, y)


def inverse_transform(f, Xc):
    """LDB.jl ``inverse_transform(f, Xc)``."""
    return f.inverse_transform(Xc)


def change_nfeatures(f, x, n_features):
    """LDB.jl ``change_nfeatures(f, x, n)``."""
    return f.change_nfeatures(x, n_features)


__all__ = [n for n in dir() if not n.startswith("_")]
