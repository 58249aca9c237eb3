"""BCR (Beylkin-Coifman-Rokhlin) fast matrix-vector multiplication.

Re-implements /root/reference/src/mod/wavemult/*: the nonstandard form
(``ns_dwt``/``ns_idwt`` telescoped 2n layout via ``ndyad`` index dyads,
transforms.jl:52-142 + utils.jl:120-155; ``stretchmatrix`` re-indexing
utils.jl:98-114) and the standard form (``sft``/``isft`` separable row+column
1-D DWTs, transforms.jl:171-228), with sparsification drivers
(mat2sparse.jl:38-100) and the ``nonstd_wavemult``/``std_wavemult`` products
(wavemult.jl:58-76,134-152).

Sparse matrices are ``jax.experimental.sparse`` BCOO (TPU-lowered
gather/scatter SpMV); a matrix is built once and reused across many
right-hand sides — the products are jitted and batched over the trailing
batch axes of ``x``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.experimental import sparse as jsparse

from .trees import maxtransformlevels
from .transforms.dwt import dwt, idwt, dwt2
from .kernels import conv
from .filters import wavelet as _wavelet


def _wt(wt):
    return _wavelet(wt) if isinstance(wt, str) else wt


def dyadlength(n: int) -> int:
    """Least power-of-two exponent >= log2(n) (utils.jl:44-51)."""
    J = int(np.ceil(np.log2(n)))
    if (1 << J) != n:
        import warnings
        warnings.warn("Dyadlength n != 2^J")
    return J


def ndyad(L: int, Lmax: int, female: bool) -> slice:
    """0-based slice of the level-L dyad in the nonstandard 2n layout
    (utils.jl:146-155)."""
    if not 1 <= L <= Lmax:
        raise ValueError(f"L={L} out of range [1, {Lmax}]")
    k = Lmax - L
    if female:
        return slice((1 << (k + 1)) + (1 << k), 1 << (k + 2))
    return slice(1 << (k + 1), (1 << (k + 1)) + (1 << k))


def stretchmatrix(i, j, n: int, L: int):
    """Re-index nonzeros into the telescoped 2n x 2n nonstandard layout
    (utils.jl:98-114).  ``i``/``j`` are 0-based index arrays."""
    Lmax = maxtransformlevels(n)
    if not 1 <= L <= Lmax:
        raise ValueError(f"L={L} out of range [1, {Lmax}]")
    ie = np.asarray(i).copy() + 1  # work 1-based like the reference
    je = np.asarray(j).copy() + 1
    for l in range(L):
        k = Lmax - l - 1
        cond = (((ie > (1 << k)) | (je > (1 << k)))
                & ((ie <= (1 << (k + 1))) & (je <= (1 << (k + 1)))))
        ie[cond] += 1 << (k + 1)
        je[cond] += 1 << (k + 1)
    return ie - 1, je - 1


# ---------------------------------------------------------------------------
# Nonstandard vector transform
# ---------------------------------------------------------------------------

def ns_dwt(x, wt, L: int | None = None):
    """Nonstandard forward transform: (..., n) -> (..., 2n)
    (transforms.jl:52-70)."""
    w = _wt(wt)
    n = x.shape[-1]
    Lmax = maxtransformlevels(n)
    L = Lmax if L is None else L
    if not 1 <= L <= Lmax:
        raise ValueError(f"L={L} out of range [1, {Lmax}]")
    nxw = jnp.zeros(x.shape[:-1] + (2 * n,), x.dtype)
    v = x
    for l in range(1, L + 1):
        w1, w2 = conv.analysis_step(v, w.lo, w.hi)
        nxw = nxw.at[..., ndyad(l, Lmax, False)].set(w1)
        nxw = nxw.at[..., ndyad(l, Lmax, True)].set(w2)
        v = w1
    nxw = nxw.at[..., : 1 << (Lmax - L)].set(v)
    return nxw


def ns_idwt(nxw, wt, L: int | None = None):
    """Nonstandard inverse transform: (..., 2n) -> (..., n)
    (transforms.jl:124-142).  Note: lossy by design (not the inverse of
    ns_dwt on arbitrary input)."""
    w = _wt(wt)
    n = nxw.shape[-1] // 2
    Lmax = maxtransformlevels(2 * n) - 1
    L = Lmax if L is None else L
    if not 1 <= L <= Lmax:
        raise ValueError(f"L={L} out of range [1, {Lmax}]")
    head = nxw[..., : 1 << (Lmax - L)]
    for l in range(L, 0, -1):
        w1 = nxw[..., ndyad(l, Lmax, False)] + head
        w2 = nxw[..., ndyad(l, Lmax, True)]
        head = conv.synthesis_step(w1, w2, w.lo, w.hi)
    return head


# ---------------------------------------------------------------------------
# Standard form transforms
# ---------------------------------------------------------------------------

def sft(M, wt, L: int | None = None):
    """Standard form: 1-D dwt of every column, then of every row
    (transforms.jl:171-185).  M: (..., n, m)."""
    L = maxtransformlevels(min(M.shape[-2:])) if L is None else L
    Mw = jnp.swapaxes(dwt(jnp.swapaxes(M, -1, -2), wt, L), -1, -2)
    return dwt(Mw, wt, L)


def isft(Mw, wt, L: int | None = None):
    """(transforms.jl:214-228)."""
    L = maxtransformlevels(min(Mw.shape[-2:])) if L is None else L
    M = idwt(Mw, wt, L)
    return jnp.swapaxes(idwt(jnp.swapaxes(M, -1, -2), wt, L), -1, -2)


# ---------------------------------------------------------------------------
# Sparse forms
# ---------------------------------------------------------------------------

def mat2sparseform_nonstd(M, wt, L: int | None = None, eps: float = 1e-4):
    """2-D dwt -> threshold at eps*max column norm -> stretch into the
    2n x 2n nonstandard layout -> BCOO (mat2sparse.jl:38-55)."""
    M = jnp.asarray(M)
    n = M.shape[0]
    if M.shape != (n, n):
        raise ValueError(f"expected a square matrix, got {M.shape}")
    L = maxtransformlevels(n) if L is None else L
    Mw = np.asarray(dwt2(M, wt, L))
    maxcolnorm = np.linalg.norm(Mw, axis=0).max()
    keep = np.abs(Mw) > eps * maxcolnorm
    i, j = np.nonzero(keep)
    # column-major (Julia findall) ordering for exact parity of duplicates
    order = np.lexsort((i, j))
    i, j = i[order], j[order]
    vals = Mw[i, j]
    ie, je = stretchmatrix(i, j, n, L)
    idx = np.stack([ie, je], axis=1)
    return jsparse.BCOO((jnp.asarray(vals), jnp.asarray(idx)),
                        shape=(2 * n, 2 * n))


def mat2sparseform_std(M, wt, L: int | None = None, eps: float = 1e-4):
    """(mat2sparse.jl:89-100)."""
    M = jnp.asarray(M)
    n = M.shape[0]
    if M.shape != (n, n):
        raise ValueError(f"expected a square matrix, got {M.shape}")
    Mw = np.asarray(sft(M, wt, L))
    maxcolnorm = np.linalg.norm(Mw, axis=0).max()
    nil = np.where(np.abs(Mw) > eps * maxcolnorm, Mw, 0.0)
    return jsparse.BCOO.fromdense(jnp.asarray(nil))


# ---------------------------------------------------------------------------
# Dense-masked forms (TPU fast path)
#
# BCOO SpMV lowers to gather/scatter on TPU — the exact op class measured
# pathological here (CLAUDE.md round-2) — while a zeros-kept dense form of
# the SAME thresholded operator rides the MXU.  The reference's headline for
# this module is *speed* (O(n) sparse vs O(n^2) dense, wavemult.jl:6-11);
# measured on chip through n = 16384 (benchmarks/probe_wavemult.py,
# BENCHMARKS.md r5) that asymptotic story NEVER materializes on TPU: the
# direct dense product y = x @ M^T wins at EVERY size (11x over BCOO at
# n = 16k, 128 RHS) and the gap widens with n — BCOO's measured growth is
# >= quadratic once its gather count saturates the scalar unit.  Among the
# operator forms, the dense-masked matmul beats BCOO 2-13x everywhere, so
# ``form='auto'`` picks dense on TPU and sparse elsewhere.  Use these forms
# for reference parity / eps-compressed operators, not as a fast path past
# the direct product.
# ---------------------------------------------------------------------------

def mat2denseform_nonstd(M, wt, L: int | None = None, eps: float = 1e-4):
    """Zeros-kept dense (2n, 2n) nonstandard form: same thresholding and
    stretch re-indexing as :func:`mat2sparseform_nonstd`, materialized dense
    for the MXU product path."""
    M = jnp.asarray(M)
    n = M.shape[0]
    if M.shape != (n, n):
        raise ValueError(f"expected a square matrix, got {M.shape}")
    L = maxtransformlevels(n) if L is None else L
    Mw = np.asarray(dwt2(M, wt, L))
    maxcolnorm = np.linalg.norm(Mw, axis=0).max()
    keep = np.abs(Mw) > eps * maxcolnorm
    i, j = np.nonzero(keep)
    vals = Mw[i, j]
    ie, je = stretchmatrix(i, j, n, L)
    D = np.zeros((2 * n, 2 * n), dtype=Mw.dtype)
    D[ie, je] = vals
    return jnp.asarray(D)


def mat2denseform_std(M, wt, L: int | None = None, eps: float = 1e-4):
    """Zeros-kept dense standard form (the thresholded ``sft`` matrix)."""
    M = jnp.asarray(M)
    n = M.shape[0]
    if M.shape != (n, n):
        raise ValueError(f"expected a square matrix, got {M.shape}")
    Mw = np.asarray(sft(M, wt, L))
    maxcolnorm = np.linalg.norm(Mw, axis=0).max()
    return jnp.asarray(np.where(np.abs(Mw) > eps * maxcolnorm, Mw, 0.0))


def _tpu_backend() -> bool:
    from .transforms.dwt import _tpu_backend as _tb
    return _tb()


def _apply_form(op, nx, is_sparse: bool):
    """Batched operator application: ``ny[..., i] = sum_j op[i,j] nx[..., j]``
    for any leading batch shape (the reference's product is single-vector,
    wavemult.jl:74; batching amortizes the operator build across RHS)."""
    lead = nx.shape[:-1]
    v = nx.reshape(-1, nx.shape[-1]).T          # (2n|n, B)
    if is_sparse:
        ny = op @ v
    else:
        ny = jnp.matmul(jnp.asarray(op, v.dtype), v,
                        precision=conv.MATMUL_PRECISION)
    return ny.T.reshape(*lead, op.shape[0])


def _resolve_op(M, n: int, wt, L, eps, form, builder_sparse, builder_dense,
                op_rows: int):
    """Accepts a prebuilt BCOO, a prebuilt dense *form* (``form='prebuilt'``
    only — a raw matrix whose shape coincides with the form's is NOT
    auto-detected, so a mistakenly passed un-transformed (2n, 2n) matrix
    errors instead of silently producing garbage), or a raw (n, n) matrix
    to build per ``form`` in {'auto', 'sparse', 'dense'}."""
    if isinstance(M, jsparse.BCOO):
        return M, True
    M = jnp.asarray(M)
    if form == "prebuilt":
        if M.shape[0] != op_rows:
            raise ValueError(
                f"form='prebuilt' expects a ({op_rows}, {op_rows}) dense "
                f"operator form, got {M.shape}")
        return M, False
    if M.shape[0] != n:
        raise ValueError(
            f"raw matrix must be ({n}, {n}) for length-{n} signals, got "
            f"{M.shape}; pass form='prebuilt' for a prebuilt dense form")
    if form == "auto":
        form = "dense" if _tpu_backend() else "sparse"
    if form == "sparse":
        return builder_sparse(M, wt, L, eps), True
    return builder_dense(M, wt, L, eps), False


# ---------------------------------------------------------------------------
# Fast products
# ---------------------------------------------------------------------------

def nonstd_wavemult(M, x, wt, L: int | None = None, eps: float = 1e-4,
                    form: str = "auto"):
    """y ~= M @ x via the nonstandard form (wavemult.jl:58-76), batched over
    any leading axes of ``x``.

    ``M`` may be a raw (n, n) matrix (the operator form is built here per
    ``form``: 'sparse' BCOO, 'dense' zeros-kept, or 'auto' = dense on TPU /
    sparse elsewhere — see the dense-form rationale above), a prebuilt BCOO
    from :func:`mat2sparseform_nonstd`, or a prebuilt (2n, 2n) dense form
    from :func:`mat2denseform_nonstd` (requires ``form='prebuilt'``)."""
    n = x.shape[-1]
    L = maxtransformlevels(n) if L is None else L
    op, is_sparse = _resolve_op(M, n, wt, L, eps, form,
                                mat2sparseform_nonstd, mat2denseform_nonstd,
                                2 * n)
    nx = ns_dwt(x, wt, L)
    ny = _apply_form(op, nx, is_sparse)
    return ns_idwt(ny, wt, L)


def std_wavemult(M, x, wt, L: int | None = None, eps: float = 1e-4,
                 form: str = "auto"):
    """y ~= M @ x via the standard form (wavemult.jl:134-152), batched over
    any leading axes of ``x``.  ``M`` as in :func:`nonstd_wavemult` (the
    standard form is (n, n); pass ``form='prebuilt'`` for a prebuilt dense
    form from :func:`mat2denseform_std`)."""
    n = x.shape[-1]
    L = maxtransformlevels(n) if L is None else L
    op, is_sparse = _resolve_op(M, n, wt, L, eps, form,
                                mat2sparseform_std, mat2denseform_std, n)
    nx = dwt(x, wt, L)
    ny = _apply_form(op, nx, is_sparse)
    return idwt(ny, wt, L)
