"""Fused SIWT deep-zone pipeline kernel for TPU.

The SIWT best-basis pipeline (transforms/siwt_dense.py) spends most of its
time and nearly all of its HBM traffic in the *deep zone* — the depths whose
node length nd has dropped below the 128-lane tile, where every per-depth
value tensor is ~constant-sized (B * P * n elements) and the XLA hybrid
materializes each of them once in the decompose, reads them for costs, and
reads them again in the reconstruct (~3x the zone's footprint, plus layout
transposes).  This kernel runs the WHOLE deep zone — decompose, Shannon
costs, the 3-way best-basis sweep, optional thresholding, and the selective
reconstruct — in ONE VMEM trip per batch tile.  HBM traffic becomes one read
of the transition tensor and one write of the reconstruction (plus the tiny
root-cost output): the deep per-depth values never exist in HBM at all.

Layout: everything stays in the *flat segment* form.  A depth-d value tensor
is (TB*K0 sublanes, nd0 lanes) per packed-shift slot, where K0 = 2^d0 nodes
at the transition depth d0 and each row's lanes hold the 2^(d-d0) descendant
node segments of that row's node, concatenated in natural order (exactly the
packed wpt layout per transition node).  Every level step is then a
right-multiplication by a block-diagonal (nd0, nd0) operator —
kron(I_segments, one_level_operator) — so the kernel is a short sequence of
(TB*K0, nd0) @ (nd0, nd0) MXU matmuls with NO lane splits, strided slices or
in-kernel transposes (the Mosaic constraints documented in pallas_wpt.py).
The circular +1 input shift of the shifted children and the -1 output shift
of the shifted synthesis are folded into the operators as block-local
permutation factors; per-segment cost sums, child pair-sums and
decision-mask broadcasts are tiny 0/1 matmuls (Seg/Pair/Exp below).

Semantics mirror siwt_dense._deep_decompose/_deep_sweep/_deep_reconstruct
(SIWT.jl:93-136 recursion, siwt_bestbasis.jl:50-103 strict-< 3-way min, the
corrected inverse-shift convention of transforms/siwt.py); parity is pinned
by tests/test_siwt.py against the XLA hybrid path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..filters import wavelet as _wavelet
from . import operators as _ops


# ---------------------------------------------------------------------------
# Host-side operator builders (all static, cached)
# ---------------------------------------------------------------------------

def _roll_mat(nd: int, shift: int) -> np.ndarray:
    """Right-multiplier R with (v @ R)[j] = v[(j - shift) % nd]
    (i.e. jnp.roll(v, shift) along the lane segment)."""
    R = np.zeros((nd, nd))
    j = np.arange(nd)
    R[(j - shift) % nd, j] = 1.0
    return R


@functools.lru_cache(maxsize=None)
def _deep_ops(tkey, nd0: int, D: int):
    """Stacked (D, nd0, nd0) f32 operator banks for the deep zone:
    Wa (unshifted analysis), Was (+1-pre-rolled analysis), Ws (synthesis),
    Wss (synthesis then -1 roll) — each level ℓ acts on blocks of length
    nd0 >> ℓ, block-diagonally over the 2^ℓ segments."""
    Wa = np.zeros((D, nd0, nd0))
    Was = np.zeros((D, nd0, nd0))
    Ws = np.zeros((D, nd0, nd0))
    Wss = np.zeros((D, nd0, nd0))
    for l in range(D):
        nd = nd0 >> l
        J = 1 << l
        A = _ops.analysis_operator(tkey, nd)
        S = _ops.synthesis_operator(tkey, nd)
        eyeJ = np.eye(J)
        Wa[l] = np.kron(eyeJ, A)
        Was[l] = np.kron(eyeJ, _roll_mat(nd, 1) @ A)
        Ws[l] = np.kron(eyeJ, S)
        Wss[l] = np.kron(eyeJ, S @ _roll_mat(nd, -1))
    f = np.float32
    return Wa.astype(f), Was.astype(f), Ws.astype(f), Wss.astype(f)


@functools.lru_cache(maxsize=None)
def _seg_mat(nd0: int, l: int) -> np.ndarray:
    """(nd0, 2^l) 0/1 segment-sum matrix: lane i belongs to segment
    i // (nd0 >> l)."""
    J = 1 << l
    nd = nd0 >> l
    M = np.zeros((nd0, J), np.float32)
    M[np.arange(nd0), np.arange(nd0) // nd] = 1.0
    return M


@functools.lru_cache(maxsize=None)
def _pair_mat(l: int) -> np.ndarray:
    """(2^(l+1), 2^l) 0/1 child-pair-sum matrix: children 2j, 2j+1 -> j."""
    J = 1 << l
    M = np.zeros((2 * J, J), np.float32)
    M[np.arange(2 * J), np.arange(2 * J) // 2] = 1.0
    return M


def _pick_tb(B: int, K0: int, nd0: int, D: int, Pmax: int) -> int:
    """Largest power-of-two tile (<= 32) dividing B whose VMEM footprint —
    ~2 copies of all (D+1) per-depth value lists — stays under ~48 MB."""
    budget = 48 * 2 ** 20
    per_b = (D + 1) * Pmax * 2 * K0 * nd0 * 4
    tb = 32
    while tb > 1 and (B % tb or tb * per_b > budget):
        tb //= 2
    return tb


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _make_deep_kernel(L: int, d0: int, budget: int, K0: int, nd0: int,
                      TB: int, has_t: bool, soft: bool, precision):
    from ..transforms.siwt_dense import packed_shifts
    shifts, kid_pos, _, _ = packed_shifts(L, budget)
    D = L - d0
    P_of = [len(shifts[d0 + l]) for l in range(D + 1)]

    def mm(a, b, prec=precision):
        return jax.lax.dot(a, b, precision=prec)

    def kernel(*refs):
        # inputs: w, nrm, t, wa, was, ws, wss, seg[0..D], pair[0..D-1],
        # exp[0..D-1]; outputs: r, c
        (w_ref, nrm_ref, t_ref, wa_ref, was_ref, ws_ref, wss_ref) = refs[:7]
        seg_refs = refs[7:7 + D + 1]
        pair_refs = refs[8 + D:8 + 2 * D]
        exp_refs = refs[8 + 2 * D:8 + 3 * D]
        r_ref, c_ref = refs[8 + 3 * D:]
        f32 = jnp.float32
        P0 = P_of[0]
        vals = [None] * (D + 1)
        vals[0] = [w_ref[:, :, p, :].reshape(TB * K0, nd0).astype(f32)
                   for p in range(P0)]
        for l in range(D):
            kp = kid_pos[d0 + l]
            Wa = wa_ref[l].astype(f32)
            Was = was_ref[l].astype(f32)
            parents = [vals[l][i] for i in kp]
            u = [mm(pv, Wa) for pv in parents]
            s = [mm(pv, Was) for pv in parents]
            vals[l + 1] = u + s

        # Shannon costs per segment.  The Seg/Pair matmuls follow the global
        # precision: MXU accumulation is f32 at every precision, so DEFAULT
        # costs only the bf16 input rounding of g (rel ~4e-3) — the same
        # relaxation the rest of the pipeline's dots already opted into —
        # while HIGHEST keeps the 6-pass exact path.
        inv_n = (1.0 / jnp.broadcast_to(nrm_ref[:, :1][:, None, :],
                                        (TB, K0, 1))
                 .reshape(TB * K0, 1).astype(f32))
        costs = []
        for l in range(D + 1):
            Seg = seg_refs[l][:]
            cl = []
            for v in vals[l]:
                s2 = (v * inv_n) ** 2
                g = jnp.where(s2 == 0, jnp.zeros_like(s2), s2 * jnp.log(s2))
                cl.append(-mm(g, Seg))
            costs.append(cl)

        # bottom-up 3-way strict-< min (siwt_bestbasis.jl:50-103)
        dec = [None] * (D + 1)
        cstar = costs[D]
        dec[D] = [jnp.zeros_like(c) for c in cstar]
        for l in range(D - 1, -1, -1):
            kp = kid_pos[d0 + l]
            Kp = len(kp)
            Pm = pair_refs[l][:]
            ps = [mm(cv, Pm) for cv in cstar]
            ndec, ncst = [], []
            for i in range(P_of[l]):
                c = costs[l][i]
                if i in kp:
                    q = kp.index(i)
                    u = ps[q]
                    sv = ps[Kp + q]
                    node_min = (c < u) & (c < sv)
                    u_min = (~node_min) & (u < sv)
                    ndec.append(jnp.where(node_min, 0.0,
                                          jnp.where(u_min, 1.0, 2.0)))
                    ncst.append(jnp.where(node_min, c,
                                          jnp.where(u_min, u, sv)))
                else:
                    ndec.append(jnp.zeros_like(c))
                    ncst.append(c)
            dec[l] = ndec
            cstar = ncst

        if has_t:
            t_full = (jnp.broadcast_to(t_ref[:, :1][:, None, :],
                                       (TB, K0, 1))
                      .reshape(TB * K0, 1).astype(f32))
            if soft:
                def thr(v):
                    return (jnp.sign(v)
                            * jnp.maximum(jnp.abs(v) - t_full, 0.0))
            else:
                def thr(v):
                    return jnp.where(jnp.abs(v) > t_full, v,
                                     jnp.zeros_like(v))
        else:
            def thr(v):
                return v

        # selective reconstruct (keep / unshifted kids / shifted kids)
        R = [thr(v) for v in vals[D]]
        for l in range(D - 1, -1, -1):
            kp = kid_pos[d0 + l]
            Kp = len(kp)
            Ws = ws_ref[l].astype(f32)
            Wss = wss_ref[l].astype(f32)
            Exp = exp_refs[l][:]
            nR = []
            for i in range(P_of[l]):
                keep = thr(vals[l][i])
                if i in kp:
                    q = kp.index(i)
                    yu = mm(R[q], Ws)
                    ys = mm(R[Kp + q], Wss)
                    # one mask expansion: dec values {0,1,2} are exact in
                    # bf16, so a single DEFAULT-precision Exp matmul
                    # broadcasts the decision across its lane segment
                    dm = mm(dec[l][i], Exp,
                            jax.lax.Precision.DEFAULT)
                    nR.append(jnp.where(dm == 0, keep,
                                        jnp.where(dm == 1, yu, ys)))
                else:
                    nR.append(keep)
            R = nR

        out_dtype = r_ref.dtype
        r_ref[:] = jnp.stack(
            [v.reshape(TB, K0, nd0) for v in R], axis=2).astype(out_dtype)
        c_ref[:] = jnp.stack(
            [c.reshape(TB, K0, 1) for c in cstar], axis=2).astype(out_dtype)

    return kernel


def deep_pipeline_ok(L: int, d0: int, budget: int,
                     nd0: int | None = None) -> bool:
    """Kernel applicability: the per-slot Python unroll must stay small, so
    require the packed shift count to saturate at <= 8 (true for the small
    budgets the SIWT pipeline is built for; large budgets fall back to the
    XLA hybrid), and the four (D, nd0, nd0) operator banks must fit VMEM."""
    from ..transforms.siwt_dense import packed_shifts
    shifts = packed_shifts(L, budget)[0]
    if max(len(s) for s in shifts[d0:]) > 8:
        return False
    if nd0 is not None and 4 * (L - d0) * nd0 * nd0 * 4 > 48 * 2 ** 20:
        return False
    return True


@functools.partial(jax.jit,
                   static_argnames=("wtname", "L", "d0", "budget", "has_t",
                                    "soft", "interpret"),
                   inline=True)
def siwt_deep_pipeline(W0, nrm, t, wtname: str, L: int, d0: int, budget: int,
                       has_t: bool = False, soft: bool = False,
                       interpret: bool = False):
    """Fused deep-zone pipeline.  ``W0``: (B, K0, P0, nd0) packed-layout
    values at the transition depth (K0 = 2^d0 nodes, P0 packed shifts,
    nd0 = n >> d0); ``nrm``: (B,) signal norms; ``t``: (B,) thresholds
    (ignored unless ``has_t``).  Returns ``(R_d0, cstar_d0)`` — the
    best-basis deep reconstruction at depth d0 (same layout as W0) and the
    minimal deep subtree costs (B, K0, P0) seeding the shallow sweep."""
    B, K0, P0, nd0 = W0.shape
    D = L - d0
    w = _wavelet(wtname)
    tkey = _ops.taps_key(w.lo, w.hi)
    Wa, Was, Ws, Wss = (jnp.asarray(a) for a in _deep_ops(tkey, nd0, D))
    from . import conv as _conv
    from ..transforms.siwt_dense import packed_shifts
    precision = _conv.MATMUL_PRECISION
    Pmax = max(len(s) for s in packed_shifts(L, budget)[0])
    TB = _pick_tb(B, K0, nd0, D, Pmax)
    kernel = _make_deep_kernel(L, d0, budget, K0, nd0, TB, has_t, soft,
                               precision)
    nrm_rep = jnp.broadcast_to(
        jnp.asarray(nrm, jnp.float32).reshape(B, 1), (B, 128))
    if has_t:
        ta = jnp.asarray(t, jnp.float32)
        t_col = jnp.broadcast_to(ta.reshape(-1) if ta.ndim else ta, (B,))
    else:
        t_col = jnp.zeros((B,), jnp.float32)
    t_rep = jnp.broadcast_to(t_col.reshape(B, 1), (B, 128))
    segs = [jnp.asarray(_seg_mat(nd0, l)) for l in range(D + 1)]
    pair_m = [jnp.asarray(_pair_mat(l)) for l in range(D)]
    exps = [jnp.asarray(_seg_mat(nd0, l).T) for l in range(D)]
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    R, cst = pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, K0, P0, nd0), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(Wa.shape), full(Was.shape), full(Ws.shape), full(Wss.shape),
        ] + [full(a.shape) for a in segs + pair_m + exps],
        out_specs=[
            pl.BlockSpec((TB, K0, P0, nd0), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, K0, P0, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, K0, P0, nd0), W0.dtype),
            jax.ShapeDtypeStruct((B, K0, P0, 1), W0.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(W0, nrm_rep, t_rep, Wa, Was, Ws, Wss, *segs, *pair_m, *exps)
    return R, cst[..., 0]
