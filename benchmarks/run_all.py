#!/usr/bin/env python
"""Benchmark all five BASELINE.md configs on the current JAX device.

Timing method: chain k applications inside one jitted fori_loop, fetch a
scalar, take the slope between two k values (cancels dispatch + tunnel
overhead; see CLAUDE.md).  Writes benchmarks/all_results.json.

Usage: python benchmarks/run_all.py [--quick] [--profile]
  --profile: capture a jax.profiler trace of the benchmark body into
  benchmarks/traces/ (TensorBoard/XProf format).
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(pathlib.Path(__file__).resolve().parents[1]
                          / ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import waveletsext_tpu as wx
from waveletsext_tpu import denoising as dn
from waveletsext_tpu import ldb as ldb_mod

QUICK = "--quick" in sys.argv
PROFILE = "--profile" in sys.argv
RESULTS = {}


def slope_time(fn, x, klo, khi, reps=3):
    """Seconds per fn application (fn must be shape-preserving).

    ONE compiled program — k is a traced fori_loop bound (same executable
    for both k values; see bench.py).  Escalates khi until the t_hi - t_lo
    gap clears the ~1 ms tunnel timer noise floor (same guard as bench.py;
    a 0.3 ms gap once produced a committed 183 Gsps artifact — above the
    HBM roofline)."""
    MIN_GAP_S = 3e-3

    @jax.jit
    def chain(a, k):
        out = jax.lax.fori_loop(0, k, lambda i, v: fn(v), a)
        return jnp.sum(jax.tree_util.tree_leaves(out)[0])
    float(chain(x, jnp.int32(klo)))  # compile + warm

    def t(k):
        kk = jnp.int32(k)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(x, kk))
            best = min(best, time.perf_counter() - t0)
        return best
    t(klo)
    # NB: (t_hi, khi) must stay a consistent pair — doubling khi after the
    # last measurement would divide t_hi's gap by a khi it never ran at,
    # overstating throughput ~2x (round-3 advisor finding).  Escalation
    # happens at the TOP of each retry, before the measurement it affects.
    for attempt in range(6):
        if attempt:
            khi *= 2
            t(khi)  # warm the new dispatch path
        t_lo, t_hi = t(klo), t(khi)
        if t_hi - t_lo >= MIN_GAP_S:
            break
    return max((t_hi - t_lo) / (khi - klo), 1e-9)


def wall_time(fn, *args, reps=3):
    """One-shot wall timing (for host+device pipelines); returns best secs."""
    fn(*args)  # warm/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best


def record(name, secs, samples, extra=None):
    msps = samples / secs / 1e6
    RESULTS[name] = {"secs": secs, "msamples_per_s": round(msps, 2),
                     **(extra or {})}
    print(f"{name:34s} {secs*1e3:9.2f} ms   {msps:10.1f} Msamples/s",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    dev = str(jax.devices()[0])
    print(f"device: {dev}")

    # -- config 1: 1D DWT + inverse round trip, db4 L=8, 2^12 samples -------
    B = 64 if QUICK else 1024
    n, L = 4096, 8
    x = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
    rt = lambda a: wx.idwt(wx.dwt(a, "db4", L), "db4", L)
    record("c1_dwt_roundtrip", slope_time(rt, x, 4, 32),
           B * n, {"B": B, "n": n})

    # north star: forward WPT only
    fw = lambda a: wx.wpt(a, "db4", L)
    record("wpt_forward", slope_time(fw, x, 8, 128),
           B * n, {"B": B, "n": n})

    # -- config 2: WPT + CW best basis on 1024 signals -----------------------
    B2 = 128 if QUICK else 1024
    n2, L2 = 256, 8
    x2 = jnp.asarray(rng.standard_normal((B2, n2)).astype(np.float32))

    def c2(a):
        xw = wx.wpd(a, "db4", L2)
        costs = wx.tree_costs(xw, wx.JBB())
        return np.asarray(costs)

    def c2_full():
        costs = c2(x2)
        return wx.bestbasis_treeselection(costs, n2)
    secs = wall_time(lambda: c2_full())
    record("c2_wpt_jbb_bestbasis", secs, B2 * n2, {"B": B2, "n": n2})

    # per-signal BB trees across the batch
    def c2b():
        xw = wx.wpd(x2, "db4", L2)
        return wx.bestbasistreeall(xw, wx.BB())
    record("c2b_bestbasistreeall", wall_time(c2b), B2 * n2,
           {"B": B2, "n": n2})

    # fused single-program pipelines: wpd -> costs -> device CW selection ->
    # dynamic extraction (slope-timed on the coefficient output)
    c2_fused = lambda a: wx.bestbasis_pipeline(a, "db4", L2)[1]
    record("c2_jbb_fused", slope_time(c2_fused, x2, 32, 256), B2 * n2,
           {"B": B2, "n": n2})
    c2b_fused = lambda a: wx.bestbasisall_pipeline(a, "db4", L2)[1]
    record("c2b_bball_fused", slope_time(c2b_fused, x2, 16, 128), B2 * n2,
           {"B": B2, "n": n2})

    # LSDB (ASH differential-entropy costs) at the c2 config — exercises the
    # scatter-free one-hot ASH path (basis._ash_differential_entropy)
    c2_lsdb = lambda a: wx.bestbasis_pipeline(a, "db4", L2,
                                              method=wx.LSDB())[1]
    record("c2_lsdb_fused", slope_time(c2_lsdb, x2, 8, 64), B2 * n2,
           {"B": B2, "n": n2})

    # larger-batch variant: the reference-size c2 program is ~0.05 ms —
    # latency-bound on the tunnel — so also measure the same pipeline at a
    # size where the chip is the bound (CLAUDE.md round-3 note).
    B2b = 2048 if QUICK else 16384
    x2b = jnp.asarray(rng.standard_normal((B2b, n2)).astype(np.float32))
    record("c2_jbb_fused_16k", slope_time(c2_fused, x2b, 8, 64), B2b * n2,
           {"B": B2b, "n": n2})

    # -- config 3: SWT/ACWT + SURE denoising of noisy HeaviSine batch --------
    B3 = 32 if QUICK else 256
    n3 = 256
    base = wx.generatesignals("heavisine", 8)
    x3 = jnp.asarray(wx.duplicatesignals(base, B3, 2, True, 0.5,
                                         rng=rng).astype(np.float32))

    def c3_swt():
        xw = wx.sdwt(x3, "db4")
        t = dn.sureshrink(xw, True)
        y = dn.denoise(xw, "sdwt", "db4", dnt=t, estnoise=dn.noisest)
        return float(jnp.sum(y))
    record("c3_swt_sure_denoise", wall_time(c3_swt), B3 * n3,
           {"B": B3, "n": n3})

    def c3_ac():
        xw = wx.acdwt(x3, "db4")
        y = dn.denoise(xw, "acdwt", "db4")
        return float(jnp.sum(y))
    record("c3_acwt_denoise", wall_time(c3_ac), B3 * n3, {"B": B3, "n": n3})

    # fused single-program denoise round trips (slope-timed: the wall numbers
    # above are dominated by per-dispatch tunnel latency at this size)
    import functools as _ft

    def swt_pipe(a):
        # selector subsampling: TPU sort time scales ~linearly with row
        # length below 256 lanes (BENCHMARKS.md r4), so SURE estimates its
        # risk from 64 coefficients (stride 36 of 2304) and the MAD row
        # samples 32 — measured 1,097 -> 1,867 Msps at B=4096 with PSNR
        # unchanged to 0.01 dB; the PSNR gate below re-verifies every run
        xw = wx.sdwt(a, "db4")
        t = dn.sureshrink(xw, True, subsample=36)
        return dn.denoise(xw, "sdwt", "db4", dnt=t,
                          estnoise=_ft.partial(dn.noisest, subsample=8))
    record("c3_swt_denoise_fused", slope_time(swt_pipe, x3, 8, 64),
           B3 * n3, {"B": B3, "n": n3})

    def ac_pipe(a):
        return dn.denoise(wx.acdwt(a, "db4"), "acdwt", "db4")
    record("c3_acwt_denoise_fused", slope_time(ac_pipe, x3, 8, 128),
           B3 * n3, {"B": B3, "n": n3})

    # fully fused best-basis VisuShrink: wpd -> JBB -> threshold -> dynamic
    # inverse, one program
    bb_den = lambda a: wx.bestbasis_denoise_pipeline(a, "db4", 6)
    record("c3b_bb_denoise_fused", slope_time(bb_den, x3, 8, 128),
           B3 * n3, {"B": B3, "n": n3})

    # larger-batch denoise variants (see c2_jbb_fused_16k note)
    B3b = 512 if QUICK else 4096
    x3b = jnp.asarray(wx.duplicatesignals(base, B3b, 2, True, 0.5,
                                          rng=rng).astype(np.float32))
    record("c3_swt_denoise_fused_4k", slope_time(swt_pipe, x3b, 4, 32),
           B3b * n3, {"B": B3b, "n": n3})
    record("c3b_bb_denoise_fused_4k", slope_time(bb_den, x3b, 4, 32),
           B3b * n3, {"B": B3b, "n": n3})

    # PSNR quality gate (must beat noisy input)
    y3 = dn.denoise(wx.sdwt(x3, "db4"), "sdwt", "db4", smooth="undersmooth")
    x0 = jnp.asarray(wx.duplicatesignals(base, B3, 2).astype(np.float32))
    psnr_noisy = float(wx.psnr(x3, x0))
    psnr_den = float(wx.psnr(y3, x0))
    RESULTS["c3_psnr"] = {"noisy": round(psnr_noisy, 2),
                          "denoised": round(psnr_den, 2)}
    print(f"c3 psnr: noisy {psnr_noisy:.2f} dB -> denoised {psnr_den:.2f} dB")

    # -- config 4: 2D WPT on 512x512 images + JBB ----------------------------
    B4 = 4 if QUICK else 16
    n4, L4 = 512, 4
    x4 = jnp.asarray(rng.standard_normal((B4, n4, n4)).astype(np.float32))
    fw2 = lambda a: wx.wpt2(a, "db4", L4)
    record("c4_wpt2d_512", slope_time(fw2, x4, 2, 16),
           B4 * n4 * n4, {"B": B4, "n": n4, "L": L4})

    def c4_jbb():
        xw = wx.wpd2(x4, "db4", L4)
        costs = wx.tree_costs(xw, wx.JBB(), is2d=True)
        return wx.bestbasis_treeselection(np.asarray(costs), n4, n4)
    record("c4_jbb_2d", wall_time(c4_jbb), B4 * n4 * n4, {"B": B4})

    # 2-D LSDB (round-5: first measured 2-D LSDB row; streamed costs —
    # the stacked-costs twin measured slower, see probe_lsdb.py)
    c4l_fused = lambda a: wx.bestbasis_pipeline(a, "db4", L4,
                                                method=wx.LSDB(),
                                                is2d=True)[1]
    record("c4l_lsdb_2d_fused", slope_time(c4l_fused, x4, 2, 16),
           B4 * n4 * n4, {"B": B4, "n": n4, "L": L4})

    c4_fused = lambda a: wx.bestbasis_pipeline(a, "db4", L4, is2d=True)[1]
    record("c4_jbb_2d_fused", slope_time(c4_fused, x4, 2, 16),
           B4 * n4 * n4, {"B": B4})

    # fused 2-D best-basis VisuShrink denoise (stack costs -> device tree ->
    # threshold -> depth-trimmed dynamic quadtree inverse, one program)
    c4_den = lambda a: wx.bestbasis_denoise_pipeline2(a, "db4", L4)
    record("c4b_bb_denoise_2d_fused", slope_time(c4_den, x4, 2, 16),
           B4 * n4 * n4, {"B": B4})

    # fused 2-D stationary denoise (sdwt2 -> MAD/VisuShrink -> average
    # inverse) at a smaller image batch — the redundant table is
    # (3L+1) x n x m per image
    B4c = 2 if QUICK else 4
    x4c = x4[:B4c]
    # mad_subsample=64: MAD from 1,024 of the 65,536 HH coefficients (~3%
    # estimator noise) — the (B, 4096) selector sort at the default 16 was
    # ~28% of the program (on-chip sweep: 1,915 -> 2,668 Msps; 256 flat)
    c4c = lambda a: wx.swt_denoise_pipeline2(a, "db4", L4, mad_subsample=64)
    record("c4c_swt2_denoise_fused", slope_time(c4c, x4c, 2, 16),
           B4c * n4 * n4, {"B": B4c, "L": L4})

    # relaxed-precision opt-in (DEFAULT dots, ~2e-3 rel rms — see
    # BENCHMARKS.md precision ladder): measures the documented throughput
    # mode; the accurate HIGHEST numbers above stay the headline.  Round 4
    # extends the ladder to the slow pipeline classes (c3/c4b/c4c) with a
    # PSNR gate recorded next to each denoise row.
    psnr_hi = float(wx.psnr(dn.denoise(wx.sdwt(x3, "db4"), "sdwt", "db4"),
                            x0))
    try:
        wx.set_matmul_precision("default")
        record("wpt_forward_relaxed", slope_time(fw, x, 8, 128), B * n,
               {"B": B, "n": n, "precision": "default"})
        record("c1_dwt_roundtrip_relaxed", slope_time(rt, x, 4, 32), B * n,
               {"B": B, "n": n, "precision": "default"})
        record("c4_wpt2d_512_relaxed", slope_time(fw2, x4, 2, 16),
               B4 * n4 * n4, {"B": B4, "precision": "default"})
        record("c4_jbb_2d_fused_relaxed", slope_time(c4_fused, x4, 2, 16),
               B4 * n4 * n4, {"B": B4, "precision": "default"})
        record("c3_swt_denoise_fused_4k_relaxed",
               slope_time(swt_pipe, x3b, 4, 32), B3b * n3,
               {"B": B3b, "precision": "default"})
        record("c3b_bb_denoise_fused_4k_relaxed",
               slope_time(bb_den, x3b, 4, 32), B3b * n3,
               {"B": B3b, "precision": "default"})
        record("c4b_bb_denoise_2d_fused_relaxed",
               slope_time(c4_den, x4, 2, 16), B4 * n4 * n4,
               {"B": B4, "precision": "default"})
        record("c4c_swt2_denoise_fused_relaxed",
               slope_time(c4c, x4c, 2, 16), B4c * n4 * n4,
               {"B": B4c, "precision": "default"})
        record("c2_lsdb_fused_relaxed", slope_time(c2_lsdb, x2, 8, 64),
               B2 * n2, {"B": B2, "precision": "default"})
        # PSNR gate: the relaxed denoise must stay within 0.1 dB of the
        # HIGHEST-precision result on the c3 config
        psnr_rel = float(wx.psnr(
            dn.denoise(wx.sdwt(x3, "db4"), "sdwt", "db4"), x0))
        RESULTS["c3_psnr_relaxed_gate"] = {
            "highest_db": round(psnr_hi, 3), "default_db": round(psnr_rel, 3),
            "delta_db": round(psnr_rel - psnr_hi, 4)}
        print(f"relaxed PSNR gate: {psnr_hi:.3f} dB (highest) vs "
              f"{psnr_rel:.3f} dB (default)")
    finally:
        wx.set_matmul_precision("highest")

    # -- config 5: LDB pipeline on triangular 3-class dataset ---------------
    Xc5, y5 = wx.generateclassdata(wx.ClassData("tri", 33, 33, 33), rng=rng)
    X5 = jnp.asarray(Xc5.astype(np.float32))

    def c5():
        f = ldb_mod.LocalDiscriminantBasis(wt="haar", n_features=10)
        return np.asarray(f.fit_transform(X5, y5))
    record("c5_ldb_fit_transform", wall_time(c5), X5.size, {"N": len(y5)})

    # fused one-program fit_transform: one dispatch instead of ~10 (the tiny
    # reference-size config is pure tunnel latency, so throughput is measured
    # at production batch size via the slope method)
    f5 = ldb_mod.LocalDiscriminantBasis(wt="haar", n_features=10)
    np.asarray(wx.ldb_fit_transform_pipeline(f5, X5, y5))

    def c5f():
        f = ldb_mod.LocalDiscriminantBasis(wt="haar", n_features=10)
        return np.asarray(wx.ldb_fit_transform_pipeline(f, X5, y5))
    record("c5_ldb_fused_wall", wall_time(c5f), X5.size, {"N": len(y5)})

    Nb = 170 if QUICK else 1366
    Xb, yb = wx.generateclassdata(wx.ClassData("tri", Nb, Nb, Nb), rng=rng)
    Xb = jnp.asarray(Xb.astype(np.float32))
    fb = ldb_mod.LocalDiscriminantBasis(wt="haar", n_features=10)
    np.asarray(wx.ldb_fit_transform_pipeline(fb, Xb, yb))  # resolve config
    from waveletsext_tpu.ldb import _ldb_pipeline, _class_masks
    idxsb = tuple(tuple(int(i) for i in ix) for ix in _class_masks(yb)[1])

    def c5_fused(a):
        _, _, _, feats = _ldb_pipeline(a, fb.wt, fb.max_dec_level, fb.en,
                                       fb.dm, fb.dp, fb.top_k, fb.n_features,
                                       idxsb, False)
        return a + jnp.sum(feats) * 1e-30
    record("c5b_ldb_fused_4k", slope_time(c5_fused, Xb, 8, 64), Xb.size,
           {"N": 3 * Nb})
    try:
        wx.set_matmul_precision("default")
        record("c5b_ldb_fused_4k_relaxed", slope_time(c5_fused, Xb, 8, 64),
               Xb.size, {"N": 3 * Nb, "precision": "default"})
    finally:
        wx.set_matmul_precision("highest")

    # Signatures/EMD fused fit (round 4: gather-free device _emd_pair — one
    # key-value sort + cumsum per coordinate; previously host-estimator only)
    fe = ldb_mod.LocalDiscriminantBasis(wt="haar", n_features=10,
                                        en=ldb_mod.Signatures("equal"),
                                        dm=ldb_mod.EarthMoverDistance())
    np.asarray(wx.ldb_fit_transform_pipeline(fe, Xb, yb))  # resolve config

    def c5_emd(a):
        _, _, _, feats = _ldb_pipeline(a, fe.wt, fe.max_dec_level, fe.en,
                                       fe.dm, fe.dp, fe.top_k, fe.n_features,
                                       idxsb, False)
        return a + jnp.sum(feats) * 1e-30
    record("c5c_ldb_emd_fused_4k", slope_time(c5_emd, Xb, 2, 16), Xb.size,
           {"N": 3 * Nb})

    # Signatures('pdf')/EMD fused fit (round 5: each class chunk-sorted once
    # via the fast-path 256-lane XLA sort + Pallas bitonic cascade; every
    # pair integrated by the fused merge+prefix+|CDF| kernel)
    fp = ldb_mod.LocalDiscriminantBasis(wt="haar", n_features=10,
                                        en=ldb_mod.Signatures("pdf"),
                                        dm=ldb_mod.EarthMoverDistance())
    np.asarray(wx.ldb_fit_transform_pipeline(fp, Xb, yb))  # resolve config

    def c5_emd_pdf(a):
        _, _, _, feats = _ldb_pipeline(a, fp.wt, fp.max_dec_level, fp.en,
                                       fp.dm, fp.dp, fp.top_k, fp.n_features,
                                       idxsb, False)
        return a + jnp.sum(feats) * 1e-30
    record("c5c_ldb_emd_pdf_fused_4k", slope_time(c5_emd_pdf, Xb, 2, 16),
           Xb.size, {"N": 3 * Nb})

    # -- config 6: dense batched SIWT (siwpd -> 3-way best basis ->
    # threshold -> inverse, one program; reference runs this as a host dict
    # recursion, SIWT.jl:93-136) ------------------------------------------
    B6 = 64 if QUICK else 256
    n6, L6 = 128, 4
    x6 = jnp.asarray(rng.standard_normal((B6, n6)).astype(np.float32))
    siwt_pipe = lambda a: wx.siwt_bestbasis_pipeline(a, "db4", L6)[0]
    record("c6_siwt_bb_pipeline", slope_time(siwt_pipe, x6, 8, 64),
           B6 * n6, {"B": B6, "n": n6, "L": L6})

    # big-batch budget-packed SIWT (P_d stays O(budget) instead of 2^d —
    # siwt_dense.packed_shifts): B=256 signals of n=4096 at L=12, budget 2
    B6b = 32 if QUICK else 256
    n6b, L6b = 4096, 12
    x6b = jnp.asarray(rng.standard_normal((B6b, n6b)).astype(np.float32))
    siwt_big = lambda a: wx.siwt_bestbasis_pipeline(a, "db4", L6b, 2)[0]
    record("c6b_siwt_bb_4k_budget2", slope_time(siwt_big, x6b, 2, 8),
           B6b * n6b, {"B": B6b, "n": n6b, "L": L6b, "budget": 2})
    try:
        wx.set_matmul_precision("default")
        record("c6b_siwt_bb_4k_budget2_relaxed",
               slope_time(siwt_big, x6b, 2, 8), B6b * n6b,
               {"B": B6b, "n": n6b, "L": L6b, "budget": 2,
                "precision": "default"})
    finally:
        wx.set_matmul_precision("highest")

    # -- config 7: WaveMult (BCR fast multiply) — build once, many RHS.
    # The reference's headline for this module is speed (O(n) sparse vs
    # O(n^2), wavemult.jl:6-11); on TPU the dispatch is measured, see
    # benchmarks/probe_wavemult.py and the form='auto' rationale.
    from waveletsext_tpu import wavemult as wm
    n7 = 256 if QUICK else 1024
    B7 = 32 if QUICK else 128
    idx7 = np.arange(n7)
    d7 = idx7[:, None] - idx7[None, :]
    M7 = np.where(d7 == 0, 0.0,
                  1.0 / np.where(d7 == 0, 1, d7)).astype(np.float32)
    x7 = jnp.asarray(rng.standard_normal((B7, n7)).astype(np.float32))
    form7 = wm.mat2denseform_nonstd(M7, "db4")
    c7 = lambda a: wm.nonstd_wavemult(form7, a, "db4",
                                  form="prebuilt")
    record("c7_wavemult_nonstd", slope_time(c7, x7, 4, 32), B7 * n7,
           {"B": B7, "n": n7, "form": "dense"})

    # quick/CPU smoke runs must not clobber the committed on-chip artifact
    name = ("all_results.json" if not QUICK and "TPU" in dev
            else "all_results_quick.json")
    out = pathlib.Path(__file__).parent / name
    out.write_text(json.dumps({"device": dev, "quick": QUICK,
                               "results": RESULTS}, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    if PROFILE:
        from waveletsext_tpu.observability import profile_trace
        tdir = pathlib.Path(__file__).parent / "traces"
        with profile_trace(tdir):
            main()
        print(f"profiler trace written to {tdir}")
    else:
        main()
