#!/usr/bin/env python
"""LSDB cost breakdown on chip (round-3 VERDICT item 6).

c2_lsdb_fused measured ~3x slower than c2_jbb_fused on the identical
config.  This probe decomposes the gap, same-process:

  * full pipelines (LSDB vs JBB), c2 config and a 16k-batch variant
  * the cost stage alone: streamed per-level loop vs a stack-batched
    single-vmap formulation (per-coordinate ASH entropy is node- and
    level-independent, so the whole (L+1)*n coordinate set can go through
    ONE vmap and the per-node sums become reshape-sums)
  * the raw vmapped ASH entropy on the equivalent coordinate set

Writes benchmarks/probe_lsdb.json.
"""

import json
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import waveletsext_tpu as wx
from waveletsext_tpu import basis as basis_mod

MIN_GAP_S = 3e-3


def slope_secs(fn, x, klo=8, khi=64, reps=3):
    @jax.jit
    def chain(a, k):
        out = jax.lax.fori_loop(0, k, lambda i, v: fn(v), a)
        return jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))
    float(chain(x, jnp.int32(klo)))

    def t(k):
        kk = jnp.int32(k)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(x, kk))
            best = min(best, time.perf_counter() - t0)
        return best
    t(klo)
    for attempt in range(6):
        if attempt:
            khi *= 2
            t(khi)
        t_lo, t_hi = t(klo), t(khi)
        if t_hi - t_lo >= MIN_GAP_S:
            break
    return max((t_hi - t_lo) / (khi - klo), 1e-9)


def stacked_lsdb_costs(x, wt, L):
    """Stack-batched LSDB node costs: ONE vmap over all (L+1)*n coords."""
    n = x.shape[-1]
    xw = wx.wpd(x, wt, L)                      # (N, L+1, n)
    coords = jnp.moveaxis(xw, 0, -1).reshape(-1, x.shape[0])
    ents = jax.vmap(basis_mod._ash_differential_entropy)(coords)
    lvl = ents.reshape(L + 1, n)
    return jnp.concatenate(
        [jnp.sum(lvl[d].reshape(1 << d, n >> d), axis=-1)
         for d in range(L + 1)])


def main():
    rng = np.random.default_rng(0)
    out = {"device": str(jax.devices()[0]), "rows": []}

    def row(name, secs, samples, extra=None):
        out["rows"].append({"name": name, "secs": secs,
                            "msps": round(samples / secs / 1e6, 1),
                            **(extra or {})})
        print(f"{name:34s} {secs*1e3:9.3f} ms  "
              f"{samples/secs/1e6:10.1f} Msps", flush=True)

    for B, tag in ((128, "c2"), (16384, "16k")):
        n, L = 256, 8
        x = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
        samples = B * n
        row(f"{tag}_jbb_fused", slope_secs(
            lambda a: wx.bestbasis_pipeline(a, "db4", L)[1], x), samples)
        row(f"{tag}_lsdb_fused", slope_secs(
            lambda a: wx.bestbasis_pipeline(a, "db4", L,
                                            method=wx.LSDB())[1], x),
            samples)
        def carry(fn):
            # cost-only stages are not shape-preserving; carry the input
            # with an epsilon data dependency so the chain still serializes
            return lambda a: a + jnp.sum(fn(a)) * 1e-30
        row(f"{tag}_lsdb_costs_stream", slope_secs(carry(
            lambda a: basis_mod._stream_costs(a, "db4", L, wx.LSDB(),
                                              False)), x), samples)
        row(f"{tag}_lsdb_costs_stacked", slope_secs(carry(
            lambda a: stacked_lsdb_costs(a, "db4", L)), x), samples)
        row(f"{tag}_jbb_costs_stream", slope_secs(carry(
            lambda a: basis_mod._stream_costs(a, "db4", L, wx.JBB(),
                                              False)), x), samples)
        # raw ASH on the stack coordinate set (no transform, no selection)
        coords = jnp.asarray(
            rng.standard_normal(((L + 1) * n, B)).astype(np.float32))
        row(f"{tag}_ash_raw", slope_secs(carry(
            lambda c: jax.vmap(basis_mod._ash_differential_entropy)(c)),
            coords), samples)

    # -- 2-D LSDB (round-5 VERDICT item 3: first 2-D measurement) ---------
    B2, n2, L2 = 256, 32, 3
    x2 = jnp.asarray(rng.standard_normal((B2, n2, n2)).astype(np.float32))
    samples2 = B2 * n2 * n2
    row("c4l_lsdb2_fused", slope_secs(
        lambda a: wx.bestbasis_pipeline(a, "db4", L2, method=wx.LSDB(),
                                        is2d=True)[1], x2), samples2)
    def carry2(fn):
        return lambda a: a + jnp.sum(fn(a)) * 1e-30
    row("c4l_lsdb2_costs_stream", slope_secs(carry2(
        lambda a: basis_mod._stream_costs(a, "db4", L2, wx.LSDB(), True)),
        x2), samples2)
    row("c4l_lsdb2_costs_stacked", slope_secs(carry2(
        lambda a: basis_mod._lsdb_stacked_costs_2d(
            wx.wpd2(a, "db4", L2))), x2), samples2)
    a2 = np.asarray(basis_mod._stream_costs(x2, "db4", L2, wx.LSDB(), True))
    b2 = np.asarray(basis_mod._lsdb_stacked_costs_2d(
        wx.wpd2(x2, "db4", L2)))
    out["stacked2d_max_abs_diff"] = float(np.abs(a2 - b2).max())
    print("2-D stacked vs stream max diff:", out["stacked2d_max_abs_diff"])

    # -- big-batch count-kernel A/B (round-5 VERDICT item 3): one-hot vs a
    # sorted-row searchsorted rank-difference count ------------------------
    def ash_sortcount(x):
        N = x.shape[0]
        M = 50
        nbins = int(np.ceil((30 * N) ** 0.2))
        mbins = int(np.ceil(M / nbins))
        g = (nbins + 1) * mbins
        sigma = jnp.std(x, ddof=1)
        lo = jnp.min(x) - 0.5 * sigma
        delta = (jnp.max(x) - jnp.min(x) + sigma) / (g - 1)
        xs = jnp.sort(x)
        edges = lo + delta * jnp.arange(1, g, dtype=x.dtype)
        ranks = jnp.searchsorted(xs, edges)  # gathers: expected slow
        counts = jnp.diff(jnp.concatenate(
            [jnp.zeros(1, ranks.dtype), ranks,
             jnp.full((1,), N, ranks.dtype)]))
        counts = counts.astype(x.dtype)
        S = jnp.asarray(basis_mod._ash_smoothing_matrix(g, mbins), x.dtype)
        smoothed = S @ counts
        density = smoothed / (jnp.sum(smoothed) * delta)
        tiny = np.finfo(np.float32).tiny
        logd = jnp.log(jnp.maximum(density, tiny))
        return -(counts @ logd) / N

    for B, tag in ((1024, "1k"), (16384, "16k")):
        coords = jnp.asarray(
            rng.standard_normal((2304, B)).astype(np.float32))
        def carry3(fn):
            return lambda c: c + jnp.sum(fn(c)) * 1e-30
        row(f"count_{tag}_onehot", slope_secs(carry3(
            lambda c: jax.vmap(basis_mod._ash_differential_entropy)(c)),
            coords), 2304 * B)
        row(f"count_{tag}_sortranks", slope_secs(carry3(
            lambda c: jax.vmap(ash_sortcount)(c)), coords), 2304 * B)

    # numerical agreement of the stacked formulation
    x = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32))
    a = np.asarray(basis_mod._stream_costs(x, "db4", 8, wx.LSDB(), False))
    b = np.asarray(stacked_lsdb_costs(x, "db4", 8))
    out["stacked_max_abs_diff"] = float(np.abs(a - b).max())
    print("stacked vs stream max diff:", out["stacked_max_abs_diff"])

    (ROOT / "benchmarks" / "probe_lsdb.json").write_text(
        json.dumps(out, indent=2))
    print("wrote benchmarks/probe_lsdb.json")


if __name__ == "__main__":
    main()
