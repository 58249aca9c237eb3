#!/usr/bin/env python
"""SIWT step-cutoff sweep on chip (round-3 VERDICT item 8).

c6b (B=256 n=4096 L=12 budget=2) measured 250-459 Msps.  Flop analysis:
with the global MATMUL_CUTOFF=1024, depths 2..5 run per-node (nd, nd)
operator matmuls at nd = 1024..256, costing 2*nd MACs per element at
6-pass HIGHEST — ~hundreds of Gflops for the level, vs 2*F = 16 for the
polyphase conv path.  This sweeps siwt_bestbasis_pipeline's step_cutoff at
both precisions to find the per-precision crossover.

Writes benchmarks/probe_siwt.json.
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

B, N, L, BUDGET = 256, 4096, 12, 2
MIN_GAP_S = 3e-3


def slope_secs(fn, x, klo=2, khi=8, reps=3):
    @jax.jit
    def chain(a, k):
        out = jax.lax.fori_loop(0, k, lambda i, v: fn(v), a)
        return jnp.sum(out.astype(jnp.float32))
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


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N)).astype(np.float32))
    out = {"config": {"B": B, "n": N, "L": L, "budget": BUDGET},
           "device": str(jax.devices()[0]), "rows": []}

    def row(name, dt):
        msps = B * N / dt / 1e6
        out["rows"].append({"name": name, "secs": dt,
                            "msps": round(msps, 1)})
        print(f"{name:34s} {dt*1e3:9.3f} ms  {msps:10.1f} Msps", flush=True)

    reps = int(os.environ.get("PROBE_REPS", "2"))
    for r in range(reps):
        for prec in ("highest", "default"):
            wx.set_matmul_precision(prec)
            try:
                # round-5 fused deep-zone kernel (auto transition) vs the
                # XLA hybrid, then the r4 step-cutoff sweep on the hybrid
                for dk, tag in ((True, "kernel"), (False, "xla")):
                    dt = slope_secs(
                        lambda a, d=dk: wx.siwt_bestbasis_pipeline(
                            a, "db4", L, BUDGET, deep_kernel=d)[0], x)
                    row(f"c6b_{prec}_{tag}_r{r}", dt)
                for cut in (None, 256, 64, 16):
                    dt = slope_secs(
                        lambda a, c=cut: wx.siwt_bestbasis_pipeline(
                            a, "db4", L, BUDGET, step_cutoff=c,
                            deep_kernel=False)[0], x)
                    row(f"c6b_{prec}_cut{cut}_r{r}", dt)
            finally:
                wx.set_matmul_precision("highest")

    (ROOT / "benchmarks" / "probe_siwt.json").write_text(
        json.dumps(out, indent=2))
    print("wrote benchmarks/probe_siwt.json")


if __name__ == "__main__":
    main()
