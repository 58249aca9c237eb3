#!/usr/bin/env python
"""Reconcile the 1-D DEFAULT-precision gap (round-3 VERDICT item 1).

benchmarks/precision_ladder.json recorded the direct ``wpt_pallas`` call at
DEFAULT dots = 68.5 Gsps (B=1024 n=4096 L=8, measured 2026-08-20 *before*
the slope-gap guard existed), while the public ``wpt_forward_relaxed`` row
measured 27.6-30.0 Gsps.  This probe re-measures, same-process, with the
guarded slope method:

  * direct wpt_pallas at HIGHEST and DEFAULT across in-kernel cutoffs
    (the 1-D cutoff was precision-blind; the 2-D one is precision-keyed)
  * block_b sweep at the best DEFAULT cutoff
  * the public wx.wpt path under set_matmul_precision, same process

Writes benchmarks/probe_wpt1.json.
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
from waveletsext_tpu.kernels.pallas_wpt import wpt_pallas

B = int(os.environ.get("PROBE_B", "1024"))
N = int(os.environ.get("PROBE_N", "4096"))
L = 8
MIN_GAP_S = 3e-3


def slope_secs(fn, x, klo=4, khi=32, reps=3):
    """Guarded slope timing (same discipline as bench.py): ONE traced-k
    program, escalate khi at the TOP of each retry until the gap clears the
    noise floor, return a consistent (t_hi, khi) slope."""
    @jax.jit
    def chain(a, k):
        out = jax.lax.fori_loop(0, k, lambda i, v: fn(v), a)
        return jnp.sum(out[0].astype(jnp.float32))
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
    return max((t_hi - t_lo) / (khi - klo), 1e-9), khi


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N)).astype(np.float32))
    out = {"config": {"B": B, "n": N, "L": L, "wavelet": "db4"},
           "device": str(jax.devices()[0]), "rows": []}

    def row(name, msps, extra=None):
        out["rows"].append({"name": name, "msps": round(msps, 1),
                            **(extra or {})})
        print(f"{name:42s} {msps:10.0f} Msps", flush=True)

    def try_row(name, fn):
        try:
            dt, khi = slope_secs(fn, x)
            row(name, B * N / dt / 1e6, {"khi": khi, "secs": dt})
        except Exception as e:  # e.g. VMEM OOM at big cutoffs
            out["rows"].append({"name": name, "error": str(e)[:200]})
            print(f"{name:42s} FAILED: {str(e)[:120]}", flush=True)

    reps = int(os.environ.get("PROBE_REPS", "2"))
    for r in range(reps):
        for prec_name, prec in (("default", jax.lax.Precision.DEFAULT),
                                ("highest", jax.lax.Precision.HIGHEST)):
            for cutoff in (128, 256, 512, 1024, 2048):
                try_row(f"direct_{prec_name}_cut{cutoff}_r{r}",
                        lambda v, c=cutoff, p=prec: wpt_pallas(
                            v, "db4", L, precision=p, in_cutoff=c))

    # block_b sweep at each precision's best cutoff so far
    for bb in (32, 64, 256, 512):
        if B % bb:
            continue
        try_row(f"direct_default_cut1024_bb{bb}",
                lambda v, b=bb: wpt_pallas(v, "db4", L, block_b=b,
                                           precision=jax.lax.Precision.DEFAULT,
                                           in_cutoff=1024))
        try_row(f"direct_highest_cut256_bb{bb}",
                lambda v, b=bb: wpt_pallas(v, "db4", L, block_b=b,
                                           precision=jax.lax.Precision.HIGHEST,
                                           in_cutoff=256))

    # public dispatch path, same process
    for r in range(reps):
        for prec_name in ("highest", "default"):
            wx.set_matmul_precision(prec_name)
            try:
                try_row(f"public_wpt_{prec_name}_r{r}",
                        lambda v: wx.wpt(v, "db4", L))
            finally:
                wx.set_matmul_precision("highest")

    (ROOT / "benchmarks" / "probe_wpt1.json").write_text(
        json.dumps(out, indent=2))
    print("wrote benchmarks/probe_wpt1.json")


if __name__ == "__main__":
    main()
