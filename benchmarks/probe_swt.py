#!/usr/bin/env python
"""On-chip probe for the fused à-trous (SWT/ACWT) denoise path (c3 config).

Measures the round-2 XLA pipeline (dispatch disabled via env flag) against
the fused Pallas kernels called directly (sdwt/acdwt stack kernel + SURE
selector + threshold-fused inverse kernel), at the reference batch size and
the big-batch variant, and checks parity between the two.  Writes
benchmarks/probe_swt.json.
"""

import json
import os
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))
# XLA baselines first: all apijit traces in this process must not dispatch
# to Pallas for the *_xla rows; the fused rows call the kernels directly.
os.environ["WAVELETSEXT_TPU_NO_PALLAS"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import waveletsext_tpu as wx
from waveletsext_tpu import denoising as dn
from waveletsext_tpu.filters import wavelet
from waveletsext_tpu.kernels.pallas_swt import (sdwt_pallas, isdwt_pallas,
                                                acdwt_pallas, iacdwt_pallas)

N = 256
L = 8  # maxtransformlevels(256)
KLO, KHI = 8, 64
MIN_GAP_S = 3e-3
W = wavelet("db4")


def log(msg):
    print(f"[probeswt {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def slope_secs(fn, x, reps=3):
    @jax.jit
    def chain(a, k):
        out = jax.lax.fori_loop(0, k, lambda i, v: fn(v), a)
        return jnp.sum(out.astype(jnp.float32))
    float(chain(x, jnp.int32(KLO)))

    def t(k):
        kk = jnp.int32(k)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(x, kk))
            best = min(best, time.perf_counter() - t0)
        return best
    t(KLO)
    khi = KHI
    for _ in range(4):
        tlo, thi = t(KLO), t(khi)
        if thi - tlo >= MIN_GAP_S:
            break
        khi *= 2
        t(khi)
    return max((thi - tlo) / (khi - KLO), 1e-9)


def xla_swt_pipe(a):
    xw = wx.sdwt(a, "db4")
    t = dn.sureshrink(xw, True, subsample=8)
    return dn.denoise(xw, "sdwt", "db4", dnt=t, estnoise=dn.noisest)


def fused_swt_pipe(a):
    xw = sdwt_pallas(a, W, L)
    t = dn.sureshrink(xw, True, subsample=8)
    sigma = dn.noisest(xw, True, None)
    return isdwt_pallas(xw, W, sigma * t.t, has_t=True)


def xla_ac_pipe(a):
    return dn.denoise(wx.acdwt(a, "db4"), "acdwt", "db4")


def fused_ac_pipe(a):
    xw = acdwt_pallas(a, W, L)
    sigma = dn.noisest(xw, True, None)
    tvis = float(np.sqrt(2 * np.log(N)))
    return iacdwt_pallas(xw, sigma * tvis, has_t=True)


def main():
    rng = np.random.default_rng(0)
    base = wx.generatesignals("heavisine", 8)
    results = {}

    for B, tag in ((256, "256"), (4096, "4k")):
        x = jnp.asarray(wx.duplicatesignals(base, B, 2, True, 0.5,
                                            rng=rng).astype(np.float32))
        ref = np.asarray(xla_swt_pipe(x))
        got = np.asarray(fused_swt_pipe(x))
        par = float(np.max(np.abs(got - ref)) / np.max(np.abs(ref)))
        for name, fn in ((f"xla_swt_pipe_{tag}", xla_swt_pipe),
                         (f"fused_swt_pipe_{tag}", fused_swt_pipe)):
            dt = slope_secs(fn, x)
            msps = B * N / dt / 1e6
            results[name] = {"msamples_per_s": round(msps, 1),
                             "secs_per_app": dt}
            log(f"{name:24s} {msps:10.0f} Msps")
        results[f"swt_parity_{tag}"] = par
        log(f"swt fused-vs-xla rel_max parity ({tag}): {par:.2e}")

        refa = np.asarray(xla_ac_pipe(x))
        gota = np.asarray(fused_ac_pipe(x))
        para = float(np.max(np.abs(gota - refa)) / np.max(np.abs(refa)))
        for name, fn in ((f"xla_ac_pipe_{tag}", xla_ac_pipe),
                         (f"fused_ac_pipe_{tag}", fused_ac_pipe)):
            dt = slope_secs(fn, x)
            msps = B * N / dt / 1e6
            results[name] = {"msamples_per_s": round(msps, 1),
                             "secs_per_app": dt}
            log(f"{name:24s} {msps:10.0f} Msps")
        results[f"ac_parity_{tag}"] = para
        log(f"ac fused-vs-xla rel_max parity ({tag}): {para:.2e}")

    out = {"config": {"n": N, "L": L, "wavelet": "db4"},
           "device": str(jax.devices()[0]), "results": results}
    (ROOT / "benchmarks" / "probe_swt.json").write_text(
        json.dumps(out, indent=2))
    log("wrote probe_swt.json")


if __name__ == "__main__":
    main()
