#!/usr/bin/env python
"""Matmul-precision ladder for the fused WPT kernel (north-star config).

The composed per-node MXU contraction dominates the fused WPT program, and
at the library default (``Precision.HIGHEST`` = 6-pass bf16, fp32-accurate)
the MXU does 6x the passes of ``Precision.DEFAULT`` (1-pass bf16).  This
probe measures, on the real chip, the throughput and the *accuracy* (vs an
exact float64 numpy reference of the same filter conventions) of:

  * f32 input, HIGHEST dots  — the library default (reference-accurate)
  * f32 input, DEFAULT dots  — relaxed: inputs rounded to bf16 per pass,
                                f32 accumulation
  * bf16 input, DEFAULT dots — storage + bandwidth also halved

Writes benchmarks/precision_ladder.json and prints a table.  See
BENCHMARKS.md for the recorded outcome and the guidance on when the relaxed
modes are safe (reference semantics: /root/reference/src/mod/DWT.jl uses
Float64 throughout; the relaxed modes are explicit opt-ins via
``set_matmul_precision`` / bf16 inputs).
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

from waveletsext_tpu.filters import wavelet
from waveletsext_tpu.kernels import operators as ops
from waveletsext_tpu.kernels.pallas_wpt import wpt_pallas

B = int(os.environ.get("PROBE_B", "1024"))
N = int(os.environ.get("PROBE_N", "4096"))
L = 8
KLO, KHI = 4, 20


def np_wpt(x64, lo, hi, levels):
    """Exact f64 WPT level sweep (same packed layout as transforms.dwt.wpt)."""
    b, n = x64.shape
    cur = x64
    for d in range(levels):
        m = n >> d
        blocks = cur.reshape(b * (1 << d), m)
        w1, w2 = ops._np_analysis_step(blocks, lo, hi)
        cur = np.concatenate([w1, w2], axis=1).reshape(b, n)
    return cur


def slope_secs(fn, x, reps=3):
    """Guarded slope (round-4: the unguarded version produced the 68.5 Gsps
    pre-guard artifact recorded in the r3 ladder; see BENCHMARKS.md)."""
    MIN_GAP_S = 3e-3

    @jax.jit
    def chain(a, k):
        out = jax.lax.fori_loop(0, k, lambda i, v: fn(v), a)
        return jnp.sum(out[0].astype(jnp.float32))
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
    for attempt in range(6):
        if attempt:
            khi *= 2
            t(khi)
        t_lo, t_hi = t(KLO), t(khi)
        if t_hi - t_lo >= MIN_GAP_S:
            break
    return max((t_hi - t_lo) / (khi - KLO), 1e-9)


def main():
    rng = np.random.default_rng(0)
    x64 = rng.standard_normal((B, N))
    w = wavelet("db4")
    ref = np_wpt(x64, w.lo, w.hi, L)
    rms = float(np.sqrt(np.mean(ref ** 2)))

    x32 = jnp.asarray(x64.astype(np.float32))
    x16 = jnp.asarray(x64.astype(np.float32)).astype(jnp.bfloat16)

    modes = [
        ("f32_highest", x32, jax.lax.Precision.HIGHEST),
        ("f32_default", x32, jax.lax.Precision.DEFAULT),
        ("bf16_default", x16, jax.lax.Precision.DEFAULT),
    ]
    out = {"config": {"B": B, "n": N, "L": L, "wavelet": "db4"},
           "device": str(jax.devices()[0]), "modes": {}}
    for name, x, prec in modes:
        y = np.asarray(wpt_pallas(x, "db4", L, precision=prec),
                       dtype=np.float64)
        err = np.abs(y - ref)
        rel_rms = float(np.sqrt(np.mean(err ** 2)) / rms)
        rel_max = float(err.max() / rms)
        dt = slope_secs(lambda v: wpt_pallas(v, "db4", L, precision=prec), x)
        msps = B * N / dt / 1e6
        out["modes"][name] = {"msamples_per_s": round(msps, 1),
                              "secs_per_app": dt,
                              "rel_rms_err": rel_rms, "rel_max_err": rel_max}
        print(f"{name:14s} {msps:10.0f} Msps   rel_rms={rel_rms:.2e} "
              f"rel_max={rel_max:.2e}", flush=True)

    (ROOT / "benchmarks" / "precision_ladder.json").write_text(
        json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
