#!/usr/bin/env python
"""Benchmark harness — north-star metric: WPT Msamples/s/chip (L=8, db4).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` compares against the measured serial-CPU reference point
(native/wpt_baseline.cpp — the reference package publishes no numbers and
Julia is unavailable, see BASELINE.md).  The CPU number is measured once and
cached in benchmarks/cpu_baseline.json.

Run on the real TPU chip (default JAX platform).  Extra per-config numbers go
to benchmarks/results.json for local inspection; stdout stays one line.
"""

import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent


def cpu_baseline_msps() -> float:
    cache = ROOT / "benchmarks" / "cpu_baseline.json"
    if cache.exists():
        return json.loads(cache.read_text())["msamples_per_s"]
    exe = ROOT / "native" / "wpt_baseline"
    if not exe.exists():
        subprocess.run(
            ["g++", "-O3", "-march=native", "-o", str(exe),
             str(ROOT / "native" / "wpt_baseline.cpp")], check=True)
    out = subprocess.run([str(exe), "64", "4096", "8", "5"],
                         capture_output=True, text=True, check=True).stdout
    rec = json.loads(out)
    cache.parent.mkdir(exist_ok=True)
    cache.write_text(json.dumps(rec))
    return rec["msamples_per_s"]


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          str(ROOT / ".jax_cache"))
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from waveletsext_tpu.transforms.dwt import wpt

    B = int(os.environ.get("BENCH_B", "1024"))
    n = int(os.environ.get("BENCH_N", "4096"))
    L = 8
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))

    # NOTE: on this backend block_until_ready can return before remote
    # completion and host fetches pay a slow tunnel transfer, so: chain k
    # transform applications inside ONE jitted fori_loop (wpt is shape- and
    # norm-preserving), return a scalar, force completion by fetching it, and
    # take the slope between two k values to cancel constant dispatch +
    # transfer overhead.
    def chain(k):
        def f(a):
            out = jax.lax.fori_loop(
                0, k, lambda i, v: wpt(v, "db4", L), a)
            return jnp.sum(out[0])
        return jax.jit(f)

    k_lo, k_hi = max(2, iters // 4), iters
    f_lo, f_hi = chain(k_lo), chain(k_hi)
    float(f_lo(x)); float(f_hi(x))  # compile + warm

    def timed(f, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(x))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(f_lo), timed(f_hi)
    dt = (t_hi - t_lo) / (k_hi - k_lo)  # secs per wpt application
    msps = B * n / dt / 1e6
    iters = k_hi

    base = cpu_baseline_msps()
    rec = {
        "metric": "wpt_msamples_per_s_per_chip",
        "value": round(msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / base, 2),
    }
    detail = {
        **rec,
        "config": {"B": B, "n": n, "L": L, "wavelet": "db4",
                   "dtype": "float32", "iters": iters},
        "cpu_baseline_msamples_per_s": base,
        "device": str(jax.devices()[0]),
        "secs": dt,
    }
    (ROOT / "benchmarks").mkdir(exist_ok=True)
    (ROOT / "benchmarks" / "results.json").write_text(json.dumps(detail,
                                                                 indent=2))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
