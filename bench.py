#!/usr/bin/env python
"""Benchmark harness — north-star metric: WPT Msamples/s/chip (L=8, db4).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` compares against the measured serial-CPU reference point
(native/wpt_baseline.cpp — the reference package publishes no numbers and
Julia is unavailable, see BASELINE.md).  The CPU number is measured once and
cached in benchmarks/cpu_baseline.json (committed).

Driver-budget design (round-1 run timed out at compile):
  * ONE compiled program — k is a *traced* fori_loop bound, so timing k_lo
    and k_hi reuses the same executable (round 1 compiled two programs).
  * The persistent compilation cache (.jax_cache/) is committed, so a fresh
    checkout hits warm cache instead of recompiling through the remote
    compile service (which can take minutes cold).
  * Progress lines go to stderr immediately so a timeout tail is diagnosable.

Timing method (see CLAUDE.md): block_until_ready can return before remote
completion and host fetches are slow through the tunnel, so chain k transform
applications inside one jitted fori_loop (wpt is shape-preserving), return a
scalar, force completion by fetching it, and use the slope between two k
values to cancel constant dispatch + transfer overhead.
"""

import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent


def log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


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
    base = cpu_baseline_msps()  # cached file read; no JAX needed
    log("importing jax")
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from waveletsext_tpu.transforms.dwt import wpt

    B = int(os.environ.get("BENCH_B", "1024"))
    n = int(os.environ.get("BENCH_N", "4096"))
    L = 8
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))

    @jax.jit
    def chain(a, k):  # k traced -> ONE executable for every k
        out = jax.lax.fori_loop(0, k, lambda i, v: wpt(v, "db4", L), a)
        return jnp.sum(out[0])

    log(f"device={jax.devices()[0]}; compiling chain (B={B}, n={n}, L={L})")
    t0 = time.perf_counter()
    float(chain(x, jnp.int32(1)))  # compile + warm (single program)
    log(f"compiled+warm in {time.perf_counter() - t0:.1f}s")

    k_lo, k_hi = max(2, iters // 4), iters

    def timed(k, reps=3):
        kk = jnp.int32(k)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(x, kk))
            best = min(best, time.perf_counter() - t0)
        return best

    timed(k_lo, reps=1)  # warm the k_lo dispatch path
    prof_dir = os.environ.get("BENCH_PROFILE")
    if prof_dir:  # capture one profiled application (jax.profiler trace)
        from waveletsext_tpu.observability import profile_trace
        with profile_trace(prof_dir):
            float(chain(x, jnp.int32(1)))
        log(f"profiler trace written to {prof_dir}")
    # Sanity guard (round-2 advisor finding): a slope measured from a
    # t_hi - t_lo gap below the ~1 ms tunnel timer noise floor can produce
    # arbitrary outliers (a 97 Gsps artifact was once committed as the
    # headline).  Escalate k_hi until the gap clears a few ms.
    # NB: (t_hi, k_hi) must stay a consistent pair — escalate at the TOP of
    # each retry so the returned slope never divides a measured gap by a
    # k_hi it never ran at (round-3 advisor finding).
    MIN_GAP_S = 3e-3
    for attempt in range(5):
        if attempt:
            log(f"slope gap below {MIN_GAP_S*1e3:.0f} ms noise floor; "
                f"doubling k_hi -> {k_hi * 2} (attempt {attempt})")
            k_hi *= 2
            timed(k_hi, reps=1)  # warm the new dispatch path
        t_lo, t_hi = timed(k_lo), timed(k_hi)
        if t_hi - t_lo >= MIN_GAP_S:
            break
    dt = (t_hi - t_lo) / (k_hi - k_lo)  # secs per wpt application
    msps = B * n / dt / 1e6
    log(f"t_lo={t_lo:.4f}s t_hi={t_hi:.4f}s -> {msps:.0f} Msps")

    rec = {
        "metric": "wpt_msamples_per_s_per_chip",
        "value": round(msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / base, 2),
    }
    detail = {
        **rec,
        "config": {"B": B, "n": n, "L": L, "wavelet": "db4",
                   "dtype": "float32", "iters": k_hi},
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
