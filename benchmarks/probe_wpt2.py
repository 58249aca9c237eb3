#!/usr/bin/env python
"""On-chip probe for the fused 2-D WPT path (c4 config, 512x512 db4 L=4).

Measures, via the slope-timed traced-k chain (see bench.py):
  * the XLA composed path (the round-2 c4 implementation) at HIGHEST and
    DEFAULT dot precision;
  * the fused Pallas kernel at several in-kernel cutoffs x precisions;
and the accuracy of every mode against an exact float64 composed-operator
reference (the 2-D WPT is separable: ref = An^T X An with the f64 numpy
composed operator from kernels/operators.py).

Merges a "wpt2d" section into benchmarks/precision_ladder.json and writes
the full sweep to benchmarks/probe_wpt2.json.
"""

import json
import os
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from waveletsext_tpu.filters import wavelet
from waveletsext_tpu.kernels import operators as ops
from waveletsext_tpu.kernels.pallas_wpt2 import wpt2_pallas

B = int(os.environ.get("PROBE_B", "32"))
N = int(os.environ.get("PROBE_N", "512"))
L = int(os.environ.get("PROBE_L", "4"))
KLO, KHI = 4, 32
MIN_GAP_S = 3e-3


def log(msg):
    print(f"[probe2 {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def slope_secs(fn, x, reps=3):
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
    for _ in range(4):
        tlo, thi = t(KLO), t(khi)
        if thi - tlo >= MIN_GAP_S:
            break
        khi *= 2
        t(khi)
    return max((thi - tlo) / (khi - KLO), 1e-9)


def main():
    rng = np.random.default_rng(0)
    x64 = rng.standard_normal((B, N, N))
    w = wavelet("db4")
    tk = ops.taps_key(w.lo, w.hi)
    An = ops.composed_analysis_operator(tk, N, L)  # f64 numpy
    ref = np.einsum("un,bnm,mv->buv", An.T, x64, An, optimize=True)
    rms = float(np.sqrt(np.mean(ref ** 2)))
    x32 = jnp.asarray(x64.astype(np.float32))

    from waveletsext_tpu.transforms import dwt as dwt_mod
    results = {}

    def measure(name, fn):
        y = np.asarray(fn(x32), dtype=np.float64)
        err = np.abs(y - ref)
        rel_rms = float(np.sqrt(np.mean(err ** 2)) / rms)
        rel_max = float(err.max() / rms)
        dt = slope_secs(fn, x32)
        msps = B * N * N / dt / 1e6
        results[name] = {"msamples_per_s": round(msps, 1),
                         "secs_per_app": dt,
                         "rel_rms_err": rel_rms, "rel_max_err": rel_max}
        log(f"{name:28s} {msps:10.0f} Msps  rel_rms={rel_rms:.2e} "
            f"rel_max={rel_max:.2e}")

    HI, DEF = jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT

    # XLA composed baseline (dispatch bypassed via env flag; flag is read at
    # trace time, each chain traces exactly once here)
    os.environ["WAVELETSEXT_TPU_NO_PALLAS"] = "1"
    from waveletsext_tpu.kernels import conv
    for pname, prec in (("highest", HI), ("default", DEF)):
        conv.set_matmul_precision(prec)
        try:
            measure(f"xla_composed_{pname}",
                    lambda v: dwt_mod.wpt2(v, "db4", L))
        finally:
            conv.set_matmul_precision(HI)
    del os.environ["WAVELETSEXT_TPU_NO_PALLAS"]

    for cutoff in (512, 256, 128, 64):
        measure(f"pallas_c{cutoff}_highest",
                lambda v, c=cutoff: wpt2_pallas(v, "db4", L, precision=HI,
                                                in_cutoff=c))
    for cutoff in (512, 256, 128):
        measure(f"pallas_c{cutoff}_default",
                lambda v, c=cutoff: wpt2_pallas(v, "db4", L, precision=DEF,
                                                in_cutoff=c))

    out = {"config": {"B": B, "n": N, "L": L, "wavelet": "db4"},
           "device": str(jax.devices()[0]), "results": results}
    (ROOT / "benchmarks" / "probe_wpt2.json").write_text(
        json.dumps(out, indent=2))

    # merge the headline modes into the precision ladder artifact
    ladder_p = ROOT / "benchmarks" / "precision_ladder.json"
    ladder = json.loads(ladder_p.read_text()) if ladder_p.exists() else {}
    best_hi = max((k for k in results if k.endswith("_highest")),
                  key=lambda k: results[k]["msamples_per_s"])
    best_def = max((k for k in results if k.endswith("_default")
                    and k.startswith("pallas")),
                   key=lambda k: results[k]["msamples_per_s"])
    ladder["wpt2d"] = {
        "config": out["config"],
        "xla_composed_highest": results["xla_composed_highest"],
        "xla_composed_default": results["xla_composed_default"],
        "best_highest": {"mode": best_hi, **results[best_hi]},
        "best_default": {"mode": best_def, **results[best_def]},
    }
    ladder_p.write_text(json.dumps(ladder, indent=2))
    log(f"wrote {ladder_p} and probe_wpt2.json")


if __name__ == "__main__":
    main()
