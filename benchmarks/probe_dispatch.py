#!/usr/bin/env python
"""Probe: does the public dispatch deliver the Pallas relaxed-precision
throughput?  Compares public wpt/wpt2 vs direct kernel calls at HIGHEST and
DEFAULT dot precision (slope-timed; see run_all.py)."""

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
from waveletsext_tpu.kernels.pallas_wpt import wpt_pallas
from waveletsext_tpu.kernels.pallas_wpt2 import wpt2_pallas


def slope_time(fn, x, klo, khi, reps=3):
    @jax.jit
    def chain(a, k):
        out = jax.lax.fori_loop(0, k, lambda i, v: fn(v), a)
        return jnp.sum(jax.tree_util.tree_leaves(out)[0])
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
    return max((t(khi) - t(klo)) / (khi - klo), 1e-9)


def report(name, secs, samples):
    print(f"{name:42s} {secs*1e3:8.3f} ms  {samples/secs/1e6:10.1f} Msps",
          flush=True)


rng = np.random.default_rng(0)
print("device:", jax.devices()[0])

# ---- 1-D north star config ----
B, n, L = 1024, 4096, 8
x = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
H, D = jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT

report("wpt_pallas direct HIGHEST",
       slope_time(lambda a: wpt_pallas(a, "db4", L, 128, precision=H),
                  x, 8, 128), B * n)
report("wpt_pallas direct DEFAULT",
       slope_time(lambda a: wpt_pallas(a, "db4", L, 128, precision=D),
                  x, 8, 128), B * n)
wx.set_matmul_precision("highest")
report("public wpt HIGHEST",
       slope_time(lambda a: wx.wpt(a, "db4", L), x, 8, 128), B * n)
try:
    wx.set_matmul_precision("default")
    report("public wpt DEFAULT",
           slope_time(lambda a: wx.wpt(a, "db4", L), x, 8, 128), B * n)
finally:
    wx.set_matmul_precision("highest")

# ---- 2-D c4 config ----
B4, n4, L4 = 16, 512, 4
x4 = jnp.asarray(rng.standard_normal((B4, n4, n4)).astype(np.float32))
report("wpt2_pallas direct HIGHEST",
       slope_time(lambda a: wpt2_pallas(a, "db4", L4, precision=H),
                  x4, 4, 32), B4 * n4 * n4)
report("wpt2_pallas direct DEFAULT",
       slope_time(lambda a: wpt2_pallas(a, "db4", L4, precision=D),
                  x4, 4, 32), B4 * n4 * n4)
report("public wpt2 HIGHEST",
       slope_time(lambda a: wx.wpt2(a, "db4", L4), x4, 4, 32), B4 * n4 * n4)
try:
    wx.set_matmul_precision("default")
    report("public wpt2 DEFAULT",
           slope_time(lambda a: wx.wpt2(a, "db4", L4), x4, 4, 32),
           B4 * n4 * n4)
finally:
    wx.set_matmul_precision("highest")
