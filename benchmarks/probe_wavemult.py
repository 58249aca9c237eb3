#!/usr/bin/env python
"""WaveMult on chip (round-3 VERDICT item 4): BCOO SpMV vs dense-masked
matmul vs the plain dense product, sizes 512/1024/2048, batched RHS.

The reference's headline claim for this module is *speed* — O(n) sparse-form
multiply vs O(n^2) dense (/root/reference/src/mod/wavemult/wavemult.jl:6-11).
This probe measures whether that asymptotic story survives on TPU, where
BCOO lowers to gather/scatter and the dense form rides the MXU.  Test matrix
is the Calderon-Zygmund-type kernel the BCR literature targets
(M[i,j] ~ 1/(i-j) off-diagonal), which sparsifies well in wavelet bases.

Writes benchmarks/probe_wavemult.json.
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

from waveletsext_tpu import wavemult as wm

B = int(os.environ.get("PROBE_B", "128"))
MIN_GAP_S = 3e-3


def slope_secs(fn, x, klo=4, khi=32, reps=3, args=()):
    # big operands (prebuilt forms) must flow through as jit ARGUMENTS:
    # closure constants are shipped inside the remote-compile payload and
    # a (2n, 2n) form at n >= 4096 exceeds its request-size limit
    @jax.jit
    def chain(a, k, *ops):
        out = jax.lax.fori_loop(0, k, lambda i, v: fn(v, *ops), a)
        return jnp.sum(out.astype(jnp.float32))
    def chainf(a, k):
        return chain(a, k, *args)
    float(chainf(x, jnp.int32(klo)))

    def t(k):
        kk = jnp.int32(k)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chainf(x, kk))
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


def cz_matrix(n: int) -> np.ndarray:
    idx = np.arange(n)
    d = idx[:, None] - idx[None, :]
    with np.errstate(divide="ignore"):
        M = np.where(d == 0, 0.0, 1.0 / np.where(d == 0, 1, d))
    return M.astype(np.float32)


def build_forms_cpu(n: int, tmpdir: str):
    """Build the operator forms for size n in a CPU-forced subprocess and
    return them (npz round trip).  The remote TPU compile tunnel rejects
    programs whose payload carries a big matrix (HTTP 413 at tens of MB,
    endpoint-dependent), and the builders are host-side preprocessing
    anyway."""
    import subprocess
    outp = os.path.join(tmpdir, f"forms_{n}.npz")
    if not os.path.exists(outp):
        code = f"""
import os, sys
os.environ["PALLAS_AXON_POOL_IPS"] = ""
sys.path.insert(0, {str(ROOT)!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from benchmarks.probe_wavemult import cz_matrix
from waveletsext_tpu import wavemult as wm
M = cz_matrix({n})
sp = wm.mat2sparseform_nonstd(M, "db4")
de = wm.mat2denseform_nonstd(M, "db4")
np.savez({outp!r}, data=np.asarray(sp.data), indices=np.asarray(sp.indices),
         shape=np.asarray(sp.shape), dense=np.asarray(de))
"""
        subprocess.run([sys.executable, "-c", code], check=True)
    z = np.load(outp)
    from jax.experimental import sparse as jsparse
    sp = jsparse.BCOO((jnp.asarray(z["data"]), jnp.asarray(z["indices"])),
                      shape=tuple(z["shape"]))
    return sp, jax.device_put(jnp.asarray(z["dense"]))


def main():
    out = {"device": str(jax.devices()[0]), "B": B, "rows": []}

    def row(name, secs, n, extra=None):
        # rate: matvecs per second (B RHS per application)
        mvps = B / secs
        out["rows"].append({"name": name, "n": n, "secs_per_app": secs,
                            "matvecs_per_s": round(mvps, 1), **(extra or {})})
        print(f"{name:28s} n={n:5d} {secs*1e3:9.3f} ms/app "
              f"{mvps:12.0f} matvec/s", flush=True)

    sizes = tuple(int(s) for s in os.environ.get(
        "PROBE_SIZES", "512,1024,2048").split(","))
    for n in sizes:
        M = cz_matrix(n)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
        Mj = jnp.asarray(M)

        # plain dense baseline: y = x @ M.T (one MXU matmul, no wavelets)
        row("dense_direct", slope_secs(
            lambda v, mj: jnp.matmul(v, mj.T), x, args=(Mj,)), n)

        if n >= 4096:
            # big matrices: build on CPU out-of-process (see build_forms_cpu)
            sp_ns, de_ns = build_forms_cpu(n, str(ROOT / "benchmarks"))
        else:
            sp_ns = wm.mat2sparseform_nonstd(M, "db4")
            de_ns = jax.device_put(jnp.asarray(wm.mat2denseform_nonstd(
                M, "db4")))
        nnz = int(sp_ns.nse)
        row("nonstd_bcoo", slope_secs(
            lambda v, sp: wm.nonstd_wavemult(sp, v, "db4"), x,
            args=(sp_ns,)), n, {"nnz": nnz, "fill": nnz / (4 * n * n)})
        row("nonstd_dense", slope_secs(
            lambda v, de: wm.nonstd_wavemult(de, v, "db4",
                                             form="prebuilt"), x,
            args=(de_ns,)), n, {"nnz": nnz})

        if n <= 4096:  # std forms at n >= 8k exceed useful probe budget
            sp_st = wm.mat2sparseform_std(M, "db4")
            de_st = wm.mat2denseform_std(M, "db4")
            nnz_st = int(sp_st.nse)
            row("std_bcoo", slope_secs(
                lambda v, sp: wm.std_wavemult(sp, v, "db4"), x,
                args=(sp_st,)), n, {"nnz": nnz_st, "fill": nnz_st / (n * n)})
            row("std_dense", slope_secs(
                lambda v, de: wm.std_wavemult(de, v, "db4",
                                              form="prebuilt"), x,
                args=(jax.device_put(jnp.asarray(de_st)),)), n,
                {"nnz": nnz_st})

    (ROOT / "benchmarks" / "probe_wavemult.json").write_text(
        json.dumps(out, indent=2))
    print("wrote benchmarks/probe_wavemult.json")


if __name__ == "__main__":
    main()
