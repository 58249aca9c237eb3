"""Multi-chip scaling-efficiency benchmark on a virtual device mesh.

The reference has no parallelism of any kind (SURVEY.md §2/§5), so there is
no number to beat — this benchmark validates the *new* sharded design against
the BASELINE.json north-star target (>= 80% scaling efficiency at 2 hosts).

Only one physical TPU chip is reachable here, so wall-clock multi-chip timing
is impossible (and an 8-virtual-device CPU mesh on a 2-core host measures the
host, not the design).  Instead this is a *compiled-program* analysis, which
is exact about the two things that determine scaling:

  1. per-device work  — GSPMD emits the per-device program; its cost_analysis
     flops / bytes-accessed ARE the per-shard compute volume;
  2. communication    — every collective the partitioner inserted is read out
     of the optimized HLO with its operand shape.

These feed a v5e roofline model (HBM 819 GB/s, fp32-via-MXU ~49 TFLOP/s, ICI
2x~45 GB/s usable per axis on the 2-D torus; ring factors 2(N-1)/N for
all-reduce, (N-1)/N for all-gather/reduce-scatter, 1 for permute).  Weak
scaling: per-device batch is held fixed while the mesh grows, mirroring how a
multi-host denoising/best-basis job would actually be laid out.

Efficiency(N) = T_compute / (T_compute + T_collectives).

Usage: python benchmarks/scaling.py   (standalone: forces an 8-device CPU
mesh before importing jax; writes benchmarks/scaling.json)
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import json
import re

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from waveletsext_tpu.parallel.sharding import (  # noqa: E402
    make_mesh, shard_batch, jbb_pipeline_sharded, denoise_step_sharded)
from waveletsext_tpu.parallel import cp  # noqa: E402

# v5e per-chip model (How to Scale Your Model / public v5e specs)
HBM_BPS = 8.19e11           # bytes/s
F32_FLOPS = 4.9e13          # MXU fp32-accurate (6-pass bf16) effective
ICI_BPS = 9.0e10            # usable bytes/s per device for one mesh axis

_COLL_OP = re.compile(
    r"=\s*(.+?)\s+"
    r"(all-reduce|all-gather|collective-permute|all-to-all|reduce-scatter)"
    r"(?:-start)?\(")
_SHAPE = re.compile(r"\b(f32|f64|bf16|f16|s32|u32|s64|pred)\[([\d,]*)\]")

_DTYPE_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s64": 8, "pred": 1}


def _result_bytes(result_type: str) -> int:
    """Total bytes of an HLO result type — a single shape or a tuple."""
    total = 0
    for dt, dims in _SHAPE.findall(result_type):
        size = (int(np.prod([int(d) for d in dims.split(",")]))
                if dims else 1)
        total += size * _DTYPE_BYTES[dt]
    return total


def collective_bytes(hlo_text: str, n_dev: int) -> dict:
    """Per-device bytes moved over ICI, by collective kind, with ring
    factors applied.  Handles tuple-typed and async (-start) collectives."""
    out = {}
    for line in hlo_text.splitlines():
        m = _COLL_OP.search(line)
        if not m:
            continue
        kind = m.group(2)
        nbytes = _result_bytes(m.group(1))
        if kind == "all-reduce":
            moved = 2 * (n_dev - 1) / n_dev * nbytes
        elif kind in ("all-gather", "reduce-scatter", "all-to-all"):
            moved = (n_dev - 1) / n_dev * nbytes
        else:  # collective-permute: one neighbor hop
            moved = nbytes
        out[kind] = out.get(kind, 0.0) + moved
    return out


def analyze(n_dp: int, n_sp: int, per_dev_batch: int, n: int, L: int,
            pipeline: str):
    n_dev = n_dp * n_sp
    if pipeline == "cp_denoise":
        # explicit-ring sequence parallelism: weak scaling along the SIGNAL
        # axis (per-device position chunk of length n held fixed), fused
        # fwd -> threshold -> adjoint average inverse round trip
        # (cp.swt_denoise_cp)
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        devs = np.asarray(jax.devices()[:n_dev]).reshape(1, n_dev)
        mesh = Mesh(devs, ("dp", "sp"))
        nn = n * n_dev
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((per_dev_batch, nn))
                        .astype(np.float32))
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "sp")))
        lowered = cp.swt_denoise_cp.lower(xs, "db4", L, 0.5, mesh)
        comp = lowered.compile()
        ca = comp.cost_analysis()
        flops = float(ca.get("flops", 0.0))
        hbm = float(ca.get("bytes accessed", 0.0))
        colls = collective_bytes(comp.as_text(), n_dev)
        t_comp = max(flops / F32_FLOPS, hbm / HBM_BPS)
        t_coll = sum(colls.values()) / ICI_BPS
        r = cp.swt_denoise_cp(xs, "db4", L, 0.5, mesh)
        jax.block_until_ready(r)
        return {
            "mesh": f"sp{n_dev}", "devices": n_dev,
            "B": per_dev_batch, "n": nn,
            "per_device_flops": flops, "per_device_hbm_bytes": hbm,
            "collective_bytes": colls,
            "t_compute_us": t_comp * 1e6, "t_collective_us": t_coll * 1e6,
            "efficiency": t_comp / (t_comp + t_coll) if t_comp else 0.0,
        }
    mesh = make_mesh(n_dp, n_sp)
    B = per_dev_batch * n_dp
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((B, n)).astype(np.float32))
    xs = shard_batch(x, mesh)
    if pipeline == "jbb":
        lowered = jbb_pipeline_sharded.lower(xs, "db4", L, mesh)
    else:
        lowered = denoise_step_sharded.lower(xs, 0.5, "db4", L, mesh)
    comp = lowered.compile()
    ca = comp.cost_analysis()
    flops = float(ca.get("flops", 0.0))
    hbm = float(ca.get("bytes accessed", 0.0))
    colls = collective_bytes(comp.as_text(), n_dev)
    t_comp = max(flops / F32_FLOPS, hbm / HBM_BPS)
    t_coll = sum(colls.values()) / ICI_BPS
    # smoke-execute one step on the virtual mesh so the analysis can never
    # drift from a program that doesn't actually run
    if pipeline == "jbb":
        r = jbb_pipeline_sharded(xs, "db4", L, mesh)
        jax.block_until_ready(r)
    else:
        r = denoise_step_sharded(xs, 0.5, "db4", L, mesh)
        jax.block_until_ready(r)
    return {
        "mesh": f"dp{n_dp}xsp{n_sp}", "devices": n_dev, "B": B, "n": n,
        "per_device_flops": flops, "per_device_hbm_bytes": hbm,
        "collective_bytes": colls,
        "t_compute_us": t_comp * 1e6, "t_collective_us": t_coll * 1e6,
        "efficiency": t_comp / (t_comp + t_coll) if t_comp else 0.0,
    }


def main():
    per_dev_batch, n, L = 256, 4096, 8
    rows = []
    for pipeline in ("jbb", "denoise", "cp_denoise"):
        meshes = ((1, 1), (2, 1), (4, 1), (8, 1), (4, 2))
        if pipeline == "cp_denoise":
            meshes = ((2, 1), (4, 1), (8, 1))  # ring sizes; B=8 per device
        for n_dp, n_sp in meshes:
            pdb = 8 if pipeline == "cp_denoise" else per_dev_batch
            r = analyze(n_dp, n_sp, pdb, n, L, pipeline)
            r["pipeline"] = pipeline
            rows.append(r)
            coll = ", ".join(f"{k}={v/1e6:.2f}MB"
                             for k, v in r["collective_bytes"].items()) or "-"
            print(f"{pipeline:8s} {r['mesh']:8s} eff={r['efficiency']:.3f} "
                  f"comp={r['t_compute_us']:.0f}us coll={r['t_collective_us']:.0f}us "
                  f"[{coll}]")
    out = os.path.join(os.path.dirname(__file__), "scaling.json")
    with open(out, "w") as f:
        json.dump({"model": {"hbm_Bps": HBM_BPS, "f32_flops": F32_FLOPS,
                             "ici_Bps": ICI_BPS},
                   "weak_scaling": rows}, f, indent=1)
    print("wrote", out)
    worst2 = min(r["efficiency"] for r in rows if r["devices"] == 2)
    print(f"north-star gate (>=0.80 @ 2 devices): "
          f"{'PASS' if worst2 >= 0.80 else 'FAIL'} ({worst2:.3f})")


if __name__ == "__main__":
    main()
