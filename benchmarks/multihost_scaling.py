#!/usr/bin/env python
"""Measured multi-process weak scaling (CPU, gloo) for the fused JBB step.

The TPU multi-chip numbers in scaling.py are roofline-model-derived (one
real chip available); this harness measures the REAL multi-process runtime:
it runs the fused sharded JBB best-basis step at a fixed per-process batch
on 1 and 2 processes (localhost, jax.distributed + gloo CPU collectives,
2 devices per process).  Both "hosts" share ONE physical CPU, so the ideal
2-process wall time is 2x the 1-process time; the reported figure is the
runtime overhead beyond that shared-hardware ideal:

    overhead = t_2proc / (2 * t_1proc)      (1.0 = collectives free)

Real cross-host scaling needs real multi-host TPU hardware; this harness
validates the full distributed path (init, process-spanning mesh, psum'd
moments over gloo) and bounds its plumbing cost.

Usage:
    python benchmarks/multihost_scaling.py            # orchestrator
    (spawns itself with --worker <pid> <nproc> <port>)

Writes benchmarks/multihost_scaling.json.
"""

import json
import pathlib
import socket
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]


def worker(pid: int, nproc: int, port: int):
    import os
    os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
    sys.path.insert(0, str(ROOT))
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    if nproc > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        from waveletsext_tpu.parallel import multihost
        assert multihost.initialize(f"127.0.0.1:{port}",
                                    num_processes=nproc, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from waveletsext_tpu.parallel import multihost
    from waveletsext_tpu.parallel.sharding import bestbasis_pipeline_sharded

    B_per_dev, n, L = 512, 4096, 8
    mesh = multihost.global_mesh()  # all devices, dp only
    n_dev = jax.device_count()
    rng = np.random.default_rng(pid)
    x_local = rng.standard_normal(
        (B_per_dev * jax.local_device_count(), n)).astype(np.float32)
    xg = multihost.host_local_batch(x_local, mesh)

    def step():
        tree, coefs = bestbasis_pipeline_sharded(xg, "db4", L, mesh)
        coefs.block_until_ready()

    step()  # compile
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        step()
    dt = (time.perf_counter() - t0) / reps

    # explicit CP ring (shard_map ppermute halo exchange) across the same
    # process-spanning device set: fixed per-device columns, measured the
    # same way (round-5 VERDICT item 4)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from waveletsext_tpu.parallel import cp
    n_cp = 1024 * n_dev
    spmesh = Mesh(np.asarray(jax.devices()).reshape(1, n_dev), ("dp", "sp"))
    cols = n_cp // nproc
    x_local_cp = np.random.default_rng(pid + 10).standard_normal(
        (8, cols)).astype(np.float32)
    x_cp = jax.make_array_from_process_local_data(
        NamedSharding(spmesh, P(None, "sp")), x_local_cp, (8, n_cp))

    def step_cp():
        cp.wpd_cp(x_cp, "db4", 6, spmesh).block_until_ready()

    step_cp()
    t0 = time.perf_counter()
    for _ in range(reps):
        step_cp()
    dt_cp = (time.perf_counter() - t0) / reps
    if pid == 0:
        print(json.dumps({"nproc": nproc, "n_dev": n_dev,
                          "secs_per_step": dt,
                          "msps": B_per_dev * n_dev * n / dt / 1e6,
                          "cp_ring_secs_per_step": dt_cp,
                          "cp_ring_msps": 8 * n_cp / dt_cp / 1e6}),
              flush=True)


def orchestrate():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    results = {}
    for nproc in (1, 2):
        procs = [subprocess.Popen(
            [sys.executable, __file__, "--worker", str(pid), str(nproc),
             str(port + nproc)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
            for pid in range(nproc)]
        outs = [p.communicate(timeout=600)[0] for p in procs]
        assert all(p.returncode == 0 for p in procs), outs
        # rank 0 prints the record; gloo chatter may share the stream
        lines = [ln for o in outs for ln in o.splitlines()
                 if ln.startswith("{")]
        rec = json.loads(lines[-1])
        results[f"{nproc}proc"] = rec
        print(f"{nproc} proc x 2 dev: {rec['secs_per_step']*1e3:.1f} ms/step "
              f"{rec['msps']:.0f} Msps", flush=True)
    t1 = results["1proc"]["secs_per_step"]
    t2 = results["2proc"]["secs_per_step"]
    # Both "hosts" share one physical CPU, so doubling total work should
    # double wall time: the honest figure is the distributed-runtime
    # overhead beyond that shared-hardware ideal (1.0 = collectives free).
    results["runtime_overhead_vs_shared_cpu_ideal"] = round(t2 / (2 * t1), 3)
    results["naive_weak_scaling_efficiency"] = round(t1 / t2, 3)
    tc1 = results["1proc"]["cp_ring_secs_per_step"]
    tc2 = results["2proc"]["cp_ring_secs_per_step"]
    results["cp_ring_overhead_vs_shared_cpu_ideal"] = round(tc2 / (2 * tc1),
                                                            3)
    results["caveat"] = (
        "Both processes share ONE physical CPU (localhost gloo): the ideal "
        "2-process wall time is 2x the 1-process time, so "
        "naive_weak_scaling_efficiency ~0.5 is EXPECTED here; the honest "
        "figures are the *_overhead_vs_shared_cpu_ideal rows (1.0 = the "
        "distributed runtime and collectives add nothing beyond sharing "
        "the CPU). Real cross-host scaling needs real multi-host hardware.")
    print(f"t(2proc) / 2*t(1proc) = {t2/(2*t1):.3f}  "
          f"(<= 1.0 means the distributed runtime + gloo collectives add no "
          f"overhead beyond sharing the CPU)")
    out = pathlib.Path(__file__).parent / "multihost_scaling.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    else:
        orchestrate()
