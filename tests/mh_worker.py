"""Worker program for the 2-process localhost multi-host test.

Run as:  python tests/mh_worker.py <process_id> <num_processes> <port>

Every process: joins the distributed runtime (gloo CPU collectives, 2 local
CPU devices each), builds a process-spanning (dp, sp) mesh, shards in its
local batch chunk, runs the fused sharded JBB best-basis step, and checks
the resulting tree + aggregated threshold against a locally recomputed
single-process reference (the full batch is derived from a shared seed, so
every rank can rebuild it).  Prints ``MH_OK`` on success.
"""

import os
import sys

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from waveletsext_tpu.parallel import multihost

assert multihost.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                            process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 2 * nproc

import numpy as np
import jax.numpy as jnp
import waveletsext_tpu as wx
from waveletsext_tpu.parallel.sharding import bestbasis_pipeline_sharded

B, n, L = 16, 64, 4
rng = np.random.default_rng(0)
X_full = rng.standard_normal((B, n)).astype(np.float64)
Bl = B // nproc
x_local = X_full[pid * Bl: (pid + 1) * Bl]

mesh = multihost.global_mesh(n_dp=2 * nproc, n_sp=1)
xg = multihost.host_local_batch(x_local, mesh)
assert xg.shape == (B, n)

tree_dev, coefs = bestbasis_pipeline_sharded(xg, "db4", L, mesh)
tree = multihost.fetch_replicated(tree_dev, mesh).astype(bool)
coefs_np = multihost.fetch_replicated(coefs, mesh)

# single-process reference, recomputed locally from the shared seed
ref_tree = wx.bestbasistree(wx.wpd(jnp.asarray(X_full), "db4", L), wx.JBB())
assert np.array_equal(tree, np.asarray(ref_tree)), (tree, ref_tree)
ref_coefs = np.asarray(wx.getbasiscoefall(
    wx.wpd(jnp.asarray(X_full), "db4", L), ref_tree))
assert np.allclose(coefs_np, ref_coefs, atol=1e-10)

# cross-host bestTH aggregation (Denoising.jl:684-703 semantics)
from waveletsext_tpu import denoising as dn
sigma = dn.noisest(jnp.asarray(coefs_np), False, None)
agg = float(multihost.aggregate_threshold(sigma, "mean"))
assert np.isclose(agg, float(np.mean(np.asarray(sigma))))

print(f"MH_OK rank={pid} procs={jax.process_count()} "
      f"devices={jax.device_count()}", flush=True)
