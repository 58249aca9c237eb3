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
jax.config.update("jax_enable_x64", True)  # f64 parity asserts below

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

# --- explicit CP ring across REAL processes (round-5 VERDICT item 4) ------
# shard_map ppermute halo exchange + coset all_to_all running over a
# process-spanning sp mesh on gloo — the one multi-chip collective class
# the single-process virtual mesh could not retire.
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from waveletsext_tpu.parallel import cp

S = jax.device_count()
ncp, Lcp = 64 * S, 4
spmesh = Mesh(np.asarray(jax.devices()).reshape(1, S), ("dp", "sp"))
Xcp_full = np.random.default_rng(7).standard_normal((2, ncp)).astype(
    np.float64)
cols = ncp // nproc
x_cp = jax.make_array_from_process_local_data(
    NamedSharding(spmesh, P(None, "sp")),
    Xcp_full[:, pid * cols:(pid + 1) * cols], (2, ncp))

xw_cp = cp.wpd_cp(x_cp, "db4", Lcp, spmesh)
ref_wpd = np.asarray(wx.wpd(jnp.asarray(Xcp_full), "db4", Lcp))
got_wpd = multihost.fetch_replicated(xw_cp, spmesh)
assert np.allclose(got_wpd, ref_wpd, atol=1e-10), "wpd_cp cross-process"

y_cp = cp.wpt_cp(x_cp, "db4", Lcp, spmesh)
r_cp = cp.iwpt_cp(y_cp, "db4", Lcp, spmesh)
assert np.allclose(multihost.fetch_replicated(r_cp, spmesh), Xcp_full,
                   atol=1e-10), "wpt_cp->iwpt_cp cross-process round trip"

den_cp = cp.swt_denoise_cp(x_cp, "db4", Lcp, 0.5, spmesh, soft=True)
xw_ref = wx.sdwt(jnp.asarray(Xcp_full), "db4", Lcp)
ref_den = np.asarray(wx.isdwt(
    jnp.sign(xw_ref) * jnp.maximum(jnp.abs(xw_ref) - 0.5, 0.0), "db4"))
got_den = multihost.fetch_replicated(den_cp, spmesh)
assert np.allclose(got_den, ref_den, atol=1e-10), "swt_denoise_cp"

print(f"MH_CP_OK rank={pid} ring={S}", flush=True)
