"""Multi-host runtime: process initialization, process-spanning meshes, and
cross-host data/result plumbing.

The reference has no distributed runtime of any kind (SURVEY.md §5:
"Distributed communication backend — absent"); this is the jax.distributed +
GSPMD design SURVEY §5 calls for.  The model: every host runs the SAME
program; ``initialize()`` wires the processes into one JAX runtime; meshes
are built over the *global* device list so pjit'd pipelines partition across
hosts automatically (ICI within a slice, DCN across hosts — DCN only carries
the tiny JBB/LSDB moment reductions and threshold aggregates, bytes not
bandwidth).

Verified by a real 2-process localhost CPU run (gloo collectives) in
tests/test_multihost.py: a process-spanning (dp, sp) mesh computes the same
JBB best-basis tree as a single process.

Launch recipe (N hosts):
    # on every host, same program:
    from waveletsext_tpu.parallel import multihost
    multihost.initialize(coordinator_address="host0:9876",
                         num_processes=N, process_id=<rank>)
    mesh = multihost.global_mesh(n_dp=...)          # spans all hosts
    x = multihost.host_local_batch(x_local, mesh)   # shard local data in
    tree, coefs = bestbasis_pipeline_sharded(x, "db4", L, mesh)
    tree_np = multihost.fetch_replicated(tree)      # same on every host
On TPU pods, ``initialize()`` with no arguments auto-detects the coordinator
from the TPU environment (jax.distributed's built-in cluster detection).
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> bool:
    """Idempotent ``jax.distributed.initialize`` wrapper.

    Arguments fall back to the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``); with nothing set and no TPU
    cluster environment this is a single-process no-op (returns False).
    Returns True when a multi-process runtime is (or already was) live.
    """
    global _initialized
    if _initialized:
        return True
    # NOTE: must not touch jax.devices()/process_count() here — any backend
    # query initializes XLA and makes jax.distributed.initialize illegal.
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # TPU-pod auto-detection path: initialize() with no args works when
        # the TPU runtime env provides cluster metadata; otherwise stay
        # single-process.
        try:
            jax.distributed.initialize()
            _initialized = True
        except Exception:
            return False
        return True
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    _initialized = True
    return True


def global_mesh(n_dp: int | None = None, n_sp: int = 1) -> Mesh:
    """(dp, sp) mesh over the GLOBAL device list (all processes).

    Default dp = total_devices / n_sp.  dp is laid out so that the devices of
    one process are contiguous along dp — batch shards stay host-local and
    the cross-host traffic is only the moment/threshold reductions.
    """
    devs = np.asarray(jax.devices())
    if n_dp is None:
        n_dp = devs.size // n_sp
    assert n_dp * n_sp <= devs.size, (n_dp, n_sp, devs.size)
    grid = devs[: n_dp * n_sp].reshape(n_dp, n_sp)
    return Mesh(grid, ("dp", "sp"))


def host_local_batch(x_local, mesh: Mesh, spec: P | None = None):
    """Assemble a global batch-sharded array from per-process local batches.

    ``x_local`` is this process's ``(B_local, ...)`` chunk; the result is the
    global ``(B_local * num_processes, ...)`` array sharded over ``dp``.
    """
    x_local = np.asarray(x_local)
    spec = spec if spec is not None else P("dp", *([None] * (x_local.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    global_shape = (x_local.shape[0] * jax.process_count(),) + x_local.shape[1:]
    return jax.make_array_from_process_local_data(sharding, x_local,
                                                  global_shape)


def fetch_replicated(x, mesh: Mesh | None = None) -> np.ndarray:
    """Fetch a (possibly sharded) device result as one identical numpy array
    on every process — the "all_gather of the tiny tree/threshold results"
    of SURVEY §5.  A non-replicated global array needs ``mesh`` to insert
    the all-gather (one jitted identity with replicated out_sharding)."""
    replicated = getattr(x, "is_fully_replicated", True)
    if jax.process_count() == 1 or replicated:
        return np.asarray(x)
    assert mesh is not None, "mesh required to replicate a sharded result"
    y = jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))(x)
    return np.asarray(y)


def aggregate_threshold(sigma, how: str = "mean"):
    """Cross-shard ``bestTH`` aggregation (Denoising.jl:684-703): per-signal
    sigmas live batch-sharded across processes; the mean/median reduces over
    the GLOBAL batch (XLA inserts the cross-host collective under jit)."""
    import jax.numpy as jnp
    agg = jnp.mean if how == "mean" else jnp.median
    return jax.jit(agg)(sigma)
