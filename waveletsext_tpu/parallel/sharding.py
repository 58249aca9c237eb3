"""Mesh construction and sharded pipelines.

The reference is single-threaded (SURVEY.md §2/§5: no parallelism of any
kind); this module is new TPU-native design.  Parallel axes used:

* ``dp`` — data parallelism over the signal batch: embarrassingly parallel
  transforms; JBB/LSDB cost moments need one ``psum`` across the batch shards
  (the reference's serial batch loops are dwt_all.jl:48-52 and the JBB moment
  accumulation bestbasis_tree.jl:153-158).
* ``sp`` — signal/sequence parallelism over the position axis for long
  signals, via GSPMD sharding constraints (XLA inserts halo exchanges /
  collective permutes for the shifted slices of the periodic conv) and, for
  deep packet levels, the packed layout naturally re-shards position->subband
  (see parallel/cp.py for the explicit shard_map ring path).

tp/pp/ep have no counterpart in this workload (documented N/A in SURVEY §2.2):
there are no weight matrices to shard (tp), levels are cheap and sequential
(pp), and there is no conditional expert routing (ep).  Scaling dimensions are
batch (dp) and position (sp).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..filters import wavelet as _wavelet
from ..transforms.dwt import wpd, iwpd
from ..basis import JBB, LoglpCost


def make_mesh(n_dp: int, n_sp: int = 1, devices=None) -> Mesh:
    """Build a (dp, sp) device mesh (dp innermost on the ICI ring so batch
    all-reduces ride neighbor links)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_dp * n_sp, (devices.size, n_dp, n_sp)
    grid = devices[: n_dp * n_sp].reshape(n_dp, n_sp)
    return Mesh(grid, ("dp", "sp"))


def shard_batch(x, mesh: Mesh):
    """Place ``(B, ...)`` with batch on dp and trailing (signal) axis on sp."""
    spec = P("dp", *([None] * (x.ndim - 2)), "sp")
    return jax.device_put(x, NamedSharding(mesh, spec))


@functools.partial(jax.jit, static_argnames=("wt", "L", "mesh", "p"))
def jbb_pipeline_sharded(x, wt: str, L: int, mesh: Mesh, p: float = 2.0):
    """Batch WPD + JBB cost moments over a (dp, sp) mesh.

    The wpd program is GSPMD-partitioned: batch over dp, signal axis over sp
    (XLA inserts the periodic-slice halo collectives).  The JBB moments
    E[X], E[X^2] reduce over the batch axis — a cross-dp psum inserted by XLA
    from the sharded mean.  Returns (wpd_stack, sigma) with sigma replicated
    enough for the host-side tree selection.
    """
    x = jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("dp", "sp")))
    xw = wpd(x, wt, L)
    xw = jax.lax.with_sharding_constraint(
        xw, NamedSharding(mesh, P("dp", None, "sp")))
    ex = jnp.mean(xw, axis=0)
    ex2 = jnp.mean(xw ** 2, axis=0)
    sigma = jnp.sqrt(jnp.maximum(ex2 - ex ** 2, 0.0))
    return xw, sigma


@functools.partial(jax.jit, static_argnames=("wt", "L", "mesh", "method"))
def bestbasis_pipeline_sharded(x, wt: str, L: int, mesh: Mesh, method=None):
    """The FULL fused best-basis step over a (dp, sp) mesh: wpd -> JBB/LSDB
    cost moments (cross-dp psum inserted by XLA) -> device CW selection
    (replicated, tiny) -> dynamic coefficient extraction (dp/sp local).
    Returns (tree, coefs) entirely on device — nothing touches the host."""
    from ..basis import bestbasis_pipeline
    x = jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("dp", "sp")))
    tree, coefs = bestbasis_pipeline(x, wt, L, method)
    coefs = jax.lax.with_sharding_constraint(
        coefs, NamedSharding(mesh, P("dp", "sp")))
    return tree, coefs


@functools.partial(jax.jit, static_argnames=("wt", "L", "mesh"))
def denoise_step_sharded(x, threshold, wt: str, L: int, mesh: Mesh):
    """One sharded hard-threshold denoising step: wpd -> threshold -> iwpd.
    The "training step" analog of this framework: forward transform, batch
    statistics, elementwise shrink, inverse transform — all under one jit
    over the (dp, sp) mesh."""
    x = jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("dp", "sp")))
    xw = wpd(x, wt, L)
    shrunk = jnp.where(jnp.abs(xw) > threshold, xw, 0.0)
    # keep level 0 (the raw signal slot) intact like the reference's
    # tree-driven reconstructions
    shrunk = shrunk.at[..., 0, :].set(xw[..., 0, :])
    y = iwpd(shrunk, wt, L)
    return y
