"""Sequence/context parallelism: WPD with the signal axis sharded over a mesh.

New TPU-native design (the reference has no parallelism; SURVEY §5).  A long
signal is split across the ``sp`` mesh axis in contiguous position chunks.
One decimated packet level at node length m with S shards (chunk n_loc = n/S):

* ``m >= 2*n_loc`` — nodes span device *groups* of g = m/n_loc devices.  The
  step needs (a) a filter-support halo exchange: F-2 samples from the right
  neighbor for the low-pass outputs and F-2 from the left for the high-pass,
  with periodic wrap *within the node group* (the device ring restricted to
  each group — a single static ``ppermute``); and (b) a packed-layout
  compaction: device j's local w1 belongs at group slot j//2 half 0/1, its w2
  at group slot g/2 + j//2 — four partial ``ppermute``s of half-chunks.
* ``m <= n_loc`` — every node lives on one device: all deeper levels are
  communication-free local transforms.

So exactly log2(S) levels touch the ICI, each moving O(F + n_loc) bytes per
device — the Ulysses-style position->subband reshard of SURVEY §5 emerges
naturally from the packed layout (once 2^d == S, position chunks *are*
subbands).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..filters import wavelet as _wavelet
from ..kernels import conv


def _group_ring_perm(S: int, g: int, direction: int):
    """Ring permutation within consecutive groups of size g (wrap inside the
    group).  direction=+1: send to right neighbor."""
    perm = []
    for j in range(S):
        base = (j // g) * g
        dst = base + (j - base + direction) % g
        perm.append((j, dst))
    return perm


def _compaction_perms(S: int, g: int):
    """Partial permutations routing local w1/w2 half-chunks into the packed
    next-level layout (see module docstring).  Returns four lists of (src,
    dst) pairs: w1 from even/odd in-group slots, w2 from even/odd slots."""
    w1_even, w1_odd, w2_even, w2_odd = [], [], [], []
    for j in range(S):
        base = (j // g) * g
        jin = j - base
        dst1 = base + jin // 2
        dst2 = base + g // 2 + jin // 2
        (w1_even if jin % 2 == 0 else w1_odd).append((j, dst1))
        (w2_even if jin % 2 == 0 else w2_odd).append((j, dst2))
    return w1_even, w1_odd, w2_even, w2_odd


def _cp_level(cur, d: int, n: int, S: int, lo, hi, axis: str):
    """One packet level on position-sharded local chunks ``cur`` (..., n_loc).
    Returns the next level's local chunk (same shape)."""
    n_loc = cur.shape[-1]
    m = n >> d
    F = len(lo)
    if m <= n_loc:
        # node-local: reshape into this device's nodes and split them
        nodes_here = n_loc // m
        nodes = cur.reshape(*cur.shape[:-1], nodes_here, m)
        w1, w2 = conv.analysis_step(nodes, lo, hi)
        out = jnp.concatenate([w1, w2], axis=-1)
        return out.reshape(*cur.shape[:-1], n_loc)

    g = m // n_loc
    assert n_loc >= F, "shard smaller than filter support"
    # (a) halo exchange with periodic wrap inside the node group
    right = jax.lax.ppermute(cur[..., : F - 2], axis,
                             _group_ring_perm(S, g, -1))
    left = jax.lax.ppermute(cur[..., -(F - 2):], axis,
                            _group_ring_perm(S, g, +1))
    ext = jnp.concatenate([left, cur, right], axis=-1)
    # (b) local decimated outputs: w1[i] over window [2i, 2i+F), w2[i] over
    # [2i+2-F, 2i+2); in ext coordinates everything shifts by F-2
    w1 = conv.periodic_filter(ext, lo, stride=1, dilation=1, offset=F - 2)
    w1 = jax.lax.slice_in_dim(w1, 0, n_loc, stride=2, axis=-1)
    w2 = conv.periodic_filter(ext, hi, stride=1, dilation=1, offset=0)
    w2 = jax.lax.slice_in_dim(w2, 0, n_loc, stride=2, axis=-1)
    # (c) compaction into the packed layout
    p1e, p1o, p2e, p2o = _compaction_perms(S, g)
    half = n_loc // 2
    lo_half = (jax.lax.ppermute(w1, axis, p1e)
               + jax.lax.ppermute(w2, axis, p2e))
    hi_half = (jax.lax.ppermute(w1, axis, p1o)
               + jax.lax.ppermute(w2, axis, p2o))
    return jnp.concatenate([lo_half, hi_half], axis=-1)


def wpd_cp(x, wt, L: int, mesh: Mesh, axis: str = "sp"):
    """Signal-axis-sharded WPD: x (..., n) with the last axis sharded over
    ``axis``; returns the (..., L+1, n) level stack, position-sharded."""
    w = _wavelet(wt) if isinstance(wt, str) else wt
    n = x.shape[-1]
    S = mesh.shape[axis]
    lead = len(x.shape) - 1

    in_spec = P(*([None] * lead), axis)
    out_spec = P(*([None] * lead), None, axis)

    def inner(xl):
        cur = xl
        levels = [cur]
        for d in range(L):
            cur = _cp_level(cur, d, n, S, w.lo, w.hi, axis)
            levels.append(cur)
        return jnp.stack(levels, axis=-2)

    fn = shard_map(inner, mesh=mesh, in_specs=(in_spec,),
                   out_specs=out_spec)
    return fn(x)


@functools.partial(jax.jit, static_argnames=("wt", "L", "mesh", "axis"))
def wpt_cp(x, wt, L: int, mesh: Mesh, axis: str = "sp"):
    """Signal-axis-sharded WPT (leaf slice only)."""
    w = _wavelet(wt) if isinstance(wt, str) else wt
    n = x.shape[-1]
    S = mesh.shape[axis]
    lead = len(x.shape) - 1
    in_spec = P(*([None] * lead), axis)

    def inner(xl):
        cur = xl
        for d in range(L):
            cur = _cp_level(cur, d, n, S, w.lo, w.hi, axis)
        return cur

    fn = shard_map(inner, mesh=mesh, in_specs=(in_spec,), out_specs=in_spec)
    return fn(x)
