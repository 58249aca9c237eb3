"""Public-API jit boundary.

Every public transform is wrapped in ``jax.jit`` with the wavelet / level /
tree arguments marked static, so a call signature compiles exactly once and
every later call is a cached dispatch.  (In this environment each fresh XLA
compilation round-trips a compile service, so eager per-op dispatch is
prohibitively slow — and on TPU the whole-transform program is what we want
XLA to fuse anyway.)

Trees are numpy bool arrays at the user level; ``StaticTree`` wraps them with
value-based hashing so they can be jit-static.  ``np.asarray`` transparently
unwraps it via ``__array__``.
"""

from __future__ import annotations

import functools
import inspect

import numpy as np
import jax


class StaticTree:
    """Hashable, immutable wrapper around a numpy bool tree array."""

    __slots__ = ("arr", "_key")

    def __init__(self, arr):
        a = np.ascontiguousarray(np.asarray(arr, dtype=bool))
        a.setflags(write=False)
        object.__setattr__(self, "arr", a)
        object.__setattr__(self, "_key", (a.shape, a.tobytes()))

    def __array__(self, dtype=None, copy=None):
        return self.arr if dtype is None else self.arr.astype(dtype)

    def __len__(self):
        return len(self.arr)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, StaticTree) and self._key == other._key

    def __repr__(self):
        return f"StaticTree(len={len(self.arr)})"


def apijit(*static_names):
    """Wrap a function in jax.jit, making the named arguments static and
    auto-converting numpy tree arrays among them to ``StaticTree``.

    The current MXU matmul precision (kernels/conv.MATMUL_PRECISION, a
    process global set by ``set_matmul_precision``) is part of the dispatch
    key: each precision value gets its own ``jax.jit`` instance, so changing
    the precision after first use re-traces instead of silently reusing the
    old programs."""

    def deco(fn):
        sig = inspect.signature(fn)
        jits = {}

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            from .kernels import conv
            jf = jits.get(conv.MATMUL_PRECISION)
            if jf is None:
                # Each precision gets its own *distinct function object*:
                # jax.jit instances of the SAME callable share one underlying
                # pjit trace cache, so jax.jit(fn) per precision silently
                # reuses the first precision's traced program (measured: the
                # relaxed bench rows were no-ops until this shim).  The shim
                # is traced while the global equals its key, so the
                # trace-time reads of conv.MATMUL_PRECISION inside ``fn``
                # are consistent.
                shim = functools.wraps(fn)(lambda *a, **kw: fn(*a, **kw))
                # inline=True: when a public transform is traced inside a
                # larger jitted program (fused pipelines, benchmark chains),
                # inline it instead of emitting a nested pjit call — a
                # non-inlined call inside a fori_loop body measured ~2x
                # slower on TPU (see BENCHMARKS.md round-2 notes).  Top-level
                # calls still compile and cache per signature as before.
                jf = jits[conv.MATMUL_PRECISION] = jax.jit(
                    shim, static_argnames=static_names, inline=True)
            b = sig.bind(*args, **kwargs)
            b.apply_defaults()
            for name in static_names:
                v = b.arguments.get(name)
                if isinstance(v, np.ndarray):
                    b.arguments[name] = StaticTree(v)
            return jf(**b.arguments)

        def clear_cache():
            for jf in jits.values():
                jf.clear_cache()
            jits.clear()

        wrapper.__wrapped_impl__ = fn
        wrapper.__jits__ = jits
        wrapper.clear_cache = clear_cache
        return wrapper

    return deco
