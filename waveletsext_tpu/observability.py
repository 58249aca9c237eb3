"""Tracing / profiling / numerical-debug hooks (SURVEY.md §5).

The reference has no profiling or sanitizer infrastructure (SURVEY §5:
"Tracing / profiling — absent", "Race detection / sanitizers — absent");
this module provides the TPU-native equivalents:

* :func:`profile_trace` — a ``jax.profiler.trace`` context manager writing a
  TensorBoard/XProf trace directory; used by ``bench.py`` (env
  ``BENCH_PROFILE=<dir>``) and ``benchmarks/run_all.py --profile``.
* :func:`enable_debug_nans` — turns on ``jax_debug_nans`` so any NaN
  produced inside a jitted program raises at the producing primitive
  (re-runs un-jitted); enabled for the test suite via
  ``WAVELETSEXT_DEBUG_NANS=1`` (tests/conftest.py).
"""

from __future__ import annotations

import contextlib
import pathlib


@contextlib.contextmanager
def profile_trace(log_dir, create_perfetto_trace: bool = False):
    """Capture a profiler trace of the enclosed block into ``log_dir``.

    Wraps ``jax.profiler.trace``; the directory is created if needed and
    contains the ``plugins/profile/...`` artifacts viewable in
    TensorBoard/XProf (and optionally a perfetto trace)."""
    import jax
    log_dir = pathlib.Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(log_dir),
                            create_perfetto_trace=create_perfetto_trace):
        yield log_dir


def annotate(name: str):
    """Named profiler region (``jax.profiler.TraceAnnotation``) for marking
    pipeline phases inside a trace."""
    import jax
    return jax.profiler.TraceAnnotation(name)


def enable_debug_nans(enable: bool = True) -> None:
    """NaN sanitizer: raise at the first NaN-producing primitive inside any
    jitted program (jax_debug_nans)."""
    import jax
    jax.config.update("jax_debug_nans", enable)
