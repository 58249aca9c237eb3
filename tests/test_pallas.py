"""Pallas fused kernel tests (run on TPU; skipped on the CPU test backend —
validated on-chip via scripts; see kernels/pallas_wpt.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from waveletsext_tpu.transforms.dwt import wpt, _try_pallas_wpt
from waveletsext_tpu.filters import wavelet

tpu = jax.devices()[0].platform.lower() in ("tpu", "axon")


def test_dispatch_declines_on_cpu_or_f64():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 2048)))
    w = wavelet("db4")
    if not tpu:
        assert _try_pallas_wpt(x.astype(jnp.float32), w, 4) is None
    assert _try_pallas_wpt(x.astype(jnp.float64), w, 4) is None


@pytest.mark.skipif(not tpu, reason="needs TPU")
def test_pallas_matches_xla():
    from waveletsext_tpu.kernels.pallas_wpt import wpt_pallas
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((64, 4096)).astype(np.float32))
    got = np.asarray(wpt_pallas(x, "db4", 8, 64))
    # f64 reference through the XLA path (never uses pallas)
    ref = np.asarray(wpt(x.astype(jnp.float64), "db4", 8)).astype(np.float32)
    assert np.allclose(got, ref, atol=1e-3)


@pytest.mark.skipif(not tpu, reason="needs TPU")
def test_pallas_inverse_matches_xla():
    from waveletsext_tpu.kernels.pallas_wpt import iwpt_pallas
    from waveletsext_tpu.transforms.dwt import iwpt
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal((64, 4096)).astype(np.float32))
    got = np.asarray(iwpt_pallas(y, "db4", 8, 64))
    ref = np.asarray(iwpt(y.astype(jnp.float64), "db4", 8)).astype(np.float32)
    assert np.allclose(got, ref, atol=1e-3)


@pytest.mark.skipif(not tpu, reason="needs TPU")
def test_pallas_roundtrip():
    from waveletsext_tpu.kernels.pallas_wpt import wpt_pallas, iwpt_pallas
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((64, 4096)).astype(np.float32))
    rec = np.asarray(iwpt_pallas(wpt_pallas(x, "db4", 8, 64), "db4", 8, 64))
    assert np.allclose(rec, np.asarray(x), atol=1e-3)
