"""Pallas fused kernel tests.

The full-kernel parity tests run twice: natively on TPU, and through the
Pallas interpreter (``interpret=True``) on the CPU test backend so kernel
regressions are caught off-chip in CI.  The sublane-form level functions
(_node_level / _node_level_inv) are plain jnp code and are parity-tested
directly against the XLA conv path, covering both the even-length polyphase
branch and the odd-length/tiny-node full-rate fallback."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from waveletsext_tpu.transforms.dwt import wpt, iwpt, _try_pallas_wpt
from waveletsext_tpu.filters import wavelet
from waveletsext_tpu.kernels import conv
from waveletsext_tpu.kernels.pallas_wpt import (_node_level, _node_level_inv,
                                                wpt_pallas, iwpt_pallas)

tpu = jax.devices()[0].platform.lower() in ("tpu", "axon")


@pytest.mark.parametrize("wt", ["db2", "db4", "coif2"])
def test_node_level_matches_conv(wt):
    """Sublane-form polyphase analysis == conv.analysis_step_packed (the
    even-filter branch the on-chip kernels use)."""
    w = wavelet(wt)
    rng = np.random.default_rng(3)
    v = rng.standard_normal((8, 64)).astype(np.float32)  # (TB, m)
    w1, w2 = _node_level(jnp.asarray(v.T), w.lo, w.hi)   # signal on sublanes
    got = np.concatenate([np.asarray(w1).T, np.asarray(w2).T], axis=-1)
    ref = np.asarray(conv.analysis_step_packed(
        jnp.asarray(v, jnp.float64), w.lo, w.hi))
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.parametrize("taps_len,m", [(7, 64), (8, 8)])
def test_node_level_fallback_matches_conv(taps_len, m):
    """Odd-length filter / tiny-node full-rate fallback branch parity."""
    rng = np.random.default_rng(4)
    lo = rng.standard_normal(taps_len)
    hi = rng.standard_normal(taps_len)
    v = rng.standard_normal((4, m)).astype(np.float32)
    w1, w2 = _node_level(jnp.asarray(v.T), lo, hi)
    got = np.concatenate([np.asarray(w1).T, np.asarray(w2).T], axis=-1)
    ref = np.asarray(conv.analysis_step_packed(
        jnp.asarray(v, jnp.float64), lo, hi))
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.parametrize("wt", ["db2", "db4"])
def test_node_level_inv_matches_conv(wt):
    w = wavelet(wt)
    rng = np.random.default_rng(5)
    y = rng.standard_normal((8, 64)).astype(np.float32)  # packed [w1 | w2]
    got = np.asarray(_node_level_inv(jnp.asarray(y.T), w.lo, w.hi)).T
    ref = np.asarray(conv.synthesis_step_packed(
        jnp.asarray(y, jnp.float64), w.lo, w.hi))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_interpret_wpt_matches_xla():
    """Full fused kernel through the Pallas interpreter on CPU."""
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((16, 512)).astype(np.float32))
    got = np.asarray(wpt_pallas(x, "db4", 5, block_b=8, in_cutoff=64,
                                interpret=True))
    ref = np.asarray(wpt(x.astype(jnp.float64), "db4", 5)).astype(np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.parametrize("shape,L,cutoff", [((3, 128, 128), 3, 32),
                                            ((2, 64, 256), 2, 32),
                                            ((2, 128, 128), 3, 256)])
def test_interpret_wpt2_matches_xla(shape, L, cutoff):
    """Fused 2-D kernel through the interpreter vs the XLA wpt2 path —
    covers shallow VPU passes + composed deep contractions (cutoff 32) and
    the pure-composed shallow=0 case (cutoff 256), square and rectangular."""
    from waveletsext_tpu.kernels.pallas_wpt2 import wpt2_pallas
    from waveletsext_tpu.transforms.dwt import wpt2
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    got = np.asarray(wpt2_pallas(x, "db4", L, in_cutoff=cutoff,
                                 interpret=True))
    ref = np.asarray(wpt2(x.astype(jnp.float64), "db4", L))
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.parametrize("shape,L", [((2, 64, 128), 2), ((1, 128, 128), 3)])
def test_interpret_wpd2_stack_matches_xla(shape, L):
    """All-levels 2-D stack kernel through the interpreter vs the XLA wpd2
    path (every level plane, rectangular and deeper-square cases)."""
    from waveletsext_tpu.kernels.pallas_wpt2 import wpd2_pallas
    from waveletsext_tpu.transforms.dwt import wpd2
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    got = np.asarray(wpd2_pallas(x, "db4", L, interpret=True))
    ref = np.asarray(wpd2(x.astype(jnp.float64), "db4", L))
    assert got.shape == ref.shape == shape[:1] + (L + 1,) + shape[1:]
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_interpret_iwpt2_roundtrip():
    from waveletsext_tpu.kernels.pallas_wpt2 import wpt2_pallas, iwpt2_pallas
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 128, 128)).astype(np.float32))
    y = wpt2_pallas(x, "db4", 3, in_cutoff=32, interpret=True)
    got = np.asarray(iwpt2_pallas(y, "db4", 3, in_cutoff=32, interpret=True))
    np.testing.assert_allclose(got, np.asarray(x), atol=1e-4)


@pytest.mark.skipif(not tpu, reason="needs TPU")
def test_pallas2_matches_xla_onchip():
    from waveletsext_tpu.kernels.pallas_wpt2 import wpt2_pallas, iwpt2_pallas
    from waveletsext_tpu.transforms.dwt import wpt2
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal((4, 512, 512)).astype(np.float32))
    got = np.asarray(wpt2_pallas(x, "db4", 4))
    ref = np.asarray(wpt2(x.astype(jnp.float64), "db4", 4)).astype(np.float32)
    assert np.allclose(got, ref, atol=1e-3)
    rec = np.asarray(iwpt2_pallas(jnp.asarray(got), "db4", 4))
    assert np.allclose(rec, np.asarray(x), atol=1e-3)


def test_interpret_iwpt_roundtrip():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((16, 512)).astype(np.float32))
    y = wpt_pallas(x, "db4", 5, block_b=8, in_cutoff=64, interpret=True)
    ref = np.asarray(iwpt(y.astype(jnp.float64), "db4", 5))
    got = np.asarray(iwpt_pallas(y, "db4", 5, block_b=8, in_cutoff=64,
                                 interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4)
    np.testing.assert_allclose(got, np.asarray(x), atol=1e-4)


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
