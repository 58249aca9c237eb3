"""Fused à-trous Pallas kernel parity (interpreter mode on CPU; the same
kernels run natively on TPU via the transforms/denoising dispatch)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import waveletsext_tpu as wx
from waveletsext_tpu import denoising as dn
from waveletsext_tpu.kernels.pallas_swt import (sdwt_pallas, isdwt_pallas,
                                                acdwt_pallas, iacdwt_pallas)

RNG = np.random.default_rng(0)


def _x(B=16, n=256):
    return jnp.asarray(RNG.standard_normal((B, n)).astype(np.float32))


@pytest.mark.parametrize("wt,L", [("db4", 5), ("haar", 3), ("db2", 8)])
def test_sdwt_pallas_matches_xla(wt, L):
    x = _x()
    got = np.asarray(sdwt_pallas(x, wt, L, interpret=True))
    ref = np.asarray(wx.sdwt(x.astype(jnp.float64), wt, L))
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.parametrize("wt,L", [("db4", 5), ("db2", 8)])
def test_isdwt_pallas_matches_xla(wt, L):
    x = _x()
    xw = wx.sdwt(x.astype(jnp.float64), wt, L)
    ref = np.asarray(wx.isdwt(xw, wt))
    got = np.asarray(isdwt_pallas(xw.astype(jnp.float32), wt,
                                  interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4)
    np.testing.assert_allclose(got, np.asarray(x), atol=1e-4)


def test_acdwt_pallas_matches_xla():
    x = _x()
    got = np.asarray(acdwt_pallas(x, "db4", 5, interpret=True))
    ref = np.asarray(wx.acdwt(x.astype(jnp.float64), "db4", 5))
    np.testing.assert_allclose(got, ref, atol=1e-4)
    rec = np.asarray(iacdwt_pallas(jnp.asarray(got), interpret=True))
    np.testing.assert_allclose(rec, np.asarray(x), atol=1e-4)


@pytest.mark.parametrize("soft,undersmooth", [(False, False), (True, False),
                                              (False, True)])
def test_isdwt_threshold_fusion_matches_denoise(soft, undersmooth):
    """Threshold-fused inverse == threshold(stack) then isdwt (the
    Denoising.jl:544-565 sdwt path with per-signal thresholds)."""
    x = _x(8, 256)
    xw = wx.sdwt(x, "db4", 4)
    t = jnp.asarray(np.abs(RNG.standard_normal(8)).astype(np.float32)) * 0.5
    th = dn.SoftTH() if soft else dn.HardTH()
    xs = dn.threshold(xw, th, t[:, None, None])
    if undersmooth:
        xs = xs.at[..., 0, :].set(xw[..., 0, :])
    ref = np.asarray(wx.isdwt(xs.astype(jnp.float64), "db4"))
    got = np.asarray(isdwt_pallas(xw, "db4", t, has_t=True, soft=soft,
                                  undersmooth=undersmooth, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_iacdwt_threshold_fusion_matches_denoise():
    x = _x(8, 256)
    xw = wx.acdwt(x, "db4", 4)
    t = jnp.asarray(np.abs(RNG.standard_normal(8)).astype(np.float32)) * 0.5
    xs = dn.threshold(xw, dn.HardTH(), t[:, None, None])
    ref = np.asarray(wx.iacdwt(xs.astype(jnp.float64)))
    got = np.asarray(iacdwt_pallas(xw, t, has_t=True, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_sdwt2_pallas_matches_xla():
    """2-D à-trous stack kernel (interpreter) vs transforms.swt.sdwt2."""
    from waveletsext_tpu.kernels.pallas_swt2 import sdwt2_pallas
    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.standard_normal((2, 32, 128)).astype(np.float32))
    L = 3
    got = np.asarray(sdwt2_pallas(x, "db4", L, interpret=True))
    ref = np.asarray(wx.sdwt2(x.astype(jnp.float64), "db4", L))
    assert got.shape == ref.shape == (2, 3 * L + 1, 32, 128)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_isdwt2_pallas_roundtrip_and_threshold_fusion():
    """Adjoint-form 2-D average inverse (interpreter): roundtrips the stack
    and matches threshold-then-isdwt2 when fusing per-image thresholds."""
    from waveletsext_tpu.kernels.pallas_swt2 import (sdwt2_pallas,
                                                     isdwt2_pallas)
    rng = np.random.default_rng(15)
    x = jnp.asarray(rng.standard_normal((2, 32, 128)).astype(np.float32))
    L = 2
    xw = sdwt2_pallas(x, "db4", L, interpret=True)
    rec = np.asarray(isdwt2_pallas(xw, "db4", interpret=True))
    np.testing.assert_allclose(rec, np.asarray(x), atol=1e-4)
    t = jnp.asarray(rng.uniform(0.3, 0.9, (2,)).astype(np.float32))
    got = np.asarray(isdwt2_pallas(xw, "db4", t, has_t=True, soft=True,
                                   interpret=True))
    xs = jnp.sign(xw) * jnp.maximum(jnp.abs(xw) - t[:, None, None, None],
                                    0.0)
    want = np.asarray(wx.isdwt2(xs.astype(jnp.float64), "db4"))
    np.testing.assert_allclose(got, want, atol=1e-4)
    # undersmooth spares the LL plane
    got_u = np.asarray(isdwt2_pallas(xw, "db4", t, has_t=True, soft=True,
                                     undersmooth=True, interpret=True))
    xs_u = xs.at[..., 0, :, :].set(xw[..., 0, :, :])
    want_u = np.asarray(wx.isdwt2(xs_u.astype(jnp.float64), "db4"))
    np.testing.assert_allclose(got_u, want_u, atol=1e-4)


def test_scalar_threshold_broadcasts_over_batch():
    """has_t=True with a python-scalar t (the documented default t=0.0)
    must broadcast over B>1 instead of crashing at the (B, 1) reshape
    (round-3 advisor finding, 1-D and 2-D inverses)."""
    from waveletsext_tpu.kernels.pallas_swt2 import (sdwt2_pallas,
                                                     isdwt2_pallas)
    x = _x(4, 256)
    xw = wx.sdwt(x, "db4", 3)
    got = np.asarray(isdwt_pallas(xw, "db4", 0.5, has_t=True,
                                  interpret=True))
    xs = dn.threshold(xw, dn.HardTH(), 0.5)
    want = np.asarray(wx.isdwt(xs.astype(jnp.float64), "db4"))
    np.testing.assert_allclose(got, want, atol=1e-4)

    rng = np.random.default_rng(16)
    x2 = jnp.asarray(rng.standard_normal((2, 16, 128)).astype(np.float32))
    xw2 = sdwt2_pallas(x2, "db4", 2, interpret=True)
    got2 = np.asarray(isdwt2_pallas(xw2, "db4", 0.5, has_t=True,
                                    interpret=True))
    xs2 = jnp.where(jnp.abs(xw2) > 0.5, xw2, 0.0)
    want2 = np.asarray(wx.isdwt2(xs2.astype(jnp.float64), "db4"))
    np.testing.assert_allclose(got2, want2, atol=1e-4)
