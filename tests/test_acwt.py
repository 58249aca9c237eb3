"""ACWT parity tests (reference test/transforms.jl "ACWT" @testset)."""

import numpy as np
import jax.numpy as jnp

import waveletsext_tpu as wx
from waveletsext_tpu.kernels import conv

RNG = np.random.default_rng(13)


def test_acdwt_step_golden():
    """test/transforms.jl:122-131."""
    w = wx.wavelet("db4")
    v = jnp.asarray([2.0, 3.0, -4.0, 5.0])
    w1, w2 = conv.acdwt_step(v, 0, w.ac_lo, w.ac_hi)
    assert np.allclose(np.round(w1, 3), [4.243, 1.414, 0, 2.828])
    assert np.allclose(np.round(w2, 3), [-1.414, 2.828, -5.657, 4.243])
    assert np.allclose(np.round(conv.iacdwt_step(w1, w2), 3), v)


def test_acdwt_step_golden_2d():
    """test/transforms.jl:132-145."""
    w = wx.wavelet("db4")
    x = jnp.asarray([[2.0, 3.0], [-4.0, 5.0]])
    w1, w2, w3, w4 = conv.acdwt_step2(x, 0, w.ac_lo, w.ac_hi)
    assert np.allclose(np.round(w1, 3), [[3, 3], [3, 3]])
    assert np.allclose(np.round(w2, 3), [[-5, 5], [-5, 5]])
    assert np.allclose(np.round(w3, 3), [[2, 2], [-2, -2]])
    assert np.allclose(np.round(w4, 3), [[4, -4], [-4, 4]])
    assert np.allclose(np.round(conv.iacdwt_step2(w1, w2, w3, w4), 3), x)


def test_acwt_1d():
    """test/transforms.jl:147-162."""
    x = jnp.asarray(RNG.standard_normal(8))
    tree = wx.maketree(8, 3, "dwt")
    assert np.allclose(wx.iacdwt(wx.acdwt(x, "db4")), x)
    assert np.allclose(wx.iacdwt(wx.acdwt(x, "db4", 2)), x)
    assert np.allclose(wx.acwpt(x, "db4"), wx.acwpd(x, "db4")[7:15])
    assert np.allclose(wx.acwpt(x, "db4", 2), wx.acwpd(x, "db4")[3:7])
    assert np.allclose(wx.iacwpt(wx.acwpt(x, "db4")), x)
    assert np.allclose(wx.iacwpd(wx.acwpd(x, "db4")), x)
    assert np.allclose(wx.iacwpd(wx.acwpd(x, "db4"), 2), x)
    assert np.allclose(wx.iacwpd(wx.acwpd(x, "db4"), tree), x)


def test_acwt_2d():
    """test/transforms.jl:164-174."""
    x = jnp.asarray(RNG.standard_normal((8, 8)))
    tree = wx.maketree2d(8, 8, 3, "dwt")
    assert np.allclose(wx.iacdwt2(wx.acdwt2(x, "db4", 3)), x)
    assert np.allclose(wx.acwpt2(x, "db4"), wx.acwpd2(x, "db4")[21:85])
    assert np.allclose(wx.acwpt2(x, "db4", 3), wx.acwpd2(x, "db4")[21:85])
    assert np.allclose(wx.iacwpt2(wx.acwpt2(x, "db4")), x)
    assert np.allclose(wx.iacwpd2(wx.acwpd2(x, "db4")), x)
    assert np.allclose(wx.iacwpd2(wx.acwpd2(x, "db4"), tree), x)


def test_acwt_batched():
    x = RNG.standard_normal(8)
    xb = jnp.asarray(np.stack([x, x, x]))
    y = wx.acwpd(jnp.asarray(x), "db4")
    yb = wx.acwpd(xb, "db4")
    assert np.allclose(yb, np.stack([y] * 3))
    assert np.allclose(wx.iacwpd(yb, 3), xb)
