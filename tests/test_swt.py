"""SWT parity tests (reference test/transforms.jl "SWT" @testset)."""

import numpy as np
import jax.numpy as jnp
import pytest

import waveletsext_tpu as wx
from waveletsext_tpu.kernels import conv

RNG = np.random.default_rng(11)


def test_sdwt_step_golden():
    """test/transforms.jl:53-60."""
    w = wx.wavelet("db4")
    v = jnp.asarray([2.0, 3.0, -4.0, 5.0])
    w1, w2 = conv.sdwt_step(v, 0, w.lo, w.hi)
    assert np.allclose(np.round(w1, 3), [3.854, -0.524, 0.389, 4.767])
    assert np.allclose(np.round(w2, 3), [-6.181, 1.803, -0.89, 5.268])
    # average-based and shift-based single-step inverses
    w1r, w2r = jnp.round(w1, 3), jnp.round(w2, 3)
    assert np.allclose(np.round(
        conv.isdwt_step_average(w1r, w2r, 0, w.lo, w.hi), 3), v)
    for sw in (0, 1):
        got = conv.isdwt_step_shift(4, w1r, w2r, 0, 0, sw, w.lo, w.hi)
        assert np.allclose(np.round(got, 3), v), sw


def test_sdwt_step_golden_2d():
    """test/transforms.jl:67-88."""
    w = wx.wavelet("db4")
    x = jnp.asarray([[2.0, 3.0], [-4.0, 5.0]])
    w1, w2, w3, w4 = conv.sdwt_step2(x, 0, w.lo, w.hi)
    assert np.allclose(np.round(w1, 3), [[3, 3], [3, 3]])
    assert np.allclose(np.round(w2, 3), [[-5, 5], [-5, 5]])
    assert np.allclose(np.round(w3, 3), [[2, 2], [-2, -2]])
    assert np.allclose(np.round(w4, 3), [[4, -4], [-4, 4]])
    assert np.allclose(np.round(
        conv.isdwt_step2_average(w1, w2, w3, w4, 0, w.lo, w.hi), 3), x)
    from waveletsext_tpu.transforms.swt import _shift_merge2
    for sw in (0, 1):
        got = _shift_merge2(w1, w2, w3, w4, 0, 0, sw, w.lo, w.hi)
        assert np.allclose(np.round(got, 3), x), sw


def test_swt_1d():
    """test/transforms.jl:89-103."""
    x = jnp.asarray(RNG.standard_normal(8))
    tree = wx.maketree(8, 3, "dwt")
    sm = 3
    assert np.allclose(wx.isdwt(wx.sdwt(x, "db4", 3), "db4"), x)
    assert np.allclose(wx.isdwt(wx.sdwt(x, "db4"), "db4", sm), x)
    # swpt == swpd leaf rows (nodes 8..15 -> slots 7..14)
    assert np.allclose(wx.swpt(x, "db4"), wx.swpd(x, "db4")[7:15])
    assert np.allclose(wx.swpt(x, "db4", 3), wx.swpd(x, "db4")[7:15])
    assert np.allclose(wx.iswpt(wx.swpt(x, "db4"), "db4"), x)
    assert np.allclose(wx.iswpt(wx.swpt(x, "db4"), "db4", sm), x)
    assert np.allclose(wx.iswpd(wx.swpd(x, "db4"), "db4"), x)
    assert np.allclose(wx.iswpd(wx.swpd(x, "db4"), "db4", 2), x)
    assert np.allclose(wx.iswpd(wx.swpd(x, "db4"), "db4", tree), x)
    assert np.allclose(wx.iswpd(wx.swpd(x, "db4"), "db4", tree, sm), x)
    assert np.allclose(wx.iswpd(wx.swpd(x, "db4"), "db4", 2, sm), x)


def test_swt_2d():
    """test/transforms.jl:105-119."""
    x = jnp.asarray(RNG.standard_normal((8, 8)))
    tree = wx.maketree2d(8, 8, 3, "dwt")
    sm = 3
    assert np.allclose(wx.isdwt2(wx.sdwt2(x, "db4", 3), "db4"), x)
    assert np.allclose(wx.isdwt2(wx.sdwt2(x, "db4"), "db4", sm), x)
    # swpt2 == swpd2 leaf slices (nodes 22..85 -> slots 21..84)
    assert np.allclose(wx.swpt2(x, "db4"), wx.swpd2(x, "db4")[21:85])
    assert np.allclose(wx.iswpt2(wx.swpt2(x, "db4"), "db4"), x)
    assert np.allclose(wx.iswpt2(wx.swpt2(x, "db4"), "db4", sm), x)
    assert np.allclose(wx.iswpd2(wx.swpd2(x, "db4"), "db4"), x)
    assert np.allclose(wx.iswpd2(wx.swpd2(x, "db4"), "db4", 2), x)
    assert np.allclose(wx.iswpd2(wx.swpd2(x, "db4"), "db4", tree), x)
    assert np.allclose(wx.iswpd2(wx.swpd2(x, "db4"), "db4", tree, sm), x)
    assert np.allclose(wx.iswpd2(wx.swpd2(x, "db4"), "db4", 2, sm), x)


def test_swt_batched():
    x = RNG.standard_normal(8)
    xb = jnp.asarray(np.stack([x, x, x]))
    y = wx.sdwt(jnp.asarray(x), "db4")
    yb = wx.sdwt(xb, "db4")
    assert np.allclose(yb, np.stack([y] * 3))
    assert np.allclose(wx.isdwt(yb, "db4", 2), xb)


def test_shift_asserts():
    with pytest.raises(ValueError):  # eager -O-safe error (round 5)
        wx.main2depthshift(12, 3)
