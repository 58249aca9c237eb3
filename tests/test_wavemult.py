"""WaveMult tests (reference test/wavemult.jl, with exactness identities in
place of its RNG-seeded golden matrices)."""

import numpy as np
import jax.numpy as jnp
import pytest

import waveletsext_tpu as wx
from waveletsext_tpu import wavemult as wm

RNG = np.random.default_rng(37)


def test_dyadlength():
    assert wm.dyadlength(16) == 4
    with pytest.warns(UserWarning):
        assert wm.dyadlength(15) == 4


def test_ndyad():
    # reference doctest (utils.jl:146-155): 1-based 17:24 / 25:32
    assert wm.ndyad(1, 4, False) == slice(16, 24)
    assert wm.ndyad(1, 4, True) == slice(24, 32)


def test_stretchmatrix():
    # reference doctest (utils.jl:98-114): diag(1..4) -> [1,4,7,8] (1-based)
    i = np.array([0, 1, 2, 3])
    ie, je = wm.stretchmatrix(i, i, 4, 2)
    assert np.array_equal(ie, [0, 3, 6, 7])
    assert np.array_equal(je, [0, 3, 6, 7])


def test_sft_isft_roundtrip():
    M = jnp.asarray(RNG.standard_normal((8, 8)))
    Mw = wm.sft(M, "db2")
    assert np.allclose(wm.isft(Mw, "db2"), M)


def test_ns_dwt_layout():
    """ns_dwt places the level-1 children in the top half dyads and the
    deepest approx in the head (transforms.jl:52-70)."""
    x = jnp.asarray(RNG.standard_normal(8))
    nxw = wm.ns_dwt(x, "haar")
    w1, w2 = wx.wpd(x, "haar", 1)[1][:4], wx.wpd(x, "haar", 1)[1][4:]
    assert np.allclose(nxw[wm.ndyad(1, 3, False)], w1)
    assert np.allclose(nxw[wm.ndyad(1, 3, True)], w2)
    assert nxw.shape == (16,)


def test_std_wavemult_exact_at_zero_eps():
    M = jnp.asarray(RNG.standard_normal((16, 16)))
    x = jnp.asarray(RNG.standard_normal(16))
    y = wm.std_wavemult(M, x, "db3", eps=0.0)
    assert np.allclose(y, M @ x, atol=1e-10)


def test_nonstd_wavemult_exact_at_zero_eps():
    M = jnp.asarray(RNG.standard_normal((16, 16)))
    x = jnp.asarray(RNG.standard_normal(16))
    y = wm.nonstd_wavemult(M, x, "haar", eps=0.0)
    assert np.allclose(y, M @ x, atol=1e-10)


def test_wavemult_truncated_close():
    M = jnp.asarray(RNG.standard_normal((32, 32)))
    x = jnp.asarray(RNG.standard_normal(32))
    for fn in (wm.nonstd_wavemult, wm.std_wavemult):
        y = fn(M, x, "db4")
        rel = np.linalg.norm(y - M @ x) / np.linalg.norm(M @ x)
        assert rel < 5e-3, fn.__name__


def test_prebuilt_sparse_matches():
    M = jnp.asarray(RNG.standard_normal((16, 16)))
    x = jnp.asarray(RNG.standard_normal(16))
    NM = wm.mat2sparseform_nonstd(M, "haar")
    assert np.allclose(wm.nonstd_wavemult(NM, x, "haar"),
                       wm.nonstd_wavemult(M, x, "haar"))
    SM = wm.mat2sparseform_std(M, "haar")
    assert np.allclose(wm.std_wavemult(SM, x, "haar"),
                       wm.std_wavemult(M, x, "haar"))


def test_dense_form_matches_sparse_and_batches():
    """Round 4: the zeros-kept dense operator forms (TPU fast path) must be
    numerically identical to the BCOO forms, accept batched RHS, and honor
    prebuilt-form passing."""
    from waveletsext_tpu import wavemult as wm
    rng = np.random.default_rng(11)
    n = 64
    i = np.arange(n)
    d = i[:, None] - i[None, :]
    M = np.where(d == 0, 0.0, 1.0 / np.where(d == 0, 1, d))
    xb = jnp.asarray(rng.standard_normal((5, n)))
    true = np.asarray(xb @ jnp.asarray(M).T)
    for fn in (wm.nonstd_wavemult, wm.std_wavemult):
        ys = np.asarray(fn(M, xb, "db4", form="sparse", eps=1e-8))
        yd = np.asarray(fn(M, xb, "db4", form="dense", eps=1e-8))
        np.testing.assert_allclose(ys, yd, atol=1e-9)
        np.testing.assert_allclose(yd, true, atol=1e-3)
    # prebuilt forms always require an explicit form='prebuilt' (raw-matrix
    # shape coincidences are rejected, never auto-detected)
    de_ns = wm.mat2denseform_nonstd(M, "db4", eps=1e-8)
    assert de_ns.shape == (2 * n, 2 * n)
    y1 = np.asarray(wm.nonstd_wavemult(de_ns, xb, "db4", form="prebuilt"))
    with pytest.raises(ValueError):
        wm.nonstd_wavemult(de_ns, xb, "db4")  # (2n, 2n) without 'prebuilt'
    np.testing.assert_allclose(y1, true, atol=1e-3)
    de_st = wm.mat2denseform_std(M, "db4", eps=1e-8)
    y2 = np.asarray(wm.std_wavemult(de_st, xb, "db4", form="prebuilt"))
    np.testing.assert_allclose(y2, true, atol=1e-3)
    # single-vector interface unchanged
    x1 = jnp.asarray(rng.standard_normal(n))
    y3 = wm.nonstd_wavemult(M, x1, "db4")
    assert y3.shape == (n,)
