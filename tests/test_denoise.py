"""Denoising tests (reference test/denoising.jl statistical bounds)."""

import numpy as np
import pytest
import jax.numpy as jnp

import waveletsext_tpu as wx
from waveletsext_tpu import denoising as dn

RNG = np.random.default_rng(23)


def _relerr(a, b):
    return float(wx.relativenorm(jnp.asarray(a), jnp.asarray(b)))


def test_shrink_constructors():
    assert dn.visushrink(8).t == np.sqrt(2 * np.log(8))
    assert isinstance(dn.RelErrorShrink(), dn.RelErrorShrink)
    x = jnp.asarray(RNG.standard_normal(8))
    s = dn.sureshrink(x)
    assert isinstance(s, dn.SureShrink)
    tree = wx.maketree(8, 3, "full")
    assert isinstance(dn.sureshrink(x, False, tree), dn.SureShrink)


def test_denoise_single():
    n = 2 ** 8
    x0 = wx.generatesignals("heavisine", 8)
    x = jnp.asarray(x0 + 0.5 * RNG.standard_normal(n))
    x0 = jnp.asarray(x0)
    err = _relerr(x, x0)
    dnt = dn.VisuShrink(dn.HardTH(), np.sqrt(2 * np.log(2)))

    y = dn.denoise(x, "sig", "haar", dnt=dnt)
    assert _relerr(y, x0) <= err
    y = dn.denoise(wx.dwt(x, "haar", 4), "dwt", "haar", L=4, dnt=dnt,
                   smooth="undersmooth")
    assert _relerr(y, x0) <= 2 * err
    y = dn.denoise(wx.dwt(x, "haar"), "dwt", "haar", dnt=dnt,
                   smooth="undersmooth")
    assert _relerr(y, x0) <= 2 * err
    y = dn.denoise(wx.wpt(x, "haar"), "wpt", "haar",
                   tree=wx.maketree(n, 8, "full"), dnt=dnt,
                   smooth="undersmooth")
    assert _relerr(y, x0) <= 2 * err
    y = dn.denoise(wx.sdwt(x, "haar"), "sdwt", "haar", dnt=dnt,
                   smooth="undersmooth")
    assert _relerr(y, x0) <= 2 * err
    y = dn.denoise(wx.swpd(x, "haar"), "swpd", "haar", smooth="undersmooth")
    assert _relerr(y, x0) <= 2 * err
    y = dn.denoise(wx.acdwt(x, "haar"), "acdwt", "haar", dnt=dnt,
                   smooth="undersmooth")
    assert _relerr(y, x0) <= 2 * err
    y = dn.denoise(wx.acwpd(x, "haar"), "acwpd", "haar", smooth="undersmooth")
    assert _relerr(y, x0) <= 2 * err


def test_denoise_group():
    n = 2 ** 8
    base = wx.generatesignals("heavisine", 8)
    x0 = jnp.asarray(wx.duplicatesignals(base, 5, 2))
    x = jnp.asarray(wx.duplicatesignals(base, 5, 2, True, 0.5,
                                        rng=np.random.default_rng(5)))
    max_err = max(_relerr(x[i], x0[i]) for i in range(5))
    dnt = dn.VisuShrink(dn.HardTH(), np.sqrt(2 * np.log(2)))

    def mean_err(y):
        return np.mean([_relerr(y[i], x0[i]) for i in range(5)])

    y = dn.denoise(x, "sig", "haar", dnt=dnt, bestTH="mean")
    assert mean_err(y) <= max_err
    y = dn.denoise(wx.dwt(x, "haar"), "dwt", "haar", dnt=dnt)
    assert mean_err(y) <= max_err
    dnt2 = dn.RelErrorShrink(dn.HardTH(), 0.3)
    tree = wx.maketree(n, 8, "full")
    y = dn.denoise(wx.wpt(x, "haar"), "wpt", "haar", tree=tree, dnt=dnt2,
                   estnoise=dn.relerrorthreshold)
    assert mean_err(y) <= max_err
    y = dn.denoise(wx.wpt(x, "haar"), "wpt", "haar", tree=tree, dnt=dnt2,
                   estnoise=dn.relerrorthreshold, bestTH="mean")
    assert mean_err(y) <= max_err
    y = dn.denoise(wx.sdwt(x, "haar"), "sdwt", "haar")
    assert mean_err(y) <= max_err
    y = dn.denoise(wx.sdwt(x, "haar"), "sdwt", "haar", dnt=dnt2,
                   estnoise=dn.relerrorthreshold, bestTH="mean")
    assert mean_err(y) <= max_err
    tree7 = wx.maketree(n, 7, "full")
    y = dn.denoise(wx.swpd(x, "haar", 7), "swpd", "haar", tree=tree7, dnt=dnt2,
                   estnoise=dn.relerrorthreshold)
    assert mean_err(y) <= max_err
    y = dn.denoise(wx.acdwt(x, "haar"), "acdwt", "haar")
    assert mean_err(y) <= max_err
    y = dn.denoise(wx.acwpd(x, "haar", 7), "acwpd", "haar", tree=tree7,
                   dnt=dnt2, estnoise=dn.relerrorthreshold)
    assert mean_err(y) <= max_err


def test_threshold_determination_types():
    x = jnp.asarray(RNG.standard_normal(32))
    tree = wx.maketree(32, 5, "full")
    assert np.isfinite(float(dn.noisest(x, False)))
    assert np.isfinite(float(dn.surethreshold(x, False)))
    assert np.isfinite(float(dn.relerrorthreshold(x, False)))
    xs = jnp.asarray(RNG.standard_normal((6, 32))).T  # (32, 6) per-node table
    xs = jnp.asarray(RNG.standard_normal((6, 32)))    # (L+1, n) layout
    assert np.isfinite(float(dn.noisest(xs, True, None)))
    assert np.isfinite(float(dn.surethreshold(xs, True, None)))
    assert np.isfinite(float(dn.relerrorthreshold(xs, True, None)))
    xw = jnp.asarray(RNG.standard_normal((63, 32)))   # all-node table
    assert np.isfinite(float(dn.noisest(xw, True, tree)))
    assert np.isfinite(float(dn.surethreshold(xw, True, tree)))
    assert np.isfinite(float(dn.relerrorthreshold(xw, True, tree)))


@pytest.mark.parametrize("shape", [(17,), (32,), (4, 33), (3, 9, 64)])
def test_noisest_single_sort_mad_matches_two_medians(shape):
    """noisest's one-sort MAD (V-shaped order-statistic windows over the
    sorted plane) must equal the textbook median(|x - median(x)|), odd and
    even lengths, including with ties."""
    x = np.asarray(RNG.standard_normal(shape))
    x[..., : shape[-1] // 3] = x[..., shape[-1] // 3: 2 * (shape[-1] // 3)]
    dr = x[..., x.shape[-1] // 2:]  # the slice noisest takes (1-D, no tree)
    med = np.median(dr, axis=-1, keepdims=True)
    want = np.median(np.abs(dr - med), axis=-1) / 0.6745
    got = np.asarray(dn.noisest(jnp.asarray(x), False))
    assert np.allclose(got, want, atol=1e-12)


def test_surethreshold_decimated_tree_ignored():
    """Pin the reference convention (Denoising.jl:149-157): for decimated
    input (redundant=False) surethreshold ignores the tree — ``y = coef`` —
    because a length-n wpt output IS the basis-coefficient set for any tree.
    Only redundant tables restrict to leaf rows."""
    x = jnp.asarray(RNG.standard_normal(64))
    xw = wx.wpt(x, "db4", wx.maketree(64, 3, "dwt"))
    t_none = float(dn.surethreshold(xw, False, None))
    t_tree = float(dn.surethreshold(xw, False, wx.maketree(64, 3, "dwt")))
    assert t_none == t_tree
    # redundant path DOES depend on the tree
    xs = jnp.asarray(RNG.standard_normal((31, 64)))
    full = float(dn.surethreshold(xs, True, wx.maketree(64, 4, "full")))
    dwt_ = float(dn.surethreshold(xs, True, wx.maketree(64, 4, "dwt")))
    assert full != dwt_


def test_subsampled_sure_degenerate_subsample():
    # subsample >= coefficient count must fall back to the exact selector,
    # not divide by zero (ADVICE r1)
    x = jnp.asarray(RNG.standard_normal(16))
    t_big = float(dn.surethreshold(x, False, subsample=64))
    t_exact = float(dn.surethreshold(x, False))
    assert t_big == t_exact


def test_subsampled_sure_near_exact():
    # subsample=s estimates the SURE risk from every s-th coefficient; the
    # risk of its chosen threshold must be within a few percent of the exact
    # minimum (and the selector must stay a real coefficient magnitude)
    x = jnp.asarray(RNG.standard_normal((8, 9, 256)).astype(np.float32))
    t1 = np.asarray(dn.surethreshold(x, True))
    t8 = np.asarray(dn.surethreshold(x, True, subsample=8))
    a = np.sort(np.abs(np.asarray(x).reshape(8, -1)) ** 2, axis=-1)
    n = a.shape[-1]

    def risk(t2, row):
        k = np.searchsorted(row, t2, side="right")
        return (n - 2 * k + row[:k].sum() + (n - k) * t2) / n

    flat = np.abs(np.asarray(x).reshape(8, -1))
    for i in range(8):
        assert np.any(np.isclose(flat[i], t8[i]))  # real data value
        assert risk(t8[i] ** 2, a[i]) <= risk(t1[i] ** 2, a[i]) + 0.05


def test_batched_threshold_matches_single():
    x = jnp.asarray(RNG.standard_normal((4, 64)))
    ts = dn.surethreshold(x, False)
    for i in range(4):
        assert np.isclose(float(ts[i]), float(dn.surethreshold(x[i], False)))
    sig = dn.noisest(x, False)
    for i in range(4):
        assert np.isclose(float(sig[i]), float(dn.noisest(x[i], False)))
    rel = dn.relerrorthreshold(x, False)
    for i in range(4):
        assert np.isclose(float(rel[i]),
                          float(dn.relerrorthreshold(x[i], False)))


def test_fused_bestbasis_denoise_matches_composition():
    """The fused pipeline must equal the host-composed equivalent (same
    sigma/threshold formulas) and actually denoise."""
    rng = np.random.default_rng(31)
    base = wx.generatesignals("heavisine", 8)
    x0 = wx.duplicatesignals(base, 16, 2)
    x = jnp.asarray(x0 + 0.4 * rng.standard_normal(x0.shape))
    n = x.shape[-1]
    y = np.asarray(wx.bestbasis_denoise_pipeline(x, "db4", 6))
    # host composition with identical formulas
    xw = wx.wpd(x, "db4", 6)
    tree = wx.bestbasistree(xw)
    coefs = np.asarray(wx.getbasiscoef(xw, tree))
    dr = np.asarray(xw)[..., 1, n // 2:]
    med = np.median(dr, axis=-1, keepdims=True)
    sigma = np.median(np.abs(dr - med), axis=-1, keepdims=True) / 0.6745
    t = sigma * np.sqrt(2 * np.log(n))
    shrunk = np.where(np.abs(coefs) > t, coefs, 0.0)
    want = np.asarray(wx.iwpt(jnp.asarray(shrunk), "db4", tree))
    assert np.allclose(y, want, atol=1e-10)
    err_noisy = np.linalg.norm(np.asarray(x) - x0)
    err_den = np.linalg.norm(y - x0)
    assert err_den < err_noisy
    # per-signal BB trees + undersmooth + soft all trace and run
    y2 = wx.bestbasis_denoise_pipeline(x, "db4", 6, method=wx.BB(),
                                       soft=True, smooth="undersmooth")
    assert y2.shape == x.shape


def test_fused_bestbasis_denoise_2d():
    """2-D fused best-basis denoiser: improves PSNR on a noisy image batch
    and reconstructs exactly at sigma=0 noise (threshold ~0)."""
    rng = np.random.default_rng(21)
    img = np.zeros((2, 32, 32), np.float64)
    img[:, 8:24, 8:24] = 1.0  # blocks image (sparse in haar packets)
    noisy = jnp.asarray(img + 0.3 * rng.standard_normal(img.shape))
    den = wx.bestbasis_denoise_pipeline2(noisy, "haar", 3)
    assert den.shape == noisy.shape
    p_noisy = float(wx.psnr(noisy[0], jnp.asarray(img[0])))
    p_den = float(wx.psnr(den[0], jnp.asarray(img[0])))
    assert p_den > p_noisy
    # undersmooth keeps the coarsest scaling block untouched
    den_u = wx.bestbasis_denoise_pipeline2(noisy, "haar", 3,
                                           smooth="undersmooth")
    assert den_u.shape == noisy.shape
    # clean input passes through (t ~ MAD of HH ~ tiny but nonzero; use
    # soft=False and check near-identity)
    clean = jnp.asarray(img)
    out = wx.bestbasis_denoise_pipeline2(clean, "haar", 3)
    assert float(jnp.max(jnp.abs(out - clean))) < 1e-8


def test_swt_denoise_pipeline2_matches_composition():
    """The fused 2-D stationary denoiser == manual sdwt2 -> MAD/VisuShrink
    threshold -> isdwt2 composition, and improves PSNR on noisy images."""
    rng = np.random.default_rng(23)
    base = np.asarray(wx.generatesignals("heavisine", 5))
    img = np.outer(base, base)
    x0 = jnp.asarray(np.stack([img] * 3).astype(np.float32))
    x = x0 + 0.05 * jnp.asarray(
        rng.standard_normal(x0.shape).astype(np.float32))
    L = 3
    got = wx.swt_denoise_pipeline2(x, "db4", L, mad_subsample=1)
    # manual composition
    xw = wx.sdwt2(x, "db4", L)
    drm = np.asarray(xw)[:, 3 * L].reshape(3, -1)
    med = np.median(drm, axis=-1, keepdims=True)
    sigma = np.median(np.abs(drm - med), axis=-1) / 0.6745
    t = (sigma * np.sqrt(2 * np.log(32 * 32)))[:, None, None, None]
    xs = jnp.where(jnp.abs(xw) > t, xw, 0.0)
    want = wx.isdwt2(xs, "db4")
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    p_no = float(wx.psnr(x, x0))
    p_dn = float(wx.psnr(got, x0))
    assert p_dn > p_no
    # undersmooth spares the LL plane
    got_u = wx.swt_denoise_pipeline2(x, "db4", L, smooth="undersmooth",
                                     mad_subsample=1)
    xs_u = xs.at[..., 0, :, :].set(xw[..., 0, :, :])
    want_u = wx.isdwt2(xs_u, "db4")
    assert np.allclose(np.asarray(got_u), np.asarray(want_u), atol=1e-5)
    # default subsampled-MAD sigma stays within ~10% of the exact estimate
    # (O(1/sqrt(m/16)) estimator noise), so the outputs stay close
    sub = drm[:, ::16]
    med_s = np.median(sub, axis=-1, keepdims=True)
    sigma_s = np.median(np.abs(sub - med_s), axis=-1) / 0.6745
    assert np.all(np.abs(sigma_s - sigma) <= 0.25 * sigma + 1e-12)
    got_s = wx.swt_denoise_pipeline2(x, "db4", L)
    assert got_s.shape == x.shape
    assert np.all(np.isfinite(np.asarray(got_s)))


def test_fused_denoise_batch_shapes():
    """The fused denoisers accept single inputs and multi-dim batches; a
    (2, 3, ...) batch must equal the flattened (6, ...) batch (one joint
    JBB tree over the lot)."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 3, 64)))
    got = wx.bestbasis_denoise_pipeline(x, "db4", 4)
    flat = wx.bestbasis_denoise_pipeline(x.reshape(6, 64), "db4", 4)
    assert got.shape == (2, 3, 64)
    assert np.allclose(np.asarray(got).reshape(6, 64), np.asarray(flat))
    single = wx.bestbasis_denoise_pipeline(x[0, 0], "db4", 4)
    assert single.shape == (64,)

    img = jnp.asarray(rng.standard_normal((2, 2, 32, 32)))
    got2 = wx.bestbasis_denoise_pipeline2(img, "haar", 3)
    flat2 = wx.bestbasis_denoise_pipeline2(img.reshape(4, 32, 32), "haar", 3)
    assert got2.shape == (2, 2, 32, 32)
    assert np.allclose(np.asarray(got2).reshape(4, 32, 32), np.asarray(flat2))
    single2 = wx.bestbasis_denoise_pipeline2(img[0, 0], "haar", 3)
    assert single2.shape == (32, 32)


def test_noisest_subsample():
    """noisest(subsample=s) estimates sigma from a uniform subsample: close
    to the exact estimate on Gaussian noise, default exactly unchanged."""
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.standard_normal((16, 1024)))
    exact = np.asarray(dn.noisest(x).t if hasattr(dn.noisest(x), "t")
                       else dn.noisest(x))
    sub = np.asarray(dn.noisest(x, subsample=4))
    assert sub.shape == exact.shape
    np.testing.assert_allclose(sub, exact, rtol=0.35)  # O(1/sqrt(m/s))
    np.testing.assert_array_equal(np.asarray(dn.noisest(x, subsample=1)),
                                  exact)


def test_operator_denoise_dispatch_matches_streamed(monkeypatch):
    """The big-batch matmul-collapsed denoise (covariance costs + operator
    extract/inverse) must equal the streamed dispatch, incl. undersmooth."""
    from waveletsext_tpu import basis
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.standard_normal((32, 128)))
    for soft, smooth in ((False, "regular"), (True, "undersmooth")):
        y0 = wx.bestbasis_denoise_pipeline(x, "db4", 5, soft=soft,
                                           smooth=smooth)
        monkeypatch.setattr(basis, "OPERATOR_PIPELINE_MIN_BATCH", 8)
        wx.bestbasis_denoise_pipeline.clear_cache()
        y1 = wx.bestbasis_denoise_pipeline(x, "db4", 5, soft=soft,
                                           smooth=smooth)
        wx.bestbasis_denoise_pipeline.clear_cache()
        monkeypatch.setattr(basis, "OPERATOR_PIPELINE_MIN_BATCH", 2048)
        assert np.allclose(np.asarray(y0), np.asarray(y1), atol=1e-8), (
            soft, smooth)
