"""Aux subsystem tests: serialization, viz data computation, compat aliases."""

import numpy as np
import jax.numpy as jnp

import waveletsext_tpu as wx
from waveletsext_tpu import ldb, serialization, viz

RNG = np.random.default_rng(43)


def test_ldb_save_load_roundtrip(tmp_path):
    X, y = wx.generateclassdata(wx.ClassData("tri", 4, 4, 4),
                                rng=np.random.default_rng(3))
    X = jnp.asarray(X)
    f = ldb.LocalDiscriminantBasis(wt="haar", n_features=6)
    Xc = f.fit_transform(X, y)
    serialization.save_ldb(f, tmp_path / "model")
    g = serialization.load_ldb(tmp_path / "model")
    assert np.allclose(g.transform(X), Xc)
    assert np.array_equal(g.tree, f.tree)
    assert g.n_features == 6


def test_threshold_save_load(tmp_path):
    sig = np.array([0.3, 0.5, 0.2])
    serialization.save_thresholds(tmp_path / "th", sigma=sig)
    out = serialization.load_thresholds(tmp_path / "th")
    assert np.allclose(out["sigma"], sig)


def test_treenodes_matrix():
    tree = wx.maketree(4, 2, "dwt")  # [1,1,0]
    # getleaf -> [0,0,1,1,1,0,0]: leaves are node 3 (depth1 pos1), 4,5 (depth2)
    m = viz.treenodes_matrix(tree)
    assert m.shape == (3, 4)
    assert m[1, 1] and m[2, 0] and m[2, 1]
    assert not m[0, 0]


def test_tfbdry_partition_covers():
    tree = wx.maketree(8, 3, "dwt")
    rects = viz.tfbdry(tree)
    total = sum((f1 - f0) for (_, _, f0, f1, _) in rects)
    assert np.isclose(total, 1.0)


def test_tfbdry2_partition_covers():
    tree = wx.maketree2d(8, 8, 2, "full")
    rects = viz.tfbdry2(tree, 8, 8)
    area = sum((r1 - r0) * (c1 - c0) for (r0, r1, c0, c1) in rects)
    assert area == 64


def test_profile_trace_artifact(tmp_path):
    """The profiler hook must produce a real trace directory (SURVEY §5)."""
    from waveletsext_tpu.observability import profile_trace, annotate
    import jax

    with profile_trace(tmp_path / "tr") as d:
        with annotate("wpd-smoke"):
            jax.block_until_ready(wx.wpd(jnp.ones((2, 32)), "haar", 3))
    files = list((tmp_path / "tr").rglob("*"))
    assert any(f.is_file() for f in files), files


def test_debug_nans_mode_raises():
    """jax_debug_nans must surface a NaN produced inside a jitted program."""
    import jax
    from waveletsext_tpu.observability import enable_debug_nans
    enable_debug_nans(True)
    try:
        with np.testing.assert_raises(Exception):
            jax.block_until_ready(
                jax.jit(lambda a: jnp.log(a) * 0 + jnp.sqrt(a))(
                    jnp.asarray([-1.0])))
    finally:
        enable_debug_nans(False)


def test_set_matmul_precision_retraces():
    """Changing the MXU precision after first use must re-trace (the
    apijit dispatch keys on it), not silently reuse stale programs."""
    from waveletsext_tpu.kernels import conv
    x = jnp.asarray(RNG.standard_normal(64))
    wx.wpt(x, "db4", 3)
    jits = wx.wpt.__jits__
    n0 = len(jits)
    old = conv.MATMUL_PRECISION
    try:
        conv.set_matmul_precision("default")
        y = wx.wpt(x, "db4", 3)
        assert len(jits) == n0 + 1  # new precision -> new jit instance
        assert y.shape == x.shape
    finally:
        conv.MATMUL_PRECISION = old


def test_ssim_golden():
    """Pin SSIM against an independent scipy.ndimage implementation with
    replicate ('nearest') borders — the ImageFiltering.jl Pad(:replicate)
    default that ImageQualityIndexes (reference utils_metrics.jl:133-135)
    filters with."""
    from scipy import ndimage

    rng = np.random.default_rng(7)
    x0 = rng.random((24, 20))
    x = np.clip(x0 + 0.1 * rng.standard_normal((24, 20)), 0, 1)

    r = np.arange(11) - 5.0
    g1 = np.exp(-(r ** 2) / (2 * 1.5 ** 2))
    g1 /= g1.sum()
    w = np.outer(g1, g1)

    def smooth(a):
        return ndimage.correlate(a, w, mode="nearest")

    C1, C2 = 0.01 ** 2, 0.03 ** 2
    mx, my = smooth(x), smooth(x0)
    sxx = smooth(x * x) - mx ** 2
    syy = smooth(x0 * x0) - my ** 2
    sxy = smooth(x * x0) - mx * my
    want = np.mean(((2 * mx * my + C1) * (2 * sxy + C2))
                   / ((mx ** 2 + my ** 2 + C1) * (sxx + syy + C2)))

    got = float(wx.ssim(jnp.asarray(x), jnp.asarray(x0)))
    assert np.isclose(got, want, atol=1e-6)
    assert np.isclose(float(wx.ssim(jnp.asarray(x0), jnp.asarray(x0))), 1.0)


def test_wiggle_data():
    wav = RNG.standard_normal((32, 3))
    traces = viz.wiggle_data(wav)
    assert len(traces) == 3
    # zero crossings inserted -> more points than samples, zeros present
    assert len(traces[0]["t"]) >= 32
    # Overlap=True reference scaling: 2*dz*sc*wav/max(col range)
    want = 2.0 * wav / np.max(wav.max(0) - wav.min(0))
    got0 = [t["amp"][np.isin(t["t"], np.arange(1.0, 33.0))] for t in traces]
    np.testing.assert_allclose(np.stack(got0, 1), want, atol=1e-12)
    # Overlap=False: sc*wav/(max(0,max)-min(0,min)), bounded by sc
    tr2 = viz.wiggle_data(wav, 1.0, Overlap=False)
    assert np.max(np.abs(np.concatenate([t["amp"] for t in tr2]))) <= 1.0
    # custom axes + ZDir reversal of the trace assignment
    ta = np.linspace(0.0, 1.0, 32)
    za = np.array([0.0, 10.0, 20.0])
    tr3 = viz.wiggle_data(wav, taxis=ta, zaxis=za, ZDir="reverse", zc=False)
    assert [t["offset"] for t in tr3] == [0.0, 10.0, 20.0]
    np.testing.assert_allclose(tr3[0]["t"], ta)
    dz = 10.0
    np.testing.assert_allclose(
        tr3[0]["amp"],
        2 * dz * wav[:, 2] / np.max(wav.max(0) - wav.min(0)), atol=1e-12)
    import pytest
    with pytest.raises(ValueError):
        viz.wiggle_data(wav, taxis=np.arange(5))
    with pytest.raises(ValueError):
        viz.wiggle_data(wav, zaxis=np.arange(5))
    with pytest.raises(ValueError):
        viz.wiggle_data(wav, ZDir="sideways")


def test_relerror_data_matches_device_selector():
    """viz.relerror_data's chosen threshold == the batched device selector
    denoising.relerrorthreshold (Denoising.jl:285-328 single-signal path)."""
    from waveletsext_tpu import denoising as dn
    x = RNG.standard_normal(256)
    coefs = np.asarray(wx.dwt(jnp.asarray(x), "db4", 4))
    d = viz.relerror_data(coefs)
    want = float(dn.relerrorthreshold(jnp.asarray(coefs)))
    assert np.isclose(d["threshold"], want, rtol=1e-6)
    assert len(d["ix"]) == 2 and d["ix"][1] <= d["ix"][0]
    # curve is normalized to [0, 1] in both coordinates
    assert 0.0 <= d["x"].min() and d["x"].max() == 1.0
    assert d["y"].max() == 1.0


def test_viz_renders_with_matplotlib(tmp_path):
    """matplotlib IS available in this image: the render paths must produce
    real figures/PNGs (reference test/visualizations.jl smoke category)."""
    import matplotlib
    matplotlib.use("Agg")
    from waveletsext_tpu import viz

    ax = viz.plot_tfbdry(wx.maketree(16, 4, "dwt"))
    fig = ax.figure
    fig.savefig(tmp_path / "tfbdry.png")
    ax2 = viz.plot_tfbdry2(wx.maketree2d(16, 16, 2, "full"), 16, 16)
    ax2.figure.savefig(tmp_path / "tfbdry2.png")
    ax3 = viz.wiggle(RNG.standard_normal((64, 5)))
    ax3.figure.savefig(tmp_path / "wiggle.png")
    # full reference kwarg surface renders (Visualizations.jl:392-475)
    ax3b = viz.wiggle(RNG.standard_normal((64, 5)),
                      taxis=np.linspace(0, 1, 64), zaxis=np.arange(5) * 2.0,
                      sc=0.8, EdgeColor="navy", FaceColor="tab:red",
                      Overlap=False, Orient="down", ZDir="reverse")
    ax3b.figure.savefig(tmp_path / "wiggle_down.png")
    assert (tmp_path / "wiggle_down.png").stat().st_size > 1000
    coefs = np.asarray(wx.dwt(jnp.asarray(RNG.standard_normal(128)),
                              "db4", 3))
    ax4 = viz.relerrorplot(coefs)
    ax4.figure.savefig(tmp_path / "relerror.png")
    for f in ("tfbdry.png", "tfbdry2.png", "wiggle.png", "relerror.png"):
        assert (tmp_path / f).stat().st_size > 1000, f
