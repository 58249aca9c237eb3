"""Sharding tests: shard-vs-single equivalence on a virtual 8-device mesh
(the multi-host correctness category SURVEY §4 calls for)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

import waveletsext_tpu as wx
from waveletsext_tpu.parallel.sharding import (make_mesh, shard_batch,
                                               jbb_pipeline_sharded,
                                               denoise_step_sharded)
from waveletsext_tpu.parallel import cp

RNG = np.random.default_rng(41)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_dp_jbb_pipeline_matches_single():
    mesh = make_mesh(4, 2)
    x = jnp.asarray(RNG.standard_normal((16, 128)).astype(np.float64))
    xs = shard_batch(x, mesh)
    xw, sigma = jbb_pipeline_sharded(xs, "db4", 4, mesh)
    ref = wx.wpd(x, "db4", 4)
    assert np.allclose(np.asarray(xw), np.asarray(ref), atol=1e-12)
    ex = np.mean(np.asarray(ref), axis=0)
    ex2 = np.mean(np.asarray(ref) ** 2, axis=0)
    assert np.allclose(np.asarray(sigma),
                       np.sqrt(np.maximum(ex2 - ex ** 2, 0)), atol=1e-10)


def test_dp_denoise_step():
    mesh = make_mesh(8, 1)
    x = jnp.asarray(RNG.standard_normal((8, 64)))
    y = denoise_step_sharded(shard_batch(x, mesh), 0.5, "haar", 3, mesh)
    assert y.shape == x.shape


@pytest.mark.parametrize("S,L", [(4, 4), (8, 5)])
def test_cp_wpd_matches_single(S, L):
    """Halo-exchange CP transform must equal the single-device transform."""
    devs = np.asarray(jax.devices()[:S]).reshape(1, S)
    mesh = Mesh(devs, ("dp", "sp"))
    n = 256
    x = jnp.asarray(RNG.standard_normal((3, n)))
    xs = jax.device_put(x, jax.sharding.NamedSharding(mesh, P(None, "sp")))
    got = cp.wpd_cp(xs, "db4", L, mesh)
    ref = wx.wpd(x, "db4", L)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-10)


def test_cp_wpt_matches_single():
    devs = np.asarray(jax.devices()[:8]).reshape(1, 8)
    mesh = Mesh(devs, ("dp", "sp"))
    n = 512
    x = jnp.asarray(RNG.standard_normal((2, n)))
    xs = jax.device_put(x, jax.sharding.NamedSharding(mesh, P(None, "sp")))
    got = cp.wpt_cp(xs, "db4", 6, mesh)
    ref = wx.wpt(x, "db4", 6)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-10)


def test_cp_haar_small_filter():
    devs = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("dp", "sp"))
    x = jnp.asarray(RNG.standard_normal((2, 64)))
    xs = jax.device_put(x, jax.sharding.NamedSharding(mesh, P(None, "sp")))
    got = cp.wpd_cp(xs, "db2", 4, mesh)
    ref = wx.wpd(x, "db2", 4)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-10)


def test_scaling_collective_parser():
    """The scaling benchmark's HLO collective parser must handle plain,
    tuple-typed, and async (-start) collectives with ring factors."""
    import importlib.util
    import pathlib
    spec = importlib.util.spec_from_file_location(
        "scaling", pathlib.Path(__file__).parent.parent
        / "benchmarks" / "scaling.py")
    scaling = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(scaling)
    hlo = """
      %ar = (f32[8,16]{1,0}, f32[8,16]{1,0}) all-reduce(%a, %b), channel_id=1
      %cp = f32[4,4]{1,0} collective-permute(%c), channel_id=2
      %ag = bf16[32]{0} all-gather-start(%d), channel_id=3
    """
    got = scaling.collective_bytes(hlo, 4)
    assert got["all-reduce"] == 2 * 3 / 4 * (2 * 8 * 16 * 4)
    assert got["collective-permute"] == 4 * 4 * 4
    assert got["all-gather"] == 3 / 4 * 32 * 2


def test_scaling_analyze_smoke():
    """analyze() must compile+run on a tiny virtual mesh, report positive
    compute time and nonzero all-reduce bytes for dp>1 JBB moments."""
    import importlib.util
    import pathlib
    spec = importlib.util.spec_from_file_location(
        "scaling", pathlib.Path(__file__).parent.parent
        / "benchmarks" / "scaling.py")
    scaling = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(scaling)
    r = scaling.analyze(2, 1, per_dev_batch=4, n=64, L=3, pipeline="jbb")
    assert r["devices"] == 2
    assert r["per_device_flops"] > 0
    assert r["collective_bytes"].get("all-reduce", 0) > 0
    assert 0 < r["efficiency"] <= 1


def test_sharded_bestbasis_pipeline_matches_single():
    """Full fused best-basis step over a (dp, sp) mesh must equal the
    single-device pipeline (tree and coefficients)."""
    from waveletsext_tpu.parallel.sharding import bestbasis_pipeline_sharded
    mesh = make_mesh(4, 2)
    x = jnp.asarray(RNG.standard_normal((16, 256)).astype(np.float64))
    xs = shard_batch(x, mesh)
    tree_s, coefs_s = bestbasis_pipeline_sharded(xs, "db4", 6, mesh)
    tree_1, coefs_1 = wx.bestbasis_pipeline(x, "db4", 6)
    assert np.array_equal(np.asarray(tree_s), np.asarray(tree_1))
    assert np.allclose(np.asarray(coefs_s), np.asarray(coefs_1), atol=1e-12)


@pytest.mark.parametrize("force", ["halo", "cosets", None])
def test_cp_sdwt_matches_single(force):
    """Position-sharded a-trous SWT == single-device sdwt, via both the
    ring-halo path and the explicit position->coset all_to_all fallback
    (``force='cosets'`` takes the all_to_all route at every level where a
    whole-coset layout exists, i.e. dilation >= n_shards)."""
    devs = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("dp", "sp"))
    n, L = 512, 5  # n_loc=128; deepest halo (F-1)*16 = 112 <= 128
    x = jnp.asarray(RNG.standard_normal((3, n)))
    xs = jax.device_put(x, jax.sharding.NamedSharding(mesh, P(None, "sp")))
    got = cp.sdwt_cp(xs, "db4", L, mesh, force=force)
    ref = wx.sdwt(x, "db4", L)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-10), force


def test_cp_sdwt_auto_uses_cosets_when_halo_too_big():
    """Deep levels where the halo would exceed the shard must still match
    (the automatic rule switches to the all_to_all path)."""
    devs = np.asarray(jax.devices()[:8]).reshape(1, 8)
    mesh = Mesh(devs, ("dp", "sp"))
    n, L = 512, 6  # n_loc=64; depth 5: halo 7*32=224 >> 64
    x = jnp.asarray(RNG.standard_normal((2, n)))
    xs = jax.device_put(x, jax.sharding.NamedSharding(mesh, P(None, "sp")))
    got = cp.sdwt_cp(xs, "db4", L, mesh)
    ref = wx.sdwt(x, "db4", L)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-10)


def test_cp_swpd_matches_single():
    devs = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("dp", "sp"))
    n, L = 128, 4
    x = jnp.asarray(RNG.standard_normal((2, n)))
    xs = jax.device_put(x, jax.sharding.NamedSharding(mesh, P(None, "sp")))
    got = cp.swpd_cp(xs, "db4", L, mesh)
    ref = wx.swpd(x, "db4", L)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-10)


@pytest.mark.parametrize("force", [None, "cosets"])
def test_cp_acdwt_matches_single(force):
    """Position-sharded ACWT (half-filter phase offsets) == single device,
    through both strategies."""
    devs = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("dp", "sp"))
    n, L = 512, 5
    x = jnp.asarray(RNG.standard_normal((2, n)))
    xs = jax.device_put(x, jax.sharding.NamedSharding(mesh, P(None, "sp")))
    got = cp.acdwt_cp(xs, "db4", L, mesh, force=force)
    ref = wx.acdwt(x, "db4", L)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-10), force
    # inverse is filterless and local: reconstruct from the sharded table
    rec = wx.iacdwt(got)
    assert np.allclose(np.asarray(rec), np.asarray(x), atol=1e-10)


def test_cp_depth_guard():
    devs = np.asarray(jax.devices()[:8]).reshape(1, 8)
    mesh = Mesh(devs, ("dp", "sp"))
    x = jnp.asarray(RNG.standard_normal((2, 512)))
    xs = jax.device_put(x, jax.sharding.NamedSharding(mesh, P(None, "sp")))
    with pytest.raises(ValueError, match="too deep"):
        cp.sdwt_cp(xs, "db4", 8, mesh)


@pytest.mark.parametrize("force", [None, "cosets"])
def test_cp_sdwt2_matches_single(force):
    """Column-sharded 2-D a-trous SWT == single-device sdwt2."""
    devs = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("dp", "sp"))
    x = jnp.asarray(RNG.standard_normal((2, 64, 256)))
    xs = jax.device_put(
        x, jax.sharding.NamedSharding(mesh, P(None, None, "sp")))
    got = cp.sdwt2_cp(xs, "db4", 4, mesh, force=force)
    ref = wx.sdwt2(x, "db4", 4)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-10), force
    # the average-based inverse runs on the sharded stack via GSPMD
    rec = wx.isdwt2(got, "db4")
    assert np.allclose(np.asarray(rec), np.asarray(x), atol=1e-10)


def test_sharded_2d_pipeline_matches_single():
    """GSPMD 2-D fused JBB pipeline under a (dp, sp) mesh (image columns on
    sp) == single-device result."""
    from jax.sharding import NamedSharding
    mesh = make_mesh(2, 4)
    x = jnp.asarray(RNG.standard_normal((8, 32, 64)).astype(np.float64))
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", None, "sp")))
    tree_s, coefs_s = wx.bestbasis_pipeline(xs, "db4", 3, is2d=True)
    tree_1, coefs_1 = wx.bestbasis_pipeline(x, "db4", 3, is2d=True)
    assert np.array_equal(np.asarray(tree_s), np.asarray(tree_1))
    assert np.allclose(np.asarray(coefs_s), np.asarray(coefs_1), atol=1e-12)


def test_cp_sdwt2_rejects_bad_level():
    devs = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("dp", "sp"))
    x = jnp.asarray(RNG.standard_normal((2, 64, 1024)))
    xs = jax.device_put(
        x, jax.sharding.NamedSharding(mesh, P(None, None, "sp")))
    with pytest.raises(ValueError, match="L must be in"):
        cp.sdwt2_cp(xs, "db4", 7, mesh)  # min side 64 supports only 6


@pytest.mark.parametrize("S,L", [(4, 3), (8, 4)])
def test_cp_wpd2_matches_single(S, L):
    """Column-sharded 2-D decimated CP == single-device wpd2."""
    devs = np.asarray(jax.devices()[:S]).reshape(1, S)
    mesh = Mesh(devs, ("dp", "sp"))
    x = jnp.asarray(RNG.standard_normal((2, 64, 128)))
    xs = jax.device_put(
        x, jax.sharding.NamedSharding(mesh, P(None, None, "sp")))
    got = cp.wpd2_cp(xs, "db4", L, mesh)
    ref = wx.wpd2(x, "db4", L)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-10)


def test_cp_wpt2_matches_single():
    devs = np.asarray(jax.devices()[:8]).reshape(1, 8)
    mesh = Mesh(devs, ("dp", "sp"))
    x = jnp.asarray(RNG.standard_normal((2, 64, 256)))
    xs = jax.device_put(
        x, jax.sharding.NamedSharding(mesh, P(None, None, "sp")))
    got = cp.wpt2_cp(xs, "db4", 4, mesh)
    ref = wx.wpt2(x, "db4", 4)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-10)


@pytest.mark.parametrize("S,L", [(4, 4), (8, 6)])
def test_cp_iwpt_matches_single(S, L):
    """CP decimated inverse: iwpt_cp(wpt_cp(x)) == x and == single-device
    iwpt on the same leaf slice (round-4: the synthesis mirror of the
    halo+compaction forward level)."""
    devs = np.asarray(jax.devices()[:S]).reshape(1, S)
    mesh = Mesh(devs, ("dp", "sp"))
    n = 512
    x = jnp.asarray(RNG.standard_normal((2, n)))
    xs = jax.device_put(x, jax.sharding.NamedSharding(mesh, P(None, "sp")))
    y = cp.wpt_cp(xs, "db4", L, mesh)
    rec = cp.iwpt_cp(y, "db4", L, mesh)
    assert np.allclose(np.asarray(rec), np.asarray(x), atol=1e-10)
    yref = wx.wpt(x, "db4", L)
    ys = jax.device_put(yref, jax.sharding.NamedSharding(mesh,
                                                         P(None, "sp")))
    rec2 = cp.iwpt_cp(ys, "db4", L, mesh)
    assert np.allclose(np.asarray(rec2), np.asarray(wx.iwpt(yref, "db4", L)),
                       atol=1e-10)


def test_cp_iwpt_haar():
    """F=2 filters have zero synthesis halo (F/2-1 = 0) — exercise that
    branch of the inverse level."""
    devs = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("dp", "sp"))
    x = jnp.asarray(RNG.standard_normal((2, 64)))
    xs = jax.device_put(x, jax.sharding.NamedSharding(mesh, P(None, "sp")))
    rec = cp.iwpt_cp(cp.wpt_cp(xs, "haar", 4, mesh), "haar", 4, mesh)
    assert np.allclose(np.asarray(rec), np.asarray(x), atol=1e-10)


@pytest.mark.parametrize("force", [None, "halo", "cosets"])
def test_cp_isdwt_matches_single(force):
    """Position-sharded average-based SWT inverse == single-device isdwt,
    through both the ring-halo and coset all_to_all strategies."""
    devs = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("dp", "sp"))
    n, L = 512, 5
    x = jnp.asarray(RNG.standard_normal((3, n)))
    xs = jax.device_put(x, jax.sharding.NamedSharding(mesh, P(None, "sp")))
    xw = cp.sdwt_cp(xs, "db4", L, mesh, force=force)
    rec = cp.isdwt_cp(xw, "db4", mesh, force=force)
    assert np.allclose(np.asarray(rec), np.asarray(x), atol=1e-10), force
    # and against the single-device inverse of a thresholded stack
    xw1 = wx.sdwt(x, "db4", L)
    sh = jnp.where(jnp.abs(xw1) > 0.5, xw1, 0.0)
    shs = jax.device_put(sh, jax.sharding.NamedSharding(
        mesh, P(None, None, "sp")))
    got = cp.isdwt_cp(shs, "db4", mesh, force=force)
    want = wx.isdwt(sh, "db4")
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-10), force


@pytest.mark.parametrize("force", [None, "cosets"])
def test_cp_isdwt2_matches_single(force):
    """Column-sharded 2-D average inverse == single-device isdwt2 (one
    grouped collective set serves all four subband planes per level)."""
    devs = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("dp", "sp"))
    x = jnp.asarray(RNG.standard_normal((2, 64, 256)))
    xs = jax.device_put(
        x, jax.sharding.NamedSharding(mesh, P(None, None, "sp")))
    xw = cp.sdwt2_cp(xs, "db4", 4, mesh, force=force)
    rec = cp.isdwt2_cp(xw, "db4", mesh, force=force)
    assert np.allclose(np.asarray(rec), np.asarray(x), atol=1e-10), force


def test_cp_iwpt2_matches_single():
    """Column-sharded 2-D decimated inverse: round trip through wpt2_cp and
    equality with the single-device iwpt2."""
    devs = np.asarray(jax.devices()[:8]).reshape(1, 8)
    mesh = Mesh(devs, ("dp", "sp"))
    x = jnp.asarray(RNG.standard_normal((2, 64, 256)))
    xs = jax.device_put(
        x, jax.sharding.NamedSharding(mesh, P(None, None, "sp")))
    y = cp.wpt2_cp(xs, "db4", 4, mesh)
    rec = cp.iwpt2_cp(y, "db4", 4, mesh)
    assert np.allclose(np.asarray(rec), np.asarray(x), atol=1e-10)
    yref = wx.wpt2(x, "db4", 4)
    ys = jax.device_put(
        yref, jax.sharding.NamedSharding(mesh, P(None, None, "sp")))
    rec2 = cp.iwpt2_cp(ys, "db4", 4, mesh)
    assert np.allclose(np.asarray(rec2),
                       np.asarray(wx.iwpt2(yref, "db4", 4)), atol=1e-10)


def test_cp_swt_denoise_roundtrip_matches_single():
    """The fused sharded denoise (sdwt -> threshold -> adjoint average
    inverse, ONE shard_map program) matches the single-device flow to f64
    tolerance — the VERDICT round-3 'done' criterion for CP inverses."""
    devs = np.asarray(jax.devices()[:8]).reshape(1, 8)
    mesh = Mesh(devs, ("dp", "sp"))
    n, L = 1024, 4
    x = jnp.asarray(RNG.standard_normal((3, n)))
    xs = jax.device_put(x, jax.sharding.NamedSharding(mesh, P(None, "sp")))
    for soft, under in ((False, False), (True, True)):
        got = cp.swt_denoise_cp(xs, "db4", L, 0.7, mesh, soft=soft,
                                undersmooth=under)
        xw = wx.sdwt(x, "db4", L)
        if soft:
            sh = jnp.sign(xw) * jnp.maximum(jnp.abs(xw) - 0.7, 0.0)
        else:
            sh = jnp.where(jnp.abs(xw) > 0.7, xw, 0.0)
        if under:
            sh = sh.at[..., 0, :].set(xw[..., 0, :])
        want = wx.isdwt(sh, "db4")
        assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-10)


@pytest.mark.parametrize("force", [None, "cosets"])
def test_cp_iswpd_matches_single(force):
    """Tree-driven CP inverse SWPD == single-device iswpd on a non-trivial
    best-basis tree (one grouped collective set per depth)."""
    devs = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("dp", "sp"))
    n, L = 256, 4
    x = jnp.asarray(RNG.standard_normal((3, n)))
    xw1 = wx.swpd(x, "db4", L)
    tree = np.asarray(wx.bestbasistree(xw1, wx.JBB(redundant=True)))
    assert wx.isvalidtree(tree, "binary") and tree.any()
    xs = jax.device_put(x, jax.sharding.NamedSharding(mesh, P(None, "sp")))
    xw = cp.swpd_cp(xs, "db4", L, mesh, force=force)
    got = cp.iswpd_cp(xw, "db4", tree, mesh, force=force)
    want = wx.iswpd(xw1, "db4", tree)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-10), force


@pytest.mark.parametrize("force", [None, "cosets"])
def test_cp_acdwt2_matches_single(force):
    """Column-sharded 2-D ACWT == single-device acdwt2; the filterless
    inverse reconstructs locally from the sharded stack."""
    devs = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("dp", "sp"))
    x = jnp.asarray(RNG.standard_normal((2, 64, 256)))
    xs = jax.device_put(
        x, jax.sharding.NamedSharding(mesh, P(None, None, "sp")))
    got = cp.acdwt2_cp(xs, "db4", 4, mesh, force=force)
    ref = wx.acdwt2(x, "db4", 4)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-10), force
    rec = wx.iacdwt2(got)
    assert np.allclose(np.asarray(rec), np.asarray(x), atol=1e-10)


def test_cp_swt_denoise_per_signal_thresholds():
    """swt_denoise_cp accepts per-signal (..., 1) threshold arrays (they
    replicate across the ring; the threshold applies locally)."""
    devs = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("dp", "sp"))
    n, L = 512, 3
    x = jnp.asarray(RNG.standard_normal((3, n)))
    t = jnp.asarray(RNG.uniform(0.3, 0.9, (3, 1)))
    xs = jax.device_put(x, jax.sharding.NamedSharding(mesh, P(None, "sp")))
    got = cp.swt_denoise_cp(xs, "db4", L, t, mesh)
    xw = wx.sdwt(x, "db4", L)
    sh = jnp.where(jnp.abs(xw) > t[..., None], xw, 0.0)
    want = wx.isdwt(sh, "db4")
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-10)
