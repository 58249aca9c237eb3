"""Best-basis tests (reference test/bestbasis.jl + an exhaustive-search
optimality check the reference lacks)."""

import numpy as np
import jax.numpy as jnp
import pytest

import waveletsext_tpu as wx
from waveletsext_tpu import basis

RNG = np.random.default_rng(17)


@pytest.fixture(scope="module")
def data():
    x = jnp.asarray(RNG.standard_normal((5, 16)))
    y = jnp.asarray(RNG.standard_normal((5, 16, 16)))
    return {
        "x": x, "y": y,
        "xw": wx.wpd(x, "haar"),
        "xsw": wx.swpd(x, "haar"),
        "xacw": wx.acwpd(x, "haar"),
        "yw": wx.wpd2(y, "haar"),
        "ysw": wx.swpd2(y, "haar"),
    }


def test_bb(data):
    t = basis.bestbasistree(data["xw"][0], basis.BB())
    assert wx.isvalidtree(t, "binary")
    ts = basis.bestbasistreeall(data["xw"], basis.BB())
    assert ts.shape[0] == 5 and wx.isvalidtree(ts[0], "binary")
    ts = basis.bestbasistreeall(
        data["xw"], basis.BB(basis.LogEnergyEntropyCost(), False))
    assert wx.isvalidtree(ts[0], "binary")
    ts = basis.bestbasistreeall(data["xsw"], basis.BB(redundant=True))
    assert wx.isvalidtree(ts[0], "binary")
    ts = basis.bestbasistreeall(data["xacw"], basis.BB(redundant=True))
    assert wx.isvalidtree(ts[0], "binary")
    t = basis.bestbasistree(data["yw"][0], basis.BB(), is2d=True)
    assert wx.isvalidtree(t, "quad")
    ts = basis.bestbasistreeall(data["yw"], basis.BB(), is2d=True)
    assert wx.isvalidtree(ts[0], "quad")
    ts = basis.bestbasistreeall(data["ysw"], basis.BB(redundant=True), is2d=True)
    assert wx.isvalidtree(ts[0], "quad")


def test_jbb(data):
    assert wx.isvalidtree(basis.bestbasistree(data["xw"]), "binary")
    assert wx.isvalidtree(
        basis.bestbasistree(data["xw"], basis.JBB(basis.NormCost(), False)),
        "binary")
    assert wx.isvalidtree(
        basis.bestbasistree(data["xsw"], basis.JBB(redundant=True)), "binary")
    assert wx.isvalidtree(
        basis.bestbasistree(data["xacw"], basis.JBB(redundant=True)), "binary")
    assert wx.isvalidtree(basis.bestbasistree(data["yw"], is2d=True), "quad")
    assert wx.isvalidtree(
        basis.bestbasistree(data["yw"], basis.JBB(basis.NormCost(), False),
                            is2d=True), "quad")
    assert wx.isvalidtree(
        basis.bestbasistree(data["ysw"], basis.JBB(redundant=True), is2d=True),
        "quad")


def test_lsdb(data):
    assert wx.isvalidtree(basis.bestbasistree(data["xw"], basis.LSDB()),
                          "binary")
    assert wx.isvalidtree(
        basis.bestbasistree(data["xsw"], basis.LSDB(redundant=True)), "binary")
    assert wx.isvalidtree(
        basis.bestbasistree(data["xacw"], basis.LSDB(redundant=True)), "binary")
    assert wx.isvalidtree(basis.bestbasistree(data["yw"], basis.LSDB(),
                                              is2d=True), "quad")
    assert wx.isvalidtree(
        basis.bestbasistree(data["ysw"], basis.LSDB(redundant=True), is2d=True),
        "quad")


def _leaf_total(tree, costs):
    """Total cost of the basis leaves implied by ``tree``."""
    total = 0.0
    k = len(costs)

    def rec(i):
        nonlocal total
        if i - 1 < len(tree) and tree[i - 1]:
            rec(2 * i)
            rec(2 * i + 1)
        else:
            total += costs[i - 1]
    rec(1)
    return total


def _all_trees(nt, k):
    """Enumerate all valid binary trees (split masks) for nt-node trees whose
    children cost indices stay within k."""
    out = []

    def rec(tree, frontier):
        out.append(tree.copy())
        for i in frontier:
            if i <= nt and 2 * i + 1 <= k and not tree[i - 1]:
                t2 = tree.copy()
                t2[i - 1] = True
                rec(t2, [j for j in frontier if j != i] + [2 * i, 2 * i + 1])
    rec(np.zeros(nt, dtype=bool), [1])
    return out


def test_cw_selection_is_optimal():
    """The CW pruning must find the global minimum over all valid trees."""
    rng = np.random.default_rng(3)
    k = 15   # nodes of a 3-level decomposition of n=8
    nt = 7
    for _ in range(5):
        costs = rng.standard_normal(k) + 2.0
        tree = basis.bestbasis_treeselection(costs.copy(), 8)
        got = _leaf_total(tree, costs)
        best = min(_leaf_total(t, costs) for t in _all_trees(nt, k))
        assert np.isclose(got, best)


def test_selection_batched_matches_single():
    rng = np.random.default_rng(4)
    costs = rng.standard_normal((6, 15)) + 1.0
    trees = basis.bestbasis_treeselection(costs.copy(), 8)
    for i in range(6):
        ti = basis.bestbasis_treeselection(costs[i].copy(), 8)
        assert np.array_equal(trees[i], ti)


def test_jbb_reconstruction_roundtrip(data):
    tree = basis.bestbasistree(data["xw"])
    coefs = wx.getbasiscoef(data["xw"], tree)
    assert np.allclose(wx.iwpt(coefs, "haar", tree), data["x"])


def test_vectorized_selection_matches_sequential_oracle():
    """The level-synchronous CW pruning must match the reference-style
    sequential reverse-node loop on random costs, binary and quad, min and
    max, single and batched."""
    rng = np.random.default_rng(7)
    # binary: n=64, costs down to depth 4 -> k = 2^5 - 1 = 31
    for sel in ("min", "max"):
        c = rng.standard_normal((8, 31)) ** 2
        got = basis.bestbasis_treeselection(c, 64, selection=sel)
        want = basis._bestbasis_treeselection_seq(c, 64, selection=sel)
        assert np.array_equal(got, want)
        c1 = c[0]
        got1 = basis.bestbasis_treeselection(c1, 64, selection=sel)
        want1 = basis._bestbasis_treeselection_seq(c1, 64, selection=sel)
        assert np.array_equal(got1, want1)
    # quad: 32x32 image, costs to depth 3 -> k = (4^4-1)/3 = 85
    for sel in ("min", "max"):
        c = rng.standard_normal((4, 85)) ** 2
        got = basis.bestbasis_treeselection(c, 32, 32, selection=sel)
        want = basis._bestbasis_treeselection_seq(c, 32, 32, selection=sel)
        assert np.array_equal(got, want)


def test_device_selection_matches_host():
    """The traceable jnp selection must equal the host selection exactly on
    random costs, binary and quad, min and max, single and batched."""
    rng = np.random.default_rng(11)
    for sel in ("min", "max"):
        c = rng.standard_normal((6, 31)) ** 2
        dev = np.asarray(basis.bestbasis_treeselection_dev(
            jnp.asarray(c), 64, selection=sel))
        host = basis.bestbasis_treeselection(c, 64, selection=sel)
        assert np.array_equal(dev, host)
        cq = rng.standard_normal((3, 85)) ** 2
        devq = np.asarray(basis.bestbasis_treeselection_dev(
            jnp.asarray(cq), 32, 32, selection=sel))
        hostq = basis.bestbasis_treeselection(cq, 32, 32, selection=sel)
        assert np.array_equal(devq, hostq)


def test_dynamic_extraction_matches_static():
    rng = np.random.default_rng(12)
    x = rng.standard_normal((5, 128))
    xw = wx.wpd(x, "db4", 5)
    tree = wx.bestbasistree(xw)
    got = np.asarray(wx.getbasiscoef_dyn(xw, jnp.asarray(tree)))
    want = np.asarray(wx.getbasiscoef(xw, tree))
    assert np.allclose(got, want)
    # per-signal device trees vs host per-signal extraction
    trees = wx.bestbasistreeall(xw)
    got = np.asarray(wx.getbasiscoef_dyn(xw, jnp.asarray(trees)))
    want = np.asarray(wx.getbasiscoefall(xw, trees))
    assert np.allclose(got, want)


def test_dynamic_extraction_2d_matches_static():
    rng = np.random.default_rng(13)
    x = rng.standard_normal((4, 32, 32))
    xw = wx.wpd2(x, "haar", 3)
    tree = wx.bestbasistree(xw, is2d=True)
    got = np.asarray(wx.getbasiscoef2_dyn(xw, jnp.asarray(tree)))
    want = np.asarray(wx.getbasiscoef2(xw, tree))
    assert np.allclose(got, want)


def test_fused_pipelines_match_host_composition():
    rng = np.random.default_rng(14)
    x = rng.standard_normal((8, 256))
    tree, coefs = wx.bestbasis_pipeline(x, "db4", 6)
    xw = wx.wpd(x, "db4", 6)
    host_tree = wx.bestbasistree(xw)
    assert np.array_equal(np.asarray(tree), host_tree)
    assert np.allclose(np.asarray(coefs), np.asarray(wx.getbasiscoef(xw, host_tree)))
    trees, coefs = wx.bestbasisall_pipeline(x, "db4", 6)
    host_trees = wx.bestbasistreeall(xw)
    assert np.array_equal(np.asarray(trees), host_trees)
    assert np.allclose(np.asarray(coefs),
                       np.asarray(wx.getbasiscoefall(xw, host_trees)))
    # 2-D
    ximg = rng.standard_normal((4, 32, 32))
    tree2, coefs2 = wx.bestbasis_pipeline(ximg, "haar", 3, is2d=True)
    xw2 = wx.wpd2(ximg, "haar", 3)
    host2 = wx.bestbasistree(xw2, is2d=True)
    assert np.array_equal(np.asarray(tree2), host2)
    assert np.allclose(np.asarray(coefs2),
                       np.asarray(wx.getbasiscoef2(xw2, host2)))


def test_dynamic_inverse_matches_static():
    rng = np.random.default_rng(21)
    x = rng.standard_normal((6, 256))
    xw = wx.wpd(x, "db4", 6)
    tree = wx.bestbasistree(xw)
    coefs = wx.getbasiscoef(xw, tree)
    want = np.asarray(wx.iwpt(coefs, "db4", tree))
    got = np.asarray(wx.iwpt_dyn(jnp.asarray(coefs), "db4", jnp.asarray(tree)))
    assert np.allclose(got, want, atol=1e-12)
    assert np.allclose(got, x, atol=1e-10)


def test_dynamic_inverse_per_signal_trees():
    """A batch of per-signal trees reconstructs in one call (the reference
    loops signals)."""
    rng = np.random.default_rng(22)
    x = rng.standard_normal((5, 128))
    xw = wx.wpd(x, "coif2", 5)
    trees = wx.bestbasistreeall(xw)
    assert len(np.unique(trees.astype(int) @ (1 << np.arange(trees.shape[1]) % 63))) >= 1
    coefs = wx.getbasiscoefall(xw, trees)
    got = np.asarray(wx.iwpt_dyn(jnp.asarray(coefs), "coif2",
                                 jnp.asarray(trees)))
    assert np.allclose(got, x, atol=1e-10)
    # per-signal static loop oracle
    want = np.stack([np.asarray(wx.iwpt(coefs[i], "coif2", trees[i]))
                     for i in range(len(x))])
    assert np.allclose(got, want, atol=1e-12)


def test_dynamic_inverse_2d():
    rng = np.random.default_rng(23)
    x = rng.standard_normal((3, 32, 32))
    xw = wx.wpd2(x, "haar", 3)
    tree = wx.bestbasistree(xw, is2d=True)
    coefs = wx.getbasiscoef2(xw, tree)
    got = np.asarray(wx.iwpt2_dyn(jnp.asarray(coefs), "haar",
                                  jnp.asarray(tree)))
    assert np.allclose(got, x, atol=1e-10)


def test_iswpd_dyn_matches_static():
    rng = np.random.default_rng(24)
    x = rng.standard_normal((4, 128))
    xw = wx.swpd(x, "db2", 4)
    costs = basis.tree_costs(xw, basis.JBB(redundant=True))
    tree = basis.bestbasis_treeselection(np.asarray(costs), 128)
    want = np.asarray(wx.iswpd(xw, "db2", tree))
    got = np.asarray(wx.iswpd_dyn(xw, "db2", jnp.asarray(tree)))
    assert np.allclose(got, want, atol=1e-10)


def test_pipeline_single_signal_bb():
    """bestbasis_pipeline on an unbatched signal with BB (regression: the
    streamed rewrite assumed a leading batch axis)."""
    x = jnp.asarray(RNG.standard_normal(64))
    tree, coefs = wx.bestbasis_pipeline(x, "db4", 3, method=wx.BB())
    assert coefs.shape == (64,)
    ref_tree = wx.bestbasistree(wx.wpd(x, "db4", 3)[None][0][None] if False
                                else wx.wpd(x, "db4", 3), wx.BB())
    assert np.array_equal(np.asarray(tree), np.asarray(ref_tree))
    rec = wx.iwpt_dyn(coefs, "db4", tree)
    assert np.allclose(np.asarray(rec), np.asarray(x), atol=1e-10)


def test_pipeline_rejects_bad_level():
    with pytest.raises(ValueError):
        wx.bestbasis_pipeline(jnp.zeros((4, 64)), "db4", 10)


@pytest.mark.parametrize("method", ["jbb", "bb", "lsdb"])
def test_stack_costs_extract_match_streamed(method):
    """The stack-based cost/extraction twins (used when the Pallas wpd2
    stack kernel engages on TPU) must match the streamed path exactly for
    every best-basis method, including per-signal BB trees."""
    m = {"jbb": wx.JBB(), "bb": wx.BB(), "lsdb": wx.LSDB()}[method]
    X = jnp.asarray(RNG.standard_normal((4, 32, 32)).astype(np.float32))
    L = 3
    xw = wx.wpd2(X, "db4", L)
    costs_stream = basis._stream_costs(X, "db4", L, m, True)
    costs_stack = basis._stack_costs(xw, m, True)
    np.testing.assert_allclose(np.asarray(costs_stack),
                               np.asarray(costs_stream), atol=1e-5)
    tree = basis.bestbasis_treeselection_dev(costs_stream, 32, 32)
    ext_stream = basis._stream_extract(X, "db4", L, tree, True)
    ext_stack = basis._stack_extract(xw, tree, True)
    np.testing.assert_allclose(np.asarray(ext_stack),
                               np.asarray(ext_stream), atol=1e-5)


def test_jbb_covariance_costs_match_streamed():
    """The one-pass covariance JBB moments must match the streamed per-level
    moments (and the host tree_costs) to float64 precision."""
    from waveletsext_tpu.basis import _jbb_costs_covariance, _stream_costs
    from waveletsext_tpu.filters import wavelet
    x = jnp.asarray(RNG.standard_normal((32, 128)))
    got = _jbb_costs_covariance(x, wavelet("db4"), 5, wx.JBB().cost)
    ref = wx.tree_costs(wx.wpd(x, "db4", 5), wx.JBB())
    streamed = _stream_costs(x, "db4", 5, wx.JBB(), False)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-9)
    assert np.allclose(np.asarray(streamed), np.asarray(ref), atol=1e-11)


def test_operator_extract_matches_stream_extract():
    """The one-matmul shared-tree extraction (X @ G_tree, round 5) must
    equal the streamed leaf-mask extraction and the covariance JBB costs
    must drive the same tree."""
    rng = np.random.default_rng(17)
    B, n, L = 16, 256, 8
    x = jnp.asarray(rng.standard_normal((B, n)))
    tree, coefs = wx.bestbasis_pipeline(x, "db4", L)
    got = basis._operator_extract(x, "db4", L, tree)
    assert np.allclose(np.asarray(got), np.asarray(coefs), atol=1e-8)
    # covariance costs select the same tree as the streamed moments
    from waveletsext_tpu.transforms.dwt import _wt as dwt_wt
    w = dwt_wt("db4")
    c_cov = basis._jbb_costs_covariance(x, w, L, wx.JBB().cost)
    t_cov = basis.bestbasis_treeselection_dev(c_cov, n, None)
    assert np.array_equal(np.asarray(t_cov), np.asarray(tree))


def test_operator_pipeline_dispatch_matches_streamed(monkeypatch):
    """The big-batch one-matmul JBB pipeline (covariance costs + operator
    extraction) must produce the same tree and coefficients as the streamed
    dispatch."""
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.standard_normal((32, 128)))
    t0, c0 = wx.bestbasis_pipeline(x, "db4", 5)
    monkeypatch.setattr(basis, "OPERATOR_PIPELINE_MIN_BATCH", 8)
    basis.bestbasis_pipeline.clear_cache()
    t1, c1 = wx.bestbasis_pipeline(x, "db4", 5)
    basis.bestbasis_pipeline.clear_cache()
    assert np.array_equal(np.asarray(t0), np.asarray(t1))
    assert np.allclose(np.asarray(c0), np.asarray(c1), atol=1e-8)


def test_lsdb_operator_extract_dispatch_matches(monkeypatch):
    """Big-batch LSDB extraction through the one-matmul path must match the
    streamed dispatch (shared LSDB tree; per-signal BB trees unaffected)."""
    rng = np.random.default_rng(41)
    x = jnp.asarray(rng.standard_normal((40, 64)))
    t0, c0 = wx.bestbasis_pipeline(x, "db4", 4, method=wx.LSDB())
    # drop BOTH gates so the streamed-costs + operator-extract branch is
    # the one actually exercised (the stacked-costs branch would otherwise
    # early-return with the streamed extract at this batch size)
    monkeypatch.setattr(basis, "OPERATOR_PIPELINE_MIN_BATCH", 8)
    monkeypatch.setattr(basis, "LSDB_STACK_MAX_BATCH", 0)
    basis.bestbasis_pipeline.clear_cache()
    t1, c1 = wx.bestbasis_pipeline(x, "db4", 4, method=wx.LSDB())
    basis.bestbasis_pipeline.clear_cache()
    assert np.array_equal(np.asarray(t0), np.asarray(t1))
    assert np.allclose(np.asarray(c0), np.asarray(c1), atol=1e-8)
    # per-signal BB trees still reconstruct through the streamed sweep
    tb, cb = wx.bestbasisall_pipeline(x, "db4", 4)
    assert tb.shape[0] == x.shape[0] and cb.shape == x.shape
