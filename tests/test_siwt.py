"""SIWT tests (reference test/transforms.jl SIWT @testset incl. golden
costs)."""

import numpy as np
import jax.numpy as jnp
import pytest

import waveletsext_tpu as wx
from waveletsext_tpu.transforms import siwt


SIGNAL = jnp.asarray([2.0, 3.0, -4.0, 5.0])


def test_node_validation():
    node = siwt.make_node(SIGNAL, 0, 0, 0)
    assert node.depth == 0 and node.cost == pytest.approx(1.208, abs=1e-3)
    with pytest.raises(ValueError):
        siwt.SiwtNode(2, 4, 0, 0.0, SIGNAL)   # invalid IndexAtDepth
    with pytest.raises(ValueError):
        siwt.SiwtNode(2, 0, 4, 0.0, SIGNAL)   # invalid TransformShift
    with pytest.raises(ValueError):
        siwt.make_node(np.random.randn(4, 4), 0, 0, 0)  # 2D unsupported


def test_object_validation():
    obj = siwt.SiwtObject(SIGNAL, "haar")
    assert obj.signal_size == 4
    assert obj.max_transform_level == 0
    assert obj.max_shifted_transform_levels == 0
    assert obj.best_tree == [(0, 0, 0)]
    with pytest.raises(ValueError):
        siwt.SiwtObject(SIGNAL, "haar", 3)      # too many levels
    with pytest.raises(ValueError):
        siwt.SiwtObject(SIGNAL, "haar", 0, 4)   # too many shift levels


def test_transform_nodes_match_dwt():
    """(test/transforms.jl:212-222 construction, asserted here for real)."""
    obj = siwt.siwpd(SIGNAL, "haar", 1, 1)
    d1 = wx.dwt(SIGNAL, "haar", 1)
    assert np.allclose(obj.nodes[(1, 0, 0)].value, d1[:2])
    assert np.allclose(obj.nodes[(1, 1, 0)].value, d1[2:])
    d1s = wx.dwt(jnp.roll(SIGNAL, 1), "haar", 1)
    assert np.allclose(obj.nodes[(1, 0, 1)].value, d1s[:2])
    assert np.allclose(obj.nodes[(1, 1, 1)].value, d1s[2:])


def test_golden_costs():
    """(test/transforms.jl:232-258)."""
    expected = {(0, 0, 0): 1.208, (1, 0, 0): 0.382, (1, 0, 1): 0.402,
                (1, 1, 0): 0.259, (1, 1, 1): 0.566}
    obj = siwt.siwpd(SIGNAL, "haar", 1)
    for k, v in expected.items():
        assert obj.nodes[k].cost == pytest.approx(v, abs=1e-3), k
    siwt.bestbasistree(obj)
    expected_after = {(0, 0, 0): 0.641, (1, 0, 0): 0.382, (1, 1, 0): 0.259}
    assert set(obj.best_tree) == set(expected_after)
    assert set(obj.nodes.keys()) == set(expected_after)
    for k, v in expected_after.items():
        assert obj.nodes[k].cost == pytest.approx(v, abs=1e-3), k
    assert obj.min_cost == pytest.approx(0.641, abs=1e-3)
    assert obj.isvalidtree()


def test_bestbasis_root_only():
    obj = siwt.SiwtObject(SIGNAL, "haar", 0, 0)
    siwt.bestbasistree(obj)
    assert obj.best_tree == [(0, 0, 0)]
    assert obj.min_cost == obj.nodes[(0, 0, 0)].cost
    assert obj.isvalidtree()


@pytest.mark.parametrize("wt", ["haar", "db4"])
def test_reconstruction(wt):
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.standard_normal(16))
    obj = siwt.siwpd(x, wt)
    siwt.bestbasistree(obj)
    rec = siwt.isiwpd(obj)
    assert np.allclose(rec, x)


def test_reconstruction_full_no_prune():
    """Reconstruct directly from the deepest unshifted leaves."""
    x = jnp.asarray(np.random.default_rng(5).standard_normal(8))
    obj = siwt.siwpd(x, "db4", 3, 1)
    siwt.bestbasistree(obj)
    assert np.allclose(siwt.isiwpd(obj), x)


# ---------------------------------------------------------------------------
# Dense batched path (transforms/siwt_dense.py)
# ---------------------------------------------------------------------------

from waveletsext_tpu.transforms import siwt_dense


def _reference_node_set(L, budget):
    """Independent oracle: the reference's siwpd_subtree recursion rule
    (SIWT.jl:93-136) generating the (depth, index, shift) node set.  Kept
    here (not in the library) so the dense shift_masks validity rule is
    checked against a second implementation, not against itself."""
    nodes = set()

    def expand(d, b, s, rd):
        nodes.add((d, b, s))
        if d == L or (rd == 0 and s > 0):
            return
        child_rd = rd - 1 if s > 0 else min(rd, L - (d + 1))
        expand(d + 1, 2 * b, s, child_rd)
        expand(d + 1, 2 * b + 1, s, child_rd)
        if rd > 0:
            cs = s + (1 << d)
            expand(d + 1, 2 * b, cs, rd - 1)
            expand(d + 1, 2 * b + 1, cs, rd - 1)

    expand(0, 0, 0, budget)
    return nodes


@pytest.mark.parametrize("L,d", [(3, 3), (3, 1), (4, 2)])
def test_dense_node_set_matches_object(L, d):
    """The static (depth, shift) validity masks must generate exactly the
    reference recursion's node set (SIWT.jl:93-136) — oracle recursion
    implemented independently in this test."""
    x = jnp.asarray(np.random.default_rng(9).standard_normal(16))
    obj = siwt.siwpd(x, "haar", L, d)
    expect = _reference_node_set(L, d)
    assert set(obj.nodes.keys()) == expect
    valid, _ = siwt_dense.shift_masks(L, d)
    mask_set = {(dd, b, s)
                for dd in range(L + 1)
                for b in range(1 << dd)
                for s in np.nonzero(valid[dd])[0].tolist()}
    assert mask_set == expect


@pytest.mark.parametrize("wt", ["haar", "db4"])
def test_dense_bestbasis_matches_object_path(wt):
    """Dense 3-way min sweep == host dict selection: same min cost and the
    same reconstruction."""
    rng = np.random.default_rng(77)
    x = jnp.asarray(rng.standard_normal(16))
    obj = siwt.siwpd(x, wt, 4, 4)
    siwt.bestbasistree(obj)

    vals, costs = siwt_dense.siwpd_dense(x, wt, 4, 4)
    decisions, mincost = siwt_dense.bestbasis_dense(costs, 4, 4)
    assert float(mincost) == pytest.approx(obj.min_cost, rel=1e-6)
    rec = siwt_dense.isiwpd_dense(vals, decisions, wt)
    assert np.allclose(np.asarray(rec), np.asarray(x), atol=1e-6)


def test_dense_batch_matches_single():
    rng = np.random.default_rng(4)
    X = jnp.asarray(rng.standard_normal((5, 16)))
    vals, costs = siwt_dense.siwpd_dense(X, "db4", 3, 3)
    for i in range(5):
        vi, ci = siwt_dense.siwpd_dense(X[i], "db4", 3, 3)
        for d in range(4):
            assert np.allclose(np.asarray(vals[d][i]), np.asarray(vi[d]),
                               atol=1e-10)
            assert np.allclose(np.asarray(costs[d][i]), np.asarray(ci[d]),
                               atol=1e-10)


def test_dense_pipeline_roundtrip_and_threshold():
    rng = np.random.default_rng(12)
    X = jnp.asarray(rng.standard_normal((3, 32)))
    rec, mincost = siwt_dense.siwt_bestbasis_pipeline(X, "db4")
    assert np.allclose(np.asarray(rec), np.asarray(X), atol=1e-6)
    assert mincost.shape == (3,)
    # thresholding at t=0 is a no-op; huge t zeroes the signal
    rec0, _ = siwt_dense.siwt_bestbasis_pipeline(X, "db4", t=0.0)
    assert np.allclose(np.asarray(rec0), np.asarray(X), atol=1e-6)
    recinf, _ = siwt_dense.siwt_bestbasis_pipeline(X, "db4", t=1e9)
    assert np.allclose(np.asarray(recinf), 0.0)


def test_dense_golden_costs():
    """Same goldens as test_golden_costs, via the dense path."""
    vals, costs = siwt_dense.siwpd_dense(SIGNAL, "haar", 1, 1)
    assert float(costs[0][0, 0]) == pytest.approx(1.208, abs=1e-3)
    assert float(costs[1][0, 0]) == pytest.approx(0.382, abs=1e-3)
    assert float(costs[1][0, 1]) == pytest.approx(0.402, abs=1e-3)
    assert float(costs[1][1, 0]) == pytest.approx(0.259, abs=1e-3)
    assert float(costs[1][1, 1]) == pytest.approx(0.566, abs=1e-3)
    _, mincost = siwt_dense.bestbasis_dense(costs, 1, 1)
    assert float(mincost) == pytest.approx(0.641, abs=1e-3)


@pytest.mark.parametrize("budget", [1, 2, None])
def test_packed_pipeline_matches_dense(budget):
    """Budget-packed fused pipeline == the dense masked sweep composed from
    the public dense functions (values, best-basis decisions, inverse),
    for partial budgets and the full budget d=L."""
    rng = np.random.default_rng(11)
    X = jnp.asarray(rng.standard_normal((3, 64)))
    L = 4
    d = L if budget is None else budget
    rec, mincost = siwt_dense.siwt_bestbasis_pipeline(X, "db4", L, d)
    vals, costs = siwt_dense.siwpd_dense(X, "db4", L, d)
    decs, mincost_dense = siwt_dense.bestbasis_dense(costs, L, d)
    rec_dense = siwt_dense.isiwpd_dense(vals, decs, "db4")
    assert np.allclose(np.asarray(mincost), np.asarray(mincost_dense),
                       atol=1e-10)
    assert np.allclose(np.asarray(rec), np.asarray(rec_dense), atol=1e-10)
    # perfect reconstruction either way
    assert np.allclose(np.asarray(rec), np.asarray(X), atol=1e-10)


@pytest.mark.parametrize("budget,L", [(1, 9), (2, 12), (3, 10)])
def test_deep_layout_pipeline_matches_shallow(budget, L, monkeypatch):
    """The deep (samples-on-sublanes) layout the pipeline switches to at
    n >= 2048 must match the all-shallow packed layout exactly: same
    reconstruction, same min cost, with and without threshold fusion."""
    rng = np.random.default_rng(5)
    X = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0.5, 1.5, (2,)).astype(np.float32))
    assert siwt_dense._deep_transition(4096, L) is not None  # hybrid engages
    rec, mc = siwt_dense.siwt_bestbasis_pipeline(X, "db4", L, budget)
    rec_t, mc_t = siwt_dense.siwt_bestbasis_pipeline(X, "db4", L, budget,
                                                     t=t, soft=True)
    monkeypatch.setattr(siwt_dense, "_deep_transition",
                        lambda n, L_: None)
    siwt_dense._pipeline_jit.clear_cache()
    rec_s, mc_s = siwt_dense.siwt_bestbasis_pipeline(X, "db4", L, budget)
    rec_ts, mc_ts = siwt_dense.siwt_bestbasis_pipeline(X, "db4", L, budget,
                                                       t=t, soft=True)
    siwt_dense._pipeline_jit.clear_cache()
    assert np.allclose(np.asarray(mc), np.asarray(mc_s), rtol=1e-5)
    assert np.allclose(np.asarray(rec), np.asarray(rec_s), atol=2e-4)
    assert np.allclose(np.asarray(mc_t), np.asarray(mc_ts), rtol=1e-5)
    assert np.allclose(np.asarray(rec_t), np.asarray(rec_ts), atol=2e-4)
    # perfect reconstruction without threshold
    assert np.allclose(np.asarray(rec), np.asarray(X), atol=2e-4)


def test_packed_shift_counts_scale_with_budget():
    """Packed metadata: P_d stays O(budget)-bounded instead of 2^d."""
    shifts, kid_pos, _, _ = siwt_dense.packed_shifts(12, 2)
    assert len(shifts[12]) <= 8          # dense would be 4096
    full, _, _, _ = siwt_dense.packed_shifts(5, 5)
    # full budget: packed == all valid == 2^d
    assert [len(s) for s in full] == [1 << d for d in range(6)]


def test_siwt_pipeline_precision_retrace():
    """Regression (round 4): siwt_bestbasis_pipeline went through plain
    jax.jit, so set_matmul_precision was a silent no-op for SIWT — assert
    the precision embedded in the traced program follows the global, and
    that an explicit step_cutoff changes the conv/matmul dispatch."""
    import re
    import waveletsext_tpu as wx

    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 256)).astype(np.float32))

    def traced_precisions():
        import jax
        s = str(jax.make_jaxpr(
            lambda a: siwt_dense.siwt_bestbasis_pipeline(a, "db4", 4, 2)[0]
        )(x))
        return set(re.findall(r"precision=\(Precision\.(\w+)", s))

    try:
        wx.set_matmul_precision("highest")
        assert traced_precisions() == {"HIGHEST"}
        wx.set_matmul_precision("default")
        assert traced_precisions() == {"DEFAULT"}
    finally:
        wx.set_matmul_precision("highest")

    # step_cutoff routes big nodes off the matmul path but must not change
    # results
    a, ca = siwt_dense.siwt_bestbasis_pipeline(x, "db4", 4, 2)
    b, cb = siwt_dense.siwt_bestbasis_pipeline(x, "db4", 4, 2,
                                               step_cutoff=32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ca), np.asarray(cb), atol=1e-4)


@pytest.mark.parametrize("t_mode", ["none", "scalar_soft", "persig_hard"])
def test_deep_kernel_pipeline_matches_xla_hybrid(t_mode):
    """The fused Pallas deep-zone kernel (kernels/pallas_siwt.py, forced
    into interpreter mode on CPU) must match the XLA hybrid path: same
    reconstruction, same min cost, with and without threshold fusion."""
    rng = np.random.default_rng(11)
    B, n, L, bud = 4, 2048, 8, 2
    X = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
    kw = {}
    if t_mode == "scalar_soft":
        kw = dict(t=0.4, soft=True)
    elif t_mode == "persig_hard":
        kw = dict(t=jnp.asarray(rng.uniform(0.2, 0.6, B).astype(np.float32)))
    r0, c0 = siwt_dense.siwt_bestbasis_pipeline(X, "db4", L, bud,
                                                deep_kernel=False, **kw)
    r1, c1 = siwt_dense.siwt_bestbasis_pipeline(X, "db4", L, bud,
                                                deep_kernel=True, **kw)
    assert np.allclose(np.asarray(r0), np.asarray(r1), atol=2e-4)
    assert np.allclose(np.asarray(c0), np.asarray(c1), rtol=1e-4)
