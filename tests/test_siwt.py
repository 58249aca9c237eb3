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
