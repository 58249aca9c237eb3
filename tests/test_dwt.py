"""Decimated transform parity tests (reference test/transforms.jl "DWT" set
plus the batch-equivalence category from "Transform All")."""

import numpy as np
import jax.numpy as jnp
import pytest

import waveletsext_tpu as wx
from waveletsext_tpu.kernels import conv


RNG = np.random.default_rng(7)


def test_step_golden_1d():
    w = wx.wavelet("db4")
    v = jnp.asarray([2.0, 3.0, -4.0, 5.0])
    w1, w2 = conv.analysis_step(v, w.lo, w.hi)
    got = np.round(np.concatenate([w1, w2]), 3)
    assert np.allclose(got, [-0.524, 4.767, 1.803, 5.268])
    rec = conv.synthesis_step(jnp.round(w1, 3), jnp.round(w2, 3), w.lo, w.hi)
    assert np.allclose(np.round(rec, 3), [2, 3, -4, 5])


def test_step_golden_2d():
    w = wx.wavelet("db4")
    x = jnp.asarray([[2.0, 3.0], [-4.0, 5.0]])
    w1, w2, w3, w4 = conv.analysis_step2(x, w.lo, w.hi)
    got = np.round(np.array([[w1[0, 0], w2[0, 0]], [w3[0, 0], w4[0, 0]]]), 3)
    assert np.allclose(got, [[3, 5], [-2, 4]])
    rec = conv.synthesis_step2(w1, w2, w3, w4, w.lo, w.hi)
    assert np.allclose(np.round(rec, 3), x)


@pytest.mark.parametrize("wt", ["haar", "db4", "sym6", "coif4"])
def test_wpd_matches_wpt_levels_1d(wt):
    """wpd level slices == wpt at each level (test/transforms.jl:29)."""
    x = jnp.asarray(RNG.standard_normal(8))
    xw = wx.wpd(x, wt)
    assert xw.shape == (4, 8)
    assert np.allclose(xw[0], x)
    for L in range(1, 4):
        assert np.allclose(xw[L], wx.wpt(x, wt, L)), L


def test_iwpd_roundtrips_1d():
    x = jnp.asarray(RNG.standard_normal(8))
    xw = wx.wpd(x, "db4")
    assert np.allclose(wx.iwpd(xw, "db4"), x)
    assert np.allclose(wx.iwpd(xw, "db4", 2), x)
    assert np.allclose(wx.iwpd(xw, "db4", wx.maketree(8, 3, "dwt")), x)


def test_wpd_2d():
    x = jnp.asarray(RNG.standard_normal((8, 8)))
    xw = wx.wpd2(x, "db4")
    assert xw.shape == (4, 8, 8)
    # dwt level 1 == wpt level 1 (test/transforms.jl:41)
    assert np.allclose(wx.dwt2(x, "db4", 1), wx.wpt2(x, "db4", 1))
    for L in range(1, 4):
        assert np.allclose(xw[L], wx.wpt2(x, "db4", L)), L
    # dwt == wpt with :dwt tree (test/transforms.jl:43)
    assert np.allclose(wx.dwt2(x, "db4"),
                       wx.wpt2(x, "db4", wx.maketree2d(8, 8, 3, "dwt")))
    assert np.allclose(wx.iwpd2(xw, "db4"), x)
    assert np.allclose(wx.iwpd2(xw, "db4", 2), x)
    assert np.allclose(wx.iwpd2(xw, "db4", wx.maketree2d(8, 8, 3, "dwt")), x)
    assert np.allclose(wx.iwpt2(wx.wpt2(x, "db4"), "db4"), x)
    assert np.allclose(wx.iwpt2(wx.wpt2(x, "db4", 2), "db4", 2), x)
    tr = wx.maketree2d(8, 8, 3, "dwt")
    assert np.allclose(wx.iwpt2(wx.wpt2(x, "db4", tr), "db4", tr), x)


def test_dwt_idwt_1d():
    x = jnp.asarray(RNG.standard_normal(64))
    for L in (1, 3, 6):
        y = wx.dwt(x, "db4", L)
        assert np.allclose(wx.idwt(y, "db4", L), x)
    # dwt == wpt with :dwt tree
    y = wx.dwt(x, "db4")
    assert np.allclose(y, wx.wpt(x, "db4", wx.maketree(64, 6, "dwt")))


def test_wpt_tree_roundtrip_1d():
    x = jnp.asarray(RNG.standard_normal(16))
    tree = wx.maketree(16, 4, "full")
    # prune some subtrees to make it non-trivial
    tree = tree.copy()
    wx.delete_subtree(tree, 3)
    y = wx.wpt(x, "db4", tree)
    assert np.allclose(wx.iwpt(y, "db4", tree), x)


def test_batched_matches_single():
    """Batch == single (test/transforms.jl:270-299), batch axis leading."""
    x = RNG.standard_normal(8)
    xb = jnp.asarray(np.stack([x, x, x]))
    single = wx.wpd(jnp.asarray(x), "db4")
    batch = wx.wpd(xb, "db4")
    for i in range(3):
        assert np.allclose(batch[i], single)
    assert np.allclose(wx.iwpd(batch, "db4"), xb)
    y = wx.wpt(jnp.asarray(x), "db4")
    assert np.allclose(wx.wpt(xb, "db4"), np.stack([y] * 3))


def test_getbasiscoefall_per_signal_trees():
    x = jnp.asarray(RNG.standard_normal((3, 8)))
    xw = wx.wpd(x, "haar")
    t1 = wx.maketree(8, 3, "dwt")
    t2 = wx.maketree(8, 3, "full")
    t3 = wx.maketree(8, 1, "full")
    trees = np.stack([t1, t2, t3])
    got = wx.getbasiscoefall(xw, trees)
    for i, t in enumerate((t1, t2, t3)):
        assert np.allclose(got[i], wx.getbasiscoef(xw[i], t))


def test_jit_and_vmap():
    import jax
    x = jnp.asarray(RNG.standard_normal((4, 16)))
    f = jax.jit(lambda a: wx.wpd(a, "db4", 3))
    assert np.allclose(f(x), wx.wpd(x, "db4", 3))
    g = jax.vmap(lambda a: wx.wpt(a, "db4", 2))
    assert np.allclose(g(x), wx.wpt(x, "db4", 2))


def test_iwpt_dyn_unbatched_signal_batched_trees():
    """Docstring-advertised combo: one signal, a batch of per-signal trees
    (regression: the blocked-mask rewrite broke this broadcast)."""
    import waveletsext_tpu as wx
    x = jnp.asarray(RNG.standard_normal(64))
    trees = np.stack([np.asarray(wx.maketree(64, 3, "dwt")),
                      np.asarray(wx.maketree(64, 3, "full"))])
    y = jnp.stack([wx.wpt(x, "db4", trees[0]), wx.wpt(x, "db4", trees[1])])
    # single coefficients row against both trees
    rec = wx.iwpt_dyn(y[0], "db4", jnp.asarray(trees[0]))
    assert np.allclose(np.asarray(rec), np.asarray(x), atol=1e-10)
    rec2 = wx.iwpt_dyn(y, "db4", jnp.asarray(trees))
    assert rec2.shape == (2, 64)
    assert np.allclose(np.asarray(rec2[0]), np.asarray(x), atol=1e-10)
    assert np.allclose(np.asarray(rec2[1]), np.asarray(x), atol=1e-10)
    # one coefficient row broadcast against a batch of trees
    rec3 = wx.iwpt_dyn(y[0], "db4", jnp.asarray(trees))
    assert rec3.shape == (2, 64)
    assert np.allclose(np.asarray(rec3[0]), np.asarray(x), atol=1e-10)


@pytest.mark.parametrize("wt", ["haar", "db4", "db10", "sym6", "coif4",
                                "batt2"])
def test_polyphase_analysis_matches_fullrate(wt):
    """The polyphase even/odd-coset analysis branch (used above the matmul
    cutoff) must equal the full-rate correlate + even-select formulation at
    f64 for every filter family."""
    w = wx.wavelet(wt)
    n = 4096  # above MATMUL_CUTOFF so the conv/polyphase branch runs
    x = jnp.asarray(RNG.standard_normal((3, n)))
    got = conv.analysis_step_packed(x, w.lo, w.hi)
    L = len(w.lo)
    w1 = conv._even(conv._window_correlate(x, w.lo, 0))
    w2 = conv._even(conv._window_correlate(x, w.hi, 2 - L))
    want = jnp.concatenate([w1, w2], axis=-1)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-12)


def test_precision_keyed_pipeline_retrace():
    """set_matmul_precision must retrace the fused pipelines (apijit keys
    the jit cache on the precision global), not silently reuse the old
    executable."""
    import jax
    x = jnp.asarray(RNG.standard_normal((4, 256)).astype(np.float32))
    try:
        wx.set_matmul_precision("highest")
        wx.bestbasis_pipeline(x, "db4", 3)
        wx.set_matmul_precision("default")
        wx.bestbasis_pipeline(x, "db4", 3)
        keys = set(wx.bestbasis_pipeline.__jits__)
        assert {jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT} <= keys
    finally:
        wx.set_matmul_precision("highest")


def test_matmul_precision_context_manager():
    """wx.matmul_precision scopes the override and restores on exit (also
    on exception)."""
    import jax
    from waveletsext_tpu.kernels import conv

    assert conv.MATMUL_PRECISION == jax.lax.Precision.HIGHEST
    with wx.matmul_precision("default"):
        assert conv.MATMUL_PRECISION == jax.lax.Precision.DEFAULT
    assert conv.MATMUL_PRECISION == jax.lax.Precision.HIGHEST
    try:
        with wx.matmul_precision("default"):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert conv.MATMUL_PRECISION == jax.lax.Precision.HIGHEST


def test_precision_actually_reaches_traced_program():
    """Regression: two jax.jit instances of the SAME function object share
    one pjit trace cache, so per-precision jit instances alone silently
    reused the first precision's program (the round-3 relaxed bench rows
    were no-ops).  Assert the precision embedded in the traced jaxpr of a
    PUBLIC entry point follows set_matmul_precision."""
    import re
    import jax

    x = jnp.asarray(RNG.standard_normal((4, 4096)).astype(np.float32))

    def traced_precisions():
        s = str(jax.make_jaxpr(lambda a: wx.wpt(a, "db4", 4))(x))
        return set(re.findall(r"precision=\(Precision\.(\w+)", s))

    try:
        wx.set_matmul_precision("highest")
        assert traced_precisions() == {"HIGHEST"}
        wx.set_matmul_precision("default")
        assert traced_precisions() == {"DEFAULT"}
        wx.set_matmul_precision("highest")
        assert traced_precisions() == {"HIGHEST"}
    finally:
        wx.set_matmul_precision("highest")
