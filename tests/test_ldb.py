"""LDB tests (reference test/ldb.jl shape/smoke coverage)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import warnings

import waveletsext_tpu as wx
from waveletsext_tpu import ldb

RNG = np.random.default_rng(29)


@pytest.fixture(scope="module")
def tri_data():
    X, y = wx.generateclassdata(wx.ClassData("tri", 5, 5, 5),
                                rng=np.random.default_rng(2))
    return jnp.asarray(X), y


DMS = [ldb.AsymmetricRelativeEntropy(), ldb.SymmetricRelativeEntropy(),
       ldb.HellingerDistance(), ldb.LpDistance()]
DPS = [ldb.BasisDiscriminantMeasure(), ldb.FishersClassSeparability(),
       ldb.RobustFishersClassSeparability()]


@pytest.mark.parametrize("dm", DMS)
@pytest.mark.parametrize("en", [ldb.TimeFrequency(), ldb.ProbabilityDensity()])
def test_ldb_1d_measures(tri_data, dm, en):
    X, y = tri_data
    f = ldb.LocalDiscriminantBasis(wt="haar", dm=dm, en=en, n_features=8)
    Xc = f.fit_transform(X, y)
    assert Xc.shape == (15, 8)
    assert wx.isvalidtree(f.tree, "binary")
    Xr = f.inverse_transform(Xc)
    assert Xr.shape == X.shape


@pytest.mark.parametrize("weight", ["equal", "pdf"])
def test_ldb_signatures_emd(tri_data, weight):
    X, y = tri_data
    f = ldb.LocalDiscriminantBasis(
        wt="haar", dm=ldb.EarthMoverDistance(), en=ldb.Signatures(weight),
        n_features=8, max_dec_level=3)
    Xc = f.fit_transform(X, y)
    assert Xc.shape == (15, 8)
    assert wx.isvalidtree(f.tree, "binary")


@pytest.mark.parametrize("dp", DPS)
def test_ldb_powers(tri_data, dp):
    X, y = tri_data
    f = ldb.LocalDiscriminantBasis(wt="haar", dp=dp, n_features=8)
    Xc = f.fit_transform(X, y)
    assert Xc.shape == (15, 8)
    # transform on "test data" must match fit_transform features
    Xc2 = f.transform(X)
    assert np.allclose(Xc, Xc2)


def test_ldb_2d():
    X = jnp.asarray(RNG.standard_normal((12, 16, 16)))
    y = np.repeat([1, 2, 3], 4)
    f = ldb.LocalDiscriminantBasis(wt="haar", n_features=10)
    Xc = f.fit_transform(X, y)
    assert Xc.shape == (12, 10)
    assert wx.isvalidtree(f.tree, "quad")
    Xr = f.inverse_transform(Xc)
    assert Xr.shape == X.shape
    assert np.allclose(f.transform(X), Xc)


def test_change_nfeatures(tri_data):
    X, y = tri_data
    f = ldb.LocalDiscriminantBasis(wt="haar")
    Xc = f.fit_transform(X, y)
    x2 = f.change_nfeatures(Xc, 8)
    assert x2.shape == (15, 8)
    assert f.n_features == 8
    with pytest.warns(UserWarning):
        x3 = f.change_nfeatures(x2, 10)
    assert x3.shape == (15, 10)
    with pytest.raises(ValueError):
        f.change_nfeatures(Xc, 4)  # column mismatch after change


def test_full_basis_roundtrip(tri_data):
    """With n_features == n, inverse_transform(transform(X)) == X."""
    X, y = tri_data
    f = ldb.LocalDiscriminantBasis(wt="haar")
    Xc = f.fit_transform(X, y)
    assert np.allclose(f.inverse_transform(Xc), X, atol=1e-8)


def test_top_k(tri_data):
    X, y = tri_data
    f = ldb.LocalDiscriminantBasis(wt="haar", top_k=5, n_features=8)
    Xc = f.fit_transform(X, y)
    assert Xc.shape == (15, 8)
    assert wx.isvalidtree(f.tree, "binary")


def test_fused_fit_transform_matches_estimator():
    """ldb_fit_transform_pipeline must reproduce the estimator path's tree,
    order, and features for every fusable (en, dm, dp) combination."""
    X, y = wx.generateclassdata(wx.ClassData("tri", 8, 8, 8),
                                rng=np.random.default_rng(5))
    X = jnp.asarray(X.astype(np.float64))
    combos = [
        (wx.TimeFrequency(), wx.AsymmetricRelativeEntropy(),
         wx.BasisDiscriminantMeasure()),
        (wx.TimeFrequency(), wx.LpDistance(),
         wx.FishersClassSeparability()),
        (wx.ProbabilityDensity(), wx.SymmetricRelativeEntropy(),
         wx.RobustFishersClassSeparability()),
        (wx.TimeFrequency(), wx.HellingerDistance(),
         wx.BasisDiscriminantMeasure()),
        # Signatures/EMD now trace through the pipeline too (round 4:
        # gather-free device _emd_pair)
        (wx.Signatures("equal"), wx.EarthMoverDistance(),
         wx.BasisDiscriminantMeasure()),
        (wx.Signatures("pdf"), wx.EarthMoverDistance(),
         wx.FishersClassSeparability()),
    ]
    for en, dm, dp in combos:
        ref = wx.LocalDiscriminantBasis(wt="db2", max_dec_level=4, dm=dm,
                                        en=en, dp=dp, top_k=8, n_features=6)
        want = np.asarray(ref.fit_transform(X, y))
        fus = wx.LocalDiscriminantBasis(wt="db2", max_dec_level=4, dm=dm,
                                        en=en, dp=dp, top_k=8, n_features=6)
        got = np.asarray(wx.ldb_fit_transform_pipeline(fus, X, y))
        assert np.array_equal(fus.tree, ref.tree), (en, dm, dp)
        assert np.array_equal(fus.order, ref.order), (en, dm, dp)
        assert np.allclose(got, want, atol=1e-10), (en, dm, dp)


def test_emd_presorted_matches_pair_oracle():
    """The round-5 presorted bitonic-merge EMD must equal the per-pair
    merged-sort oracle _emd_pair exactly: unequal counts, arbitrary
    positive weights, ties in the supports."""
    rng = np.random.default_rng(3)
    R, N1, N2 = 7, 13, 21
    p = jnp.asarray(rng.standard_normal((R, N1)))
    q = jnp.asarray(rng.standard_normal((R, N2)))
    # inject ties within and across supports
    p = p.at[:, 3].set(p[:, 5])
    q = q.at[:, 2].set(p[:, 1])
    wp = jnp.asarray(rng.uniform(0.1, 2.0, (R, N1)))
    wq = jnp.asarray(rng.uniform(0.1, 2.0, (R, N2)))
    ps, wps = jax.lax.sort([p, wp], num_keys=1)
    qs, wqs = jax.lax.sort([q, wq], num_keys=1)
    got = np.asarray(ldb._emd_presorted(ps, wps, qs, wqs))
    want = np.asarray(jax.vmap(ldb._emd_pair)(p, wp, q, wq))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)


def test_emd_general_path_uses_presorted_merge_and_matches():
    """discriminant_measure over Signatures('pdf')-style general weights
    (unequal class counts) must match the summed _emd_pair oracle."""
    rng = np.random.default_rng(4)
    sigs = []
    for Nc in (9, 14, 11):
        coef = jnp.asarray(rng.standard_normal((Nc, 4, 8)))
        w = jnp.asarray(rng.uniform(0.05, 1.0, (Nc, 4, 8)))
        sigs.append(ldb.Signature(coef, w))
    got = np.asarray(ldb.discriminant_measure(sigs, ldb.EarthMoverDistance()))
    want = 0.0
    import itertools
    for g1, g2 in itertools.combinations(sigs, 2):
        want = want + np.asarray(
            ldb.pairwise_discriminant_measure(g1, g2,
                                              ldb.EarthMoverDistance()))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_sort_rows_pallas_interpret_parity():
    """Chunked fast-path sort + bitonic cascade (interpret mode) must match
    lax.sort on the real prefix, pad with per-row max keys / zero weights,
    and feed the fused EMD kernel to oracle parity."""
    from waveletsext_tpu.kernels.pallas_emd import (sort_rows_pallas,
                                                    emd_presorted_pallas)
    rng = np.random.default_rng(6)
    for N in (100, 256, 300, 700):
        R = 5
        k = jnp.asarray(rng.standard_normal((R, N)).astype(np.float32))
        v = jnp.asarray(rng.uniform(0.1, 1, (R, N)).astype(np.float32))
        ks, vs = sort_rows_pallas(k, v, interpret=True)
        kref, vref = jax.lax.sort([k, v], num_keys=1)
        assert np.allclose(np.asarray(ks[:, :N]), np.asarray(kref)), N
        M = ks.shape[-1]
        if M > N:
            np.testing.assert_allclose(
                np.asarray(ks[:, N:]),
                np.asarray(kref[:, -1:]) * np.ones((1, M - N)))
            # NB: value pads may interleave with true-max ties (equal keys
            # sort arbitrarily) — total weight is what must be preserved
            np.testing.assert_allclose(np.asarray(jnp.sum(vs, -1)),
                                       np.asarray(jnp.sum(v, -1)),
                                       rtol=1e-6)
        k2 = jnp.asarray(rng.standard_normal((R, N)).astype(np.float32))
        v2 = jnp.asarray(rng.uniform(0.1, 1, (R, N)).astype(np.float32))
        k2s, v2s = sort_rows_pallas(k2, v2, interpret=True)
        got = np.asarray(emd_presorted_pallas(ks, vs, k2s, v2s,
                                              interpret=True))
        want = np.asarray(jax.vmap(ldb._emd_pair)(k, v, k2, v2))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_emd_kernel_rejects_unequal_shapes():
    from waveletsext_tpu.kernels.pallas_emd import emd_presorted_pallas
    p = jnp.zeros((4, 16))
    q = jnp.zeros((4, 24))
    w = jnp.ones((4, 16))
    with pytest.raises(ValueError):
        emd_presorted_pallas(p, w, q, jnp.ones((4, 24)), interpret=True)
