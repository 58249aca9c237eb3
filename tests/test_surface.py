"""API-surface parity: every symbol the reference exports must resolve here,
either on the package or in the reference-name compat module.

The export lists below are transcribed from the ``export`` blocks of each
reference module (src/mod/*.jl; Julia stdlib/module re-exports like
LinearAlgebra excluded).  Mutating-convention names (`foo!`) map to `foo` —
this framework is functional.
"""

import numpy as np

import waveletsext_tpu as wx
from waveletsext_tpu import compat

REFERENCE_EXPORTS = """
    wpd wpd! iwpd iwpd! dwtall wptall wpdall idwtall iwptall iwpdall
    sdwt sdwt! swpt swpt! swpd swpd! isdwt isdwt! iswpt iswpt! iswpd iswpd!
    sdwtall swptall swpdall isdwtall iswptall iswpdall
    acdwt acdwt! acwpt acwpt! acwpd acwpd! iacdwt iacdwt! iacwpt iacwpt!
    iacwpd iacwpd! acdwtall acwptall acwpdall iacdwtall iacwptall iacwpdall
    siwpd isiwpd bestbasistree!
    ShiftInvariantWaveletTransformNode ShiftInvariantWaveletTransformObject
    CostFunction BBCost JBBCost LSDBCost
    ShannonEntropyCost LogEnergyEntropyCost NormCost LoglpCost
    DifferentialEntropyCost
    BestBasisType BB JBB LSDB
    tree_costs bestbasistree bestbasistreeall
    RelErrorShrink SureShrink VisuShrink
    noisest relerrorthreshold denoise denoiseall surethreshold
    LocalDiscriminantBasis
    EnergyMap TimeFrequency ProbabilityDensity Signatures
    DiscriminantMeasure ProbabilityDensityDM SignaturesDM
    AsymmetricRelativeEntropy SymmetricRelativeEntropy HellingerDistance
    LpDistance EarthMoverDistance
    DiscriminantPower BasisDiscriminantMeasure FishersClassSeparability
    RobustFishersClassSeparability
    energy_map discriminant_measure discriminant_power
    fit! fitdec! transform fit_transform inverse_transform change_nfeatures
    getbasiscoef getbasiscoefall getchildindex getparentindex getcolrange
    getrowrange getdepth getleaf gettreelength nodelength
    coarsestscalingrange finestdetailrange maxtransformlevels maketree
    isvalidtree packet main2depthshift
    relativenorm psnr snr ssim
    ClassData duplicatesignals generatesignals generateclassdata
    mat2sparseform_std mat2sparseform_nonstd ns_dwt ns_idwt
    std_wavemult nonstd_wavemult
    plot_tfbdry plot_tfbdry! plot_tfbdry2 plot_tfbdry2! wiggle wiggle!
""".split()


def test_every_reference_export_resolves():
    missing = []
    for name in REFERENCE_EXPORTS:
        base = name.rstrip("!")
        if not (hasattr(wx, base) or hasattr(compat, base)):
            missing.append(name)
    assert not missing, f"missing reference exports: {missing}"


def test_compat_step_kernels_match_pinned_convention():
    """dwt_step/idwt_step under the reference (h, g) signature must agree
    with the framework's pinned analysis/synthesis steps."""
    from waveletsext_tpu.filters import wavelet
    rng = np.random.default_rng(3)
    v = rng.standard_normal((2, 16))
    w = wavelet("db4")
    g, h = compat.makereverseqmfpair("db4")
    w1, w2 = compat.dwt_step(v, h, g)
    from waveletsext_tpu.kernels import conv
    e1, e2 = conv.analysis_step(v, np.asarray(w.lo), np.asarray(w.hi))
    assert np.allclose(np.asarray(w1), np.asarray(e1))
    assert np.allclose(np.asarray(w2), np.asarray(e2))
    vr = compat.idwt_step(w1, w2, h, g)
    assert np.allclose(np.asarray(vr), v, atol=1e-12)
    # a-trous pair round trip through the shift-based inverse, depth 0
    s1, s2 = compat.sdwt_step(v, 0, h, g)
    v0 = compat.isdwt_step(s1, s2, 0, h, g)
    assert np.allclose(np.asarray(v0), v, atol=1e-12)


def test_public_argument_validation_raises_eagerly():
    """User-facing argument errors are ValueError/TypeError raised eagerly
    (the reference's ArgumentError discipline, SWT.jl:619-621) — NOT bare
    asserts that vanish under ``python -O``."""
    import pytest
    import jax.numpy as jnp
    from waveletsext_tpu import denoising, ldb, basis, utils, wavemult as wm

    x = jnp.zeros((2, 16))
    with pytest.raises(ValueError):
        denoising.denoise(x, "sig", "db4", smooth="bogus")
    with pytest.raises(ValueError):
        denoising.denoise(x, "nope", "db4")
    with pytest.raises(ValueError):
        utils.main2depthshift(8, 3)
    with pytest.raises(TypeError):
        basis.bestbasistreeall(x, method=object())
    with pytest.raises(ValueError):
        wm.ndyad(0, 4, False)
    with pytest.raises(ValueError):
        wm.mat2sparseform_nonstd(jnp.zeros((4, 8)), "haar")
    est = ldb.LocalDiscriminantBasis(wt="haar", max_dec_level=2)
    with pytest.raises(ValueError):  # unfitted
        est.transform(x)
    with pytest.raises(ValueError):  # single class
        est.fit(jnp.zeros((4, 16)), np.zeros(4, int))
