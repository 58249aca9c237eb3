"""waveletsext_tpu — a TPU-native wavelet analysis/synthesis framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
WaveletsExt.jl (UCD4IDS): decimated DWT/WPT/WPD, redundant SWT/ACWT/SIWT,
best-basis search (CW entropy / JBB / LSDB), wavelet shrinkage denoising,
Local Discriminant Basis feature extraction, BCR fast wavelet multiplication,
plus tree utilities, metrics, and synthetic datasets — all batched, functional,
jit/vmap/pjit-compatible, and sharded over device meshes (see ``parallel``).
"""

from .filters import Wavelet, wavelet
from .trees import (maketree, maketree2d, maxtransformlevels, gettreelength,
                    getchildindex, getparentindex, getdepth, getleaf,
                    isvalidtree, delete_subtree, tree_depth)
from .utils import (nodelength, packet, main2depthshift, getrowrange,
                    getcolrange, getbasiscoef, getbasiscoef2, getbasiscoefall,
                    coarsestscalingrange, finestdetailrange)
from .transforms.dwt import (dwt, idwt, dwt2, idwt2, wpt, iwpt, wpt2, iwpt2,
                             wpd, iwpd, wpd2, iwpd2, iwpt_dyn, iwpt2_dyn)
from .transforms.swt import (sdwt, sdwt2, isdwt, isdwt2, swpt, swpt2, iswpt,
                             iswpt2, swpd, swpd2, iswpd, iswpd2, iswpd_dyn)
from .transforms.acwt import (acdwt, acdwt2, iacdwt, iacdwt2, acwpt, acwpt2,
                              iacwpt, iacwpt2, acwpd, acwpd2, iacwpd, iacwpd2)
from .datasets import (generatesignals, duplicatesignals, ClassData,
                       generateclassdata)
from .metrics import relativenorm, psnr, snr, ssim
from .denoising import (HardTH, SoftTH, SteinTH, threshold, VisuShrink,
                      visushrink, SureShrink, sureshrink, RelErrorShrink,
                      noisest, surethreshold, relerrorthreshold, denoise,
                      denoiseall, bestbasis_denoise_pipeline,
                      bestbasis_denoise_pipeline2, swt_denoise_pipeline2)
from .basis import (BB, JBB, LSDB, ShannonEntropyCost, LogEnergyEntropyCost,
                    LoglpCost, NormCost, DifferentialEntropyCost, coefcost,
                    tree_costs, bestbasis_treeselection, bestbasistree,
                    bestbasistreeall, bestbasis_treeselection_dev,
                    bestbasis_pipeline, bestbasisall_pipeline)
from .utils import getbasiscoef_dyn, getbasiscoef2_dyn

from .wavemult import (ns_dwt, ns_idwt, sft, isft, stretchmatrix, ndyad,
                       dyadlength, mat2sparseform_nonstd, mat2sparseform_std,
                       mat2denseform_nonstd, mat2denseform_std,
                       nonstd_wavemult, std_wavemult)
from .transforms.siwt import (SiwtNode, SiwtObject, siwpd, isiwpd,
                              bestbasistree as siwt_bestbasistree)
from .transforms.siwt_dense import (siwpd_dense, bestbasis_dense,
                                    isiwpd_dense, siwt_bestbasis_pipeline)
from .ldb import (LocalDiscriminantBasis, TimeFrequency, ProbabilityDensity,
                  Signatures, AsymmetricRelativeEntropy,
                  SymmetricRelativeEntropy, HellingerDistance, LpDistance,
                  EarthMoverDistance, BasisDiscriminantMeasure,
                  FishersClassSeparability, RobustFishersClassSeparability,
                  energy_map, discriminant_measure, discriminant_power,
                  ldb_fit_transform_pipeline)

from .kernels.conv import set_matmul_precision, matmul_precision
from .filters import makereverseqmfpair
from .basis import (CostFunction, BBCost, JBBCost, LSDBCost, BestBasisType)
from .ldb import (EnergyMap, DiscriminantMeasure, ProbabilityDensityDM,
                  SignaturesDM, DiscriminantPower)
from .compat import (ShiftInvariantWaveletTransformNode,
                     ShiftInvariantWaveletTransformObject)
from .viz import (treenodes_matrix, tfbdry, tfbdry2, wiggle_data,
                  relerror_data, relerrorplot,
                  plot_tfbdry, plot_tfbdry2, wiggle)

__version__ = "0.1.0"
