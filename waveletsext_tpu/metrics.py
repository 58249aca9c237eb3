"""Quality metrics: relativenorm, psnr, snr, ssim.

Re-implements /root/reference/src/mod/utils/utils_metrics.jl:29-135.  The
reference delegates ``ssim`` to ImageQualityIndexes; here it is implemented
directly (Wang et al. SSIM with the standard 11x11 Gaussian window,
K1=0.01, K2=0.03) as batched XLA ops.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("p",), inline=True)
def relativenorm(x, x0, p: float = 2.0):
    """||x - x0||_p / ||x0||_p (utils_metrics.jl:29-34)."""
    diff = jnp.abs(x - x0) ** p
    ref = jnp.abs(x0) ** p
    return (diff.sum() ** (1.0 / p)) / (ref.sum() ** (1.0 / p))


@jax.jit
def psnr(x, x0):
    """20 log10(max(x0)) - 10 log10(MSE) (utils_metrics.jl:63-71)."""
    mse = jnp.mean((x - x0) ** 2)
    return 20 * jnp.log10(jnp.max(x0)) - 10 * jnp.log10(mse)


@jax.jit
def snr(x, x0):
    """20 log10(||x0||_2 / ||x - x0||_2) (utils_metrics.jl:100-103)."""
    return 20 * jnp.log10(jnp.linalg.norm(x0.ravel())
                          / jnp.linalg.norm((x - x0).ravel()))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    r = np.arange(size) - (size - 1) / 2
    g = np.exp(-(r ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def _filter2_same_1d(img, w, axis):
    """'same' correlation along one axis with edge-replicate padding
    (separable window).

    Replicate matches the reference convention: utils_metrics.jl:133-135
    delegates to ImageQualityIndexes.assess_ssim, whose filtering goes
    through ImageFiltering.imfilter with its documented default border
    ``Pad(:replicate)``.  Pinned against an independent scipy.ndimage
    implementation in tests/test_aux.py::test_ssim_golden."""
    k = len(w)
    pad = [(0, 0)] * img.ndim
    pad[axis] = (k // 2, k - 1 - k // 2)
    xp = jnp.pad(img, pad, mode="edge")
    out = None
    for t in range(k):
        sl = jax.lax.slice_in_dim(xp, t, t + img.shape[axis], axis=axis)
        term = float(w[t]) * sl
        out = term if out is None else out + term
    return out


@functools.partial(jax.jit, static_argnames=("peak",), inline=True)
def ssim(x, x0, peak: float = 1.0):
    """Mean SSIM over the image(s) ``(..., n, m)`` (utils_metrics.jl:133-135
    semantics; standard Wang et al. parameters)."""
    C1 = (0.01 * peak) ** 2
    C2 = (0.03 * peak) ** 2
    w = _gaussian_window()

    def smooth(a):
        return _filter2_same_1d(_filter2_same_1d(a, w, -2), w, -1)

    mu_x = smooth(x)
    mu_y = smooth(x0)
    sxx = smooth(x * x) - mu_x ** 2
    syy = smooth(x0 * x0) - mu_y ** 2
    sxy = smooth(x * x0) - mu_x * mu_y
    num = (2 * mu_x * mu_y + C1) * (2 * sxy + C2)
    den = (mu_x ** 2 + mu_y ** 2 + C1) * (sxx + syy + C2)
    return jnp.mean(num / den, axis=(-2, -1))
