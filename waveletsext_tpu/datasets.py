"""Synthetic test-signal generators.

Re-implements /root/reference/src/mod/utils/utils_dataset.jl: the
Donoho-Johnstone test functions (``generatesignals``, :110-150), circular-shift
duplication (``duplicatesignals``, :60-76), and the Saito-Coifman 3-class LDB
datasets (``ClassData``/``generateclassdata``, :15-26,180-258).

Pure numpy on the host (data generation is setup work, not device compute);
shapes are batch-first: ``(num_signals, n)``.
"""

from __future__ import annotations

import dataclasses

import numpy as np

_T = np.array([0.1, 0.13, 0.15, 0.23, 0.25, 0.4, 0.44, 0.65, 0.76, 0.78, 0.81])
_H = np.array([4, -5, 3, -4, 5, -4.2, 2.1, 4.3, -3.1, 5.1, -4.2])


def generatesignals(fn: str, L: int = 7) -> np.ndarray:
    """Length-2^L Donoho-Johnstone test signal
    (utils_dataset.jl:110-150; 'heavisine' also accepted as 'heavysine')."""
    assert L >= 1
    n = 1 << L
    tt = np.linspace(0.0, 1.0, n)
    if fn == "blocks":
        x = sum(h * (1 + np.sign(tt - t)) / 2 for h, t in zip(_H, _T))
    elif fn == "bumps":
        w = 0.01 * np.array([0.5, 0.5, 0.6, 1, 1, 3, 1, 1, 0.5, 0.8, 0.5])
        x = sum(abs(h) / (1 + ((tt - t) / wj) ** 4)
                for h, t, wj in zip(_H, _T, w))
    elif fn in ("heavisine", "heavysine"):
        x = 4 * np.sin(4 * np.pi * tt) - np.sign(tt - 0.3) - np.sign(0.72 - tt)
    elif fn == "doppler":
        eps = 0.05
        x = np.sqrt(tt * (1 - tt)) * np.sin(2 * np.pi * (1 + eps) / (tt + eps))
    elif fn == "quadchirp":
        x = np.sin((np.pi / 3) * tt * (n * tt ** 2))
    elif fn == "mishmash":
        x = np.sin((np.pi / 3) * tt * (n * tt ** 2))
        x = x + np.sin(np.pi * (n * 0.6902) * tt)
        x = x + np.sin(np.pi * tt * (n * 0.125 * tt))
    else:
        raise ValueError(f"Unrecognised signal type {fn!r}")
    return x.astype(np.float64)


def duplicatesignals(x: np.ndarray, n: int, k: int, noise: bool = False,
                     t: float = 1.0, rng=None) -> np.ndarray:
    """``n`` circularly-shifted copies of ``x`` (shift multiples of ``k``),
    optionally + N(0, t) noise (utils_dataset.jl:60-76). Batch-first output."""
    rng = np.random.default_rng() if rng is None else rng
    X = np.stack([np.roll(x, k * i, axis=-1) for i in range(n)])
    if noise:
        X = X + t * rng.standard_normal(X.shape)
    return X


@dataclasses.dataclass(frozen=True)
class ClassData:
    """3-class dataset spec (utils_dataset.jl:15-26). ``kind`` is 'tri'
    (length-32 triangular) or 'cbf' (length-128 cylinder-bell-funnel)."""
    kind: str
    s1: int
    s2: int
    s3: int

    def __post_init__(self):
        if self.kind not in ("tri", "cbf"):
            raise ValueError("Invalid type. Accepted types are tri and cbf.")


def generateclassdata(c: ClassData, shuffle: bool = False, rng=None):
    """Generate the Saito-Coifman 3-class signals
    (utils_dataset.jl:180-258).  Returns ``(X, y)`` with X batch-first
    ``(s1+s2+s3, n)`` and y in {1,2,3}."""
    rng = np.random.default_rng() if rng is None else rng
    total = c.s1 + c.s2 + c.s3
    y = np.concatenate([np.full(c.s1, 1), np.full(c.s2, 2), np.full(c.s3, 3)])
    if c.kind == "tri":
        n = 32
        u = rng.uniform(0, 1)
        k = np.arange(1, n + 1)
        h1 = np.maximum(6 - np.abs(k - 7), 0)
        h2 = np.maximum(6 - np.abs(k - 15), 0)   # h1(k - 8)
        h3 = np.maximum(6 - np.abs(k - 11), 0)   # h1(k - 4)
        H1 = np.tile(u * h1 + (1 - u) * h2, (c.s1, 1))
        H2 = np.tile(u * h1 + (1 - u) * h3, (c.s2, 1))
        H3 = np.tile(u * h2 + (1 - u) * h3, (c.s3, 1))
        X = np.concatenate([H1, H2, H3], axis=0) + rng.standard_normal((total, n))
    else:
        n = 128
        X = np.zeros((total, n))

        def _fill(rows, length_hi, shape):
            a = rng.integers(16, 33, size=len(rows))
            b = a + rng.integers(*length_hi, size=len(rows))
            eta = rng.standard_normal(len(rows))
            for r, ak, bk, ek in zip(rows, a, b, eta):
                m = bk - ak + 1
                if shape == "cyl":
                    seg = np.ones(m)
                elif shape == "bell":
                    seg = np.arange(m) / (m - 1)
                else:
                    seg = np.arange(m - 1, -1, -1) / (m - 1)
                X[r, ak - 1: bk] = (6 + ek) * seg
        _fill(range(0, c.s1), (16, 33), "cyl")
        _fill(range(c.s1, c.s1 + c.s2), (32, 97), "bell")
        _fill(range(c.s1 + c.s2, total), (32, 97), "funnel")
        X = X + rng.standard_normal((total, n))
    if shuffle:
        idx = rng.permutation(total)
        X, y = X[idx], y[idx]
    return X, y
