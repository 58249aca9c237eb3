"""Visualization utilities.

Re-implements /root/reference/src/mod/Visualizations.jl with a split design:
pure-numpy *data* computation (always available, testable headless) and
optional matplotlib *rendering* (matplotlib/Agg is available here,
so rendering is lazily imported and cleanly gated).

* ``treenodes_matrix`` — BitVector -> (level, position) bool matrix
  (Visualizations.jl:61-78).
* ``tfbdry`` / ``plot_tfbdry`` — time-frequency tiling of a binary basis tree
  (Visualizations.jl:149-187).
* ``tfbdry2`` / ``plot_tfbdry2`` — quadtree partition rectangles
  (Visualizations.jl:254-293).
* ``wiggle_data`` / ``wiggle`` — seismic-style multi-trace plot with
  zero-crossing interpolation and positive-lobe fill
  (Visualizations.jl:392-475).
"""

from __future__ import annotations

import numpy as np

from .trees import getdepth, getleaf, maketree, tree_depth
from .utils import getrowrange, getcolrange


def _require_matplotlib():
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        return plt
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "matplotlib is not available in this environment; use the "
            "data-computation functions (tfbdry/tfbdry2/wiggle_data) "
            "instead.") from e


def treenodes_matrix(tree: np.ndarray) -> np.ndarray:
    """(L0+1, 2^L0) bool matrix: entry [d, b] marks node b at depth d
    (Visualizations.jl:61-78 semantics over the leaf mask)."""
    tree = np.asarray(tree, dtype=bool)
    leaf = getleaf(tree, "binary")
    L0 = getdepth(len(leaf), "binary")
    out = np.zeros((L0 + 1, 1 << L0), dtype=bool)
    for i0, isleaf in enumerate(leaf):
        if isleaf:
            d = getdepth(i0 + 1, "binary")
            out[d, (i0 + 1) - (1 << d)] = True
    return out


def tfbdry(tree: np.ndarray, n: int | None = None):
    """Time-frequency tiling rectangles of a basis tree: list of
    (t0, t1, f0, f1) in [0,1]^2, one per leaf."""
    tree = np.asarray(tree, dtype=bool)
    leaf = getleaf(tree, "binary")
    rects = []
    for i0, isleaf in enumerate(leaf):
        if isleaf:
            i = i0 + 1
            d = getdepth(i, "binary")
            b = i - (1 << d)
            # leaf at depth d, block b: frequency band [b, b+1]/2^d,
            # full time extent split into 2^? cells — the reference's
            # heatmap marks the (level, block) tiling
            rects.append((0.0, 1.0, b / (1 << d), (b + 1) / (1 << d), d))
    return rects


def tfbdry2(tree: np.ndarray, n: int, m: int):
    """Quadtree partition rectangles: list of (r0, r1, c0, c1) index ranges
    (Visualizations.jl:254-293 via getrowrange/getcolrange)."""
    tree = np.asarray(tree, dtype=bool)
    leaf = getleaf(tree, "quad")
    rects = []
    for i0, isleaf in enumerate(leaf):
        if isleaf:
            i = i0 + 1
            r = getrowrange(n, i)
            c = getcolrange(m, i)
            rects.append((r.start, r.stop, c.start, c.stop))
    return rects


def wiggle_data(wav: np.ndarray, sc: float = 1.0, zc: bool = True, *,
                taxis=None, zaxis=None, Overlap: bool = True,
                ZDir: str = "normal"):
    """Per-trace plot data for a seismic wiggle display
    (Visualizations.jl:392-475, full parameter surface).

    ``wav``: (n, k) matrix, one trace per column (reference convention).
    ``taxis``/``zaxis``: sample-time and trace-offset coordinates (default
    ``1:n`` / ``1:k``).  ``Overlap=True`` scales amplitudes to
    ``2*dz*sc/max(col_max - col_min)`` (adjacent traces may overlap);
    ``Overlap=False`` uses the reference's non-overlapping
    ``sc/(max(0, max) - min(0, min))`` normalization.  ``ZDir='reverse'``
    reverses the trace-to-offset assignment.  ``zc`` inserts interpolated
    zero crossings so the positive-lobe fill has exact boundaries.

    Returns a list of dicts with interpolated (t, amp), the trace offset and
    the fill mask for positive lobes."""
    wav = np.asarray(wav, dtype=float)
    if wav.ndim == 1:
        wav = wav[:, None]
    n, k = wav.shape
    t = (np.arange(1, n + 1, dtype=float) if taxis is None
         else np.asarray(taxis, dtype=float))
    z = (np.arange(1, k + 1, dtype=float) if zaxis is None
         else np.asarray(zaxis, dtype=float))
    if len(t) != n:
        raise ValueError(f"Inconsistent taxis dimension! ({len(t)} != {n})")
    if len(z) != k:
        raise ValueError(f"Inconsistent zaxis dimension! ({len(z)} != {k})")
    if ZDir not in ("normal", "reverse"):
        raise ValueError(f"ZDir must be 'normal' or 'reverse', got {ZDir!r}")
    dz = float(np.mean(np.diff(z))) if k > 1 else 1.0
    maxrow = wav.max(axis=0)
    minrow = wav.min(axis=0)
    if Overlap:
        rng = np.max(maxrow - minrow)
        wamp = 2.0 * dz * (sc / rng) * wav if rng > 0 else 0.0 * wav
    else:
        wmax = max(maxrow.max(), 0.0)
        wmin = min(minrow.min(), 0.0)
        wamp = sc * wav / (wmax - wmin) if wmax > wmin else 0.0 * wav
    if ZDir == "reverse":
        wamp = wamp[:, ::-1]
    traces = []
    for j in range(k):
        amp = wamp[:, j]
        if zc:
            tt = [t[0]]
            aa = [amp[0]]
            for i in range(n - 1):
                a0, a1 = amp[i], amp[i + 1]
                if a0 * a1 < 0:  # sign change: interpolate the crossing
                    tz = t[i] + abs(a0) / (abs(a0) + abs(a1)) * (t[i + 1]
                                                                 - t[i])
                    tt.append(tz)
                    aa.append(0.0)
                tt.append(t[i + 1])
                aa.append(a1)
            tt = np.asarray(tt)
            aa = np.asarray(aa)
        else:
            tt, aa = t, amp
        traces.append({
            "offset": float(z[j]),
            "t": tt,
            "amp": aa,
            "fill_mask": aa > 0,
        })
    return traces


def relerror_data(coef, redundant: bool = False, tree=None, elbows: int = 2):
    """Data for the threshold-vs-relative-error elbow diagnostic
    (Denoising.jl:285-328 with ``makeplot=true``; curve from
    ``orth2relerror`` :344-349, elbows from ``findelbow`` :367-381).

    Host-side single-signal mirror of ``denoising.relerrorthreshold`` (the
    batched device selector); returns a dict with the normalized curve
    (``x``, ``y``), scales (``xmax``, ``ymax``), per-elbow indices ``ix`` and
    the (A, v) projection data the reference's relerrorplot draws
    (Denoising.jl:401-430), plus the chosen ``threshold``.
    """
    from .denoising import _relevant_coefs
    c = np.asarray(_relevant_coefs(np.asarray(coef), redundant, tree)).ravel()
    x = np.sort(np.abs(c))[::-1]
    o = np.sort(c ** 2)[::-1]
    tot = o.sum()
    r = np.sqrt(np.abs(tot - np.cumsum(o))) / np.sqrt(tot)
    x = np.concatenate([x, [0.0]])        # push!(x, 0)
    r = np.concatenate([r[:1], r])        # pushfirst!(r, r[1])
    xmax, ymax = x.max(), r.max()
    xn = x[::-1] / xmax
    yn = r[::-1] / ymax

    def findelbow(xv, yv):
        v = np.array([xv[-1] - xv[0], yv[-1] - yv[0]])
        v = v / np.sqrt((v ** 2).sum())
        dx, dy = xv - xv[0], yv - yv[0]
        H2 = dx ** 2 + dy ** 2
        A = dx * v[0] + dy * v[1]
        O = np.sqrt(np.abs(H2 - A ** 2))
        return int(np.argmax(O)), A, v

    ix, As, vs = [], [], []
    end = len(xn)
    for _ in range(elbows):
        i, A, v = findelbow(xn[:end], yn[:end])
        ix.append(i)
        As.append(A)
        vs.append(v)
        end = i + 1
    return {
        "x": xn, "y": yn, "xmax": float(xmax), "ymax": float(ymax),
        "ix": ix, "A": As, "v": vs,
        "threshold": float(xn[ix[-1]] * xmax),
    }


# ---------------------------------------------------------------------------
# Rendering (optional)
# ---------------------------------------------------------------------------

def plot_tfbdry(tree, ax=None, **kwargs):
    plt = _require_matplotlib()
    if ax is None:
        _, ax = plt.subplots()
    for (t0, t1, f0, f1, _d) in tfbdry(tree):
        ax.add_patch(plt.Rectangle((t0, f0), t1 - t0, f1 - f0,
                                   fill=False, **kwargs))
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.set_xlabel("time")
    ax.set_ylabel("frequency")
    return ax


def plot_tfbdry2(tree, n: int, m: int, ax=None, **kwargs):
    plt = _require_matplotlib()
    if ax is None:
        _, ax = plt.subplots()
    for (r0, r1, c0, c1) in tfbdry2(tree, n, m):
        ax.add_patch(plt.Rectangle((c0, r0), c1 - c0, r1 - r0,
                                   fill=False, **kwargs))
    ax.set_xlim(0, m)
    ax.set_ylim(n, 0)
    return ax


def relerrorplot(coef, redundant: bool = False, tree=None, elbows: int = 2,
                 ax=None):
    """Render the relative-error elbow diagnostic (Denoising.jl:401-430):
    the blue error curve, per-elbow diagonal + perpendicular-drop lines and
    highlighted elbow points.  Returns the matplotlib Axes."""
    d = relerror_data(coef, redundant, tree, elbows)
    plt = _require_matplotlib()
    if ax is None:
        _, ax = plt.subplots()
    x = d["x"] * d["xmax"]
    y = d["y"] * d["ymax"]
    ax.plot(x, y, lw=2, color="tab:blue")
    ax.set_xlim(0, 1.004 * d["xmax"])
    ax.set_ylim(0, 1.004 * d["ymax"])
    colors = ["tab:orange", "tab:green", "tab:red", "tab:purple"]
    for i, (ix, A, v) in enumerate(zip(d["ix"], d["A"], d["v"])):
        col = colors[i % len(colors)]
        endpoint = d["ix"][i - 1] if i > 0 else len(x) - 1
        ax.plot([x[0], 1.004 * x[endpoint]], [y[0], 1.004 * y[endpoint]],
                lw=2, color=col)
        dropto = (np.array([x[0], y[0]])
                  + A[ix] * (v * np.array([d["xmax"], d["ymax"]])))
        ax.plot([x[ix], dropto[0]], [y[ix], dropto[1]], lw=2, color=col)
        ax.scatter([x[ix]], [y[ix]], color=col, zorder=3)
    ax.set_xlabel("Threshold")
    ax.set_ylabel("Relative Error")
    return ax


def wiggle(wav, sc: float = 1.0, zc: bool = True, ax=None, *,
           taxis=None, zaxis=None, EdgeColor="black", FaceColor="black",
           Overlap: bool = True, Orient: str = "across",
           ZDir: str = "normal", **kwargs):
    """Render the seismic wiggle plot (Visualizations.jl:392-475).

    ``Orient='across'`` (reference default) runs time along x with trace
    offsets on y; ``Orient='down'`` runs time down the (flipped) y axis.
    ``EdgeColor``/``FaceColor`` set the trace line / positive-lobe fill
    colors; remaining options are forwarded to :func:`wiggle_data`."""
    if Orient not in ("across", "down"):
        raise ValueError(f"Orient must be 'across' or 'down', got {Orient!r}")
    plt = _require_matplotlib()
    if ax is None:
        _, ax = plt.subplots()
    traces = wiggle_data(wav, sc, zc, taxis=taxis, zaxis=zaxis,
                         Overlap=Overlap, ZDir=ZDir)
    for tr in traces:
        a = tr["offset"] + tr["amp"]
        if Orient == "down":
            ax.plot(a, tr["t"], color=EdgeColor, lw=0.7, **kwargs)
            ax.fill_betweenx(tr["t"], tr["offset"], a,
                             where=tr["fill_mask"], color=FaceColor,
                             alpha=0.75)
        else:
            ax.plot(tr["t"], a, color=EdgeColor, lw=0.7, **kwargs)
            ax.fill_between(tr["t"], tr["offset"], a,
                            where=tr["fill_mask"], color=FaceColor,
                            alpha=0.75)
    if Orient == "down":
        ax.invert_yaxis()
    return ax
