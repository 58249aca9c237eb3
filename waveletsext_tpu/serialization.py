"""Checkpoint / resume for fitted state.

The reference keeps its only persistent object (the fitted
LocalDiscriminantBasis, /root/reference/src/mod/LDB.jl:89-110) in memory and
never serializes anything (SURVEY §5).  This module adds the save/load story:
fitted LDB state and denoising thresholds as npz + json artifacts — small,
host-side, and sufficient for rerun-from-checkpoint batch recovery.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib

import numpy as np

from . import ldb as _ldb


_EN_TYPES = {c.__name__: c for c in
             (_ldb.TimeFrequency, _ldb.ProbabilityDensity, _ldb.Signatures)}
_DM_TYPES = {c.__name__: c for c in
             (_ldb.AsymmetricRelativeEntropy, _ldb.SymmetricRelativeEntropy,
              _ldb.HellingerDistance, _ldb.LpDistance,
              _ldb.EarthMoverDistance)}
_DP_TYPES = {c.__name__: c for c in
             (_ldb.BasisDiscriminantMeasure, _ldb.FishersClassSeparability,
              _ldb.RobustFishersClassSeparability)}


def save_ldb(f: _ldb.LocalDiscriminantBasis, path):
    """Persist a fitted LDB estimator to ``<path>.json`` + ``<path>.npz``."""
    path = pathlib.Path(path)
    meta = {
        "wt": f.wt if isinstance(f.wt, str) else f.wt.name,
        "max_dec_level": f.max_dec_level,
        "dm": type(f.dm).__name__,
        "dm_params": dataclasses.asdict(f.dm),
        "en": type(f.en).__name__,
        "en_params": dataclasses.asdict(f.en),
        "dp": type(f.dp).__name__,
        "top_k": f.top_k,
        "n_features": f.n_features,
        "sz": list(f.sz) if f.sz is not None else None,
    }
    path.with_suffix(".json").write_text(json.dumps(meta, indent=2))
    arrays = {}
    if f.tree is not None:
        arrays["tree"] = np.asarray(f.tree)
        arrays["cost"] = np.asarray(f.cost)
        arrays["DM"] = np.asarray(f.DM)
        arrays["DP"] = np.asarray(f.DP)
        arrays["order"] = np.asarray(f.order)
        if not isinstance(f.Gamma, list):
            arrays["Gamma"] = np.asarray(f.Gamma)
    np.savez(path.with_suffix(".npz"), **arrays)


def load_ldb(path) -> _ldb.LocalDiscriminantBasis:
    """Restore a fitted LDB estimator saved with :func:`save_ldb`."""
    path = pathlib.Path(path)
    meta = json.loads(path.with_suffix(".json").read_text())
    f = _ldb.LocalDiscriminantBasis(
        wt=meta["wt"],
        max_dec_level=meta["max_dec_level"],
        dm=_DM_TYPES[meta["dm"]](**meta["dm_params"]),
        en=_EN_TYPES[meta["en"]](**meta["en_params"]),
        dp=_DP_TYPES[meta["dp"]](),
        top_k=meta["top_k"],
        n_features=meta["n_features"],
    )
    if meta["sz"] is not None:
        f.sz = tuple(meta["sz"])
    data = np.load(path.with_suffix(".npz"), allow_pickle=False)
    if "tree" in data:
        f.tree = data["tree"]
        f.cost = data["cost"]
        f.DM = data["DM"]
        f.DP = data["DP"]
        f.order = data["order"]
        f.Gamma = data["Gamma"] if "Gamma" in data else None
    return f


def save_thresholds(path, **named_arrays):
    """Persist named threshold/sigma arrays (denoising state)."""
    np.savez(pathlib.Path(path).with_suffix(".npz"),
             **{k: np.asarray(v) for k, v in named_arrays.items()})


def load_thresholds(path) -> dict:
    data = np.load(pathlib.Path(path).with_suffix(".npz"))
    return {k: data[k] for k in data.files}
