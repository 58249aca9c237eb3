#!/usr/bin/env python
"""Regenerate docs/api/*.md from the package docstrings.

Usage: python docs/gen_api.py   (CPU; writes one page per module group)

Mirrors the reference Documenter API layout (docs/make.jl:20-31: DWT, ACWT,
SWT, SIWT, WaveMult, Best Basis, Denoising, LDB, Utils, Visualizations) plus
a Parallel page for the TPU-added subsystems.
"""

import inspect
import os
import pathlib
import sys

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import waveletsext_tpu as wx  # noqa: E402
from waveletsext_tpu import (basis, denoising, ldb, metrics, datasets,  # noqa
                             trees, utils, viz, wavemult, serialization,
                             observability)
from waveletsext_tpu.transforms import dwt, swt, acwt, siwt, siwt_dense  # noqa
from waveletsext_tpu.parallel import sharding, cp, multihost  # noqa
from waveletsext_tpu.kernels import conv, pallas_siwt, pallas_emd  # noqa
from waveletsext_tpu import filters  # noqa

PAGES = {
    "dwt.md": ("DWT — decimated transforms", [dwt], None),
    "swt.md": ("SWT — stationary transforms", [swt], None),
    "acwt.md": ("ACWT — autocorrelation transforms", [acwt], None),
    "siwt.md": ("SIWT — shift-invariant transforms", [siwt, siwt_dense],
                None),
    "bestbasis.md": ("Best basis", [basis], None),
    "denoising.md": ("Denoising", [denoising], None),
    "ldb.md": ("Local Discriminant Basis", [ldb], None),
    "wavemult.md": ("WaveMult (BCR fast multiplication)", [wavemult], None),
    "utils.md": ("Utils — trees, indexing, metrics, datasets, filters",
                 [trees, utils, metrics, datasets, filters, serialization],
                 None),
    "visualizations.md": ("Visualizations", [viz], None),
    "parallel.md": ("Parallel & runtime (TPU-added)",
                    [sharding, cp, multihost, observability, conv,
                     pallas_siwt, pallas_emd], None),
}


def _public_members(mod):
    out = []
    for name, obj in vars(mod).items():
        if name.startswith("_"):
            continue
        if not (inspect.isfunction(obj) or inspect.isclass(obj)):
            continue
        if getattr(obj, "__module__", None) != mod.__name__ and not hasattr(
                obj, "__wrapped_impl__"):
            continue
        if not (obj.__doc__ or "").strip():
            continue
        out.append((name, obj))
    out.sort(key=lambda kv: _lineno(kv[1]))
    return out


def _lineno(obj):
    try:
        impl = getattr(obj, "__wrapped_impl__", obj)
        return inspect.getsourcelines(inspect.unwrap(impl))[1]
    except (OSError, TypeError):
        return 1 << 30


def _signature(name, obj):
    impl = getattr(obj, "__wrapped_impl__", obj)
    try:
        sig = str(inspect.signature(impl))
    except (ValueError, TypeError):
        sig = "(...)"
    return f"{name}{sig}"


def render(title, mods):
    lines = [f"# {title}", "",
             "*Generated from docstrings by `docs/gen_api.py` — regenerate "
             "after changing signatures.*", ""]
    for mod in mods:
        lines.append(f"## `{mod.__name__}`")
        lines.append("")
        head = (mod.__doc__ or "").strip().split("\n\n")[0]
        if head:
            lines.append(head)
            lines.append("")
        for name, obj in _public_members(mod):
            kind = "class" if inspect.isclass(obj) else "def"
            lines.append(f"### `{_signature(name, obj)}`" if kind == "def"
                         else f"### class `{name}`")
            lines.append("")
            doc = inspect.cleandoc(obj.__doc__)
            lines.append(doc)
            lines.append("")
    return "\n".join(lines) + "\n"


def main():
    api = ROOT / "docs" / "api"
    api.mkdir(parents=True, exist_ok=True)
    for fname, (title, mods, _) in PAGES.items():
        (api / fname).write_text(render(title, mods))
        print(f"wrote docs/api/{fname}")


if __name__ == "__main__":
    main()
