"""Docs stay true: execute every ```python block in docs/ manual pages.

(The reference counterpart is Documenter's doctest pass over docs/src;
here the examples are plain python and run under the CPU test config.)
"""

import pathlib
import re

import pytest

DOCS = pathlib.Path(__file__).resolve().parents[1] / "docs"
PAGES = sorted(p for p in [DOCS / "index.md", *sorted((DOCS / "manual").glob("*.md"))])

BLOCK = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks(page):
    return BLOCK.findall(page.read_text())


@pytest.mark.parametrize("page", PAGES, ids=lambda p: p.stem)
def test_manual_examples_run(page):
    blocks = _blocks(page)
    if not blocks:
        pytest.skip("no python blocks")
    ns = {"rank": 0}
    for i, src in enumerate(blocks):
        if "multihost.initialize" in src:
            continue  # needs a real multi-process launch (tests/test_multihost.py)
        try:
            exec(compile(src, f"{page.name}[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover
            raise AssertionError(
                f"{page.name} block {i} failed: {e}\n---\n{src}") from e
