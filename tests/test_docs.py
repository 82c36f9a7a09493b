"""Execute every ```python block in docs/ (VERDICT r4 item 10).

Each guide's blocks run sequentially in one shared namespace per file, on
CPU, so the documentation cannot drift from the API: a renamed class or
changed signature fails this test.
"""
from __future__ import annotations

import pathlib
import re

import pytest

DOCS = pathlib.Path(__file__).resolve().parent.parent / "docs"
GUIDES = sorted(p.name for p in DOCS.glob("*.md")
                if p.name != "architecture.md")

_BLOCK_RE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks(name):
    text = (DOCS / name).read_text()
    return _BLOCK_RE.findall(text)


def test_guides_exist():
    assert {"quickstart.md", "guide_trace_analyze.md", "guide_optimize.md",
            "guide_tolerancing.md", "guide_tpu_scaling.md"} <= set(GUIDES)


@pytest.mark.parametrize("name", GUIDES)
def test_doc_code_blocks_execute(name):
    blocks = _blocks(name)
    assert blocks, f"{name} has no python blocks"
    import matplotlib
    matplotlib.use("Agg")
    ns: dict = {"__name__": f"docs_{name}"}
    for i, src in enumerate(blocks):
        try:
            exec(compile(src, f"{name}[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure path
            raise AssertionError(
                f"{name} block {i} failed: {type(e).__name__}: {e}\n"
                f"--- block source ---\n{src}") from e
