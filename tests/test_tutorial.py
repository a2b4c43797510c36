"""Every ``python`` block in docs/TUTORIAL.md must run as-is.

The reference ships an executable tutorial (scripts/tutorial.ipynb); this
test is its CI analog — it extracts the fenced ``python`` blocks in
document order and executes them in one shared namespace (later blocks
reuse names defined by earlier ones, like notebook cells).
"""
from __future__ import annotations

import re
from pathlib import Path

TUTORIAL = Path(__file__).resolve().parent.parent / "docs" / "TUTORIAL.md"

_BLOCK_RE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks():
    text = TUTORIAL.read_text()
    blocks = _BLOCK_RE.findall(text)
    assert len(blocks) >= 8, f"expected >=8 python blocks, found {len(blocks)}"
    return blocks


def test_tutorial_blocks_execute(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)  # blocks write relative paths (state.npz)
    ns: dict = {}
    for i, block in enumerate(_blocks()):
        try:
            exec(compile(block, f"TUTORIAL.md[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure reporting
            raise AssertionError(
                f"tutorial block {i} failed ({type(e).__name__}: {e}):\n"
                f"{block}"
            ) from e
