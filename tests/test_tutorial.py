"""Execute every python block in docs/TUTORIAL.md.

The reference ships an executable notebook (scripts/tutorial.ipynb); this
test keeps our markdown tutorial honest the same way: each ```python block
is exec'd in order in one shared namespace, so later blocks may use names
defined by earlier ones (``total``, ``sketched``).  Runs on the test
suite's CPU/f64 platform; file outputs go to a tmp cwd.
"""
import os
import re
from pathlib import Path

DOC = Path(__file__).resolve().parent.parent / "docs" / "TUTORIAL.md"


def _python_blocks(text):
    return re.findall(r"```python\n(.*?)```", text, flags=re.DOTALL)


def test_tutorial_blocks_execute(tmp_path):
    blocks = _python_blocks(DOC.read_text())
    assert len(blocks) >= 8, "tutorial lost its code blocks?"
    ns = {}
    cwd = os.getcwd()
    os.chdir(tmp_path)  # the checkpointing block writes state.npz
    try:
        for i, block in enumerate(blocks):
            try:
                exec(compile(block, f"TUTORIAL.md[block {i}]", "exec"), ns)
            except Exception as e:  # pragma: no cover - failure reporting
                raise AssertionError(
                    f"tutorial block {i} failed: {e}\n---\n{block}"
                ) from e
    finally:
        os.chdir(cwd)
    # sanity: the GMRES block actually converged somewhat
    hist = ns["history"]
    assert hist["residual_norm"][-1] < hist["residual_norm"][0]
