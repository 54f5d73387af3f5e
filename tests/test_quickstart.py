"""QUICKSTART.md must actually run: execute its python blocks in order
(skipping the real-weights section), sharing one namespace — the same
guarantee the reference's Colab notebook gives its users."""
import os
import re

import pytest


def _blocks():
    path = os.path.join(os.path.dirname(__file__), "..", "QUICKSTART.md")
    text = open(path, encoding="utf-8").read()
    return re.findall(r"```python\n(.*?)```", text, re.DOTALL)


def test_quickstart_python_blocks_execute(tmp_path):
    blocks = [b for b in _blocks() if "from_pretrained" not in b]
    assert len(blocks) >= 4
    ns = {}
    for i, block in enumerate(blocks):
        block = block.replace("/tmp/quickstart.wav",
                              str(tmp_path / "quickstart.wav"))
        block = block.replace("/tmp/qs_cap.wav", str(tmp_path / "qs_cap.wav"))
        try:
            exec(compile(block, f"QUICKSTART block {i}", "exec"), ns)
        except Exception as e:  # pragma: no cover
            pytest.fail(f"QUICKSTART block {i} failed: {type(e).__name__}: {e}\n{block}")
    assert (tmp_path / "quickstart.wav").exists()
    assert ns["files"]["srt"] and os.path.exists(ns["files"]["srt"])
    assert sum(len(c) for c in ns["chunks"]) > 0
