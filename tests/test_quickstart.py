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


def test_notebook_in_sync_with_quickstart(tmp_path):
    """demo/VibeVoice_TPU.ipynb is generated from QUICKSTART.md (one source
    of truth) — regenerating must reproduce the checked-in file, and its
    python code cells must equal the quickstart blocks the test above
    already executes."""
    import json
    import subprocess
    import sys
    repo = os.path.join(os.path.dirname(__file__), "..")
    nb_path = os.path.join(repo, "demo", "VibeVoice_TPU.ipynb")
    before = open(nb_path, encoding="utf-8").read()
    subprocess.run([sys.executable, os.path.join(repo, "scripts", "make_notebook.py")],
                   check=True, capture_output=True)
    assert open(nb_path, encoding="utf-8").read() == before, (
        "notebook out of sync: run scripts/make_notebook.py and commit")
    nb = json.load(open(nb_path, encoding="utf-8"))
    nb_python = ["".join(c["source"]) for c in nb["cells"]
                 if c["cell_type"] == "code"
                 and c["metadata"].get("vv_language") == "python"]
    md_python = [b.rstrip("\n") for b in _blocks()]
    assert nb_python == md_python
