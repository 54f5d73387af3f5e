"""Generate demo/VibeVoice_TPU.ipynb from QUICKSTART.md.

The reference ships a Colab notebook (reference demo/VibeVoice_colab.ipynb);
ours is generated from QUICKSTART.md so the walkthrough has ONE source of
truth — the markdown prose becomes markdown cells, fenced ```python blocks
become code cells (```bash blocks become `!`-prefixed code cells), and the
existing QUICKSTART execution test keeps every cell runnable.

Re-run after editing QUICKSTART.md:  python scripts/make_notebook.py
"""
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "QUICKSTART.md")
DST = os.path.join(ROOT, "demo", "VibeVoice_TPU.ipynb")


def build_cells(text):
    cells = []
    pos = 0
    for m in re.finditer(r"```(python|bash)\n(.*?)```\n?", text, re.DOTALL):
        prose = text[pos:m.start()].strip()
        if prose:
            cells.append({"cell_type": "markdown", "metadata": {},
                          "source": prose.splitlines(keepends=True)})
        lang, code = m.group(1), m.group(2).rstrip("\n")
        if lang == "bash":
            code = "\n".join(f"!{line}" if line.strip() and not line.startswith("#")
                             else line for line in code.splitlines())
        cells.append({"cell_type": "code",
                      "metadata": {"vv_language": lang}, "outputs": [],
                      "execution_count": None,
                      "source": code.splitlines(keepends=True)})
        pos = m.end()
    tail = text[pos:].strip()
    if tail:
        cells.append({"cell_type": "markdown", "metadata": {},
                      "source": tail.splitlines(keepends=True)})
    return cells


def main():
    text = open(SRC, encoding="utf-8").read()
    nb = {
        "nbformat": 4,
        "nbformat_minor": 5,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python"},
        },
        "cells": build_cells(text),
    }
    with open(DST, "w", encoding="utf-8") as f:
        json.dump(nb, f, indent=1, ensure_ascii=False)
        f.write("\n")
    n_code = sum(1 for c in nb["cells"] if c["cell_type"] == "code")
    print(f"{DST}: {len(nb['cells'])} cells ({n_code} code)")


if __name__ == "__main__":
    main()
