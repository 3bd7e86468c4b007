"""Docs integrity checker — the local/no-deps half of the docs CI gate.

The CI workflow additionally runs ``mkdocs build --strict`` (which needs
pip-installed mkdocs-material); this script validates everything that can
be checked from the files alone, so a broken docs tree fails fast on any
machine:

  * every chapter in docs/ is reachable from mkdocs.yml's nav, and every
    nav entry exists on disk;
  * every RELATIVE markdown link inside docs/ resolves to a real file
    (anchors are stripped; http(s) links are ignored);
  * the book meets its teaching-surface floor: total line count and
    fenced diagram count (docs/10-DIAGRAMS.md + inline ascii art blocks).

Run: ``python scripts/docs_check.py`` — exits nonzero with a findings list.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = os.path.join(REPO, "docs")

MIN_TOTAL_LINES = 5000
MIN_DIAGRAMS = 10

LINK_RE = re.compile(r"\[[^\]]*\]\(([^)#\s]+)(?:#[^)]*)?\)")


def main() -> int:
    findings: list[str] = []
    chapters = sorted(f for f in os.listdir(DOCS) if f.endswith(".md"))

    # --- nav coverage -----------------------------------------------------
    nav_files = set()
    with open(os.path.join(DOCS, "mkdocs.yml")) as f:
        for line in f:
            m = re.search(r":\s*([\w.\-]+\.md)\s*$", line)
            if m:
                nav_files.add(m.group(1))
    for f in nav_files:
        if not os.path.exists(os.path.join(DOCS, f)):
            findings.append(f"mkdocs.yml nav references missing file: {f}")
    for f in chapters:
        if f not in nav_files:
            findings.append(f"chapter not in mkdocs.yml nav: {f}")

    # --- link resolution + metrics ---------------------------------------
    total_lines = 0
    diagrams = 0
    for name in chapters:
        path = os.path.join(DOCS, name)
        with open(path) as f:
            text = f.read()
        lines = text.splitlines()
        total_lines += len(lines)
        # a "diagram" = a fenced block containing box-drawing/ascii-art
        # structure (axes, boxes, arrows), not a code sample
        for block in re.findall(r"```(?:\w*)\n(.*?)```", text, re.S):
            if re.search(r"[┌└├│▶█]|──|->.*->|▼", block):
                diagrams += 1
        for target in LINK_RE.findall(text):
            if target.startswith(("http://", "https://", "mailto:")):
                continue
            resolved = os.path.normpath(os.path.join(DOCS, target))
            if not os.path.exists(resolved):
                findings.append(f"{name}: broken relative link -> {target}")

    if total_lines < MIN_TOTAL_LINES:
        findings.append(
            f"teaching surface below floor: {total_lines} lines "
            f"(need >= {MIN_TOTAL_LINES})")
    if diagrams < MIN_DIAGRAMS:
        findings.append(
            f"too few diagrams: {diagrams} (need >= {MIN_DIAGRAMS})")

    print(f"docs: {len(chapters)} chapters, {total_lines} lines, "
          f"{diagrams} diagrams, {len(findings)} finding(s)")
    for f in findings:
        print(f"  - {f}")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
