#!/usr/bin/env python3
"""Regenerate file:line anchors in IMPLEMENTATION.md.

Scans src/main/scala for `QueryDef(\n  "<name>",` declarations, then
rewrites every `src/main/scala/...scala:<line>` token in a table row
whose id column matches a declared query name. Rows naming a file
without a line (e.g. "TextOps.scala (dupClustersQ)") are left alone.
Run from the repo root: python3 tools/anchors.py [--check]
"""
import re
import sys
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
DOC = ROOT / "IMPLEMENTATION.md"

def find_anchors():
    anchors = {}
    for p in sorted((ROOT / "src/main/scala").rglob("*.scala")):
        text = p.read_text()
        for m in re.finditer(r'QueryDef\(\s*\n?\s*"([a-z0-9_]+)"', text):
            line = text[:m.start()].count("\n") + 1
            anchors[m.group(1)] = f"{p.relative_to(ROOT)}:{line}"
    return anchors

def main():
    check = "--check" in sys.argv
    anchors = find_anchors()
    out, changed = [], 0
    for raw in DOC.read_text().splitlines(keepends=True):
        m = re.match(r"\|\s*\+?\s*([a-z0-9_]+)(?:\s+\(flagship\))?\s*\|", raw)
        name = m.group(1) if m else None
        if name in anchors and re.search(r"src/main/scala/\S+\.scala:\d+", raw):
            new = re.sub(r"src/main/scala/\S+\.scala:\d+", anchors[name], raw, count=1)
            if new != raw:
                changed += 1
            out.append(new)
        else:
            out.append(raw)
    if check:
        print(f"{changed} stale anchors" if changed else "anchors up to date")
        sys.exit(1 if changed else 0)
    DOC.write_text("".join(out))
    print(f"rewrote {changed} anchors")

if __name__ == "__main__":
    main()
