#!/usr/bin/env python
"""Regenerate the committed driver-green manifest from the
``CORRECTNESS_r*.json`` files the driver leaves in the repo root.

The registry's driver-window rotation (queries/__init__.py) reads the
COMMITTED manifest so the window is deterministic for a given checkout
— a stale/foreign/missing CORRECTNESS file can no longer silently
change which ops the driver verifies (ADVICE r03). Run this after each
round lands a new CORRECTNESS file, review the diff, commit.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(ROOT, "faexport_db_spark", "queries", "driver_green.json")
sys.path.insert(0, ROOT)


def collect_green() -> dict[str, str]:
    """key -> LAST round file that recorded it clean (r05: was first;
    the window now re-checks greens oldest-first, which needs recency,
    not discovery order). The acceptance criteria are
    ``queries.greenrows.is_green_row`` — the SAME definition the
    runtime merge uses, so the manifest can't drift from it (imported
    from the dependency-free module so this tool works even while the
    registry itself is broken)."""
    from faexport_db_spark.queries.greenrows import is_green_row

    green: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            doc = json.load(f)
        if not isinstance(doc, dict):
            continue
        for key, row in doc.items():
            if is_green_row(row):
                green[key] = os.path.basename(path)
    return green


def main() -> None:
    green = collect_green()
    prev = {}
    if os.path.exists(MANIFEST):
        with open(MANIFEST) as f:
            prev = json.load(f).get("green", {})
    def rnum(v):
        m = re.search(r"_r(\d+)", str(v))
        return int(m.group(1)) if m else -1

    # Per key keep whichever side names the NEWER round; a key only in
    # prev survives (the loose CORRECTNESS file may have been cleaned).
    merged = dict(prev)
    for k, v in green.items():
        if k not in merged or rnum(v) > rnum(merged[k]):
            merged[k] = v
    with open(MANIFEST, "w") as f:
        json.dump({"green": dict(sorted(merged.items()))}, f, indent=1, sort_keys=True)
        f.write("\n")
    added = sorted(set(merged) - set(prev))
    print(f"manifest: {len(merged)} green keys ({len(added)} new): {added}")


if __name__ == "__main__":
    main()
