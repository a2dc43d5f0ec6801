"""The single definition of a clean driver correctness row.

Deliberately dependency-free (no pyspark, no registry import):
``tools/update_green_manifest.py`` needs it while iterating on a
possibly-broken registry, and importing the full queries package would
execute every query module plus the window reorder at import time
(review finding)."""

from __future__ import annotations


def is_green_row(row) -> bool:
    """A driver correctness row that counts as a clean pass — shared
    by the runtime window computation and the committed-manifest tool
    so the two can never drift."""
    return (
        isinstance(row, dict)
        and not row.get("err")
        and bool(row.get("rows_match"))
        and bool(row.get("hash_match", True))
    )
