"""Hand-built faexport-shaped snapshot fixtures (FIXTURES.md family A).

Small, deterministic, covering every golden case FIXTURES.md requires:
newest-non-null coalesce, recorded-empty vs not-captured keywords,
extra_data shallow layering (nested values preserved wholesale),
clash-reset file merge, duplicate rows for W1-W4, orphans for J4.
"""

from __future__ import annotations

import base64
from datetime import datetime

from faexport_db_spark.datamodel.schemas import (
    FILE_HASHES,
    FILES,
    KEYWORDS,
    SUBMISSION_SNAPSHOTS,
    USER_SNAPSHOTS,
)

D = datetime  # noqa: N816 - terse fixture literals


def b64(raw: bytes) -> str:
    return base64.b64encode(raw).decode()


T1, T2, T3 = D(2024, 1, 1), D(2024, 1, 2), D(2024, 1, 3)
TI = D(2024, 2, 1)  # ingest_datetime, uncorrelated with scan order


def submission_snapshots(spark):
    rows = [
        # sub fa/101 — three snapshots exercising the full merge family
        (1, "fa", "101", T1, 1, TI, "u1", False, "Old Title", None, D(2023, 12, 31), '{"a":1,"b":{"x":1}}', True),
        (2, "fa", "101", T2, 1, TI, None, False, None, "newer desc", None, '{"b":{"y":2},"c":3}', False),
        (3, "fa", "101", T3, 2, TI, None, True, None, None, None, None, False),
        # sub fa/102 — keywords recorded-as-empty in the newest snapshot
        (4, "fa", "102", T1, 1, TI, "u2", False, "Keep", None, None, None, True),
        (5, "fa", "102", T2, 1, TI, None, False, None, None, None, None, True),
        # sub e621/201 — single snapshot, everything-null path
        (6, "e621", "201", T1, 2, TI, None, False, None, None, None, None, False),
    ]
    return spark.createDataFrame(rows, SUBMISSION_SNAPSHOTS)


def keywords(spark):
    rows = [
        (10, 1, "dog", 1),
        (11, 1, "cat", 0),
        (12, 4, "x", 0),
        # snapshot 5 has keywords_recorded=True but NO rows ⇒ recorded empty
    ]
    return spark.createDataFrame(rows, KEYWORDS)


def files(spark):
    rows = [
        # fa/101 'main' file history: union then clash-reset
        (100, 1, "main", "http://a/1.png", 100, '{"fe":1}'),
        (101, 2, "main", "http://a/1.png", None, '{"fe":2,"g":1}'),
        (102, 3, "main", "http://a/2.png", 200, None),  # url change ⇒ clash
        # fa/102: single file, never clashes
        (103, 4, None, "http://b/9.png", 9, None),
    ]
    return spark.createDataFrame(rows, FILES)


def file_hashes(spark):
    rows = [
        (1000, 100, 1, b"\x01\x01"),  # algo1 on f100
        (1001, 101, 2, b"\x02\x02"),  # new algo on f101 ⇒ union
        (1002, 102, 1, b"\x03\x03"),  # post-clash hash set
        (1003, 103, 1, b"\x09\x09"),
    ]
    return spark.createDataFrame(rows, FILE_HASHES)


def user_snapshots(spark):
    rows = [
        (1, "fa", "u1", T1, 1, TI, False, "Name1", '{"w":[{"n":"a"}],"p":1}'),
        (2, "fa", "u1", T3, 1, TI, True, None, '{"p":2}'),
        (3, "weasyl", "u9", T2, 2, TI, False, "W9", None),
    ]
    return spark.createDataFrame(rows, USER_SNAPSHOTS)


# --- maintenance fixtures: duplicates + orphans --------------------------


def dirty_tables(spark):
    """Tables seeded with duplicates (W1-W4 shapes) and orphans (J4)."""
    subs = spark.createDataFrame(
        [
            (1, "fa", "101", T1, 1, TI, None, False, "A", None, None, None, False),
            # exact dup of snapshot 1's dedup key with higher id ⇒ W3 keeps id 1
            (7, "fa", "101", T1, 1, TI, None, False, "A-dup", None, None, None, False),
            (2, "fa", "101", T2, 1, TI, None, False, "B", None, None, None, False),
        ],
        SUBMISSION_SNAPSHOTS,
    )
    users = spark.createDataFrame(
        [
            (1, "fa", "u1", T1, 1, TI, False, "N", None),
            (5, "fa", "u1", T1, 1, TI, False, "N-dup", None),  # W4 keeps id 1
        ],
        USER_SNAPSHOTS,
    )
    kws = spark.createDataFrame(
        [
            (10, 1, "ok", 0),
            (11, 999, "orphan", 0),  # no parent snapshot ⇒ J4 removes
        ],
        KEYWORDS,
    )
    fls = spark.createDataFrame(
        [
            (100, 1, "main", "u", 1, None),
            (101, 1, "main", "u", 1, None),  # dup (snapshot, site_file_id) ⇒ W2 keeps 101
            (102, 999, "gone", "u", 1, None),  # orphan file ⇒ J4 removes
        ],
        FILES,
    )
    hs = spark.createDataFrame(
        [
            (1000, 100, 1, b"\x01"),
            (1001, 100, 1, b"\x02"),  # dup (file, algo) ⇒ W1 keeps 1001
            (1002, 102, 1, b"\x03"),  # parent file is an orphan ⇒ gone at fixpoint
        ],
        FILE_HASHES,
    )
    return {
        "submission_snapshots": subs,
        "user_snapshots": users,
        "submission_snapshot_keywords": kws,
        "submission_snapshot_files": fls,
        "submission_snapshot_file_hashes": hs,
    }
