"""Maintenance: duplicate-snapshot dedup + orphan cleanup (SURVEY §2.6
W1-W4, §2.3 J4, §2.1 K4).

The reference's cron job (scripts/cron/remove_duplicates.py:310-328)
streams ids into Python lists and issues chunked DELETEs; here each
step is a window/anti-join and the "delete" is a rewrite: the kept
DataFrame replaces the table (K4 — delete-as-anti-join, SURVEY §2.1).

The reference CASCADES within a single run: ``delete_files`` also
deletes the removed files' hashes (remove_duplicates.py:127-138) and
``delete_submissions`` deletes the removed snapshots' files, keywords
and those files' hashes (:217-250). ``cleanup`` mirrors that — each
dedup step is followed by orphan removal against the kept parents, so
one pass leaves no orphans, exactly like one cron run of the
reference. ``cleanup_to_fixpoint`` remains as the audit form.

Scale notes: every window partitions on a high-cardinality composite
key; every anti-join joins child fact to parent fact on the surrogate
id — co-partitionable, handled by AQE. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dedup_keep_one(
    df: DataFrame, keys: list[str], id_col: str, keep: str = "highest"
) -> DataFrame:
    """Keep exactly one row per key group, by surrogate-id direction.

    ``keep="highest"`` mirrors remove_duplicates.py:107-124 (hashes) and
    :161-178 (files); ``keep="lowest"`` mirrors :253-271 (submission
    snapshots) and :290-307 (user snapshots) — SURVEY §7.4.5 warns the
    direction differs by table.
    """
    order = F.desc(id_col) if keep == "highest" else F.asc(id_col)
    w = Window.partitionBy(*keys).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def remove_orphans(
    child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Drop child rows whose parent no longer exists (J4 + K4).

    Reference: remove_duplicates.py:89-96 (hashes), :143-150 (files),
    :199-206 (keywords) — LEFT JOIN … WHERE parent.id IS NULL, then
    chunked DELETE. Spark form: one left_anti to find nothing — we
    directly keep the semi-joined survivors.
    """
    parent_keys = parent.select(F.col(pk).alias(fk)).distinct()
    return child.join(parent_keys, fk, "left_semi")


SUBMISSION_DEDUP_KEYS = [
    "website_id",
    "site_submission_id",
    "scan_datetime",
    "archive_contributor_id",
]
USER_DEDUP_KEYS = [
    "website_id",
    "site_user_id",
    "scan_datetime",
    "archive_contributor_id",
]


def cleanup(tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """One pass of the reference's cleanup sequence
    (remove_duplicates.py:316-322), as pure DataFrame rewrites.

    Input/output dict keys: user_snapshots, submission_snapshots,
    submission_snapshot_keywords, submission_snapshot_files,
    submission_snapshot_file_hashes (missing tables are skipped).
    """
    out = dict(tables)

    if "user_snapshots" in out:
        out["user_snapshots"] = dedup_keep_one(
            out["user_snapshots"], USER_DEDUP_KEYS, "user_snapshot_id", keep="lowest"
        )

    files = out.get("submission_snapshot_files")
    hashes = out.get("submission_snapshot_file_hashes")
    snaps = out.get("submission_snapshots")

    if hashes is not None and files is not None:
        hashes = remove_orphans(hashes, files, "file_id", "file_id")
        hashes = dedup_keep_one(hashes, ["file_id", "algo_id"], "hash_id", keep="highest")

    if files is not None and snaps is not None:
        files = remove_orphans(
            files, snaps, "submission_snapshot_id", "submission_snapshot_id"
        )
        files = dedup_keep_one(
            files,
            ["submission_snapshot_id", "site_file_id"],
            "file_id",
            keep="highest",
        )
        if hashes is not None:
            # Cascade of the file dedup: the reference deletes the losing
            # files' hashes in the same run (remove_duplicates.py:127-138).
            hashes = remove_orphans(hashes, files, "file_id", "file_id")

    keywords = out.get("submission_snapshot_keywords")
    if keywords is not None and snaps is not None:
        keywords = remove_orphans(
            keywords, snaps, "submission_snapshot_id", "submission_snapshot_id"
        )
        # The reference never needs a keyword dedup: duplicate snapshots
        # always carry fresh serial ids there, so the snapshot-dedup
        # cascade removes the losing snapshot's keywords. Our streaming
        # redelivery mints the SAME ids deterministically, leaving
        # full-row keyword duplicates the cascade can't see — collapse
        # them (a no-op on reference-shaped data).
        keywords = dedup_keep_one(
            keywords,
            ["submission_snapshot_id", "keyword", "ordinal"],
            "keyword_id",
            keep="lowest",
        )

    if snaps is not None:
        snaps = dedup_keep_one(
            snaps, SUBMISSION_DEDUP_KEYS, "submission_snapshot_id", keep="lowest"
        )
        # Cascade of the snapshot dedup: the reference deletes the losing
        # snapshots' files, keywords, and those files' hashes in the same
        # run (remove_duplicates.py:217-250).
        if files is not None:
            files = remove_orphans(
                files, snaps, "submission_snapshot_id", "submission_snapshot_id"
            )
            if hashes is not None:
                hashes = remove_orphans(hashes, files, "file_id", "file_id")
        if keywords is not None:
            keywords = remove_orphans(
                keywords, snaps, "submission_snapshot_id", "submission_snapshot_id"
            )

    for name, df in (
        ("submission_snapshots", snaps),
        ("submission_snapshot_files", files),
        ("submission_snapshot_keywords", keywords),
        ("submission_snapshot_file_hashes", hashes),
    ):
        if df is not None:
            out[name] = df
    return out


def cleanup_to_fixpoint(
    tables: dict[str, DataFrame], max_rounds: int = 3
) -> dict[str, DataFrame]:
    """Run ``cleanup`` until row counts stop changing (the reference
    reaches the same state by being run repeatedly from cron). Counts
    are the only actions; bounded by ``max_rounds`` (the dependency
    chain snapshot→file→hash is 3 deep, so 3 always suffices)."""
    counts = {name: df.count() for name, df in tables.items()}
    for _ in range(max_rounds):
        tables = cleanup(tables)
        new_counts = {name: df.count() for name, df in tables.items()}
        if new_counts == counts:
            break
        counts = new_counts
    return tables
