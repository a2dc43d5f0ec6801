"""End-to-end pipeline (SURVEY.md §5 plan item 4): raw dump → ingest →
re-ingest (duplicate delivery) → maintenance cleanup → merged view →
hash search → JSONL export, against hand-computed goldens.

This is the reference's full operational loop (bulk ingest CLI +
remove_duplicates cron + web reads + dump_db cron) as one Spark
pipeline over a tiny e621-shaped dump.
"""

from __future__ import annotations

import csv as _csv
import json

import pytest
from pyspark.sql import functions as F

from faexport_db_spark import serve
from faexport_db_spark.ingest import e621, explode_to_store
from faexport_db_spark.maintenance.dedup import cleanup_to_fixpoint
from faexport_db_spark.serve.export import dump_merged_submissions


def _row(post_id, md5, scan_desc, score="5"):
    return [
        post_id, "u9", "2022-07-01T10:00:00Z", md5,
        "https://a.net/x", "s", "800", "600", "tag_a tag_b", "",
        "10", "png", "", "77", "", "12345", "3", scan_desc, "",
        "2022-07-02T10:00:00Z", "f", "f", "f", score, "7", "-1", "f", "f", "t",
    ]


@pytest.fixture(scope="module")
def dumps(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    first = d / "dump1.csv"
    second = d / "dump2.csv"  # later scrape: 2001 changed, 2002 unchanged
    with open(first, "w", newline="") as fh:
        w = _csv.writer(fh)
        w.writerow(e621.E621_COLUMNS)
        w.writerow(_row("2001", "a" * 32, "first text"))
        w.writerow(_row("2002", "b" * 32, "other post"))
    with open(second, "w", newline="") as fh:
        w = _csv.writer(fh)
        w.writerow(e621.E621_COLUMNS)
        w.writerow(_row("2001", "c" * 32, "edited text", score="9"))
        w.writerow(_row("2002", "b" * 32, "other post"))
    return str(first), str(second)


@pytest.fixture(scope="module")
def store(spark, dumps):
    first, second = dumps
    snaps1 = e621.to_snapshots(
        e621.read_csv(spark, first), contributor_id=1,
        scan_datetime_lit="2022-07-13 00:00:00",
    )
    snaps2 = e621.to_snapshots(
        e621.read_csv(spark, second), contributor_id=1,
        scan_datetime_lit="2022-08-13 00:00:00",
    )
    # second dump delivered TWICE (the reference's re-run reality;
    # SURVEY §2.10 contract: append + dedup, never upsert)
    nested = snaps1.unionByName(snaps2).unionByName(snaps2)
    tables = explode_to_store(nested)
    # single-pass cleanup mirrors the reference's cron order, which
    # leaves children newly orphaned by snapshot dedup for the NEXT
    # run; the fixpoint composition converges in one call.
    tables = cleanup_to_fixpoint(tables)

    dims = {
        "websites": spark.createDataFrame(
            [("e621", "e621", "https://e621.net")],
            "website_id string, full_name string, link string",
        ),
        "archive_contributors": spark.createDataFrame(
            [(1, "dump-loader", "k1")],
            "contributor_id bigint, name string, api_key string",
        ),
        "hash_algos": spark.createDataFrame(
            [(e621.MD5_ALGO_ID, "any", "md5")],
            "algo_id bigint, language string, algorithm_name string",
        ),
    }
    return {**tables, **dims}


@pytest.mark.slow
def test_dedup_collapsed_duplicate_delivery(store):
    """3 deliveries of 2 dumps × 2 posts → exactly 4 distinct snapshots."""
    assert store["submission_snapshots"].count() == 4
    assert (
        store["submission_snapshots"]
        .groupBy("website_id", "site_submission_id", "scan_datetime")
        .count()
        .filter(F.col("count") > 1)
        .count()
        == 0
    )


@pytest.mark.slow
def test_children_survive_cleanup_consistently(store):
    """Every keyword/file row still points at a surviving snapshot;
    every hash at a surviving file (J4 orphan rules)."""
    snaps = store["submission_snapshots"].select("submission_snapshot_id")
    kw = store["submission_snapshot_keywords"]
    files = store["submission_snapshot_files"]
    hashes = store["submission_snapshot_file_hashes"]
    assert kw.join(snaps, "submission_snapshot_id", "left_anti").count() == 0
    assert files.join(snaps, "submission_snapshot_id", "left_anti").count() == 0
    assert hashes.join(files.select("file_id"), "file_id", "left_anti").count() == 0
    # 2 keywords per snapshot
    assert kw.count() == 8
    assert files.count() == 4 and hashes.count() == 4


@pytest.mark.slow
def test_merged_view_reflects_latest_scrape(store):
    data = serve.view_submission(store, "e621", "2001")
    assert data["cache_data"]["snapshot_count"] == 2
    assert data["submission_data"]["description"] == "edited text"
    assert json.loads(json.dumps(data["submission_data"]["extra_data"]))["score"] == 9
    # md5 change ⇒ file clash ⇒ only the new hash survives (M7)
    [f] = data["submission_data"]["files"]
    assert f["file_hashes"][0]["hash_value"] == _b64_of_hex("c" * 32)

    unchanged = serve.view_submission(store, "e621", "2002")
    assert unchanged["cache_data"]["snapshot_count"] == 2
    assert unchanged["submission_data"]["description"] == "other post"


def _b64_of_hex(hx: str) -> str:
    import base64

    return base64.b64encode(bytes.fromhex(hx)).decode()


@pytest.mark.slow
def test_hash_search_finds_post_by_md5(store):
    results = serve.search_hash(store, e621.MD5_ALGO_ID, bytes.fromhex("c" * 32))
    assert [r["site_submission_id"] for r in results] == ["2001"]
    # the pre-edit hash still resolves to its historical snapshot
    old = serve.search_hash(store, e621.MD5_ALGO_ID, bytes.fromhex("a" * 32))
    assert [r["site_submission_id"] for r in old] == ["2001"]


def test_export_roundtrip(spark, store, tmp_path):
    out = str(tmp_path / "dump")
    dump_merged_submissions(store, out)
    back = {r["site_submission_id"]: r for r in spark.read.json(out).collect()}
    assert set(back) == {"2001", "2002"}
    assert back["2001"]["submission_data"]["description"] == "edited text"
    assert back["2001"]["cache_data"]["snapshot_count"] == 2
