"""Ingest-adapter tests over tiny format-faithful sample dumps
(FIXTURES.md A9), including rule-violating rows so validation mode has
positive counts."""

import base64
import json
import sqlite3
import struct

import pytest

from faexport_db_spark.ingest import explode_to_store, validation_report
from faexport_db_spark.ingest import (
    e621,
    fa_indexer,
    faexport_api,
    findfurrypicbot,
    foxoblue,
    fuzzysearch,
)


def _e621_row(post_id, md5="a" * 32, rating="s", deleted="f", score="5", down="-1"):
    return [
        post_id, "u9", "2022-07-01T10:00:00Z", md5, "https://www.a.net/x\nhttps://b.org/y",
        rating, "800", "600", "tag1 tag2 tag1", "lock1", "10", "png", "", "77", "",
        "12345", "3", "a description", "", "2022-07-02T10:00:00Z", deleted, "f", "f",
        score, "7", down, "f", "f", "t",
    ]


@pytest.fixture(scope="module")
def e621_csv(tmp_path_factory):
    path = tmp_path_factory.mktemp("e621") / "posts.csv"
    import csv as _csv

    with open(path, "w", newline="") as fh:
        w = _csv.writer(fh)
        w.writerow(e621.E621_COLUMNS)
        w.writerow(_e621_row("1001"))
        w.writerow(_e621_row("1002", md5="b" * 32, rating="q"))
        w.writerow(_e621_row("1003", rating="x", deleted="z", down="3"))  # violations
    return str(path)


def test_e621_adapter(spark, e621_csv):
    raw = e621.read_csv(spark, e621_csv)
    snaps = e621.to_snapshots(raw, contributor_id=1, scan_datetime_lit="2022-07-13 00:00:00")
    rows = {r["site_submission_id"]: r for r in snaps.collect()}
    assert len(rows) == 3
    row = rows["1001"]
    extra = json.loads(row["extra_data"])
    assert extra["sources"] == ["https://www.a.net/x", "https://b.org/y"]
    assert extra["rating"] == "s"
    assert extra["down_score"] == -1 and extra["is_note_locked"] is True
    kws = {(k["ordinal"], k["keyword"]) for k in row["keywords"]}
    assert kws == {(None, "tag1"), (None, "tag2")}  # unordered, duplicates kept
    [f] = row["files"]
    assert f["file_url"] == f"https://static1.e621.net/data/aa/aa/{'a'*32}.png"
    assert f["file_size"] == 12345
    assert bytes(f["hashes"][0]["hash_value"]) == bytes.fromhex("a" * 32)
    assert json.loads(f["extra_data"])["duration"] is None  # null kept (json fidelity)

    report = {
        r["rule"]: r["violations"]
        for r in validation_report(raw, e621.validation_rules()).collect()
    }
    assert report["rating_not_eqs"] == 1
    assert report["is_deleted_not_tf"] == 1
    assert report["down_score_positive"] == 1
    assert report["created_at_missing"] == 0

    domains = [r["domain"] for r in e621.investigate_domains(raw).collect()]
    assert domains[0] == "a.net"  # www. stripped, top by count


@pytest.fixture(scope="module")
def fuzzysearch_csv(tmp_path_factory):
    path = tmp_path_factory.mktemp("fuzzy") / "dump.csv"
    sha = base64.b64encode(b"\x11" * 32).decode()
    lines = [
        "site,submission_id,artists,hash,posted_at,updated_at,sha256,deleted,content_url",
        f"furaffinity,123,artist1,-12345,2020-01-01T00:00:00Z,2021-06-01T00:00:00Z,{sha},false,https://cdn/x.png",
        "furaffinity,124,artist2,,,,,false,",  # empty hash → skipped
        "weasyl,125,artist3,99,2020-02-01T00:00:00Z,,,true,",
        "badsite,1 26,a,notint,whenever,,***,maybe,",  # violations
    ]
    path.write_text("\n".join(lines))
    return str(path)


def test_fuzzysearch_adapter(spark, fuzzysearch_csv):
    raw = fuzzysearch.read_csv(spark, fuzzysearch_csv)
    snaps = fuzzysearch.to_snapshots(raw, contributor_id=2)
    rows = {r["site_submission_id"]: r for r in snaps.collect()}
    assert set(rows) == {"123", "125", "1 26"}  # empty-hash row skipped
    row = rows["123"]
    assert row["website_id"] == "fa"
    hashes = {h["algo_id"]: bytes(h["hash_value"]) for h in row["files"][0]["hashes"]}
    assert hashes[fuzzysearch.DHASH_ALGO_ID] == struct.pack(">q", -12345)
    assert hashes[fuzzysearch.SHA256_ALGO_ID] == b"\x11" * 32
    # no updated_at on 125 → falls back to dump-wide earliest updated_at
    assert rows["125"]["scan_datetime"].year == 2021
    assert rows["125"]["is_deleted"] is True

    report = {
        r["rule"]: r["violations"]
        for r in validation_report(raw, fuzzysearch.validation_rules()).collect()
    }
    assert report["site_unknown"] == 1
    assert report["submission_id_charset"] == 1
    assert report["hash_not_int64"] == 1
    assert report["deleted_not_bool"] == 1


def test_foxoblue_adapter(spark, tmp_path):
    path = tmp_path / "users.csv"
    path.write_text(
        "username,updated_at,error\n"
        "alice,2021-01-05T00:00:00Z,NULL\n"
        "bob,NULL,account_disabled\n"
        "carol,2021-02-01T00:00:00Z,unknown_user\n"
    )
    out = foxoblue.to_user_snapshots(foxoblue.read_csv(spark, str(path)), contributor_id=3)
    rows = {r["site_user_id"]: r for r in out.collect()}
    assert set(rows) == {"alice", "bob"}  # unknown_user skipped
    assert rows["alice"]["is_deleted"] is False and rows["alice"]["extra_data"] is None
    assert rows["bob"]["is_deleted"] is True
    assert json.loads(rows["bob"]["extra_data"]) == {"deletion_type": "account_disabled"}
    assert rows["bob"]["scan_datetime"] == rows["alice"]["scan_datetime"]  # earliest fallback


def test_fa_indexer_adapter(spark, tmp_path):
    d = tmp_path / "dump" / "sub1"
    d.mkdir(parents=True)
    (d / "page1.json").write_text(
        json.dumps(
            {
                "41": {
                    "id": 41, "username": "u_a", "title": "T",
                    "description": "desc\x00with nul", "date": "2019-03-01T12:00:00Z",
                    "rating": "general", "keywords": ["k2", "k1"], "filename": "https://f/x.png",
                },
                "42": None,
            }
        )
    )
    (d / "page2.json").write_text(
        json.dumps(
            {
                "43": {
                    "id": 43, "username": "u_a", "title": "T2", "description": "d2",
                    "date": "2019-03-02T12:00:00Z", "rating": "adult",
                    "keywords": [], "filename": "https://f/y.png",
                }
            }
        )
    )
    parsed = fa_indexer.read_json_dir(spark, str(tmp_path / "dump"))
    snaps = fa_indexer.to_snapshots(parsed, 1, "2019-06-01 00:00:00")
    rows = {r["site_submission_id"]: r for r in snaps.collect()}
    assert set(rows) == {"41", "43"}  # null submission skipped
    assert rows["41"]["description"] == "descwith nul"  # NUL scrubbed
    assert [(k["ordinal"], k["keyword"]) for k in rows["41"]["keywords"]] == [
        (0, "k2"),
        (1, "k1"),
    ]  # ordered keywords keep position
    users = fa_indexer.uploader_user_snapshots(parsed, 1, "2019-06-01 00:00:00")
    assert users.count() == 1  # seen-usernames dedup


@pytest.mark.slow
def test_findfurrypicbot_adapter(spark, tmp_path):
    db_path = str(tmp_path / "ffpb.sqlite")
    con = sqlite3.connect(db_path)
    con.execute("CREATE TABLE posts (id INTEGER, a_hash BLOB, p_hash BLOB, d_hash BLOB, w_hash BLOB)")
    con.execute(
        "INSERT INTO posts VALUES (7, ?, ?, ?, ?)",
        (b"\x0a" * 8, b"\x0b" * 8, b"\x0c" * 8, b"\x0d" * 8),
    )
    con.commit(); con.close()
    raw = findfurrypicbot.read_sqlite(spark, db_path)
    snaps = findfurrypicbot.to_snapshots(raw, 1, "2020-01-01 00:00:00")
    [row] = snaps.collect()
    hashes = {h["algo_id"]: bytes(h["hash_value"]) for h in row["files"][0]["hashes"]}
    assert hashes == {4: b"\x0a" * 8, 3: b"\x0c" * 8, 5: b"\x0b" * 8, 6: b"\x0d" * 8}


@pytest.mark.slow
def test_faexport_api_formats(spark):
    sub_payload = json.dumps(
        {
            "link": "https://www.furaffinity.net/view/555/", "profile_name": "artist",
            "name": "Artist", "title": "Pic", "description": "d",
            "posted_at": "2023-01-01T00:00:00Z", "rating": "General",
            "category": "Art", "theme": "x", "species": "wolf", "gender": "m",
            "favorites": 3, "comments": 1, "views": 9,
            "download": "https://d/full.png", "thumbnail": "https://d/t.jpg",
            "full": "https://d/f.jpg", "resolution": "800x600",
            "avatar": "https://d/a.jpg", "keywords": ["a", "b"],
        }
    )
    err_payload = json.dumps({"error": "Submission not found"})
    payloads = spark.createDataFrame([(sub_payload,), (err_payload,)], "payload string")
    parsed = faexport_api.parse_submission_payloads(payloads)
    snaps = faexport_api.submission_snapshots(parsed, 1, "2023-02-01 00:00:00")
    [row] = snaps.collect()
    assert row["site_submission_id"] == "555"  # id from url, trailing slash stripped
    assert json.loads(row["files"][0]["extra_data"])["image_width"] == "800"
    users = faexport_api.submission_uploader_users(parsed, 1, "2023-02-01 00:00:00")
    assert users.count() == 1

    user_payload = json.dumps(
        {
            "profile": "https://www.furaffinity.net/user/someone/", "name": "Someone",
            "account_type": "Member", "avatar": "https://d/a.jpg", "user_title": "t",
            "registered_at": "2010-05-01T00:00:00Z",
            "watchers": {"count": 2, "recent": [
                {"profile_name": "w1", "name": "W1"}, {"profile_name": "w2", "name": "W2"}]},
            "watching": {"count": 1, "recent": [{"profile_name": "w3", "name": "W3"}]},
        }
    )
    disabled = json.dumps(
        {"error": "User has disabled their account", "url": "https://fa/user/gone/"}
    )
    up = faexport_api.parse_user_payloads(
        spark.createDataFrame([(user_payload,), (disabled,)], "payload string")
    )
    users = faexport_api.user_snapshots(up, 1, "2023-02-01 00:00:00")
    rows = {r["site_user_id"]: r for r in users.collect()}
    # 1 main + 3 watcher stubs + 1 tombstone
    assert set(rows) == {"someone", "w1", "w2", "w3", "gone"}
    assert rows["gone"]["is_deleted"] is True
    extra = json.loads(rows["someone"]["extra_data"])
    assert extra["watchers_recent"] == [
        {"site_user_id": "w1", "display_name": "W1"},
        {"site_user_id": "w2", "display_name": "W2"},
    ]


@pytest.mark.slow
def test_explode_to_store_roundtrip(spark, e621_csv):
    raw = e621.read_csv(spark, e621_csv)
    nested = e621.to_snapshots(raw, 1, "2022-07-13 00:00:00")
    store = explode_to_store(nested)
    assert store["submission_snapshots"].count() == 3
    assert store["submission_snapshot_keywords"].count() == 9  # 3 tags/row, dups kept
    assert store["submission_snapshot_files"].count() == 3
    assert store["submission_snapshot_file_hashes"].count() == 3
    # parent/child id consistency: every child joins back to a parent
    snap_ids = {r["submission_snapshot_id"] for r in store["submission_snapshots"].collect()}
    kw_parents = {r["submission_snapshot_id"] for r in store["submission_snapshot_keywords"].collect()}
    assert kw_parents <= snap_ids
    file_ids = {r["file_id"] for r in store["submission_snapshot_files"].collect()}
    hash_parents = {r["file_id"] for r in store["submission_snapshot_file_hashes"].collect()}
    assert hash_parents <= file_ids
    assert store["submission_snapshots"].filter("keywords_recorded").count() == 3


@pytest.mark.slow
def test_with_dense_ids_dense_at_high_partition_counts(spark):
    """Ids stay bounded by the row count no matter the partition count —
    the property the streaming batch-id stride relies on. Raw
    monotonically_increasing_id at 200 partitions would mint ids
    >= 199*2^33 > 2^40 and collide with the next batch's stride."""
    from faexport_db_spark.ingest.base import with_dense_ids

    n = 1000
    df = spark.range(n).repartition(200)
    out = with_dense_ids(df, "sid")
    ids = sorted(r["sid"] for r in out.select("sid").collect())
    assert ids == list(range(n))


@pytest.mark.slow
def test_faexport_user_full_extra_and_featured(spark):
    """The faexport_user format's full extra_data field set plus the
    featured/profile-id submission stubs (faexport.py:88-152)."""
    payload = json.dumps(
        {
            "profile": "https://www.furaffinity.net/user/someone/", "name": "Someone",
            "account_type": "Member", "avatar": "https://d/a.jpg", "user_title": "t",
            "registered_at": "2010-05-01T00:00:00Z",
            "guest_access": True, "current_mood": "happy",
            "artist_profile": "<p>hi</p>", "pageviews": 100, "submissions": 12,
            "comments_received": 5, "comments_given": 7, "journals": 2, "favorites": 33,
            "featured_submission": {"id": "777", "title": "Feat", "thumbnail": "https://d/feat.jpg"},
            "profile_id": {"id": "888", "title": "PID", "thumbnail": "https://d/pid.jpg"},
            "artist_information": {"Species": "wolf"},
            "contact_information": [{"title": "Twitter", "name": "someone", "link": "https://t/x"}],
            "watchers": {"count": 1, "recent": [{"profile_name": "w1", "name": "W1"}]},
            "watching": {"count": 0, "recent": []},
        }
    )
    up = faexport_api.parse_user_payloads(
        spark.createDataFrame([(payload,)], "payload string")
    )
    users = faexport_api.user_snapshots(up, 1, "2023-02-01 00:00:00")
    main = [r for r in users.collect() if r["site_user_id"] == "someone"][0]
    extra = json.loads(main["extra_data"])
    assert extra["profile_html"] == "<p>hi</p>"
    assert extra["view_count"] == 100
    assert extra["comments_received_count"] == 5
    assert extra["featured_submission_id"] == "777"
    assert extra["profile_id_submission_id"] == "888"
    assert extra["artist_information"] == {"Species": "wolf"}
    assert extra["contact_information"] == [
        {"title": "Twitter", "name": "someone", "link": "https://t/x"}
    ]

    feats = faexport_api.user_featured_submissions(up, 1, "2023-02-01 00:00:00")
    rows = {r["site_submission_id"]: r for r in feats.collect()}
    assert set(rows) == {"777", "888"}
    assert rows["777"]["uploader_site_user_id"] == "someone"
    assert rows["777"]["title"] == "Feat"
    assert rows["777"]["keywords"] is None  # keywords NOT recorded
    assert json.loads(rows["777"]["files"][0]["extra_data"])["thumbnail_url"] == "https://d/feat.jpg"
