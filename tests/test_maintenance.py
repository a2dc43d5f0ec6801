"""Maintenance-job tests: W1-W4 dedup direction, J4 orphan removal,
same-run cascade fidelity (remove_duplicates.py:127-138, 217-250), and
fixpoint convergence/idempotence."""

from fixtures_faexport import dirty_tables

from faexport_db_spark.maintenance import cleanup
from faexport_db_spark.maintenance.dedup import cleanup_to_fixpoint


def _ids(df, col):
    return sorted(r[col] for r in df.select(col).collect())


def test_single_pass_cascades_like_reference(spark):
    out = cleanup(dirty_tables(spark))
    # W3: duplicate submission snapshot keeps LOWEST id
    assert _ids(out["submission_snapshots"], "submission_snapshot_id") == [1, 2]
    # W4: duplicate user snapshot keeps LOWEST id
    assert _ids(out["user_snapshots"], "user_snapshot_id") == [1]
    # J4: orphan keyword removed, valid one kept
    assert _ids(out["submission_snapshot_keywords"], "keyword_id") == [10]
    # W2+J4: duplicate file keeps HIGHEST id, orphan file removed
    assert _ids(out["submission_snapshot_files"], "file_id") == [101]
    # Cascade within the same run, like the reference: W1 keeps hash
    # 1001 over 1000, but its parent file 100 then loses the W2 dedup —
    # delete_files (remove_duplicates.py:127-138) deletes that file's
    # hashes in the same run, as does the orphan file 102's hash 1002.
    assert _ids(out["submission_snapshot_file_hashes"], "hash_id") == []


def test_single_pass_is_fixpoint(spark):
    once = cleanup(dirty_tables(spark))
    fixed = cleanup_to_fixpoint(dirty_tables(spark))
    for name, df in fixed.items():
        assert _ids(df, df.columns[0]) == _ids(once[name], once[name].columns[0]), name
    # and another pass changes nothing (idempotence)
    again = cleanup(once)
    for name, df in again.items():
        assert df.count() == once[name].count(), name


def test_compaction_shrinks_streaming_appends(spark, sf_small, tmp_path):
    """Ten tiny appends → compaction rewrites to few files with
    identical content, preserving the hive partition layout."""
    from pyspark.sql import functions as F

    from faexport_db_spark.datamodel.testdata import load_table
    from faexport_db_spark.maintenance.compaction import compact_path, plan_compaction

    docs = load_table(spark, sf_small, "documents").select("doc_id", "lang", "text")
    path = str(tmp_path / "store")
    for i in range(10):
        docs.filter(F.col("doc_id") % 10 == i).write.mode("append").partitionBy(
            "lang"
        ).parquet(path)
    before = plan_compaction(spark, path)
    assert before["worthwhile"] and before["n_files"] >= 10
    want = {(r["doc_id"], r["lang"]) for r in spark.read.parquet(path).collect()}

    result = compact_path(spark, path, partition_by=["lang"])
    assert result["files_after"] < before["n_files"]
    got = {(r["doc_id"], r["lang"]) for r in spark.read.parquet(path).collect()}
    assert got == want
    # hive layout preserved: lang= directories still exist
    import os
    assert any(d.startswith("lang=") for d in os.listdir(path))
