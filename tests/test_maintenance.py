"""Maintenance-job tests: W1-W4 dedup direction, J4 orphan removal,
reference step-order fidelity, and fixpoint convergence/idempotence."""

from fixtures_faexport import dirty_tables

from faexport_db_spark.maintenance import cleanup
from faexport_db_spark.maintenance.dedup import cleanup_to_fixpoint


def _ids(df, col):
    return sorted(r[col] for r in df.select(col).collect())


def test_single_pass_matches_reference_order(spark):
    out = cleanup(dirty_tables(spark))
    # W3: duplicate submission snapshot keeps LOWEST id
    assert _ids(out["submission_snapshots"], "submission_snapshot_id") == [1, 2]
    # W4: duplicate user snapshot keeps LOWEST id
    assert _ids(out["user_snapshots"], "user_snapshot_id") == [1]
    # J4: orphan keyword removed, valid one kept
    assert _ids(out["submission_snapshot_keywords"], "keyword_id") == [10]
    # W2+J4: duplicate file keeps HIGHEST id, orphan file removed
    assert _ids(out["submission_snapshot_files"], "file_id") == [101]
    # W1: duplicate hash keeps HIGHEST id. Hash 1002's parent file (102)
    # was removed in THIS pass but after the hash orphan scan — the
    # reference's step order leaves it for the next run.
    assert _ids(out["submission_snapshot_file_hashes"], "hash_id") == [1001, 1002]
    # hash 1000 survived? no — deduped away by W1 (keep 1001). The one
    # attached to the removed duplicate file 100 lingers as an orphan:
    # that's exactly the reference behavior (single pass ≠ clean).


def test_fixpoint_fully_clean(spark):
    out = cleanup_to_fixpoint(dirty_tables(spark))
    # second pass collects the hash orphaned by the first pass's file ops
    assert _ids(out["submission_snapshot_file_hashes"], "hash_id") == []
    # and a third pass changes nothing (idempotence at fixpoint)
    again = cleanup(out)
    for name, df in again.items():
        assert df.count() == out[name].count(), name
