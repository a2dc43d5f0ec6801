from faexport_db_spark.operators.merge import (  # noqa: F401
    latest_value,
    merged_submissions,
    merged_users,
    newest_non_null,
    snapshot_order,
)
