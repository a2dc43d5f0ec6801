from faexport_db_spark.maintenance.dedup import (  # noqa: F401
    cleanup,
    dedup_keep_one,
    remove_orphans,
)
