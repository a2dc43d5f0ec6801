from faexport_db_spark.maintenance.dedup import (  # noqa: F401
    cleanup,
    dedup_keep_one,
    remove_orphans,
)
from faexport_db_spark.maintenance.compaction import (  # noqa: F401
    compact_manifest_table,
    compact_path,
    plan_compaction,
    recover_compaction,
)
