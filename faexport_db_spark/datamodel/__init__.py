from faexport_db_spark.datamodel.schemas import (  # noqa: F401
    ARCHIVE_CONTRIBUTORS,
    FILE_HASHES,
    FILES,
    HASH_ALGOS,
    KEYWORDS,
    SUBMISSION_SNAPSHOTS,
    USER_SNAPSHOTS,
    WEBSITES,
)
from faexport_db_spark.datamodel.testdata import (  # noqa: F401
    FIXTURE_TABLES,
    load_table,
    load_tables,
    register_views,
)
