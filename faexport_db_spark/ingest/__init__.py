from faexport_db_spark.ingest.base import (  # noqa: F401
    NESTED_SUBMISSION_SCHEMA,
    explode_to_store,
    validation_report,
)
