"""Query/oracle inventory: importing this package populates the registry.

Modules register one ``queries()`` entry (and DuckDB oracle where
SQL-expressible) per SURVEY.md §2 operator ID.
"""

from faexport_db_spark.queries import (  # noqa: F401
    aggregates,
    filters,
    joins,
    merge_queries,
    scalars,
    setops,
    sorts,
    sources_queries,
    streaming_queries,
    training_queries,
    windows,
)
from faexport_db_spark.queries.registry import ORACLES, QUERIES  # noqa: F401
