"""Query/oracle inventory: importing this package populates the registry.

Modules register one ``queries()`` entry (and DuckDB oracle where
SQL-expressible) per SURVEY.md §2 operator ID.
"""

from faexport_db_spark.queries import merge_queries  # noqa: F401
from faexport_db_spark.queries.registry import ORACLES, QUERIES  # noqa: F401
