"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship merged-entity query at sf0.001;
``queries()``/``oracle_sql()`` expose the SURVEY.md §2 operator
inventory (registered in ``faexport_db_spark.queries``) for the
driver's DuckDB differential harness.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from faexport_db_spark.queries import ORACLES, QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["merged_entity"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
