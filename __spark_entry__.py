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

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)

from faexport_db_spark.queries import ORACLES, QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

_SHIPPED: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``faexport_db_spark`` importable in Python WORKERS even when
    the driver runs from a foreign cwd: module-level UDF functions
    pickle by reference, so workers must import the package. addPyFile
    distributes a zip and prepends it to worker sys.path."""
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    import shutil
    import tempfile

    staging = tempfile.mkdtemp(prefix="spark_graft_pkg_")
    zip_base = os.path.join(staging, "faexport_db_spark")
    shutil.make_archive(
        zip_base, "zip", root_dir=_REPO_DIR, base_dir="faexport_db_spark"
    )
    spark.sparkContext.addPyFile(zip_base + ".zip")
    _SHIPPED.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ship_package(spark)
    return QUERIES["merged_entity"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        run.__name__ = getattr(fn, "__name__", "query")
        run.__doc__ = fn.__doc__
        return run

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
