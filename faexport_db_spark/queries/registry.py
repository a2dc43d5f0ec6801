"""Registry mapping SURVEY.md §2 operator IDs to (Spark query, DuckDB oracle).

Every implemented operator registers here; ``__spark_entry__.py``
re-exports the two dicts for the driver's correctness harness.

Contract (BASELINE.md): each Spark callable takes ``(spark, sf_dir)``
and returns a DataFrame; the oracle is ANSI SQL DuckDB runs over the
same parquet tables. Column names must match exactly (the driver sorts
columns by name before value-hashing), so every computed column is
aliased identically on both sides. Oracles are omitted only for
genuinely non-SQL-expressible ops (ordered stateful folds, streaming).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a query (and optionally its DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
