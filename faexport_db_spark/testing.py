"""Differential-test helpers mirroring the driver's correctness gate:
run a registered Spark query and its DuckDB oracle on the same parquet
tables, then compare row count + schema (column names) + values
order-insensitively (BASELINE.md t2).
"""

from __future__ import annotations

import datetime as _dt
import math

import pandas as pd

from faexport_db_spark.datamodel.testdata import FIXTURE_TABLES


def duckdb_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    try:
        for name in FIXTURE_TABLES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir.rstrip('/')}/{name}.parquet')"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def _canon(value):
    """Normalize a cell to a sortable, comparable token."""
    if value is None:
        return "\x00null"
    if isinstance(value, float):
        if math.isnan(value):
            return "\x00null"
        return f"{value:.9g}"
    if isinstance(value, (pd.Timestamp, _dt.datetime)):
        ts = pd.Timestamp(value)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(value, (bytes, bytearray)):
        return bytes(value).hex()
    if isinstance(value, bool):
        return str(value)
    if isinstance(value, int):
        return str(value)
    return str(value)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [tuple(_canon(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(out)


def assert_oracle_match(spark_df, sql: str, sf_dir: str, name: str = "query") -> None:
    mine = spark_df.toPandas()
    oracle = duckdb_oracle(sql, sf_dir)
    assert sorted(mine.columns) == sorted(oracle.columns), (
        f"{name}: column mismatch spark={sorted(mine.columns)} oracle={sorted(oracle.columns)}"
    )
    assert len(mine) == len(oracle), f"{name}: row count {len(mine)} != oracle {len(oracle)}"
    mine_rows = canonical_rows(mine)
    oracle_rows = canonical_rows(oracle)
    if mine_rows != oracle_rows:
        diffs = [
            (a, b) for a, b in zip(mine_rows, oracle_rows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
