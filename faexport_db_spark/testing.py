"""Differential-test helpers mirroring the driver's correctness gate:
run a registered Spark query and its DuckDB oracle on the same parquet
tables, then compare row count + schema (column names) + values
order-insensitively (BASELINE.md t2).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
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


def column_kind(series: pd.Series) -> str:
    """Coarse dtype *kind* of a pandas column, for the strict-type leg
    of the differential. The driver's value hash distinguishes int64
    from float64 (``1`` vs ``1.0``) even though :func:`_canon` renders
    both as ``1`` — so a kind mismatch here is exactly the class of bug
    (r04's ``t_passage_dedup`` uncast ``sum()``) that was locally green
    but driver-red. Buckets: int / float / bool / datetime / str /
    binary / object, with ``empty`` as a wildcard for all-null or
    zero-row columns."""
    k = series.dtype.kind
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k in ("M", "m"):
        return "datetime"
    if k != "O":
        return k
    non_null = series[series.notna()]
    if len(non_null) == 0:
        return "empty"
    v = non_null.iloc[0]
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, _decimal.Decimal):
        return "float"
    if isinstance(v, (pd.Timestamp, _dt.datetime, _dt.date)):
        return "datetime"
    if isinstance(v, (bytes, bytearray)):
        return "binary"
    if isinstance(v, str):
        return "str"
    return "object"


def assert_same_kinds(mine: pd.DataFrame, oracle: pd.DataFrame, name: str) -> None:
    """Fail if any shared column has a different dtype kind on the
    Spark vs the DuckDB side (``empty`` matches anything)."""
    bad = []
    for col in sorted(set(mine.columns) & set(oracle.columns)):
        a, b = column_kind(mine[col]), column_kind(oracle[col])
        if a != b and "empty" not in (a, b):
            bad.append(f"{col}: spark={a} oracle={b}")
    assert not bad, f"{name}: column dtype-kind mismatch — " + "; ".join(bad)


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
    assert_same_kinds(mine, oracle, name)
    mine_rows = canonical_rows(mine)
    oracle_rows = canonical_rows(oracle)
    if mine_rows != oracle_rows:
        diffs = [
            (a, b) for a, b in zip(mine_rows, oracle_rows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
