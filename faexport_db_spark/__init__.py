"""faexport_db_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of Deer-Spangle/faexport_db.

The reference (read-only at /root/reference/) is an append-only snapshot
store over PostgreSQL with Python-side merge logic; this package
re-expresses its semantics Spark-first: Parquet-backed snapshot tables,
window/aggregate merge-to-current-entity operators, anti-join orphan
cleanup, expression-based ingest adapters, plus large-scale
training-data operators (dedup, similarity search, text analysis).

Nothing here is a port: the reference tells us WHAT to compute
(SURVEY.md), the HOW is DataFrame/Spark SQL/Catalyst.
"""

__version__ = "0.1.0"
