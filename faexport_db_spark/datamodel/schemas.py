"""Explicit StructType schemas for the faexport_db data model.

Mirrors the reference's DDL (reference: faexport_db/schema/faexport_db.sql)
with the Spark type mapping recorded in SURVEY.md §1.2:

- ``serial`` surrogate keys -> LongType (non-semantic; Spark mints them,
  see schema/faexport_db.sql:28,49 and SURVEY §1.2).
- ``timestamp with time zone`` -> TimestampType under a pinned-UTC
  session (schema/faexport_db.sql:34,38).
- ``json extra_data`` -> StringType holding canonical JSON
  (schema/faexport_db.sql:43,68,91): values are heterogeneous (nested
  lists of dicts, ISO datetimes — ingest_formats/faexport.py:115-126),
  so a flat MapType would be lossy; JSON string + JSON functions is the
  faithful mapping.
- ``bytea hash_value`` -> BinaryType (schema/faexport_db.sql:113).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _struct(*fields: tuple[str, T.DataType, bool]) -> T.StructType:
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


# reference: faexport_db/schema/faexport_db.sql:1-11
WEBSITES = _struct(
    ("website_id", T.StringType(), False),
    ("full_name", T.StringType(), False),
    ("link", T.StringType(), True),
)

# reference: faexport_db/schema/faexport_db.sql:13-23
ARCHIVE_CONTRIBUTORS = _struct(
    ("contributor_id", T.LongType(), False),
    ("name", T.StringType(), False),
    ("api_key", T.StringType(), True),
)

# reference: faexport_db/schema/faexport_db.sql:116-124 (seeded with
# the schema-version row: setting_id='version', value '0.2.1')
SETTINGS = _struct(
    ("setting_id", T.StringType(), False),
    ("setting_value", T.StringType(), True),
)

# reference: faexport_db/schema/faexport_db.sql:94-104
HASH_ALGOS = _struct(
    ("algo_id", T.LongType(), False),
    ("language", T.StringType(), True),
    ("algorithm_name", T.StringType(), False),
)

# reference: faexport_db/schema/faexport_db.sql:25-44
USER_SNAPSHOTS = _struct(
    ("user_snapshot_id", T.LongType(), False),
    ("website_id", T.StringType(), False),
    ("site_user_id", T.StringType(), False),
    ("scan_datetime", T.TimestampType(), False),
    ("archive_contributor_id", T.LongType(), False),
    ("ingest_datetime", T.TimestampType(), False),
    ("is_deleted", T.BooleanType(), True),
    ("display_name", T.StringType(), True),
    ("extra_data", T.StringType(), True),
)

# reference: faexport_db/schema/faexport_db.sql:46-69
SUBMISSION_SNAPSHOTS = _struct(
    ("submission_snapshot_id", T.LongType(), False),
    ("website_id", T.StringType(), False),
    ("site_submission_id", T.StringType(), False),
    ("scan_datetime", T.TimestampType(), False),
    ("archive_contributor_id", T.LongType(), False),
    ("ingest_datetime", T.TimestampType(), False),
    ("uploader_site_user_id", T.StringType(), True),
    ("is_deleted", T.BooleanType(), True),
    ("title", T.StringType(), True),
    ("description", T.StringType(), True),
    ("datetime_posted", T.TimestampType(), True),
    ("extra_data", T.StringType(), True),
    ("keywords_recorded", T.BooleanType(), True),
)

# reference: faexport_db/schema/faexport_db.sql:71-79
KEYWORDS = _struct(
    ("keyword_id", T.LongType(), False),
    ("submission_snapshot_id", T.LongType(), False),
    ("keyword", T.StringType(), False),
    ("ordinal", T.IntegerType(), True),
)

# reference: faexport_db/schema/faexport_db.sql:81-92
FILES = _struct(
    ("file_id", T.LongType(), False),
    ("submission_snapshot_id", T.LongType(), False),
    ("site_file_id", T.StringType(), True),
    ("file_url", T.StringType(), True),
    ("file_size", T.LongType(), True),
    ("extra_data", T.StringType(), True),
)

# reference: faexport_db/schema/faexport_db.sql:106-114
FILE_HASHES = _struct(
    ("hash_id", T.LongType(), False),
    ("file_id", T.LongType(), False),
    ("algo_id", T.LongType(), False),
    ("hash_value", T.BinaryType(), True),
)

FAEXPORT_SCHEMAS: dict[str, T.StructType] = {
    "websites": WEBSITES,
    "archive_contributors": ARCHIVE_CONTRIBUTORS,
    "hash_algos": HASH_ALGOS,
    "settings": SETTINGS,
    "user_snapshots": USER_SNAPSHOTS,
    "submission_snapshots": SUBMISSION_SNAPSHOTS,
    "submission_snapshot_keywords": KEYWORDS,
    "submission_snapshot_files": FILES,
    "submission_snapshot_file_hashes": FILE_HASHES,
}
