"""Reusable scalar column builders (SURVEY.md §2.9, C1-C21).

These are the expression-level building blocks the ingest adapters
compose. All stay inside whole-stage codegen (pure
``pyspark.sql.functions``) — no Python UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def id_from_url(url: str | Column) -> Column:
    """C1 — last path segment of a URL after stripping trailing slashes.

    Reference: ingest_formats/faexport.py:24,79-88
    (``link.strip("/").split("/")[-1]``).
    """
    return F.element_at(F.split(F.regexp_replace(_col(url), "/+$", ""), "/"), -1)


def split_resolution(res: str | Column) -> tuple[Column, Column]:
    """C2 — '800x600' → (width, height). Reference: ingest_formats/faexport.py:50-51."""
    parts = F.split(_col(res), "x")
    return parts.getItem(0).cast("int"), parts.getItem(1).cast("int")


def split_whitespace(col: str | Column) -> Column:
    """C3 — tag_string → keywords. Reference: e621_db_export/main.py:76."""
    return F.split(F.trim(_col(col)), r"\s+")


def split_lines_trimmed(col: str | Column) -> Column:
    """C4 — newline-separated sources list, each trimmed.

    Reference: e621_db_export/main.py:78.
    """
    return F.transform(F.split(_col(col), "\n"), lambda x: F.trim(x))


def canonical_username(col: str | Column) -> Column:
    """C5/C6 — lowercase + strip non-alphanumerics (FA username canon).

    Reference: fuzzysearch/user_lookup.py:135,225.
    """
    return F.regexp_replace(F.lower(_col(col)), "[^a-z0-9]", "")


def strip_nul(col: str | Column) -> Column:
    """C7 — scrub NUL characters. Reference: fa_indexer/main.py:76-83."""
    return F.regexp_replace(_col(col), "\u0000", "")


def md5_shard_url(md5_hex: str | Column, ext: str | Column, base: str) -> Column:
    """C8 — static-file URL sharded by md5 prefix:
    ``{base}/{md5[0:2]}/{md5[2:4]}/{md5}.{ext}``.

    Reference: e621_db_export/main.py:51.
    """
    m = _col(md5_hex)
    return F.concat(
        F.lit(base.rstrip("/") + "/"),
        F.substring(m, 1, 2),
        F.lit("/"),
        F.substring(m, 3, 2),
        F.lit("/"),
        m,
        F.lit("."),
        _col(ext),
    )


def parse_bool_literal(col: str | Column) -> Column:
    """C17 — 't'/'f', 'true'/'false' literal parsing (NULL otherwise).

    Reference: e621_db_export/main.py:61, fuzzysearch/main.py:119,
    foxoblue_userlist/main.py:59-62.
    """
    lowered = F.lower(_col(col))
    return (
        F.when(lowered.isin("t", "true"), F.lit(True))
        .when(lowered.isin("f", "false"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def int64_be_bytes_hex(col: str | Column) -> Column:
    """C15 — signed int64 → 8-byte big-endian representation, as hex.

    Reference: fuzzysearch/main.py:101 (``struct.pack(">q", dhash)``);
    two's-complement hex == the packed big-endian bytes, no UDF needed.
    Pair with ``unhex`` for the BinaryType form.
    """
    return F.lpad(F.hex(_col(col)), 16, "0")


def iso_format(col: str | Column, fmt: str = "yyyy-MM-dd'T'HH:mm:ssXXX") -> Column:
    """C13 — ISO-8601 output formatting (db.py:40-50)."""
    return F.date_format(_col(col), fmt)
