from faexport_db_spark.functions.scalars import (  # noqa: F401
    canonical_username,
    id_from_url,
    int64_be_bytes_hex,
    iso_format,
    md5_shard_url,
    parse_bool_literal,
    split_lines_trimmed,
    strip_nul,
)
