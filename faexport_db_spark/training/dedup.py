"""Document deduplication operators: exact, MinHash+LSH, SimHash.

Scale design notes:
- Exact dedup: hash-groupBy on a content digest — one shuffle keyed by
  the digest (uniform), keep-lowest-id tiebreak.
- MinHash+LSH: shingle explode → per-doc signature (num_perm min-aggs,
  map-side combined) → band buckets → candidate pairs only within a
  bucket (never all-pairs) → exact-Jaccard verification of candidates.
  At 100 TB the only quadratic term is within-bucket, bounded by band
  tuning; everything else is linear shuffles on uniform keys.
- SimHash: 64-bit signature from token hashes; Hamming-≤k candidate
  generation by the pigeonhole band trick (split signature into k+1
  chunks; any pair within distance k shares an exact chunk), verified
  with bit_count(xor).

All hashing is xxhash64 with fixed seeds — deterministic across runs
and executors, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from faexport_db_spark.operators.partitioning import fan_out


def tokens_expr(text: str | Column) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(text), r"\s+")


def word_shingles(text: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (array<string>)."""
    toks = tokens_expr(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(grams)


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: keep the lowest-id representative per content hash.

    Output: one row per distinct content with ``n_dups`` (cluster size).
    """
    hashed = docs.withColumn("content_hash", F.md5(F.col(text_col)))
    w = Window.partitionBy("content_hash").orderBy(F.asc(id_col))
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_dups", F.count(F.lit(1)).over(Window.partitionBy("content_hash")))
        .filter(F.col("__rn") == 1)
        .select(id_col, "content_hash", "n_dups")
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature: min over shingles of xxhash64(shingle,
    seed_i) for each of ``num_perm`` seeded permutations. One explode +
    one groupBy; the min-aggs combine map-side. ``fan_out`` spreads
    narrow inputs over every core — the hashing is the hot loop."""
    exploded = fan_out(docs).select(
        F.col(id_col), F.explode(word_shingles(text_col, shingle_n)).alias("shingle")
    )
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"mh{i}")
        for i in range(num_perm)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def _band_hashes(num_perm: int, bands: int) -> list[Column]:
    rows = num_perm // bands
    return [
        F.xxhash64(*[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias(f"band{b}")
        for b in range(bands)
    ]


def minhash_dedup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Near-duplicate pairs: MinHash-LSH candidates verified with exact
    shingle Jaccard ≥ threshold.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded.
    """
    sigs = minhash_signatures(docs, text_col, id_col, num_perm, shingle_n)
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(F.array(*_band_hashes(num_perm, bands))).alias("band_idx", "band_hash"),
    )
    left = banded.alias("l")
    # Pin the build side: the banded frame is per-doc-small (bands x id),
    # and leaving the choice to estimated stats makes the strategy (and
    # runtime) flap between BHJ and SMJ run to run.
    right = F.broadcast(banded.alias("r"))
    candidates = (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )
    return _verify_jaccard(docs, candidates, text_col, id_col, shingle_n, threshold)


def _verify_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int,
    threshold: float,
) -> DataFrame:
    # The candidate set is orders of magnitude smaller than the corpus:
    # broadcast IT (both hops), so the shingled corpus streams through
    # two broadcast hash joins without being shuffled — and without the
    # optimizer electing to broadcast the (bigger) shingle side.
    shingled = fan_out(docs).select(
        F.col(id_col), word_shingles(text_col, shingle_n).alias("shingles")
    )
    a = shingled.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = shingled.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    joined = F.broadcast(F.broadcast(pairs).join(a, "id_a")).join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        joined.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


SIMHASH_BITS = 60  # stay clear of the int64 sign bit


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    exploded = fan_out(docs).select(
        F.col(id_col), F.explode(F.array_distinct(tokens_expr(text_col))).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    sig_df = exploded.groupBy(id_col).agg(*votes)
    sig = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        sig = sig.bitwiseOR(
            F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
        )
    return sig_df.select(F.col(id_col), sig.alias("simhash"))


def simhash_dedup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance ≤ max_hamming.

    Candidate generation via pigeonhole banding: split the signature
    into (max_hamming + 1) chunks; any pair within the distance budget
    must agree exactly on ≥1 chunk, so a per-chunk equi-self-join finds
    every true pair without an all-pairs comparison.
    """
    sigs = simhash_signatures(docs, text_col, id_col)
    chunks = max_hamming + 1
    width = SIMHASH_BITS // chunks
    mask = (1 << width) - 1
    chunk_cols = F.array(
        *[
            F.shiftright(F.col("simhash"), c * width).bitwiseAND(F.lit(mask))
            for c in range(chunks)
        ]
    )
    banded = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(chunk_cols).alias("chunk_idx", "chunk_val"),
    )
    left = banded.alias("l")
    # Pin the build side: the banded frame is per-doc-small (bands x id),
    # and leaving the choice to estimated stats makes the strategy (and
    # runtime) flap between BHJ and SMJ run to run.
    right = F.broadcast(banded.alias("r"))
    candidates = (
        left.join(
            right,
            (F.col("l.chunk_idx") == F.col("r.chunk_idx"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.simhash").alias("sig_a"),
            F.col("r.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        candidates.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
