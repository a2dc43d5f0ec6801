"""Bloom-pruned join: kill non-matching fact rows BEFORE the shuffle.

The selective-dim join problem at 100 TB: joining a petabyte fact
table to a dim subset that matches 1% of fact rows still shuffles the
whole fact side under a plain SortMergeJoin — the join can't drop a
row until the two sides meet. The classic fix (what engines call a
runtime/semi-join filter or "sideways information passing") is to fold
the dim keys into a Bloom filter, broadcast the bitmap, and filter the
fact scan map-side: false negatives are impossible, so the subsequent
exact join sees every true match, and false positives merely ride
along to be dropped by the real join — the result is IDENTICAL to the
plain join, which is exactly what the driver oracle checks.

Spark's AQE can inject a similar runtime filter on its own in narrow
cases; this operator makes the plan explicit, portable, and tunable
(m_bits/k sized to the dim cardinality), using the same engine-neutral
md5 position scheme as the decontamination Bloom
(training/text.py::build_bloom_filter) so the bitmap itself could be
persisted or shipped cross-engine.

Bitmap sizing: m_bits = 2^20 is 128 KiB broadcast — at k=3 the false
positive rate is ~ (n·k/m)^k; size m ≈ 10·n_dim_keys bits for ~1-2%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pos(s: Column, seed: int, m_bits: int) -> Column:
    h = F.conv(
        F.substring(F.md5(F.concat(s, F.lit(f"#{seed}"))), 1, 15), 16, 10
    ).cast("long")
    return h % F.lit(m_bits)


def _masks() -> Column:
    return F.array(
        *[F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long") for i in range(64)]
    )


def build_key_bloom(
    dim: DataFrame, key: str, m_bits: int = 1 << 20, k: int = 3
) -> list[int]:
    """Fold the dim side's join keys into an m_bits Bloom bitmap
    (list of m_bits/64 longs). One map-side-combining aggregate
    bounded by the CONSTANT m/64, collected once — the dim is
    typically already small relative to the fact side, and only the
    ≤ m/64 set words ever reach the driver."""
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    s = F.col(key).cast("string")
    pos = (
        dim.filter(F.col(key).isNotNull())
        .select(
            F.explode(F.array(*[_pos(s, i, m_bits) for i in range(k)])).alias("pos")
        )
        .distinct()
    )
    word_rows = (
        pos.groupBy((F.col("pos") / 64).cast("int").alias("w"))
        .agg(
            F.bit_or(
                F.element_at(_masks(), (F.col("pos") % 64).cast("int") + 1)
            ).alias("bits")
        )
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in word_rows:
        words[r["w"]] = r["bits"]
    return words


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Inner-join fact to dim on the given keys, with the fact side
    Bloom-pruned BEFORE the join: the dim keys build the bitmap once,
    the probe is a pure per-row expression over the fact scan
    (map-only, the bitmap rides as a one-row broadcast), and the
    surviving rows — true matches plus the small false-positive tail
    — feed the exact equi-join. No false negatives, so the output is
    row-for-row the plain inner join's."""
    words = build_key_bloom(dim, dim_key, m_bits, k)
    bloom = fact.sparkSession.createDataFrame([(words,)], "`__bloom` array<long>")
    s = F.col(fact_key).cast("string")

    def bit_set(p: Column) -> Column:
        word = F.element_at(F.col("__bloom"), (p / 64).cast("int") + 1)
        mask = F.element_at(_masks(), (p % 64).cast("int") + 1)
        return word.bitwiseAND(mask) != 0

    hit = F.lit(True)
    for i in range(k):
        hit = hit & bit_set(_pos(s, i, m_bits))
    pruned = (
        fact.crossJoin(F.broadcast(bloom))
        .filter(F.col(fact_key).isNotNull() & hit)
        .drop("__bloom")
    )
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])
