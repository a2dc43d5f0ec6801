"""Count-based n-gram language-model scoring for corpus filtering —
the CCNet / Wenzek-et-al-2020 shape (arXiv:1911.00359): train a small
LM on a trusted slice, score every candidate document's per-token
log-likelihood, and filter/bucket the corpus by perplexity. KenLM is
out of scope (native lib); a bigram stupid-backoff model (Brants et
al. 2007, "Large Language Models in Machine Translation") gives the
same pipeline shape with pure DataFrame ops and an exactly-oracleable
score.

Scale shape: training is two groupBys over exploded tokens/bigrams
(map-side combining, uniform-ish Zipf keys — the heavy hitters are
exactly the rows a map-side partial collapses best); corpus stats are
ONE 1-row frame joined broadcast. Scoring joins each document's
bigrams to the count tables on token equi-keys: the bigram table
shuffle-joins (it is vocab²-bounded but can be large), the unigram
table broadcasts (vocab-bounded — ~10M terms fits every executor; at
a vocab that doesn't, drop the hint and it degrades to one more
equi-shuffle, nothing breaks). Per-document aggregation shuffles only
(doc_id, logprob) rows. Nothing corpus-sized is ever collected or
broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from faexport_db_spark.training.text import tokens_expr


def _clean_tokens(text_col: str) -> Column:
    # drop the [''] artifact split() yields on empty/whitespace text so
    # empty docs contribute no counts (DuckDB parity: list_filter).
    return F.filter(tokens_expr(text_col), lambda t: t != F.lit(""))


def _bigrams(toks: Column) -> Column:
    """(w1, w2) structs for adjacent token pairs; empty below 2 tokens."""
    n = F.size(toks)
    return F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


@dataclass
class BigramLM:
    """A trained bigram LM: count tables + corpus totals.

    ``unigrams`` (tok, c1) and ``bigrams`` (w1, w2, c2) are unmaterialized
    DataFrames — callers may persist them with the usual table writers;
    ``stats`` is a 1-row (n_tokens, vocab) frame.
    """

    unigrams: DataFrame
    bigrams: DataFrame
    stats: DataFrame


def lm_train(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> BigramLM:
    """Count unigrams + adjacent bigrams over the training slice."""
    toks = _clean_tokens(text_col)
    uni_rows = docs.select(F.explode(toks).alias("tok"))
    unigrams = uni_rows.groupBy("tok").agg(F.count("*").cast("bigint").alias("c1"))
    bigrams = (
        docs.select(F.explode(_bigrams(toks)).alias("bg"))
        .groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count("*").cast("bigint").alias("c2"))
    )
    stats = uni_rows.agg(
        F.count("*").cast("double").alias("n_tokens"),
        F.countDistinct("tok").cast("double").alias("vocab"),
    )
    return BigramLM(unigrams=unigrams, bigrams=bigrams, stats=stats)


def lm_score(
    docs: DataFrame,
    model: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
) -> DataFrame:
    """Per-document stupid-backoff log-likelihood and perplexity.

    Each adjacent bigram (w1, w2) scores
    ``ln(c2(w1,w2) / c1(w1))`` when the bigram was seen in training,
    else the smoothed backoff ``ln(alpha * (c1(w2)+1) / (N+V))`` —
    add-one on the unigram count so fully-OOV tokens stay finite.
    Output: (id, n_bigrams, nll, ppl) with ``nll`` the negative mean
    log-prob (rounded 6) and ``ppl = exp(nll)`` (rounded 4) — the
    CCNet filtering statistic. Documents with fewer than two tokens
    have no bigrams and are absent from the output.
    """
    per_bg = docs.select(
        F.col(id_col), F.explode(_bigrams(_clean_tokens(text_col))).alias("bg")
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    joined = (
        per_bg.join(model.bigrams, ["w1", "w2"], "left")
        .join(
            F.broadcast(model.unigrams.select(F.col("tok").alias("w1"), "c1")),
            "w1",
            "left",
        )
        .join(
            F.broadcast(
                model.unigrams.select(
                    F.col("tok").alias("w2"), F.col("c1").alias("c1b")
                )
            ),
            "w2",
            "left",
        )
        .join(F.broadcast(model.stats))
    )
    backoff = (
        F.lit(alpha)
        * (F.coalesce(F.col("c1b"), F.lit(0)).cast("double") + F.lit(1.0))
        / (F.col("n_tokens") + F.col("vocab"))
    )
    lp = F.when(
        F.col("c2").isNotNull(),
        F.log(F.col("c2").cast("double") / F.col("c1").cast("double")),
    ).otherwise(F.log(backoff))
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.avg(lp).alias("_mlp"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.round(-F.col("_mlp"), 6).alias("nll"),
            F.round(F.exp(-F.col("_mlp")), 4).alias("ppl"),
        )
    )


def lm_perplexity_filter(
    docs: DataFrame,
    model: BigramLM,
    max_ppl: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus rows whose LM perplexity is at most ``max_ppl`` — the
    CCNet keep-the-head policy (low perplexity ≈ in-domain text).
    Documents too short to score (no bigrams) are dropped, matching
    CCNet's treatment of degenerate fragments. The score frame is
    skinny (id, nll, ppl); survivors rejoin full rows by id so document
    text never shuffles through the scoring aggregation."""
    scored = lm_score(docs, model, text_col=text_col, id_col=id_col)
    keep = scored.filter(F.col("ppl") <= max_ppl).select(id_col)
    return docs.join(keep, id_col, "left_semi")


def lm_kneser_ney(model: BigramLM, discount: float = 0.75) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities from the trained
    count tables — the standard n-gram smoothing (Kneser & Ney 1995;
    Chen & Goodman 1999) whose continuation counts fix stupid
    backoff's overconfidence on frequent-but-one-context words:

        p_KN(w2|w1) = max(c(w1,w2) - d, 0) / c(w1)
                      + [d · N1+(w1,·) / c(w1)] · N1+(·,w2) / |bigram types|

    Every term is count algebra over the bigram-TYPE table: N1+(w1,·)
    = distinct continuations of w1, N1+(·,w2) = distinct left contexts
    of w2, both map-side-combining groupBys bounded by vocab size;
    the type total rides a one-row broadcast. The left-context and
    continuation tables broadcast back onto the bigram table (vocab-
    sized — the same budget every tokenizer/vocab op here assumes; at
    a vocabulary too large to broadcast the joins degrade gracefully
    to equi-shuffles on w1/w2). Output: (w1, w2, c2, p_kn) for every
    OBSERVED bigram, probabilities rounded 6dp.
    """
    if not 0 < discount < 1:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    bg = model.bigrams
    cont = bg.groupBy("w2").agg(F.count("*").cast("double").alias("n_left"))
    fert = bg.groupBy("w1").agg(F.count("*").cast("double").alias("n_right"))
    types = bg.agg(F.count("*").cast("double").alias("n_types"))
    c1 = model.unigrams.select(F.col("tok").alias("w1"), F.col("c1"))
    d = F.lit(float(discount))
    p = (
        F.greatest(F.col("c2") - d, F.lit(0.0)) / F.col("c1")
        + (d * F.col("n_right") / F.col("c1"))
        * (F.col("n_left") / F.col("n_types"))
    )
    return (
        bg.join(F.broadcast(c1), "w1")
        .join(F.broadcast(fert), "w1")
        .join(F.broadcast(cont), "w2")
        .join(F.broadcast(types))
        .select("w1", "w2", "c2", F.round(p, 6).alias("p_kn"))
    )
