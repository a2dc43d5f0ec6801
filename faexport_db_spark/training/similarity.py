"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k of a (small, broadcast)
  query set against the corpus — the correctness baseline. Linear in
  |corpus| x |queries|; at 100 TB you bound |queries| per job and let
  the corpus stream partition-parallel. The dot product is a
  zip_with/aggregate fold — whole-stage codegen, no UDF.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane LSH signs
  (fixed seed, hyperplanes shipped as literals/broadcast) bucket the
  corpus; queries probe their own bucket plus all Hamming-≤1 codes.
  Corpus is hashed once (linear), probing joins on the bucket code —
  a uniform equi-join key — so no cross join ever materializes.
- ``ivf_topk``: IVF ANN — deterministic k-means coarse quantizer,
  queries probe their nprobe nearest cells (equi-join on cell id).
- ``cosine_near_dup_pairs`` / ``cosine_near_dup_pairs_lsh``:
  embedding near-duplicate pairs — exact all-pairs baseline, and the
  scale path via multi-table LSH bucket-pair expansion + single-scan
  exact-cosine verification (no corpus-wide vector shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from faexport_db_spark.operators.partitioning import fan_out


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. Output: (query_id, neighbor_id,
    cosine, rank), self-matches excluded, ties broken by neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = fan_out(corpus, by=[id_col]).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, nbits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim)).round(6).tolist()


def _code_expr(vec: Column, planes: list[list[float]]) -> Column:
    code = F.lit(0)
    for i, plane in enumerate(planes):
        d = dot_expr(vec, F.array(*[F.lit(v) for v in plane]))
        code = code.bitwiseOR(F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    return code


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: probe the query's LSH bucket and every
    bucket at Hamming distance 1 (nbits+1 probes). Deterministic: the
    hyperplanes derive from a fixed seed and travel as literals.
    """
    planes = _hyperplanes(dim, nbits, seed)
    c = fan_out(corpus, by=[id_col]).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
    ).withColumn("bucket", _code_expr(F.col("c_vec"), planes))
    bit_masks = F.array(*[F.lit(1 << i) for i in range(nbits)])
    probe_codes = F.array_union(
        F.array(F.col("q_bucket")),
        F.transform(bit_masks, lambda m: F.col("q_bucket").bitwiseXOR(m)),
    )
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
        .withColumn("q_bucket", _code_expr(F.col("q_vec"), planes))
        .withColumn("bucket", F.explode(probe_codes))
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int | None = 250_000,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b,
    cosine ≥ threshold) — the correctness baseline for embedding dedup.

    All-pairs with one side broadcast: right for corpora that fit a
    broadcast (dim tables, per-partition blocks); at 100 TB use
    ``cosine_near_dup_pairs_lsh`` — same verify expression, candidates
    from bucket joins instead of the quadratic product. ``max_rows``
    guards against accidentally pointing the O(n²) baseline at a
    corpus it can never finish (pass ``None`` to bypass, knowingly).
    """
    if max_rows is not None:
        n = corpus.count()
        if n > max_rows:
            raise ValueError(
                f"cosine_near_dup_pairs is the O(n²) exact baseline; corpus has "
                f"{n} rows (> max_rows={max_rows}). Use cosine_near_dup_pairs_lsh "
                f"at this scale, or pass max_rows=None to force the quadratic scan."
            )
    a = fan_out(corpus, by=[id_col]).select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    cos = F.round(cosine_expr(F.col("va"), F.col("vb")), 6)
    return (
        pairs.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _pair_cosines(
    corpus: DataFrame, pairs: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Exact cosine for a (small) candidate id-pair set, scanning the
    corpus exactly ONCE: the pair set is pre-grouped into a per-id
    membership table (one broadcast — the candidate subtree appears in
    the plan a single time, where a member + distinct-ids formulation
    embeds it twice), an inner broadcast join both restricts the
    corpus to candidate vectors and attaches each one's pair list, and
    one small groupBy reunites the two vectors per pair (collapsing
    duplicate candidates from multi-table collisions). Vectors are
    never shuffled corpus-wide and never hashed through a distinct.
    The post-join explode only fans out stored columns, so nothing
    expensive re-evaluates per pair-membership row. Candidates arrive
    with cross-table duplicates (a true near-dup collides in up to
    n_tables tables); they collapse inside the membership
    ``collect_set`` (map-side partial dedup — one exchange where a
    dedicated distinct paid two; the r07 _verify_jaccard change,
    mirrored). Either way only id pairs ride this shuffle; vectors
    join in after, restricted to candidate ids."""
    member = pairs.select(
        "id_a", "id_b", F.explode(F.array("id_a", "id_b")).alias("mid")
    )
    grouped = member.groupBy("mid").agg(
        F.collect_set(F.struct("id_a", "id_b")).alias("ps")
    )
    # NO fan_out before this broadcast probe (r10, ABAB'd −30% for the
    # whole embed dedup): the probe is a cheap hash lookup, the explode
    # fans out STORED columns, and the expensive cosine runs after the
    # pair groupBy — post-exchange, already wide. Fanning the corpus
    # here paid a full corpus-vector exchange to parallelize trivial
    # work (the same negative result as r09's j1 probe-side fan-out).
    # At scale the corpus arrives wide and the fan-out would no-op.
    vecs = (
        corpus
        .join(F.broadcast(grouped), F.col(id_col) == F.col("mid"))
        .select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("vec"),
            F.explode("ps").alias("p"),
        )
    )
    per_pair = vecs.groupBy("p.id_a", "p.id_b").agg(
        F.max(F.when(F.col("vid") == F.col("p.id_a"), F.col("vec"))).alias("va"),
        F.max(F.when(F.col("vid") == F.col("p.id_b"), F.col("vec"))).alias("vb"),
    )
    cos = F.round(cosine_expr(F.col("va"), F.col("vb")), 6)
    return per_pair.select("id_a", "id_b", cos.alias("cosine"))


def _code_rows(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    nbits: int,
    n_tables: int,
    dim: int,
    seed: int,
    id_alias: str = "vid",
) -> DataFrame:
    """(id, tbl, code) rows: every vector coded in all ``n_tables``
    LSH tables, one Arrow-batched matmul per batch.

    The coder is a vectorized Pandas UDF, not a column expression, for
    two measured reasons: (a) nbits × n_tables hyperplane dot products
    as expression folds lose to one BLAS (batch × dim) @ (dim, planes)
    matmul — ~4x at 72 planes — and (b) a deep code expression inlined
    into the downstream ``posexplode`` generator escapes whole-stage
    codegen and re-evaluates interpreted (measured 0.57s → 2.2s at
    sf0.1). The UDF output is an attribute, a natural optimizer
    barrier. Deterministic: planes derive from the fixed seed and ship
    in the UDF closure (n_tables × nbits × dim floats — tiny). Still a
    pure narrow map — no shuffle, corpus coded exactly once."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    planes = np.array(_hyperplanes(dim, nbits * n_tables, seed), dtype=np.float64)
    weights = 1 << np.arange(nbits, dtype=np.int64)

    @pandas_udf(ArrayType(IntegerType()))
    def code_udf(vs: pd.Series) -> pd.Series:
        mat = np.vstack(vs.to_numpy()).astype(np.float64)
        signs = (mat @ planes.T) >= 0
        out = np.empty((signs.shape[0], n_tables), dtype=np.int64)
        for t in range(n_tables):
            out[:, t] = signs[:, t * nbits : (t + 1) * nbits] @ weights
        return pd.Series(out.astype(np.int32).tolist())

    # NO fan_out before the coder (r10, ABAB'd together with
    # _pair_cosines' removal): one BLAS matmul per Arrow batch is far
    # too cheap to justify a corpus exchange — and FEWER partitions
    # mean fewer per-task Python round-trips. The banding groupBy
    # right after re-spreads the work; at scale the input arrives wide
    # and the fan-out would no-op anyway.
    return df.select(
        F.col(id_col).alias(id_alias),
        F.posexplode(code_udf(vec_col)).alias("tbl", "code"),
    )


def cosine_near_dup_pairs_lsh(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 12,
    n_tables: int = 6,
    dim: int = 64,
    seed: int = 42,
    max_bucket: int | None = 10_000,
    entries: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs at scale: MULTI-TABLE hyperplane
    LSH generates candidates (same code in any of ``n_tables``
    independent ``nbits``-plane tables), exact cosine verifies.
    ``entries`` short-circuits coding with precomputed ``_code_rows``
    output (vid, tbl, code) — streaming callers code each batch once
    and feed every step from that one frame.

    Multi-table replaces the earlier single-table + Hamming-1 probing:
    at nbits=8 a 4k-vector corpus produced ~300k candidate pairs
    (random collisions in 256 codes dominate — every one paying
    vector-shuffle verification); nbits=12 × 6 tables cuts that ~30×
    at BETTER recall for the same total planes (recall at cosine 0.95
    ≈ 1-(1-p^nbits)^L with p = 1-θ/π ≈ 0.90, i.e. ~0.86 here, →0.99+
    near cosine 1.0 where dedup mass sits). Tuning rule at scale:
    nbits ≈ log2(|corpus|/target_bucket_size) — the per-table code
    space must grow with the corpus or random collisions reintroduce
    the quadratic term; raise ``n_tables`` to buy recall back.

    Candidates come from within-bucket pair expansion keyed by
    (table, code) — never a corpus-wide self-join. Cross-table
    duplicate candidates collapse inside the verify stage (cheap
    id-pair distinct before anything vector-sized moves). Only id
    pairs leave the expansion; vectors rejoin in ``_pair_cosines``'s
    single corpus scan. Every shuffle is linear on uniform keys;
    ``max_bucket`` drops degenerate over-dense codes.
    """
    from faexport_db_spark.training.dedup import _bucket_pairs

    if entries is None:
        entries = _code_rows(corpus, id_col, vec_col, nbits, n_tables, dim, seed)
    cand = _bucket_pairs(
        entries.select("tbl", "code", F.col("vid").alias("m")),
        ["tbl", "code"],
        F.col("m"),
        max_bucket,
    ).select(F.col("ma").alias("id_a"), F.col("mb").alias("id_b"))
    return _pair_cosines(corpus, cand, id_col, vec_col).filter(
        F.col("cosine") >= threshold
    )


#: Above this many centroids the literal-expression assignment path is
#: replaced by the Arrow coder: a 50k-element F.array(struct(...)) —
#: one cosine_expr sub-tree (× dim floats) per centroid — would blow
#: past Catalyst expression-tree/codegen limits long before SemDeDup's
#: stated LAION-scale operating point (VERDICT r05 "What's wrong" #2).
#: Below it, the literal expression stays: whole-stage codegen, zero
#: Python in the hot loop.
LITERAL_CENTROID_MAX = 1024


def _cell_probes_expr(vec: Column, centroids: list[list[float]], nprobe: int) -> Column:
    """nprobe nearest cell ids by cosine as a pure literal expression;
    ties by cid ascending (array_sort on (neg_cos, cid) structs)."""
    scored = F.array(
        *[
            F.struct(
                (-cosine_expr(vec, F.lit(c).cast("array<double>"))).alias("neg_cos"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.transform(F.slice(F.array_sort(scored), 1, nprobe), lambda s: s["cid"])


def _cell_probes_arrow(centroids: list[list[float]], nprobe: int):
    """Arrow-batched pandas UDF form of the same assignment: one numpy
    matmul + stable argsort per batch against a BROADCAST centroid
    matrix (50k × dim doubles ship to each executor once, not per
    task). Same ordering contract as the literal path — cosine
    descending, ties by cid ascending (stable argsort over ascending
    cid input order) — so the two paths are interchangeable; an
    equality test pins that. Still a pure narrow map: no shuffle, no
    join, the cited scale property of IVF/SemDeDup assignment."""
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    spark = SparkSession.getActiveSession()
    cmat = np.asarray(centroids, dtype=np.float64)
    bc = spark.sparkContext.broadcast(
        (cmat, np.linalg.norm(cmat, axis=1))
    )

    @pandas_udf(ArrayType(IntegerType()))
    def probes(vs: pd.Series) -> pd.Series:
        cm, cn = bc.value
        mat = np.vstack(vs.to_numpy()).astype(np.float64)
        cos = (mat @ cm.T) / (
            np.linalg.norm(mat, axis=1, keepdims=True) * cn
        )
        order = np.argsort(-cos, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(order.astype(np.int32).tolist())

    return probes


def _cell_probes(
    vec: Column,
    centroids: list[list[float]],
    nprobe: int,
    force: str | None = None,
) -> Column:
    """Size-gated nprobe-nearest-cells: literal expression up to
    ``LITERAL_CENTROID_MAX`` centroids, Arrow coder above (``force``
    pins a path for tests)."""
    path = force or (
        "literal" if len(centroids) <= LITERAL_CENTROID_MAX else "arrow"
    )
    if path == "literal":
        return _cell_probes_expr(vec, centroids, nprobe)
    return _cell_probes_arrow(centroids, nprobe)(vec)


def _nearest_centroid(
    vec: Column, centroids: list[list[float]], force: str | None = None
) -> Column:
    """argmax cosine over the centroid set (scale-invariant, so IVF
    assignment is stable under embedding renormalization). Size-gated:
    see ``_cell_probes``."""
    return _cell_probes(vec, centroids, 1, force=force)[0]


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd's k-means with cosine assignment, deterministic seeding
    (lowest xxhash64(id) rows). Centroids are tiny (n_centroids × dim)
    and round-trip through the driver each iteration — the standard
    Spark k-means shape: assignment is a map-only pass over the corpus,
    the update is one groupBy; only the centroid table ever collects.
    """
    seeds = (
        fan_out(corpus, by=[id_col])
        .select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col).cast("string")))
        .limit(n_centroids)
        .collect()
    )
    centroids = [list(r["v"]) for r in seeds]
    assigned = None
    for _ in range(iters):
        assigned = fan_out(corpus, by=[id_col]).select(
            _as_double(F.col(vec_col)).alias("v"),
            _nearest_centroid(F.col(vec_col), centroids).alias("cid"),
        )
        sums = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in sums:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = r["m"]
        centroids = [
            [comp[p] for p in sorted(comp)] if (comp := by_cid.get(i)) else centroids[i]
            for i in range(n_centroids)
        ]
    return centroids


def semantic_dedup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    max_cluster: int | None = 10_000,
) -> DataFrame:
    """Semantic near-dup pairs, SemDeDup shape (Abbas et al. 2023,
    arXiv:2303.09540): k-means clusters the embedding space, candidate
    pairs come ONLY from within a cluster, exact cosine verifies at
    ``threshold``. Output (id_a, id_b, cosine), id_a < id_b.

    The third embedding-dedup candidate generator next to the exact
    baseline (``cosine_near_dup_pairs``) and the LSH path
    (``cosine_near_dup_pairs_lsh``): clustering concentrates
    semantically-close vectors into the same cell, so for corpora
    whose duplicate mass sits inside semantic modes (the SemDeDup
    observation about web-scale text) a few hundred cells replace
    thousands of hash buckets, and the cluster model doubles as the
    IVF coarse quantizer already used for ANN (``ivf_centroids`` —
    pass ``centroids`` to share one trained model across dedup and
    search).

    Scale shape: assignment is a map-only pass (``_nearest_centroid``
    — a literal-centroid codegen expression up to
    ``LITERAL_CENTROID_MAX`` cells, the broadcast-matrix Arrow coder
    above it, so the ~50k-cluster regime below is actually reachable;
    no join either way); within-cell pair
    expansion reuses ``_bucket_pairs`` keyed by ``cid``, so no row
    materializes a cell² array and ``max_cluster`` bounds the
    degenerate giant-cluster case exactly like LSH's ``max_bucket``
    (at 100 TB raise ``n_centroids`` so expected cell size stays
    bounded — the SemDeDup paper runs ~50k clusters for LAION-scale);
    only id pairs leave the expansion, vectors rejoin in
    ``_pair_cosines``'s single corpus scan. Assignment is
    scale-invariant (cosine argmax), so renormalized or scaled copies
    can never straddle cells and recall at cosine≈1.0 is structural,
    not probabilistic.
    """
    from faexport_db_spark.training.dedup import _bucket_pairs

    if centroids is None:
        centroids = ivf_centroids(
            corpus, n_centroids=n_centroids, iters=iters, id_col=id_col, vec_col=vec_col
        )
    assign = fan_out(corpus, by=[id_col]).select(
        F.col(id_col).alias("m"),
        _nearest_centroid(F.col(vec_col), centroids).alias("cid"),
    )
    cand = _bucket_pairs(assign, ["cid"], F.col("m"), max_cluster).select(
        F.col("ma").alias("id_a"), F.col("mb").alias("id_b")
    )
    return _pair_cosines(corpus, cand, id_col, vec_col).filter(
        F.col("cosine") >= threshold
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    max_cluster: int | None = 10_000,
) -> DataFrame:
    """Corpus rows surviving semantic dedup: a row is removed iff it
    has a LOWER-id near-dup partner (cosine ≥ threshold in the same
    cluster) — the deterministic keep-lowest-id policy every dedup op
    in this package uses. The removed-id set is a skinny id column;
    survivors come from a left-anti join, so full rows are scanned
    once and never shuffled by value."""
    pairs = semantic_dedup_pairs(
        corpus,
        threshold=threshold,
        n_centroids=n_centroids,
        iters=iters,
        id_col=id_col,
        vec_col=vec_col,
        centroids=centroids,
        max_cluster=max_cluster,
    )
    removed = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return corpus.join(removed, id_col, "left_anti")


def semantic_dedup_against_index(
    new_vecs: DataFrame,
    index_path: str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int | None = 10_000,
) -> DataFrame:
    """Semantic near-dup pairs between a NEW batch and a persisted IVF
    index (``ivf_build``'s cid-partitioned layout + ``_centroids.json``
    sidecar) — the incremental analog of ``semantic_dedup_pairs``:
    only the batch is assigned (same size-gated scale-invariant cosine
    argmax, so a scaled copy of an indexed vector lands in its
    original's cell STRUCTURALLY, and recall matches the batch
    formulation), the probed cell ids become an ``isin`` partition
    filter (≤ |batch| distinct cells, pruned scan — the corpus is
    never re-assigned or fully read), and candidates are the pruned
    cells' members × the batch rows assigned there. The index rows
    carry their vectors, so exact-cosine verification happens in the
    probe join itself — no second corpus scan. ``max_cluster`` skips
    degenerate giant cells exactly like the batch path. Output:
    (id_a = indexed vector, id_b = new vector, cosine), cosine ≥
    threshold, rounded like ``_pair_cosines`` so batch and
    incremental paths agree bit-for-bit on shared pairs."""
    from faexport_db_spark.training.indexmeta import read_model_sidecar

    spark = new_vecs.sparkSession
    centroids = read_model_sidecar(spark, index_path, "_centroids.json")
    assigned = fan_out(new_vecs, by=[id_col]).select(
        F.col(id_col).alias("new_id"),
        F.col(vec_col).alias("new_vec"),
        _nearest_centroid(F.col(vec_col), centroids).alias("cid"),
    )
    probed = [r["cid"] for r in assigned.select("cid").distinct().collect()]
    cells = spark.read.parquet(index_path).filter(F.col("cid").isin(probed))
    if max_cluster is not None:
        oversized = (
            cells.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("__csz"))
            .filter(F.col("__csz") > max_cluster)
            .select("cid")
        )
        cells = cells.join(F.broadcast(oversized), "cid", "left_anti")
    scored = (
        cells.join(F.broadcast(assigned), "cid")
        .filter(F.col("neighbor_id") != F.col("new_id"))
        .withColumn(
            "cosine",
            F.round(cosine_expr(F.col("c_vec"), F.col("new_vec")), 6),
        )
    )
    return scored.filter(F.col("cosine") >= threshold).select(
        F.col("neighbor_id").alias("id_a"),
        F.col("new_id").alias("id_b"),
        "cosine",
    )


def semantic_append_index(
    new_vecs: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a batch's rows to a persisted IVF index: assign against
    the SIDECAR centroids (the model is never retrained — cell
    membership stays consistent with every past batch, the property
    incremental dedup depends on) and append in the same
    cid-partitioned layout ``ivf_build`` writes. Batch-sized work
    only."""
    from faexport_db_spark.training.indexmeta import read_model_sidecar

    centroids = read_model_sidecar(new_vecs.sparkSession, index_path, "_centroids.json")
    (
        fan_out(new_vecs, by=[id_col])
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            _nearest_centroid(F.col(vec_col), centroids).alias("cid"),
        )
        .write.mode("append")
        .partitionBy("cid")
        .parquet(index_path)
    )


def _probed_queries(
    queries: DataFrame, centroids: list[list[float]], nprobe: int, id_col: str, vec_col: str
) -> DataFrame:
    """Each query row exploded to its ``nprobe`` nearest cell ids
    (size-gated literal/Arrow assignment — see ``_cell_probes``)."""
    probes = _cell_probes(F.col("q_vec"), centroids, nprobe)
    return queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("cid", F.explode(probes))


def _probe_cells(cells: DataFrame, q: DataFrame, k: int) -> DataFrame:
    """Equi-join probed queries to their cells, exact cosine, top-k."""
    scored = (
        cells.join(F.broadcast(q), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    nprobe: int = 2,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus partitioned into centroid cells
    (one linear assignment pass), queries probe their ``nprobe``
    nearest cells — an equi-join on cell id, exact cosine inside.

    At 100 TB the assigned corpus is written once partitioned by
    ``cid`` — ``ivf_build`` / ``ivf_topk_persisted`` — so partition
    pruning turns a probe into a ~nprobe/n_centroids scan; here the
    assignment stays inline.
    """
    if centroids is None:
        centroids = ivf_centroids(corpus, n_centroids, iters, id_col, vec_col)
    cells = fan_out(corpus, by=[id_col]).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _nearest_centroid(F.col(vec_col), centroids).alias("cid"),
    )
    q = _probed_queries(queries, centroids, nprobe, id_col, vec_col)
    return _probe_cells(cells, q, k)


def ivf_build(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Build and persist the IVF index: the assigned corpus written
    ONCE as ``cid``-partitioned parquet — the 100 TB layout, where a
    probe's cell filter becomes partition pruning and only
    ~nprobe/n_centroids of the corpus is ever listed or scanned — plus
    the (tiny) centroid table as an underscore-prefixed JSON sidecar
    Spark's scanner ignores (written through the index's own Hadoop
    filesystem, so object-store paths work like local ones)."""
    from faexport_db_spark.training.indexmeta import write_model_sidecar

    centroids = ivf_centroids(corpus, n_centroids, iters, id_col, vec_col)
    assigned = fan_out(corpus, by=[id_col]).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _nearest_centroid(F.col(vec_col), centroids).alias("cid"),
    )
    assigned.write.mode("overwrite").partitionBy("cid").parquet(path)
    write_model_sidecar(corpus.sparkSession, path, "_centroids.json", centroids)
    return centroids


def ivf_topk_persisted(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a persisted IVF index. The probed cell ids (≤ n_centroids
    values — bounded regardless of corpus size) become an ``isin``
    partition filter, so the scan prunes to the probed ``cid=``
    directories before a byte of vector data is read."""
    from faexport_db_spark.training.indexmeta import read_model_sidecar

    centroids = read_model_sidecar(spark, path, "_centroids.json")
    q = _probed_queries(queries, centroids, nprobe, id_col, vec_col)
    probed_cids = [r["cid"] for r in q.select("cid").distinct().collect()]
    cells = spark.read.parquet(path).filter(F.col("cid").isin(probed_cids))
    return _probe_cells(cells, q, k)


def embed_lsh_build_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 12,
    n_tables: int = 6,
    dim: int = 64,
    seed: int = 42,
) -> None:
    """Persist the corpus's multi-table hyperplane-LSH code table:
    (tbl, code, vid) parquet partitioned by ``tbl`` — coded once,
    probed by every future batch; the ``tbl`` partitioning keeps
    per-table files independently listable (and lets a targeted
    rebuild rewrite one table), mirroring the MinHash band index. The
    hyperplanes derive from the fixed seed, so batch and index codes
    agree without storing the planes; (nbits, n_tables, dim, seed) are
    persisted in an ``_index_meta.json`` sidecar and validated by
    ``embed_dedup_against_index`` — a probe coded with different
    parameters would silently match nothing."""
    from faexport_db_spark.training.indexmeta import write_index_meta

    coded = _code_rows(corpus, id_col, vec_col, nbits, n_tables, dim, seed)
    (
        coded.repartition("tbl")
        .sortWithinPartitions("code")
        .write.mode("overwrite")
        .partitionBy("tbl")
        .parquet(path)
    )
    write_index_meta(
        corpus.sparkSession,
        path,
        "embed_lsh_codes",
        {"nbits": nbits, "n_tables": n_tables, "dim": dim, "seed": seed},
    )


def embed_dedup_against_index(
    new_vecs: DataFrame,
    corpus: DataFrame,
    index_path: str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 12,
    n_tables: int = 6,
    dim: int = 64,
    seed: int = 42,
    max_bucket: int | None = 10_000,
    probes: DataFrame | None = None,
) -> DataFrame:
    """Embedding near-dup pairs between a NEW batch and an indexed
    corpus — the incremental analog of ``cosine_near_dup_pairs_lsh``:
    only the batch is coded (same multi-table codes, so recall matches
    the self-join formulation exactly); candidates come from joining
    the batch's (tbl, code) probes against the persisted code table —
    one index scan, no corpus re-coding, no index-side shuffle (batch
    probes broadcast). Exact cosine verifies in a single scan over
    candidate vectors (cross-table duplicate candidates collapse in
    the verify groupBy). ``max_bucket`` skips degenerate over-dense
    code buckets, mirroring the self-join formulation's stop-bucket
    guard. Output: (id_a, id_b, cosine) with id_a = corpus vector,
    id_b = new vector."""
    from faexport_db_spark.training.indexmeta import check_index_meta

    spark = new_vecs.sparkSession
    check_index_meta(
        spark,
        index_path,
        "embed_lsh_codes",
        {"nbits": nbits, "n_tables": n_tables, "dim": dim, "seed": seed},
    )
    index = spark.read.parquet(index_path)
    if probes is None:
        probes = _code_rows(
            new_vecs, id_col, vec_col, nbits, n_tables, dim, seed, id_alias="new_id"
        )
    matched = index.join(F.broadcast(probes), ["tbl", "code"]).filter(
        F.col("vid") != F.col("new_id")
    )
    if max_bucket is not None:
        oversized = (
            index.join(
                F.broadcast(probes.select("tbl", "code").distinct()),
                ["tbl", "code"],
                "left_semi",
            )
            .groupBy("tbl", "code")
            .agg(F.count(F.lit(1)).alias("__bsz"))
            .filter(F.col("__bsz") > max_bucket)
            .select("tbl", "code")
        )
        matched = matched.join(F.broadcast(oversized), ["tbl", "code"], "left_anti")
    cand = matched.select(F.col("vid").alias("id_a"), F.col("new_id").alias("id_b"))
    both = corpus.select(id_col, vec_col).unionByName(new_vecs.select(id_col, vec_col))
    return _pair_cosines(both, cand, id_col, vec_col).filter(
        F.col("cosine") >= threshold
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-compressed ANN scale path:
# vectors compress to m subspace codes (m bytes at k<=256), queries scan
# codes with per-query ADC lookup tables instead of raw vectors. At
# 100 TB this is the difference between scanning 256 GB of codes and
# 25 TB of float vectors; IVF composes on top (assign cells, PQ within).

def pq_train(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> list[list[list[float]]]:
    """Per-subspace codebooks: split dim into ``m`` contiguous
    subvectors and run a small deterministic k-means in each (seeded by
    lowest xxhash64(id), like ``ivf_centroids``). Each subspace pass is
    a map-only assignment + one groupBy; only the (m x k x dim/m)
    codebook ever reaches the driver."""
    sub = dim // m
    books: list[list[list[float]]] = []
    base = fan_out(corpus, by=[id_col]).select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    ).localCheckpoint(eager=True)
    for j in range(m):
        sliced = base.select(
            F.col(id_col), F.slice("v", j * sub + 1, sub).alias("v")
        )
        seeds = (
            sliced.orderBy(F.xxhash64(F.col(id_col).cast("string")))
            .limit(k)
            .collect()
        )
        if len(seeds) < k:
            # Otherwise the centroid-update comprehension below indexes
            # cents[i] for i in range(k) and dies with an opaque
            # IndexError (ADVICE r03).
            raise ValueError(
                f"pq_train: corpus has only {len(seeds)} vectors but k={k} "
                "centroids per subspace were requested — pass a smaller k "
                "or a larger corpus"
            )
        cents = [list(r["v"]) for r in seeds]
        for _ in range(iters):
            assigned = sliced.select(
                "v", _nearest_l2(F.col("v"), cents).alias("cid")
            )
            sums = (
                assigned.select("cid", F.posexplode("v").alias("pos", "x"))
                .groupBy("cid", "pos")
                .agg(F.avg("x").alias("mval"))
                .collect()
            )
            by_cid: dict[int, dict[int, float]] = {}
            for r in sums:
                by_cid.setdefault(r["cid"], {})[r["pos"]] = r["mval"]
            cents = [
                [comp[p] for p in sorted(comp)] if (comp := by_cid.get(i)) else cents[i]
                for i in range(k)
            ]
        books.append(cents)
    return books


def _l2sq_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _nearest_l2(vec: Column, centroids: list[list[float]]) -> Column:
    scored = F.array(
        *[
            F.struct(
                _l2sq_expr(vec, F.lit(c).cast("array<double>")).alias("d"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.array_min(scored)["cid"]


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>[m]): each subvector's nearest codebook
    entry by L2 — a pure map-side projection; ties break toward the
    lowest centroid id (array_min on (distance, cid) structs)."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    v = _as_double(F.col(vec_col))
    codes = F.array(
        *[
            _nearest_l2(F.slice(v, j * sub + 1, sub), codebooks[j])
            for j in range(m)
        ]
    )
    return fan_out(corpus, by=[id_col]).select(F.col(id_col).alias("nid"), codes.alias("codes"))


def pq_topk(
    corpus_codes: DataFrame,
    queries: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    k: int = 3,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: per query, the m x k table of
    exact subvector-to-centroid squared distances is computed
    driver-side (tiny) and shipped as literals; each corpus code row
    sums m table lookups — no vector data is ever read at query time.
    ``queries`` is a bounded in-memory list (same contract as the
    brute-force baseline's broadcast query set). Output: (query_id,
    neighbor_id, adc_dist, rank), ties by neighbor id."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    out = None
    for qid, qv in queries:
        tables = [
            [
                sum((qv[j * sub + t] - c[t]) ** 2 for t in range(sub))
                for c in codebooks[j]
            ]
            for j in range(m)
        ]
        dist = None
        for j in range(m):
            term = F.element_at(
                F.lit(tables[j]).cast("array<double>"),
                F.element_at("codes", j + 1) + 1,
            )
            dist = term if dist is None else dist + term
        scored = corpus_codes.select(
            F.lit(qid).alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.round(dist, 6).alias("adc_dist"),
        ).filter(F.col("neighbor_id") != qid)
        out = scored if out is None else out.unionByName(scored)
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def _adc_tables(vec: Column, codebooks: list[list[list[float]]]) -> Column:
    """Per-row ADC lookup tables: array[m][k] of exact subvector-to-
    centroid squared distances — the per-QUERY table ``pq_topk``
    computed driver-side, here a pure expression so queries can be a
    DataFrame of any size."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    v = _as_double(vec)
    return F.array(
        *[
            F.array(
                *[
                    _l2sq_expr(
                        F.slice(v, j * sub + 1, sub), F.lit(c).cast("array<double>")
                    )
                    for c in codebooks[j]
                ]
            )
            for j in range(m)
        ]
    )


def _adc_dist(tables_col: Column, codes_col: Column, m: int) -> Column:
    """Σ_j tables[j][codes[j]] — m array lookups per corpus code row."""
    dist = None
    for j in range(m):
        term = F.element_at(
            F.element_at(tables_col, j + 1), F.element_at(codes_col, j + 1) + 1
        )
        dist = term if dist is None else dist + term
    return dist


def pq_topk_df(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale form of ``pq_topk``: queries as a DATAFRAME, one scan of
    the code table regardless of query count.

    ``pq_topk`` builds one plan branch (one code scan) per query —
    fine for its documented bounded-panel contract, quadratic plan
    compilation for a thousand-query batch (VERDICT r03 item 4). Here
    each query row computes its own ADC table as a pure expression
    (m × k little L2 sums over codebook literals), the query panel
    broadcasts, and every corpus code row sums m table lookups against
    every query in a single broadcast-nested-loop pass — the code
    table is scanned ONCE. The per-query top-k window then shuffles
    only skinny (query_id, neighbor_id, adc_dist) rows; no vector
    bytes exist anywhere downstream of the query panel.

    Output schema/order/tie-breaks identical to ``pq_topk``:
    (query_id, neighbor_id, adc_dist, rank), ties by neighbor id.
    """
    m = len(codebooks)
    q = queries.select(
        F.col(id_col).alias("query_id"), _adc_tables(F.col(vec_col), codebooks).alias("__adc")
    )
    scored = (
        corpus_codes.crossJoin(F.broadcast(q))
        .filter(F.col("nid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            F.round(_adc_dist(F.col("__adc"), F.col("codes"), m), 6).alias("adc_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def _residual_expr(
    vec: Column, cid: Column, centroids: list[list[float]]
) -> Column:
    """``vec − centroids[cid]`` as a pure expression (the centroid
    table is a bounded driver-side list, shipped as one literal)."""
    cent = F.element_at(
        F.lit(centroids).cast("array<array<double>>"), cid + 1
    )
    return F.zip_with(_as_double(vec), cent, lambda x, y: x - y)


def pq_train_residual(
    corpus: DataFrame,
    centroids: list[list[float]],
    m: int = 8,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """PQ codebooks trained on CELL RESIDUALS (v − its coarse
    centroid) — the standard IVFADC refinement (Jégou et al. 2011
    §III): residuals concentrate around the origin with far less
    variance than raw vectors, so the same m×k codebook budget spends
    its centroids on the part of the vector the coarse quantizer
    hasn't already explained. One codebook set POOLED across cells
    (not per-cell) keeps the probe the same single ``cid`` equi-join."""
    assigned = fan_out(corpus, by=[id_col]).select(
        F.col(id_col),
        F.col(vec_col),
        _nearest_centroid(F.col(vec_col), centroids).alias("cid"),
    )
    residuals = assigned.select(
        F.col(id_col),
        _residual_expr(F.col(vec_col), F.col("cid"), centroids).alias(vec_col),
    )
    return pq_train(residuals, m, k, iters, id_col, vec_col,
                    dim=len(centroids[0]))


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    nprobe: int = 2,
    m: int = 8,
    codebook_k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    residual: bool = False,
) -> DataFrame:
    """IVF + PQ composed — the standard billion-scale ANN layout
    (IVFADC, Jégou/Douze/Schmid PAMI 2011): coarse centroids route
    each query to ``nprobe`` cells, and WITHIN the probed cells
    distances come from PQ codes via ADC lookups, so a probe reads
    ~nprobe/n_centroids of the CODE bytes and no vectors at all.

    With ``residual=False`` codebooks quantize the raw vectors; with
    ``residual=True`` they quantize cell residuals (v − centroid[cid],
    trained via ``pq_train_residual`` when not supplied) and each
    probed query row computes its ADC tables from its own residual
    against THAT cell — a pure per-row expression, so the plan shape
    (broadcast probed-query panel, single ``cid`` equi-join, skinny
    id/dist rows downstream) is IDENTICAL; only the expressions feeding
    the lookup tables change. Caller-supplied ``codebooks`` must match
    the flag (trained on residuals iff ``residual``).

    Queries travel as a DataFrame: cell routing (``_probed_queries``'s
    argmax expression) and ADC tables are pure per-row expressions,
    the probed-query panel broadcasts, and candidates come from an
    equi-join on ``cid`` against the coded corpus — with a
    ``cid=``-partitioned persisted code table this is partition
    pruning, exactly like ``ivf_topk_persisted``.

    Output: (query_id, neighbor_id, adc_dist, rank), ties by
    neighbor id."""
    if centroids is None:
        centroids = ivf_centroids(corpus, n_centroids, iters, id_col, vec_col)
    if codebooks is None:
        codebooks = (
            pq_train_residual(corpus, centroids, m, codebook_k, iters,
                              id_col, vec_col)
            if residual
            else pq_train(corpus, m, codebook_k, iters, id_col, vec_col,
                          dim=len(centroids[0]))
        )
    # Codes and cell id in ONE map-side projection — never a
    # corpus×corpus join (both are pure expressions over the vector).
    sub = len(codebooks[0][0])
    assigned = fan_out(corpus, by=[id_col]).select(
        F.col(id_col).alias("nid"),
        F.col(vec_col),
        _nearest_centroid(F.col(vec_col), centroids).alias("cid"),
    )
    enc = (
        _residual_expr(F.col(vec_col), F.col("cid"), centroids)
        if residual
        else _as_double(F.col(vec_col))
    )
    codes = F.array(
        *[_nearest_l2(F.slice(enc, j * sub + 1, sub), codebooks[j]) for j in range(len(codebooks))]
    )
    coded = assigned.select("nid", codes.alias("codes"), "cid")
    probed = _probed_queries(queries, centroids, nprobe, id_col, vec_col)
    q_enc = (
        _residual_expr(F.col("q_vec"), F.col("cid"), centroids)
        if residual
        else F.col("q_vec")
    )
    q = probed.select(
        "query_id", "cid", _adc_tables(q_enc, codebooks).alias("__adc")
    )
    nm = len(codebooks)
    scored = (
        coded.join(F.broadcast(q), "cid")
        .filter(F.col("nid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            F.round(_adc_dist(F.col("__adc"), F.col("codes"), nm), 6).alias("adc_dist"),
        )
        # a pair can surface via several probed cells only if dup cell
        # assignments existed; cells partition the corpus, so rows are
        # already unique — no distinct needed.
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def ivfpq_build(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 8,
    m: int = 8,
    codebook_k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    residual: bool = False,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Persist the IVFADC layout: the corpus as PQ CODES (m small ints
    per vector — no vector bytes) written once as ``cid``-partitioned
    parquet, plus the coarse centroids and per-subspace codebooks as a
    JSON sidecar. At 100 TB this is THE billion-scale ANN artifact: a
    probe partition-prunes to ~nprobe/n_centroids of the code table
    and ADC-scans bytes, never vectors. With ``residual`` the codes
    quantize cell residuals (``pq_train_residual``) — the flag is
    recorded in the sidecar so ``ivfpq_topk_persisted`` probes
    correctly with no caller coordination. Returns (centroids,
    codebooks) for callers that keep probing in-process."""
    from faexport_db_spark.training.indexmeta import write_model_sidecar

    centroids = ivf_centroids(corpus, n_centroids, iters, id_col, vec_col)
    codebooks = (
        pq_train_residual(corpus, centroids, m, codebook_k, iters, id_col, vec_col)
        if residual
        else pq_train(
            corpus, m, codebook_k, iters, id_col, vec_col, dim=len(centroids[0])
        )
    )
    sub = len(codebooks[0][0])
    assigned = fan_out(corpus, by=[id_col]).select(
        F.col(id_col).alias("nid"),
        F.col(vec_col),
        _nearest_centroid(F.col(vec_col), centroids).alias("cid"),
    )
    enc = (
        _residual_expr(F.col(vec_col), F.col("cid"), centroids)
        if residual
        else _as_double(F.col(vec_col))
    )
    codes = F.array(
        *[
            _nearest_l2(F.slice(enc, j * sub + 1, sub), codebooks[j])
            for j in range(len(codebooks))
        ]
    )
    coded = assigned.select("nid", codes.alias("codes"), "cid")
    coded.write.mode("overwrite").partitionBy("cid").parquet(path)
    write_model_sidecar(
        corpus.sparkSession,
        path,
        "_ivfpq_model.json",
        {"centroids": centroids, "codebooks": codebooks, "residual": residual},
    )
    return centroids, codebooks


def ivfpq_topk_persisted(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a persisted IVFADC index: route each query row to its
    ``nprobe`` cells (pure expression over the sidecar centroids),
    partition-prune the code table to those ``cid=`` directories, and
    ADC-scan the codes with per-query lookup tables — identical
    output contract to ``ivfpq_topk`` with the same models."""
    from faexport_db_spark.training.indexmeta import read_model_sidecar

    model = read_model_sidecar(spark, path, "_ivfpq_model.json")
    centroids, codebooks = model["centroids"], model["codebooks"]
    # Pre-residual sidecars carry no flag — their codes quantize raw
    # vectors, which is exactly what .get's default probes.
    q_enc = (
        _residual_expr(F.col("q_vec"), F.col("cid"), centroids)
        if model.get("residual", False)
        else F.col("q_vec")
    )
    q = _probed_queries(queries, centroids, nprobe, id_col, vec_col).select(
        "query_id", "cid", _adc_tables(q_enc, codebooks).alias("__adc")
    )
    probed_cids = [r["cid"] for r in q.select("cid").distinct().collect()]
    coded = spark.read.parquet(path).filter(F.col("cid").isin(probed_cids))
    nm = len(codebooks)
    scored = (
        coded.join(F.broadcast(q), "cid")
        .filter(F.col("nid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            F.round(_adc_dist(F.col("__adc"), F.col("codes"), nm), 6).alias("adc_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def range_search(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine RANGE search: every corpus vector whose cosine to
    a query meets ``threshold`` — the radius-neighbor complement of
    :func:`brute_force_topk` (dedup wants "everything closer than X",
    retrieval wants "the best k"; they are different contracts).

    Unlike top-k there is no per-query ranking, so the whole operator
    is broadcast-join + codegen'd fold + filter: ZERO exchanges, no
    window, embarrassingly parallel over corpus partitions
    (plan-asserted in tests/test_plans.py). At 100 TB the corpus scan
    dominates and nothing shuffles; the bounded/broadcast query-panel
    contract is the same as the PQ/ADC scorers.

    Output: (query_id, neighbor_id, cosine), self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = fan_out(corpus, by=[id_col]).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("q_vec"), F.col("c_vec")), 6))
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("query_id", "neighbor_id", "cosine")
    )


def label_centroids(
    embs: DataFrame,
    dim: int = 64,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-class embedding centroids in ONE aggregation pass: the
    elementwise mean is expressed as ``dim`` scalar ``avg`` aggregates
    (map-side partial aggregation applies, so the corpus streams once
    and only |labels|-sized partials shuffle), then a constant-width
    stack pivots to long format — never an explode-per-dimension of
    the corpus (which would shuffle n_rows x dim rows), never a
    driver-side numpy pass. The centroid table this emits is what
    classifier-free dedup (SemDeDup cells), label-drift monitoring,
    and nearest-class-mean classification consume.

    Output: (label, dim, mean_val) — long format, dim 0-based,
    rounded to 6 (order-independent to the last ulp after rounding).
    """
    aggs = [
        F.round(F.avg(F.col(vec_col)[i]), 6).alias(f"m_{i}") for i in range(dim)
    ]
    wide = embs.groupBy(label_col).agg(*aggs)
    stack_args = ", ".join(f"{i}, m_{i}" for i in range(dim))
    return wide.select(
        label_col,
        F.expr(f"stack({dim}, {stack_args}) AS (dim, mean_val)"),
    ).select(label_col, F.col("dim").cast("bigint").alias("dim"), "mean_val")


def ncm_confusion(
    embs: DataFrame,
    dim: int = 64,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-class-mean classification eval: assign every embedding
    to its cosine-nearest label centroid (from ``label_centroids``,
    components rounded to 6 so both engines score IDENTICAL doubles)
    and emit the confusion matrix — the ten-second "are these
    embeddings linearly separated by class" health check run before
    anyone trains on them.

    Scale shape: centroids are |labels| × dim driver-side metadata
    (the bounded-collect pattern the IVF family established); the
    assignment is one literal-expression argmax per row — map-only,
    whole-stage codegen, no join — and the confusion matrix is one
    groupBy over a |labels|² key domain. Ties break toward the lower
    label via the (neg_cos, label) struct sort, matching the oracle's
    row_number order exactly.

    Output: (label, pred_label, n).
    """
    cents = label_centroids(embs, dim=dim, label_col=label_col, vec_col=vec_col)
    by_label: dict[int, dict[int, float]] = {}
    for r in cents.collect():  # bounded: |labels| x dim
        by_label.setdefault(r[label_col], {})[r["dim"]] = r["mean_val"]
    labels = sorted(by_label)
    scored = F.array(
        *[
            F.struct(
                (
                    -cosine_expr(
                        F.col(vec_col),
                        F.lit([by_label[lb][d] for d in range(dim)]).cast(
                            "array<double>"
                        ),
                    )
                ).alias("nc"),
                F.lit(lb).alias("lb"),
            )
            for lb in labels
        ]
    )
    pred = F.array_sort(scored)[0]["lb"]
    return (
        embs.select(F.col(label_col), pred.alias("pred_label"))
        .groupBy(label_col, "pred_label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def kmeans_quantized(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10_000,
    shift: int = 20_000,
    force: str | None = None,
) -> tuple[DataFrame, list[list[int]]]:
    """Lloyd's k-means whose every arithmetic step is EXACT integer
    math, so the trained model — not just its cluster sizes — is
    bit-reproducible across runs, partitionings, and engines (the
    trainer sibling of ``ivf_centroids``, whose float means are
    run-stable but not engine-portable; the driver oracle unrolls
    these same iterations as SQL CTEs, the g3_pagerank pattern).

    Mechanics: vectors quantize to ``floor(x * scale) + shift``
    (floor, not round — no rounding-mode ties; ``shift`` keeps values
    nonnegative so truncating and floor integer division agree in
    every engine). Seeds are the ``k`` lowest-``id_col`` vectors,
    assignment is exact-integer squared-L2 argmin (ties to the lowest
    cid via struct ordering), and the centroid update is the integer
    floor-mean ``sum div count``; a cluster that loses all members
    keeps its previous centroid.

    Shape at 100 TB: the standard Spark k-means loop — assignment is a
    map-only pass over the corpus (no join: ≤ ``LITERAL_CENTROID_MAX``
    centroids travel as literal expressions inside whole-stage
    codegen; above that the same integer argmin runs as ONE
    Arrow-batched numpy matmul against the broadcast int64 centroid
    matrix, the ``_cell_probes`` two-path rule — ``force``
    'literal'/'arrow' overrides), the update is ONE groupBy per
    iteration bounded by k × dim output rows, and only the centroid
    table (k × dim ints) ever reaches the driver. Integer-overflow
    bound for the Arrow path's exact matmul: dim × (|q|max)² must fit
    int64 — |floor(x·scale)+shift| up to ~10⁸ at dim 64, far beyond
    any quantization this uses.

    Returns (assignments, centroids): assignments is
    (id, cid, dist) — bigint, int, bigint (exact squared quantized
    L2); centroids is the final k × dim integer table.
    """
    if k < 1 or iters < 0:
        raise ValueError(f"need k >= 1 and iters >= 0, got k={k} iters={iters}")
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long")
        + F.lit(shift),
    )
    pts = corpus.select(F.col(id_col), q.alias("q"))
    seeds = pts.orderBy(id_col).limit(k).collect()
    if len(seeds) < k:
        raise ValueError(f"corpus has fewer than k={k} vectors")
    centroids: list[list[int]] = [list(r["q"]) for r in seeds]

    def _assign_literal(frame: DataFrame) -> DataFrame:
        choices = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            F.col("q"),
                            F.array(*[F.lit(int(v)) for v in cent]),
                            lambda x, y: (x - y) * (x - y),
                        ),
                        F.lit(0).cast("long"),
                        lambda acc, x: acc + x,
                    ).alias("dist"),
                    F.lit(i).cast("int").alias("cid"),
                )
                for i, cent in enumerate(centroids)
            ]
        )
        best = F.array_min(choices)
        return frame.select(
            id_col, "q", best["cid"].alias("cid"), best["dist"].alias("dist")
        )

    def _assign_arrow(frame: DataFrame) -> DataFrame:
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        cmat = np.asarray(centroids, dtype=np.int64)
        cc = (cmat * cmat).sum(axis=1)

        @pandas_udf("struct<cid:int,dist:bigint>")
        def best_udf(vs: pd.Series) -> pd.DataFrame:
            if not len(vs):
                return pd.DataFrame({"cid": pd.Series(dtype="int32"),
                                     "dist": pd.Series(dtype="int64")})
            qmat = np.array(vs.tolist(), dtype=np.int64)
            # exact int64 squared-L2: |q|^2 + |c|^2 - 2 q.c — every
            # term integer, identical to the literal expression
            d2 = (qmat * qmat).sum(1)[:, None] + cc[None, :] - 2 * (qmat @ cmat.T)
            cid = d2.argmin(axis=1)  # first min -> lowest cid, the tie rule
            dist = d2[np.arange(len(cid)), cid]
            return pd.DataFrame({"cid": cid.astype("int32"), "dist": dist})

        out = frame.withColumn("__b", best_udf(F.col("q")))
        return out.select(
            id_col, "q",
            F.col("__b.cid").alias("cid"), F.col("__b.dist").alias("dist"),
        )

    def _assign(frame: DataFrame) -> DataFrame:
        mode = force or (
            "literal" if len(centroids) <= LITERAL_CENTROID_MAX else "arrow"
        )
        if mode == "literal":
            return _assign_literal(frame)
        if mode != "arrow":
            raise ValueError(f"force must be 'literal' or 'arrow', got {force!r}")
        return _assign_arrow(frame)

    for _ in range(iters):
        stats = (
            _assign(pts)
            .select("cid", F.posexplode("q").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cid: dict[int, dict[int, int]] = {}
        for r in stats:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = int(r["s"]) // int(r["n"])
        centroids = [
            [comp[p] for p in sorted(comp)] if (comp := by_cid.get(i)) else centroids[i]
            for i in range(k)
        ]

    return _assign(pts).select(id_col, "cid", "dist"), centroids


def embedding_stats(
    corpus: DataFrame, vec_col: str = "embedding", scale: int = 1_000_000
) -> DataFrame:
    """Per-dimension mean/std over an embedding column — the QC table
    read before whitening/normalization decisions (a dimension with
    near-zero variance or a drifting mean is a model-or-ingest bug).
    Values quantize to ``floor(x * scale)`` first so the sums are
    EXACT integers (order-independent — engine-reproducible, unlike a
    float avg whose partition-order sum drift sits exactly at a
    round() boundary sometimes); mean/std then derive from the two
    exact sums in fixed double arithmetic.

    One posexplode + one groupBy bounded by dim rows; the shuffle
    carries map-side-combined (pos, sum, sumsq, n) partials only.
    Output: (pos, n, mean, std) — int, bigint, double(6dp) x2.
    """
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long"),
    )
    exploded = corpus.select(F.posexplode(q).alias("pos", "qv"))
    agg = exploded.groupBy("pos").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("qv").alias("s"),
        F.sum(F.col("qv") * F.col("qv")).alias("sq"),
    )
    s = F.col("s").cast("double")
    sq = F.col("sq").cast("double")
    n = F.col("n")
    mean = s / n / F.lit(float(scale))
    var = (sq - s * s / n) / n
    std = F.sqrt(var) / F.lit(float(scale))
    return agg.select(
        F.col("pos").cast("int").alias("pos"),
        "n",
        F.round(mean, 6).alias("mean"),
        F.round(std, 6).alias("std"),
    )


def mmr_rerank_quantized(
    corpus: DataFrame,
    query_id: int = 0,
    pool: int = 8,
    picks: int = 3,
    lam_num: int = 7,
    scale: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998) in EXACT integer arithmetic — the diversity-aware
    final stage of a retrieval stack: greedily pick the candidate
    maximizing λ·rel(d,q) − (1−λ)·max_{s∈S} sim(d,s), so near-copies
    of an already-picked result stop crowding out coverage.

    Determinism scheme (the ``kmeans_quantized`` discipline): vectors
    quantize to floor(x·scale) int64s, every relevance/similarity is
    an integer dot product, and λ enters as the integer pair
    (``lam_num``, 10−``lam_num``) — scores are 10× the λ=0.7 MMR,
    order-identical, so the greedy trajectory (not just the final
    set) replays bit-for-bit in any engine; ties break on id.

    Shape at scale: the ONLY corpus-sized pass is candidate
    generation (one map-only dot product against the broadcast query
    + a top-``pool`` window); the greedy loop then runs ``picks``
    unrolled rounds on the ``pool``-row frame — pool × picks tiny
    joins, the corpus is never touched again.

    Output: (sel_rank, id, rel, max_sim, mmr) — all integers; the
    first pick carries max_sim 0 and mmr = lam_num·rel.
    """
    if not 1 <= picks <= pool:
        raise ValueError(f"need 1 <= picks <= pool, got picks={picks} pool={pool}")
    if not 0 <= lam_num <= 10:
        raise ValueError(f"lam_num is tenths of lambda in [0, 10], got {lam_num}")

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    qz = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long"),
    )
    pts = corpus.select(F.col(id_col).alias("id"), qz.alias("qv"))
    qrow = pts.filter(F.col("id") == query_id).select(F.col("qv").alias("query_v"))
    w = Window.orderBy(F.desc("rel"), F.asc("id"))
    cand = (
        pts.filter(F.col("id") != query_id)
        .crossJoin(F.broadcast(qrow))
        .select("id", "qv", _dot(F.col("qv"), F.col("query_v")).alias("rel"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= pool)
        .drop("rk")
        .localCheckpoint(eager=True)
    )
    first = (
        cand.orderBy(F.desc("rel"), F.asc("id"))
        .limit(1)
        .select(
            F.lit(1).cast("bigint").alias("sel_rank"),
            "id",
            "qv",
            "rel",
            F.lit(0).cast("bigint").alias("max_sim"),
            (F.lit(lam_num) * F.col("rel")).cast("bigint").alias("mmr"),
        )
    )
    selected = first
    for t in range(2, picks + 1):
        sel_vecs = selected.select(
            F.col("id").alias("sid"), F.col("qv").alias("sv")
        )
        scored = (
            cand.join(sel_vecs, F.col("id") != F.col("sid"))
            .groupBy("id", "qv", "rel")
            .agg(F.max(_dot(F.col("qv"), F.col("sv"))).cast("bigint").alias("max_sim"))
            # drop candidates already selected: they matched fewer
            # than t-1 distinct partners
            .join(selected.select(F.col("id").alias("done")),
                  F.col("id") == F.col("done"), "left_anti")
            .withColumn(
                "mmr",
                (F.lit(lam_num) * F.col("rel")
                 - F.lit(10 - lam_num) * F.col("max_sim")).cast("bigint"),
            )
        )
        pick = (
            scored.orderBy(F.desc("mmr"), F.asc("id"))
            .limit(1)
            .select(
                F.lit(t).cast("bigint").alias("sel_rank"),
                "id", "qv", "rel", "max_sim", "mmr",
            )
        )
        selected = selected.unionAll(pick).localCheckpoint(eager=True)
    return selected.drop("qv")


def power_iteration_quantized(
    corpus: DataFrame,
    iters: int = 2,
    scale: int = 100,
    damp: int = 1_000,
    vec_col: str = "embedding",
) -> DataFrame:
    """Leading principal direction by POWER ITERATION on the Gram
    matrix, in exact integer arithmetic end-to-end — the
    dimensionality-reduction sibling of ``kmeans_quantized``: the
    direction embeddings-QC wants ("what single axis explains this
    corpus") with a result that is bit-reproducible across runs,
    partitionings, and engines.

    Mechanics: components quantize to floor(x·scale) (|q| ≤ scale for
    unit-ish embeddings); M = Σ_rows q qᵀ is a dim² integer aggregate;
    v₀ = 1; each step is v ← M v with a fixed integer floor-division
    rescale (``damp``) between steps so bigint never overflows —
    division by a positive literal preserves the direction argmax
    exactly like the un-normalized HITS trick. Overflow budget:
    |M_ij| ≤ rows·scale², |v| after a damped step ≤ dim·|M|·|v_prev|/
    damp — two iterations stay far inside int64 for any plausible
    (rows, scale, damp) this is called with.

    Shape at scale: the Gram build is the ONLY corpus-sized work —
    an in-row pair explode (dim² fan-out per row, map-side combining
    into ≤ dim² cells; for dim ≳ 128 swap the explode for per-
    partition numpy Gram partials over mapInPandas — same exact
    integer sums, the ``kmeans_quantized`` Arrow-path rule). The
    iteration itself runs on the dim²-row M frame: per step one
    broadcast of the dim-row vector and one M-keyed aggregate —
    the corpus is never touched again.

    Output: (pos, v) — the un-normalized integer direction after
    ``iters`` damped steps, one row per dimension.
    """
    if iters < 1 or scale < 1 or damp < 1:
        raise ValueError(
            f"need iters/scale/damp >= 1, got {iters}/{scale}/{damp}"
        )
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long"),
    )
    pairs = corpus.select(q.alias("qv")).select(
        F.explode(
            F.expr(
                "flatten(transform(qv, (x, i) ->"
                " transform(qv, (y, j) -> struct(i AS i, j AS j,"
                " x * y AS p))))"
            )
        ).alias("c")
    )
    m = (
        pairs.groupBy(F.col("c.i").alias("i"), F.col("c.j").alias("j"))
        .agg(F.sum("c.p").cast("long").alias("m"))
        .localCheckpoint(eager=True)
    )
    # v0 = ones: first step is just damped row sums
    v = (
        m.groupBy(F.col("i").alias("pos"))
        .agg(F.expr(f"CAST(sum(m) DIV {int(damp)} AS BIGINT)").alias("v"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters - 1):
        v = (
            m.join(
                F.broadcast(v.select(F.col("pos").alias("j"), F.col("v").alias("vj"))),
                "j",
            )
            .groupBy(F.col("i").alias("pos"))
            .agg(
                F.expr(f"CAST(sum(m * vj) DIV {int(damp)} AS BIGINT)").alias("v")
            )
            .localCheckpoint(eager=True)
        )
    return v
