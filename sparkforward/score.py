"""Fast-Forward scoring: vector gather-join, dot products, mode aggregation,
interpolation and early stopping.

Reference semantics re-expressed as one lazy DataFrame DAG
(``index/base.py:279-387``):

1. candidates ``(q_id, id)``  ⋈  broadcast query vectors (by q_id),
2. equi-join the index table keyed by the mode's lookup ID — the distributed
   replacement of the ``doc_id -> [idx]`` hash-map gather (S3 in SURVEY §2),
3. dot products JVM-side (``zip_with`` + sequential ``aggregate`` fold in
   float64 — deterministic order, whole-stage codegen, no Python),
4. mode aggregation ``groupBy(q_id, id).agg(max|avg|first)``
   (``index/base.py:306-312``),
5. score-column replacement (``index/base.py:461``): the output Ranking's
   score IS the dense score; interpolation stays a separate explicit step.

Missing IDs raise ``IndexError`` like the reference (``index/util.py:38-39``)
via a cheap left-anti-join probe (optional at scale).

Early stopping (``index/base.py:316-387``) is inherently iterative: a driver
loop over depth slices issuing <= len(depths) Spark jobs, pruning surviving
queries with a broadcast set. See :func:`early_stopping_scores`.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping, Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkforward.index import Mode, VectorIndex
from sparkforward.ranking import Ranking, add_ranks


def dot_expr(a: str, b: str):
    """float64 dot product of two array<float> columns, JVM-side.

    ``aggregate`` folds sequentially in element order — deterministic
    regardless of partitioning (unlike a shuffle-order float sum).
    """
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _query_vectors_df(
    spark: SparkSession,
    ranking: Ranking,
    encoder=None,
    query_vectors: DataFrame | Mapping[str, Sequence[float]] | None = None,
) -> DataFrame:
    """(q_id, q_vector) — encode distinct queries or accept precomputed."""
    if query_vectors is not None:
        if isinstance(query_vectors, Mapping):
            rows = [(q, [float(x) for x in v]) for q, v in query_vectors.items()]
            schema = T.StructType(
                [
                    T.StructField("q_id", T.StringType()),
                    T.StructField("q_vector", T.ArrayType(T.FloatType())),
                ]
            )
            return spark.createDataFrame(rows, schema)
        return query_vectors.select("q_id", "q_vector")
    if encoder is None:
        raise ValueError("Either an encoder or precomputed query_vectors is required.")
    if not ranking.has_queries:
        raise ValueError("Input ranking has no queries attached.")
    # dedup before encoding — the reference's duplicate-work avoidance
    # (index/base.py:417-421); query sets are small: encode on the driver.
    pairs = (
        ranking.df.select("q_id", "query").dropDuplicates(["q_id"]).collect()
    )
    vecs = encoder([r["query"] for r in pairs])
    rows = [
        (r["q_id"], [float(x) for x in np.asarray(v, dtype=np.float32)])
        for r, v in zip(pairs, vecs)
    ]
    schema = T.StructType(
        [
            T.StructField("q_id", T.StringType()),
            T.StructField("q_vector", T.ArrayType(T.FloatType())),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _check_missing_ids(candidates: DataFrame, id_vectors: DataFrame) -> None:
    """Raise IndexError when a candidate ID is absent (ref index/util.py:38-39)."""
    missing = (
        candidates.select("id")
        .distinct()
        .join(id_vectors.select("id").distinct(), "id", "left_anti")
        .limit(1)
        .collect()
    )
    if missing:
        raise IndexError(f"ID {missing[0]['id']} not found in the index.")


def compute_scores(
    candidates: DataFrame,
    index: VectorIndex,
    qvec_df: DataFrame,
    mode: Mode | None = None,
    check_missing: bool = True,
) -> DataFrame:
    """(q_id, id, ff_score) for every candidate pair.

    The gather-join keys on the mode's lookup ID; MAXP/AVEP fan out to all
    passages of a doc, FIRSTP to the first-inserted one, PASSAGE to the
    unique passage vector (ref index/util.py:30-36, base.py:306-312).
    """
    mode = mode or index.mode
    id_vectors = index.vectors_for_mode(mode)
    if check_missing:
        _check_missing_ids(candidates, id_vectors)
    joined = (
        candidates.select("q_id", "id")
        .join(id_vectors, "id")
        .join(F.broadcast(qvec_df), "q_id")
        .withColumn("_dot", dot_expr("q_vector", "vector"))
    )
    if mode == Mode.MAXP:
        agg = F.max("_dot")
    elif mode == Mode.AVEP:
        agg = F.avg("_dot")
    else:  # FIRSTP / PASSAGE: exactly one vector per id after the view filter
        agg = F.first("_dot")
    return joined.groupBy("q_id", "id").agg(agg.cast("float").alias("ff_score"))


def ff_score(
    ranking: Ranking,
    index: VectorIndex,
    encoder=None,
    query_vectors=None,
    mode: Mode | None = None,
    check_missing: bool = True,
    batch_size: int | None = None,  # noqa: ARG001 — see docstring
) -> Ranking:
    """``Index.__call__`` equivalent (index/base.py:389-469): score a ranking.

    Returns a Ranking whose ``score`` IS the dense score (name
    "fast-forward"); the sparse score is retained as column ``score_sparse``
    for interpolation.

    ``batch_size`` (reference index/base.py:445-459) exists only to bound
    the reference's single-process peak memory; here partitioning IS the
    batching (results are batch-size-invariant by construction — the
    reference pins that invariance in tests/test_index.py:335-349, and our
    partitioning-invariance tests pin the distributed analogue). Accepted
    for API parity; per-UDF batch memory is governed by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``.
    """
    spark = SparkSession.getActiveSession()
    qvec_df = _query_vectors_df(spark, ranking, encoder, query_vectors)
    scores = compute_scores(
        ranking.df, index, qvec_df, mode=mode, check_missing=check_missing
    )
    out = (
        ranking.df.withColumnRenamed("score", "score_sparse")
        .join(scores, ["q_id", "id"])
        .withColumn("score", F.col("ff_score").cast("float"))
        .drop("ff_score")
    )
    return Ranking(out.select(*(
        ["q_id", "id", "score"]
        + (["query"] if "query" in out.columns else [])
    )), name="fast-forward")


def interpolated_rerank(
    sparse: Ranking,
    index: VectorIndex,
    alpha: float,
    encoder=None,
    query_vectors=None,
    mode: Mode | None = None,
    k: int | None = None,
) -> Ranking:
    """The flagship pipeline: ``alpha*sparse + (1-alpha)*dense`` re-ranking.

    Equivalent of ``bm25 % N >> FFScore(idx) >> FFInterpolate(alpha)``
    (docs/pyterrier.md:10, util/pyterrier.py:26-83), fused into one DAG so
    the candidate join happens once.
    """
    dense = ff_score(
        sparse, index, encoder=encoder, query_vectors=query_vectors, mode=mode,
        check_missing=False,
    )
    out = sparse.interpolate(dense, alpha)
    return out.cut(k) if k is not None else out


def early_stopping_scores(
    ranking: Ranking,
    index: VectorIndex,
    cutoff: int,
    alpha: float,
    depths: Iterable[int],
    encoder=None,
    query_vectors=None,
    mode: Mode | None = None,
) -> Ranking:
    """Iterative-deepening top-k with pruning. Ref: index/base.py:316-387.

    Per sorted depth ``b`` (< cutoff skipped, base.py:341): score the rank
    slice ``(a, b]`` for surviving queries, accumulate, then keep only
    queries whose k-th best interpolated score is still below
    ``alpha * (sparse score at current depth) + (1-alpha) * max ff so far``
    (the criterion at base.py:350-358; the "score at current depth" is the
    minimum sparse score scored so far since the frame is rank-ordered).

    Driver loop = len(depths) Spark jobs; surviving q_ids travel as a
    broadcast isin filter. Returns only the scored prefix rows per query,
    score column = ff_score (matching the reference's output exactly —
    tests pin the golden 20-row result of tests/test_index.py:273-333).
    """
    spark = SparkSession.getActiveSession()
    qvec_df = _query_vectors_df(spark, ranking, encoder, query_vectors)

    # precompute the per-query rank once (score desc, id asc — see ranking.py)
    ranked = add_ranks(ranking.df).cache()
    mode = mode or index.mode

    accumulated: DataFrame | None = None
    a = 0
    for b in sorted(set(int(d) for d in depths)):
        if b < cutoff:
            continue
        if a == 0:
            surviving = None  # all queries
        else:
            w = Window.partitionBy("q_id").orderBy(F.desc("int_score"))
            stats = (
                accumulated.withColumn("_rn", F.row_number().over(w))
                .groupBy("q_id")
                .agg(
                    F.min(F.when(F.col("_rn") <= cutoff, F.col("int_score"))).alias(
                        "kth_best"
                    ),
                    F.max("ff_score").alias("max_ff"),
                    F.min("score").alias("last_sparse"),
                )
            )
            surviving = [
                r["q_id"]
                for r in stats.filter(
                    F.col("kth_best")
                    < alpha * F.col("last_sparse") + (1.0 - alpha) * F.col("max_ff")
                )
                .select("q_id")
                .collect()
            ]
            if not surviving:
                break
        chunk = ranked.filter((F.col("rank") > a) & (F.col("rank") <= b))
        if surviving is not None:
            chunk = chunk.filter(F.col("q_id").isin(surviving))
        ff = compute_scores(chunk, index, qvec_df, mode=mode, check_missing=False)
        chunk_scores = (
            chunk.join(ff, ["q_id", "id"])
            .withColumn(
                "int_score",
                alpha * F.col("score") + (1.0 - alpha) * F.col("ff_score"),
            )
        )
        # one job materializes the slice; the emptiness check reads the
        # checkpointed result instead of running a separate probe job
        chunk_scores = chunk_scores.localCheckpoint(eager=True)
        if chunk_scores.count() == 0:
            break
        accumulated = (
            chunk_scores
            if accumulated is None
            else accumulated.unionByName(chunk_scores)
        )
        a = b

    if accumulated is None:
        return Ranking(
            ranking.df.select("q_id", "id", "score").limit(0), name="fast-forward"
        )
    out = accumulated.select(
        "q_id", "id", F.col("ff_score").cast("float").alias("score")
    )
    return Ranking(out, name="fast-forward")
