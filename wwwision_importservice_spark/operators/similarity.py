"""Similarity search over embedding columns (SURVEY §2.9 X3).

Driver-mandated extension: approximate-nearest-neighbor over an
``array<float>`` embedding column. Two strategies:

- :func:`cosine_topk` — brute-force exact top-k. The score is a pure
  Spark SQL expression (``zip_with`` dot product + ``aggregate`` fold),
  whole-stage-codegen'd, no Python. Cost is |Q|×|C| — the baseline, and
  the right answer when |Q| is small and the corpus side broadcasts.
- :func:`cosine_topk_lsh` — sign-LSH bucketing: the first ``bits``
  dimensions' signs form a bucket key (axis-aligned random-hyperplane
  LSH); candidates come only from the query's bucket, trading recall for
  a |Q|×|C|/2^bits expected candidate count. At cluster scale, bucket
  join = one shuffle on a small key; probing multiple buckets (hamming
  ≤1 neighbors) recovers recall.

Scale notes: embeddings are pre-cast to double once (element-wise
``transform``) so all engines compute identical IEEE sums; norms are
computed once per side, not per pair. For a 100 TB corpus the LSH path
shards buckets across executors and the per-bucket top-k is a partial
aggregate before the global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_scores(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vector_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """All-pairs cosine similarity (the scoring core of both strategies)."""
    q = queries.select(
        F.col(query_id),
        _as_double(F.col(vector_col)).alias("__qv"),
    ).withColumn("__qn", _norm(F.col("__qv")))
    c = corpus.select(
        F.col(corpus_id),
        _as_double(F.col(vector_col)).alias("__cv"),
    ).withColumn("__cn", _norm(F.col("__cv")))
    score = _dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
    if round_to is not None:
        score = F.round(score, round_to)
    return q.crossJoin(c).select(
        F.col(query_id), F.col(corpus_id), score.alias("score")
    )


def topk(
    scored: DataFrame,
    k: int,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
) -> DataFrame:
    """Deterministic top-k per query (score desc, id asc tiebreak)."""
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vector_col: str = "embedding",
    broadcast_corpus: bool = False,
) -> DataFrame:
    """Brute-force exact cosine top-k (the baseline)."""
    c = F.broadcast(corpus) if broadcast_corpus else corpus
    scored = cosine_scores(queries, c, query_id, corpus_id, vector_col)
    return topk(scored, k, query_id, corpus_id)


def sign_bucket(vector_col: Column, bits: int = 8) -> Column:
    """Axis-aligned sign-LSH bucket: bit i = (v[i] > 0), over the first
    ``bits`` dimensions — a fixed, portable hyperplane family."""
    bucket = F.lit(0)
    for i in range(bits):
        bucket = bucket + F.when(
            F.element_at(vector_col, i + 1) > 0, F.lit(2**i)
        ).otherwise(F.lit(0))
    return bucket.cast("int")


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vector_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """ANN top-k: candidates restricted to the query's sign-LSH bucket.

    Recall < 1 by construction (near neighbors can land across a
    hyperplane); the exact :func:`cosine_topk` is the ground truth."""
    q = queries.withColumn("__bkt", sign_bucket(F.col(vector_col), bits))
    c = corpus.withColumn("__bkt", sign_bucket(F.col(vector_col), bits))
    qd = q.select(
        query_id,
        "__bkt",
        _as_double(F.col(vector_col)).alias("__qv"),
    ).withColumn("__qn", _norm(F.col("__qv")))
    cd = c.select(
        corpus_id,
        "__bkt",
        _as_double(F.col(vector_col)).alias("__cv"),
    ).withColumn("__cn", _norm(F.col("__cv")))
    score = F.round(
        _dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")), 6
    )
    scored = qd.join(cd, "__bkt").select(
        F.col(query_id), F.col(corpus_id), score.alias("score")
    )
    return topk(scored, k, query_id, corpus_id)
