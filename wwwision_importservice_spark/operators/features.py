"""Text → vector-space featurization (the hashing trick) and sketch
rollups — the bridge between the text operators and the embedding
operators.

No reference counterpart (the PHP reference has no text surface, SURVEY
§1.4). Feature hashing (Weinberger et al. 2009, "Feature Hashing for
Large Scale Multitask Learning") is the distributed-native featurizer:
no vocabulary table to build, broadcast, or keep consistent across
epochs — the feature index IS a hash of the token, so a 100 TB corpus
featurizes in one narrow pass and two runs never disagree.

Exactness design (registry conventions):

- the bucket hash is the repo-wide md5-prefix family
  (``conv(substr(md5(tok),1,15),16,10) % n``) — replicable bit-exactly
  in DuckDB, Python, and Spark;
- term frequencies are exact LONGs;
- the only float op in the l2 form is ``tf / sqrt(Σ tf²)`` — a
  correctly-rounded IEEE division and square root **of exact
  integers**, so engines agree bit-for-bit before the final 6dp round
  (no accumulation-order exposure anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


from wwwision_importservice_spark.operators.text import (
    corpus_tokens as _tokens,
)


def _bucket(tok, n_features: int):
    """Feature index: the repo-wide md5-prefix long
    (dedup._md5_long — one definition of the hash family), mod n."""
    from wwwision_importservice_spark.operators.dedup import _md5_long

    return F.pmod(_md5_long(tok), F.lit(n_features))


def hashed_tf(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n_features: int = 64,
) -> DataFrame:
    """Sparse hashed term frequencies: one row per (doc, bucket) with
    ``tf`` (LONG, exact) and ``l2_tf`` (tf / √Σtf² over the doc,
    rounded 6dp) — the relational face of the hashing trick. One
    explode + one hash aggregate + one per-doc window for the norm; no
    vocabulary state."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("__t")
    )
    tf = toks.groupBy(
        id_col, _bucket(F.col("__t"), n_features).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("tf"))
    w = Window.partitionBy(id_col)
    return tf.select(
        F.col(id_col),
        "bucket",
        "tf",
        F.round(
            F.col("tf")
            / F.sqrt(F.sum(F.col("tf") * F.col("tf")).over(w)),
            6,
        ).alias("l2_tf"),
    )


def hashing_tf_vectors(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n_features: int = 64,
    l2: bool = True,
) -> DataFrame:
    """Dense hashed-TF vectors ``(id, embedding: array<double>)`` —
    drop-in input for every embedding operator (cosine top-k, sign-LSH,
    IVF, semantic dedup), closing the text→vector loop without any
    external model. Built from :func:`hashed_tf` by folding the sparse
    rows into a map and reading it out along ``sequence(0, n-1)`` —
    densification cost is O(n_features) per doc, after the aggregate."""
    value = F.col("l2_tf") if l2 else F.col("tf").cast("double")
    sparse = hashed_tf(df, id_col, text_col, n_features).select(
        F.col(id_col), F.col("bucket"), value.alias("__v")
    )
    return (
        sparse.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "__v"))
            ).alias("__m")
        )
        .select(
            F.col(id_col),
            F.transform(
                F.sequence(F.lit(0), F.lit(n_features - 1)),
                lambda i: F.coalesce(F.element_at("__m", i), F.lit(0.0)),
            ).alias("embedding"),
        )
    )


def distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    Spark's ``hll_sketch_agg``): one binary sketch per group. The
    sketch-table pattern for 100 TB corpus accounting — build per
    source/day/shard ONCE (map-side combinable aggregate), then answer
    any union's cardinality later by merging sketches
    (:func:`merge_sketch_estimates`) without rescanning the corpus.
    Estimate error is the standard HLL ±~1.04/√2^lg_k (≈1.6% at the
    default lg_k=12)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_sketch_estimates(
    sketches: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Roll sketches up to a coarser grouping (possibly empty = corpus
    total) and emit the distinct-count estimate — merging binaries, not
    rescanning data. ``hll_union_agg(allowDifferentLgConfigK=True)``
    accepts mixed-precision inputs (merges degrade to the smallest
    lg_k, the DataSketches rule)."""
    agg = F.hll_sketch_estimate(
        F.hll_union_agg(F.col("sketch"), F.lit(True))
    ).alias("distinct_estimate")
    if group_cols:
        return sketches.groupBy(*group_cols).agg(
            agg, F.sum("n_rows").alias("n_rows")
        )
    return sketches.agg(agg, F.sum("n_rows").alias("n_rows"))


def approx_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: list[float],
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate percentiles — the 100 TB form of the exact
    ``a3_quantiles`` rollup (whose docstring promises exactly this
    swap): ``percentile_approx`` runs on a Greenwald-Khanna-style
    mergeable summary, so the aggregate stays one partial/final pass
    with bounded state per group (O(accuracy · log n)), where exact
    ``percentile`` must materialize and sort every group's values.

    ``accuracy`` bounds the RANK error: a returned value's rank is
    within ``n / accuracy`` of the target rank (the Spark contract) —
    the value-space error the tolerance test derives from that is
    data-dependent. Emits one row per group with a ``q_<pct>`` column
    per requested quantile, plus ``n_rows``.
    """
    aggs = [
        F.percentile_approx(
            F.col(value_col), F.lit(float(q)), F.lit(int(accuracy))
        ).alias(f"q_{str(q).replace('.', '_')}")
        for q in quantiles
    ]
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)
