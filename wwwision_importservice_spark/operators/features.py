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


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    k: int = 50,
    counters: int | None = None,
) -> DataFrame:
    """Approximate frequent items (Misra-Gries / mergeable-summaries
    form) — the third mergeable sketch next to HLL distinct counts and
    the GK quantile rollup: corpus-wide token/domain/url heads WITHOUT
    shuffling the full item-count table.

    Each partition keeps at most ``counters`` (default ``8*k``) local
    counters: Arrow batches are counted vectorized (``value_counts``),
    folded into the running summary, and when the summary overflows the
    classic Misra-Gries decrement subtracts the (counters+1)-th largest
    count from everything and drops the non-positive — bounded memory
    no matter the partition's cardinality. Partition summaries (≤
    counters rows each) are the ONLY thing shuffled; summing them keeps
    the one-sided guarantee

        est_count ≤ true_count ≤ est_count + err_bound,
        err_bound = floor(N / (counters + 1))

    (each partition's total decrement is ≤ n_p/(counters+1); the bounds
    add across partitions — Agarwal et al. 2013, "Mergeable
    Summaries"). When ``counters`` exceeds the true cardinality no
    decrement ever fires and the sketch degenerates to EXACT counts —
    the registry query pins the plumbing that way, the unit test
    exercises real truncation on a wide-vocabulary corpus.

    Returns AT MOST ``k`` items by estimated count (ties broken by item
    value, deterministic): ``(item, est_count, err_bound, n_total)`` —
    fewer when the decrement evicts everything else (e.g. a heads-plus-
    singleton-tail distribution legitimately leaves only the heads).
    The final top-k pass moves ≤ partitions × counters summary rows —
    at 1000 executors × 8k counters that is megabytes, independent of
    corpus size.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    counters = int(counters) if counters is not None else 8 * k
    if counters < k:
        raise ValueError(f"counters ({counters}) must be >= k ({k})")

    import pandas as pd

    out_schema = f"`{item_col}` string, _cnt long, _pid int, _part_rows long"
    cap = counters

    def summarize(batches):
        mg = pd.Series(dtype="int64")
        n = 0
        pid = None
        for pdf in batches:
            if pid is None and len(pdf):
                pid = int(pdf["_pid"].iloc[0])
            vc = pdf[item_col].dropna().astype(str).value_counts()
            n += int(vc.sum())
            mg = pd.concat([mg, vc]).groupby(level=0).sum()
            if len(mg) > cap:
                # Misra-Gries decrement: one subtraction bounded by
                # n_batch/(cap+1) per overflow, vectorized
                thresh = int(mg.nlargest(cap + 1).iloc[-1])
                mg = mg[mg > thresh] - thresh
        if pid is None:
            return
        yield pd.DataFrame(
            {
                item_col: mg.index.astype(str),
                "_cnt": mg.values.astype("int64"),
                "_pid": pid,
                "_part_rows": n,
            }
        )

    summaries = (
        df.select(F.col(item_col), F.spark_partition_id().alias("_pid"))
        .mapInPandas(summarize, schema=out_schema)
    )
    # one row per partition → N; tiny frame (≤ #partitions rows)
    totals = (
        summaries.select("_pid", "_part_rows")
        .distinct()
        .agg(F.coalesce(F.sum("_part_rows"), F.lit(0)).alias("n_total"))
    )
    merged = summaries.groupBy(item_col).agg(F.sum("_cnt").alias("est_count"))
    return (
        merged.crossJoin(F.broadcast(totals))
        .withColumn(
            "err_bound", F.expr(f"n_total DIV {counters + 1}").cast("long")
        )
        .orderBy(F.col("est_count").desc(), F.col(item_col).asc())
        .limit(k)
        .select(item_col, "est_count", "err_bound", "n_total")
    )
