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
    group_cols: list[str] | None = None,
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

    ``group_cols`` switches to PER-GROUP heads (per-language /
    per-domain token heads — the curation form): every group keeps its
    own ``counters``-bounded summary and its own guarantee with
    ``err_bound = floor(n_group / (counters + 1))``; the result is the
    per-group top-``k`` via a ranking window (plans as
    WindowGroupLimit: map tasks pre-limit before the shuffle).
    Executor memory is counters × live-groups-per-partition — for
    high-cardinality grouping keys, pre-partition the input by group so
    each task sees few groups. Items are compared AS STRINGS (summaries
    cast to string for a stable cross-type schema) in both forms.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    counters = int(counters) if counters is not None else 8 * k
    if counters < k:
        raise ValueError(f"counters ({counters}) must be >= k ({k})")
    groups = list(group_cols or [])

    import pandas as pd

    gschema = "".join(f"`{g}` string, " for g in groups)
    out_schema = f"{gschema}`{item_col}` string, _cnt long, _pid int, _part_rows long"
    cap = counters
    levels = list(range(len(groups) + 1))

    key_cols = groups + [item_col]

    def summarize(batches):
        # mg: running summary DataFrame (group..., item, c); n: per-group
        # row totals (Series over group tuples; a 1-entry scalar Series
        # for the global form)
        mg = pd.DataFrame(columns=key_cols + ["c"])
        n_global = 0
        n = pd.Series(dtype="int64")
        pid = None
        for pdf in batches:
            if pid is None and len(pdf):
                pid = int(pdf["_pid"].iloc[0])
            pdf = pdf.dropna(subset=[item_col])
            if not len(pdf):
                continue
            keyed = pdf[key_cols].astype(str)
            vc = keyed.groupby(key_cols, sort=False).size().rename("c").reset_index()
            if groups:
                gn = keyed.groupby(groups, sort=False).size()
                n = pd.concat([n, gn]).groupby(level=levels[:-1]).sum()
            else:
                n_global += len(keyed)
            mg = (
                pd.concat([mg, vc])
                .groupby(key_cols, sort=False)["c"]
                .sum()
                .reset_index()
            )
            # the first concat with the empty seed frame yields object
            # dtype; nlargest/arithmetic below need a real integer
            mg["c"] = mg["c"].astype("int64")
            # Misra-Gries decrement, vectorized across ALL overflowing
            # groups at once: per-group threshold = the (cap+1)-th
            # largest count (absent → group under cap, no decrement)
            if len(mg) > cap:
                if groups:
                    rank = mg.groupby(groups, sort=False)["c"].rank(
                        method="first", ascending=False
                    )
                    th = mg.loc[rank == cap + 1, groups + ["c"]].rename(
                        columns={"c": "_th"}
                    )
                    if len(th):
                        mg = mg.merge(th, on=groups, how="left")
                        mg["c"] -= mg["_th"].fillna(0).astype("int64")
                        mg = mg.loc[mg["c"] > 0, key_cols + ["c"]]
                else:
                    thresh = int(mg["c"].nlargest(cap + 1).iloc[-1])
                    mg = mg.loc[mg["c"] > thresh, key_cols + ["c"]]
                    mg["c"] -= thresh
        if pid is None:
            return
        out = {c: mg[c].astype(str) for c in key_cols}
        if groups:
            part_rows = (
                n.reindex(pd.MultiIndex.from_frame(mg[groups]))
                if len(groups) > 1
                else n.reindex(mg[groups[0]])
            ).values.astype("int64")
        else:
            part_rows = n_global
        out["_cnt"] = mg["c"].astype("int64").values
        out["_pid"] = pid
        out["_part_rows"] = part_rows
        yield pd.DataFrame(out)

    summaries = (
        df.select(*groups, F.col(item_col), F.spark_partition_id().alias("_pid"))
        .mapInPandas(summarize, schema=out_schema)
    )
    # one row per (partition, group) → per-group N; tiny frame
    totals = (
        summaries.select(*groups, "_pid", "_part_rows")
        .distinct()
        .groupBy(*groups)
        .agg(F.coalesce(F.sum("_part_rows"), F.lit(0)).alias("n_total"))
        if groups
        else summaries.select("_pid", "_part_rows")
        .distinct()
        .agg(F.coalesce(F.sum("_part_rows"), F.lit(0)).alias("n_total"))
    )
    merged = summaries.groupBy(*groups, item_col).agg(
        F.sum("_cnt").alias("est_count")
    )
    if groups:
        from pyspark.sql import Window

        w = Window.partitionBy(*groups).orderBy(
            F.col("est_count").desc(), F.col(item_col).asc()
        )
        return (
            merged.join(totals, on=groups)
            .withColumn(
                "err_bound", F.expr(f"n_total DIV {counters + 1}").cast("long")
            )
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select(*groups, item_col, "est_count", "err_bound", "n_total")
        )
    return (
        merged.crossJoin(F.broadcast(totals))
        .withColumn(
            "err_bound", F.expr(f"n_total DIV {counters + 1}").cast("long")
        )
        .orderBy(F.col("est_count").desc(), F.col(item_col).asc())
        .limit(k)
        .select(item_col, "est_count", "err_bound", "n_total")
    )
