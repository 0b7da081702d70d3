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
    densification cost is O(n_features) per doc, after the aggregate.

    Contract note (r11 review): a document with ZERO tokens (empty /
    whitespace / NULL text) emits NO row — it has no hashed_tf rows to
    fold, so downstream id-joins exclude it from scoring and dedup
    decisions rather than seeing an all-zeros vector. Filter empty
    docs out explicitly (the quality gate already does) or union a
    zero-vector frame if every id must appear."""
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
    default lg_k=12). Rows with NULL group values are excluded — the
    same contract as the MG and MRL builders, so the three families a
    :class:`sketchstore.SketchStoreSpec` feeds from one input always
    agree on the group set (coalesce first to keep a null group)."""
    for g in group_cols:
        df = df.filter(F.col(g).isNotNull())
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
    cast to string for a stable cross-type schema) in both forms; rows
    with NULL group values are excluded (coalesce first to keep them).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    counters = int(counters) if counters is not None else 8 * k
    if counters < k:
        raise ValueError(f"counters ({counters}) must be >= k ({k})")
    groups = list(group_cols or [])

    # lineage barrier (r11 review catch): `totals` and `merged` both
    # re-derive from this frame under DIFFERENT exchanges, so without a
    # cut the corpus-wide mapInPandas fold — the operator's entire cost
    # — executes twice per action. The summary is partitions×counters
    # rows, pennies to checkpoint.
    summaries = _mg_partition_summaries(
        df, item_col, groups, counters
    ).localCheckpoint(eager=False)
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
    # carrier rows (item NULL) exist only to keep per-group N exact in
    # `totals` when a partition's every counter decremented away; they
    # are not items
    merged = (
        summaries.filter(F.col(item_col).isNotNull())
        .groupBy(*groups, item_col)
        .agg(F.sum("_cnt").alias("est_count"))
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


def _mg_partition_summaries(
    df: DataFrame, item_col: str, groups: list[str], cap: int
) -> DataFrame:
    """Stage 1 of every Misra-Gries path: fold each partition into a
    ≤ cap-per-group counter summary via ``mapInPandas`` (narrow, no
    shuffle). Output rows ``(group..., item, _cnt, _pid, _part_rows)``
    where ``_part_rows`` is the partition's per-group non-null row
    count (constant per (partition, group) — summed over distinct
    ``_pid`` downstream to recover exact N). Every (partition, group)
    additionally emits ONE carrier row (``item`` NULL, ``_cnt`` 0):
    when a flood of distinct items decrements a group's every counter
    away, the group would otherwise vanish from the summary and its N
    with it — silently shrinking downstream err_bounds (found by the
    hypothesis merge property test). Shared by :func:`heavy_hitters`
    (top-k form) and :func:`heavy_hitter_summary` (persistable
    form)."""
    import pandas as pd

    gschema = "".join(f"`{g}` string, " for g in groups)
    out_schema = (
        f"{gschema}`{item_col}` string, _cnt long, _pid int, _part_rows long"
    )
    key_cols = groups + [item_col]

    def summarize(batches):
        # mg: running summary DataFrame (group..., item, c); n: per-group
        # row totals (Series indexed by group value / MultiIndex tuple —
        # index-aligned .add keeps the MultiIndex intact, where a
        # concat-with-empty-seed would collapse it to flat tuples and
        # crash the level groupby on 2+ group columns)
        mg = pd.DataFrame(columns=key_cols + ["c"])
        n_global = 0
        n = None
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
                n = gn if n is None else n.add(gn, fill_value=0).astype("int64")
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
        if groups:
            if n is None:
                # rows existed but every item was null: nothing counted,
                # nothing to carry (n would be 0 for every group)
                return
            gtot = n.rename("_part_rows").reset_index()
            gtot.columns = groups + ["_part_rows"]
            parts = []
            if len(mg):
                m = mg.merge(gtot, on=groups, how="left").rename(
                    columns={"c": "_cnt"}
                )
                parts.append(m[key_cols + ["_cnt", "_part_rows"]])
            carrier = gtot.copy()
            carrier[item_col] = None
            carrier["_cnt"] = 0
            parts.append(carrier[key_cols + ["_cnt", "_part_rows"]])
            out = pd.concat(parts, ignore_index=True)
        else:
            out = mg.rename(columns={"c": "_cnt"}).copy()
            out["_part_rows"] = n_global
            out = pd.concat(
                [
                    out,
                    pd.DataFrame(
                        {item_col: [None], "_cnt": [0],
                         "_part_rows": [n_global]}
                    ),
                ],
                ignore_index=True,
            )
        out["_cnt"] = out["_cnt"].astype("int64")
        out["_part_rows"] = out["_part_rows"].astype("int64")
        out["_pid"] = pid
        yield out[key_cols + ["_cnt", "_pid", "_part_rows"]]

    src = df.select(
        *groups, F.col(item_col), F.spark_partition_id().alias("_pid")
    )
    # NULL group values are EXCLUDED, not stringified: pandas astype(str)
    # would silently relabel them 'None'/'nan' and merge them with
    # genuine such strings; callers who want a null group coalesce first
    for g in groups:
        src = src.filter(F.col(g).isNotNull())
    return src.mapInPandas(summarize, schema=out_schema)


# --------------------------------------------------------------------------- #
# Persistable quantile sketches (deterministic MRL/KLL-style compactors)
# --------------------------------------------------------------------------- #

def _make_mrl_collapse():
    """Factory for the deterministic compactor chain (the
    Manku-Rajagopalan-Lindsay 1998 collapse rule in KLL's level-buffer
    layout, Karnin/Lang/Liberty 2016 — public literature; no
    randomness, so two engines and two runs agree bit-for-bit).
    Returned as a NESTED function so cloudpickle ships it BY VALUE
    into executor closures — a module-level reference would require
    the package on every worker's import path (repo closure
    convention; cf. ``packing.py:pack``).

    Items at ``level`` L carry weight 2^L. Whenever a level holds ≥ k
    items: sort, retain the last item if the count is odd, promote
    every other item of the even body (offset = level parity — the
    deterministic stand-in for KLL's coin flip) to L+1. One collapse
    of a weight-w buffer moves any rank by ≤ w, so total rank error ≤
    Σ_L w_L · collapses(L) ≤ n·ceil(log2(n/k))/k — the deterministic
    bound the differential test pins. Total weight is EXACTLY
    preserved (promoted items double, the odd leftover stays), so
    Σ 2^level over the sketch equals the true row count."""

    def collapse(values, levels, k: int):
        import numpy as np

        buf = {}
        empty = np.empty(0, dtype="float64")
        for lv in np.unique(levels):
            buf[int(lv)] = values[levels == lv]
        lv = 0
        max_lv = max(buf, default=0)
        while lv <= max_lv:
            arr = buf.get(lv, empty)
            if len(arr) >= k:
                arr = np.sort(arr, kind="stable")
                keep = len(arr) % 2
                body = arr[: len(arr) - keep]
                buf[lv] = arr[len(arr) - keep:]
                buf[lv + 1] = np.concatenate(
                    [buf.get(lv + 1, empty), body[(lv % 2)::2]]
                )
                max_lv = max(max_lv, lv + 1)
            lv += 1
        out_v = [a for a in (buf.get(L, empty) for L in sorted(buf)) if len(a)]
        out_l = [
            np.full(len(buf[L]), L, dtype="int32")
            for L in sorted(buf)
            if len(buf[L])
        ]
        if not out_v:
            return empty, np.empty(0, dtype="int32")
        return np.concatenate(out_v), np.concatenate(out_l)

    return collapse


#: driver-side handle (tests, driver-only callers)
_mrl_collapse = _make_mrl_collapse()


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """Build a PERSISTABLE, re-mergeable quantile summary — the fourth
    mergeable sketch next to HLL distinct counts
    (:func:`distinct_sketches`), Misra-Gries heads
    (:func:`heavy_hitters`) and :func:`approx_quantiles`'s in-query
    GK summary. Where ``percentile_approx`` answers ONE query over
    data it must rescan, this emits the summary itself as rows —
    ``(group..., level int, value double)``, each row standing for
    2^level original rows — so per-shard/per-day sketches can be
    written to parquet once and any union answered later by
    :func:`merge_quantile_sketches` + :func:`sketch_quantile_values`
    without touching the corpus again (the sketch-table pattern).

    Two-stage plan: a narrow ``mapInPandas`` folds each partition into
    a ≤ k·levels partial (no shuffle), then one ``applyInPandas``
    collapse per group merges partials — the shuffle moves only
    partitions × k·levels summary rows per group, never data rows.
    With n_group ≤ k the sketch IS the data at level 0 (exact —
    the oracle mode); compaction determinism and the rank-error bound
    are documented at :func:`_mrl_collapse`. NULL values are dropped
    (Σ 2^level counts non-null rows — exact, pinned by test).
    """
    if k < 2 or k % 2:
        raise ValueError(f"k must be an even integer >= 2, got {k}")
    groups = list(group_cols or [])

    import numpy as np
    import pandas as pd

    gschema = "".join(f"`{g}` string, " for g in groups)
    out_schema = f"{gschema}level int, value double"
    # nested function: ships by value, workers need no package import
    collapse = _make_mrl_collapse()

    def partials(batches):
        state: dict[tuple, list] = {}
        for pdf in batches:
            vals = pd.to_numeric(pdf[value_col], errors="raise")
            mask = vals.notna()
            if not mask.any():
                continue
            if groups:
                keys = pdf.loc[mask, groups].astype(str)
                vs = vals[mask].astype("float64")
                for key, idx in keys.groupby(groups, sort=False).groups.items():
                    kt = key if isinstance(key, tuple) else (key,)
                    st = state.setdefault(kt, [empty_v(), empty_l()])
                    st[0] = np.concatenate([st[0], vs.loc[idx].values])
                    st[1] = np.concatenate(
                        [st[1], np.zeros(len(idx), dtype="int32")]
                    )
                    if len(st[0]) >= 4 * k:
                        st[0], st[1] = collapse(st[0], st[1], k)
            else:
                st = state.setdefault((), [empty_v(), empty_l()])
                st[0] = np.concatenate(
                    [st[0], vals[mask].astype("float64").values]
                )
                st[1] = np.concatenate(
                    [st[1], np.zeros(int(mask.sum()), dtype="int32")]
                )
                if len(st[0]) >= 4 * k:
                    st[0], st[1] = collapse(st[0], st[1], k)
        for kt, (vs, ls) in state.items():
            vs, ls = collapse(vs, ls, k)
            out = {g: np.full(len(vs), kv) for g, kv in zip(groups, kt)}
            out["level"] = ls
            out["value"] = vs
            yield pd.DataFrame(out)

    def empty_v():
        return np.empty(0, dtype="float64")

    def empty_l():
        return np.empty(0, dtype="int32")

    part = df.select(*groups, F.col(value_col).cast("double").alias(value_col))
    # NULL group values are EXCLUDED (same contract and reason as
    # _mg_partition_summaries: astype(str) would mislabel them 'None')
    for g in groups:
        part = part.filter(F.col(g).isNotNull())
    part = part.mapInPandas(partials, schema=out_schema)
    return merge_quantile_sketches(part, group_cols=groups, k=k)


def merge_quantile_sketches(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """Fold a union of sketch frames (same schema, possibly many
    appends of :func:`quantile_sketch` output read back from parquet)
    into one ≤ k·levels summary per group: concatenate level buffers,
    re-run the deterministic collapse. Mergeability is by
    construction — the compactor never cares where a level's items
    came from. One ``applyInPandas`` shuffle of summary rows only."""
    if k < 2 or k % 2:
        raise ValueError(f"k must be an even integer >= 2, got {k}")
    groups = list(group_cols or [])

    import pandas as pd

    gschema = "".join(f"`{g}` string, " for g in groups)
    out_schema = f"{gschema}level int, value double"

    collapse = _make_mrl_collapse()

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        vs, ls = collapse(
            pdf["value"].values.astype("float64"),
            pdf["level"].values.astype("int32"),
            k,
        )
        out = {
            g: pdf[g].iloc[:1].repeat(len(vs)).reset_index(drop=True)
            for g in groups
        }
        out["level"] = ls
        out["value"] = vs
        return pd.DataFrame(out)

    grouped = sketches.groupBy(*groups) if groups else sketches.groupBy()
    return grouped.applyInPandas(fold, schema=out_schema)


def sketch_quantile_values(
    sketches: DataFrame,
    quantiles: list[float],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Answer quantile queries from a sketch frame — PURE Spark SQL, no
    Python: weighted rank over the (level, value) rows where a row
    counts 2^level originals. Returns per group the smallest value
    whose cumulative weight reaches ceil(q·W) as ``q_<q>`` columns,
    plus ``n_rows`` = Σ 2^level (EXACTLY the non-null input count, a
    preserved invariant of the compactor). On an uncompacted (exact-
    degenerate) sketch this is the textbook lower discrete quantile,
    which is what the SQL oracle states over the raw table."""
    from pyspark.sql import Window

    groups = list(group_cols or [])
    for q in quantiles:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantiles must be in (0, 1], got {q}")
    w_expr = F.expr("shiftleft(CAST(1 AS BIGINT), level)")
    cum_w = Window.partitionBy(*groups).orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot_w = Window.partitionBy(*groups)
    sk = (
        sketches.withColumn("__w", w_expr)
        .withColumn("__cw", F.sum("__w").over(cum_w))
        .withColumn("__W", F.sum("__w").over(tot_w))
    )
    aggs = [
        F.min(
            F.when(
                F.col("__cw")
                # EXACT rank arithmetic (r11 review catch): double
                # ceil(q*W) rounds past the integer rank whenever the
                # nearest-double of q lands epsilon above (ceil(0.07
                # * 100) = 8, not the textbook 7). Decimal-from-string
                # keeps q exact; decimal x long stays exact.
                >= F.ceil(
                    F.lit(str(float(q))).cast("decimal(22,10)")
                    * F.col("__W")
                ).cast("long"),
                F.col("value"),
            )
        ).alias(f"q_{str(q).replace('.', '_')}")
        for q in quantiles
    ]
    aggs.append(F.max("__W").alias("n_rows"))
    if groups:
        return sk.groupBy(*groups).agg(*aggs)
    return sk.agg(*aggs)


# --------------------------------------------------------------------------- #
# Persistable Misra-Gries summaries (the heavy-hitter sketch-table form)
# --------------------------------------------------------------------------- #

def _make_mg_fold(groups: list[str], item_col: str, cap: int):
    """Factory for the per-group MG fold used by the persistable
    summary path (ships by value — repo closure convention): sum
    counts per item, recover exact N from the per-source totals, and
    re-cap to ``cap`` counters with the Misra-Gries decrement. The
    mergeable-summaries result (Agarwal, Cormode, Huang, Phillips,
    Wei, Yi 2012) is what makes the re-cap sound: merging MG
    summaries by count-sum then decrementing back to ``cap`` counters
    summarizes the CONCATENATED stream with the same one-sided
    guarantee, err ≤ N_total // (cap + 1).

    Every summary carries one carrier row per group (``item`` NULL,
    ``c`` 0) holding ``n``; the fold re-emits it, so a group whose
    every counter decrements away still reports its exact N into the
    next merge — without it, merging such a summary silently shrinks
    N and with it every downstream err_bound (the hypothesis merge
    property test's counterexample)."""

    def fold(pdf):
        import pandas as pd

        # groupby(dropna=True) excludes the NULL-item carrier rows
        # from the count sum; they still participate in N below
        c = (
            pdf.groupby(item_col, sort=False)["c"]
            .sum()
            .astype("int64")
            .reset_index()
        )
        # exact N: each source summary stamps a constant n per
        # (group, __src); sum one value per source
        n = int(pdf.drop_duplicates("__src")["n"].sum())
        if len(c) > cap:
            thresh = int(c["c"].nlargest(cap + 1).iloc[-1])
            c = c.loc[c["c"] > thresh].copy()
            c["c"] -= thresh
        carrier = pd.DataFrame({item_col: [None], "c": [0]})
        c = pd.concat([c, carrier], ignore_index=True)
        out = {g: pdf[g].iloc[:1].repeat(len(c)).reset_index(drop=True)
               for g in groups}
        out[item_col] = c[item_col]
        out["c"] = c["c"].astype("int64")
        out["n"] = n
        return pd.DataFrame(out)

    return fold


def heavy_hitter_summary(
    df: DataFrame,
    item_col: str,
    group_cols: list[str] | None = None,
    counters: int = 512,
) -> DataFrame:
    """PERSISTABLE Misra-Gries summary — the sketch-table form of
    :func:`heavy_hitters`: instead of answering top-k in-query, emit
    the bounded summary itself as rows ``(group..., item, c, n)``
    (≤ ``counters`` items per group plus one NULL-item carrier row
    that keeps ``n`` — the group's exact non-null row count — alive
    even when every counter decrements away), so per-shard/per-day
    summaries persist to
    parquet once and any union's heads are answered later by
    :func:`merge_heavy_hitter_summaries` + :func:`heavy_hitter_top_k`
    without rescanning the corpus. Guarantee per summary:
    ``c ≤ true ≤ c + n // (counters+1)`` (items absent from the
    summary have ``c = 0`` side implied).

    Plan: the shared narrow partition stage
    (:func:`_mg_partition_summaries`) then ONE ``applyInPandas``
    fold per group — only ≤ partitions × counters summary rows
    shuffle. With ``counters`` above the group's vocabulary nothing
    is ever decremented and the summary is EXACT (the oracle mode)."""
    if counters < 1:
        raise ValueError(f"counters must be >= 1, got {counters}")
    groups = list(group_cols or [])
    parts = _mg_partition_summaries(df, item_col, groups, counters)
    tagged = parts.select(
        *groups,
        item_col,
        F.col("_cnt").alias("c"),
        F.col("_part_rows").alias("n"),
        F.col("_pid").cast("string").alias("__src"),
    )
    gschema = "".join(f"`{g}` string, " for g in groups)
    out_schema = f"{gschema}`{item_col}` string, c long, n long"
    fold = _make_mg_fold(groups, item_col, counters)
    grouped = tagged.groupBy(*groups) if groups else tagged.groupBy()
    return grouped.applyInPandas(fold, schema=out_schema)


def merge_heavy_hitter_summaries(
    summaries: list[DataFrame],
    item_col: str,
    group_cols: list[str] | None = None,
    counters: int = 512,
) -> DataFrame:
    """Fold several persisted summary frames (same schema and the SAME
    ``counters`` — the bound below assumes it) into one: per group,
    sum counts per item, add the frames' exact ``n``, re-cap. Output
    schema equals the input schema, so merging is associative and
    chainable — exactly the property that lets a store fold appends
    batch by batch. Guarantee after any merge tree:
    ``c ≤ true ≤ c + n // (counters+1)`` over the concatenated input
    (Agarwal et al. 2012)."""
    if not summaries:
        raise ValueError("merge_heavy_hitter_summaries: no inputs")
    groups = list(group_cols or [])
    tagged = None
    for i, s in enumerate(summaries):
        t = s.select(
            *groups, item_col, "c", "n", F.lit(str(i)).alias("__src")
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    gschema = "".join(f"`{g}` string, " for g in groups)
    out_schema = f"{gschema}`{item_col}` string, c long, n long"
    fold = _make_mg_fold(groups, item_col, counters)
    grouped = tagged.groupBy(*groups) if groups else tagged.groupBy()
    return grouped.applyInPandas(fold, schema=out_schema)


def heavy_hitter_top_k(
    summary: DataFrame,
    item_col: str,
    k: int,
    group_cols: list[str] | None = None,
    counters: int = 512,
) -> DataFrame:
    """Answer top-k from a persisted/merged summary — pure Spark SQL
    (rank window, plans as WindowGroupLimit), emitting the same
    ``(group..., item, est_count, err_bound, n_total)`` shape as
    :func:`heavy_hitters` so the two are drop-in interchangeable.
    ``counters`` must match the summaries' build parameter — it only
    feeds ``err_bound = n // (counters+1)``, never the ranking. The
    NULL-item carrier rows are metadata, not items — filtered here."""
    from pyspark.sql import Window

    groups = list(group_cols or [])
    base = summary.filter(F.col(item_col).isNotNull()).select(
        *groups,
        item_col,
        F.col("c").alias("est_count"),
        F.expr(f"n DIV {counters + 1}").cast("long").alias("err_bound"),
        F.col("n").alias("n_total"),
    )
    if groups:
        w = Window.partitionBy(*groups).orderBy(
            F.col("est_count").desc(), F.col(item_col).asc()
        )
        return (
            base.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
    return base.orderBy(
        F.col("est_count").desc(), F.col(item_col).asc()
    ).limit(k)


# --------------------------------------------------------------------------- #
# Sketch-based two-sample drift statistics
# --------------------------------------------------------------------------- #

def sketch_ks(
    a: DataFrame,
    b: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic computed FROM two MRL
    quantile sketches — the distribution-drift test that never touches
    data rows: ``ks = sup_v |F_a(v) - F_b(v)|`` over the sketches'
    weighted empirical CDFs. Month-over-month length/score drift on a
    100 TB corpus costs only the two summaries.

    Pure Spark SQL: per-(group, value) weights are pivoted from the
    level buffers (integer sums — order-independent), the CDFs are one
    cumulative window each, and every term is ONE IEEE division of
    exact integers, so the result is deterministic and hash-exact
    across engines (the oracle mode: uncompacted sketches make this
    the textbook two-sample KS). On compacted sketches the statistic
    is within each sketch's rank-error bound of the true KS (the CDF
    at any point is off by ≤ err/n per side). A group present on only
    one side reports ``ks = 1.0`` (sup of the CDF gap), with the
    missing side's ``n`` = 0.

    Returns one row per group: ``(group..., ks double, n_a long,
    n_b long)`` with exact per-side row counts (Σ 2^level)."""
    from pyspark.sql import Window

    groups = list(group_cols or [])
    w_expr = F.expr("shiftleft(CAST(1 AS BIGINT), level)")
    pts = (
        a.select(*groups, "level", "value")
        .withColumn("__side", F.lit(0))
        .unionByName(
            b.select(*groups, "level", "value").withColumn("__side", F.lit(1))
        )
    )
    per_value = pts.groupBy(*groups, "value").agg(
        F.sum(F.when(F.col("__side") == 0, w_expr).otherwise(0)).alias("wa"),
        F.sum(F.when(F.col("__side") == 1, w_expr).otherwise(0)).alias("wb"),
    )
    cum = Window.partitionBy(*groups).orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy(*groups)
    scored = (
        per_value.withColumn("__cwa", F.sum("wa").over(cum))
        .withColumn("__cwb", F.sum("wb").over(cum))
        .withColumn("__WA", F.sum("wa").over(tot))
        .withColumn("__WB", F.sum("wb").over(tot))
    )
    point_gap = F.abs(
        F.col("__cwa").cast("double") / F.col("__WA").cast("double")
        - F.col("__cwb").cast("double") / F.col("__WB").cast("double")
    )
    agg = [
        F.max(
            F.when((F.col("__WA") == 0) | (F.col("__WB") == 0), F.lit(1.0))
            .otherwise(point_gap)
        ).alias("ks"),
        F.max("__WA").alias("n_a"),
        F.max("__WB").alias("n_b"),
    ]
    if groups:
        return scored.groupBy(*groups).agg(*agg)
    return scored.agg(*agg)


def heads_psi(
    a: DataFrame,
    b: DataFrame,
    item_col: str,
    group_cols: list[str] | None = None,
    epsilon: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two Misra-Gries head
    summaries (:func:`heavy_hitter_summary` schema) — categorical
    drift (token/domain/label mix) from summaries alone:
    ``psi = Σ_cat (p_a - p_b) · ln(p_a / p_b)`` over the union of
    reported items plus ONE residual bucket per side (``n - Σc``, the
    tail mass the summaries don't itemize — so shares sum to 1 and
    heads-only coverage can't inflate the index). Shares are floored
    at ``epsilon`` before the log. Rule-of-thumb thresholds: < 0.1
    stable, 0.1–0.25 moderate, > 0.25 major shift.

    PSI is exact when the summaries are exact (counters above vocab);
    under truncation each share is within err_bound/n of truth.
    ``ln`` is evaluated once per category on driver-deterministic
    shares and the result rounded to 6dp (the repo's float
    convention); the cross-engine-fragile log keeps PSI at the
    differential-test tier rather than the hash oracle (cf. the BM25
    precedent). Returns ``(group..., psi double, n_a long, n_b long)``."""
    groups = list(group_cols or [])
    an = a.filter(F.col(item_col).isNotNull())
    bn = b.filter(F.col(item_col).isNotNull())

    def totals(s, side):
        g = s.groupBy(*groups) if groups else s.groupBy()
        # n from any row (constant per group incl. carriers);
        # itemized mass from the real rows only
        return g.agg(
            F.max("n").alias(f"n_{side}"),
            F.coalesce(F.sum("c"), F.lit(0)).alias(f"m_{side}"),
        )

    # per-item outer join (carriers excluded; their n recovered above)
    ja = an.select(*groups, item_col, F.col("c").alias("ca"))
    jb = bn.select(*groups, item_col, F.col("c").alias("cb"))
    items = ja.join(jb, [*groups, item_col], "full_outer").fillna(
        0, subset=["ca", "cb"]
    )
    ta = totals(a, "a")
    tb = totals(b, "b")
    if groups:
        # full outer: a group reported on only ONE side still gets a
        # PSI row (its other side's shares floor at epsilon — the
        # maximal-shift reading); n/m coalesce to 0 for the missing side
        tt = ta.join(tb, groups, "full_outer").fillna(
            0, subset=["n_a", "m_a", "n_b", "m_b"]
        )
        joined = items.join(tt, groups)
        residual = tt
    else:
        tt = ta.crossJoin(tb)
        joined = items.crossJoin(F.broadcast(tt))
        residual = tt

    def share(c, n):
        # try_divide: a one-sided group has n = 0 on its missing side
        # (ANSI mode raises on plain /); the null floors to epsilon
        return F.greatest(
            F.try_divide(c.cast("double"), n.cast("double")),
            F.lit(float(epsilon)),
        )

    term = (share(F.col("ca"), F.col("n_a")) - share(F.col("cb"), F.col("n_b"))) * (
        F.log(share(F.col("ca"), F.col("n_a")) / share(F.col("cb"), F.col("n_b")))
    )
    item_terms = joined.select(*groups, term.alias("__t"))
    res_term = (
        share(F.col("n_a") - F.col("m_a"), F.col("n_a"))
        - share(F.col("n_b") - F.col("m_b"), F.col("n_b"))
    ) * F.log(
        share(F.col("n_a") - F.col("m_a"), F.col("n_a"))
        / share(F.col("n_b") - F.col("m_b"), F.col("n_b"))
    )
    res_terms = residual.select(*groups, res_term.alias("__t"))
    all_terms = item_terms.unionByName(res_terms)
    agg = [F.round(F.sum("__t"), 6).alias("psi")]
    out = (
        all_terms.groupBy(*groups).agg(*agg)
        if groups
        else all_terms.agg(*agg)
    )
    if groups:
        return out.join(residual.select(*groups, "n_a", "n_b"), groups)
    return out.crossJoin(F.broadcast(residual.select("n_a", "n_b")))
