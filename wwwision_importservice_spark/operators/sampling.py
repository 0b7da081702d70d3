"""Deterministic sampling and dataset splitting.

Training-data plumbing (no reference counterpart): train/val/test
splits and downsampling must be *deterministic functions of the record
id* — never ``rand()`` — so that re-runs, retries, and incremental
appends route every record to the same split (no train/test leakage
when the pipeline re-executes). The split key is an md5 bucket of the
id: uniform, engine-portable, and stable across runs and engines.

All pure expressions (codegen, no shuffle): a split/sample is a filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def md5_long(col: Column) -> Column:
    """THE engine-portable 60-bit integer hash: first 15 hex digits of
    the md5, as BIGINT — DuckDB reproduces it byte-for-byte via
    ``CAST('0x'||substr(md5(x),1,15) AS BIGINT)``. One definition,
    shared by every operator that must hash identically across engines
    (buckets, splits, shard manifests); a drifted copy (16 digits,
    xxhash64) would break oracle parity only for its caller."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash_bucket(id_col: Column, buckets: int = _BUCKETS) -> Column:
    """Uniform deterministic bucket in [0, buckets) from the id's
    :func:`md5_long`."""
    return md5_long(id_col.cast("string")) % buckets


def split_column(
    id_col: Column, fractions: dict[str, float], buckets: int = _BUCKETS
) -> Column:
    """Label each row with its split name by cumulative bucket ranges.

    ``fractions`` maps split name → fraction (must sum to ≤ 1; the
    remainder, if any, becomes NULL — useful for "sample 10%, ignore
    the rest"). Iteration order fixes the ranges, so pass an ordered
    dict and never reorder it between runs.
    """
    bucket = hash_bucket(id_col, buckets)
    expr = None
    cum = 0.0
    for name, frac in fractions.items():
        lo = int(round(cum * buckets))
        cum += frac
        hi = int(round(cum * buckets))
        cond = (bucket >= lo) & (bucket < hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    if cum > 1.0 + 1e-9:
        raise ValueError(f"Split fractions sum to {cum} > 1")
    return expr


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Add a deterministic split label column (NULL = not selected)."""
    return df.withColumn(split_col, split_column(F.col(id_col), fractions))


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    fractions: dict[str, float],
    split_col: str = "split",
    edges_within_nodes: bool = False,
) -> DataFrame:
    """Group-aware train/val/test split: the split unit is the NEAR-DUP
    CLUSTER, not the document, so no near-duplicate pair ever straddles
    a split boundary — the eval-leakage failure mode a per-document
    :func:`hash_split` cannot prevent (a doc and its near-twin hash
    independently, and the twin lands in val while the original trains).

    ``pairs`` is any near-dup pair frame (LSH candidates, embedding
    pairs, fuzzy matches) with ``id_a``/``id_b`` columns; documents are
    clustered by connected components over it, and each cluster draws
    ONE split label from the md5 of its ``cluster_id`` (the cluster's
    min id — stable under re-runs and appends that don't merge
    clusters). Singleton documents form their own clusters, so the
    realized fractions still track ``fractions`` at corpus scale.

    Scale shape: CC is the pointer-doubling pass already used by the
    dedup pipeline (O(log n) rounds); the label assignment is a pure
    expression on the ids-only cluster frame plus one narrow join back
    on ``id_col``. ``edges_within_nodes`` defaults to False (the safe
    ``connected_components`` default): a stale or pre-filter pair table
    with ids outside ``df`` would otherwise conduct connectivity through
    removed documents and silently reshuffle split labels. Pass True
    only when ``pairs`` provably derives from ``df`` itself — it skips
    the three node-restriction joins.
    """
    from wwwision_importservice_spark.operators.dedup import connected_components

    cc = connected_components(
        df.select(id_col),
        pairs,
        id_col=id_col,
        edges_within_nodes=edges_within_nodes,
    )
    labeled = cc.select(F.col("id").alias(id_col), "cluster_id").withColumn(
        split_col, split_column(F.col("cluster_id"), fractions)
    )
    return df.join(labeled, id_col)


def split_churn(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    split_col: str = "split",
) -> DataFrame:
    """The contamination delta between two :func:`leakage_safe_split`
    generations (VERDICT r8 ask #7).

    :func:`leakage_safe_split` labels each near-dup cluster from the md5
    of its cluster-min id — stable under appends that leave clusters
    intact, but an append that MERGES two clusters collapses them onto
    ONE min id, so every document of the cluster that lost its min is
    relabeled wholesale. That is correct behavior (the merged cluster
    must not straddle a boundary going forward), but a model already
    trained on the old generation has now *seen* documents that the new
    generation assigns to val/test. This report makes that delta
    explicit instead of silent.

    ``old`` / ``new`` are two labeled outputs (only ``id_col`` +
    ``split_col`` are read). Returns one row per id whose assignment
    changed, with ``old_split`` / ``new_split`` (NULL on the missing
    side) and ``churn``:

    - ``relabeled`` — present in both, label moved (the cluster-merge
      signature). ``old_split ∈ {val,test} ∧ new_split = train`` rows
      are the ones that silently leak old eval docs into new training
      sets; ``train → val/test`` rows invalidate the NEW eval for any
      model trained on the OLD generation.
    - ``added`` / ``removed`` — only in one generation (corpus append /
      retention deletion), reported so realized-fraction drift is
      attributable.

    One narrow full-outer join on the id — ids-plus-label columns only,
    no payload; scales as the split frames do. Retraining policy stays
    with the caller (e.g. "abort if any relabeled row was in test").
    """
    # explicit presence flags: a NULL *label* (fractions summing < 1
    # leave a remainder) must not masquerade as an absent *row*
    o = old.select(
        F.col(id_col),
        F.col(split_col).alias("old_split"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(id_col),
        F.col(split_col).alias("new_split"),
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, on=id_col, how="full_outer")
    churn = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("relabeled"))
    )
    # eqNullSafe: a NULL label (id in the "remainder" of fractions
    # summing < 1) is a real assignment — NULL→train is churn too, and
    # plain != would silently drop it. Presence changes always report,
    # even when both labels are NULL (an added doc parked in the
    # remainder still moves the realized fractions' denominator).
    return joined.filter(
        ~F.col("old_split").eqNullSafe(F.col("new_split"))
        | F.col("__in_old").isNull()
        | F.col("__in_new").isNull()
    ).select(F.col(id_col), "old_split", "new_split", churn.alias("churn"))


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float
) -> DataFrame:
    """Keep a stable ~``fraction`` of rows by id hash — unlike
    ``df.sample()`` this survives re-runs, retries, and appends with the
    same per-record decisions."""
    cutoff = int(round(fraction * _BUCKETS))
    return df.filter(hash_bucket(F.col(id_col)) < cutoff)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own
    hash-cutoff fraction (e.g. downsample boilerplate-heavy languages,
    keep all of rare ones). Strata absent from ``fractions`` keep
    ``default_fraction``. Still a single filter expression — no shuffle,
    no per-stratum passes."""
    bucket = hash_bucket(F.col(id_col))
    cutoff = F.lit(int(round(default_fraction * _BUCKETS)))
    for value, frac in fractions.items():
        cutoff = F.when(
            F.col(strata_col) == value, F.lit(int(round(frac * _BUCKETS)))
        ).otherwise(cutoff)
    return df.filter(bucket < cutoff)


def stratified_split(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    fractions: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """EXACT per-stratum allocation: within every stratum, rank rows by
    a deterministic hash of the id and cut the ranking at the cumulative
    fractions — each stratum lands within 1 row of its target proportion
    (a plain hash split is only proportional in expectation, which skews
    small strata; class-balanced train/val needs the exact form).

    One shuffle on the strata columns + a per-stratum sort (the rank
    window); the hash order makes the assignment independent of input
    order, so re-runs and incremental recomputes allocate identically.
    Fractions must sum to ≤ 1; the remainder becomes NULL (held out).
    """
    from pyspark.sql import Window

    cum = 0.0
    cuts: list[tuple[str, float]] = []
    for name, frac in fractions.items():
        cum += frac
        cuts.append((name, cum))
    if cum > 1.0 + 1e-9:
        raise ValueError(f"Split fractions sum to {cum} > 1")

    order = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*strata_cols).orderBy(order, F.col(id_col))
    n = Window.partitionBy(*strata_cols)
    # position in [0, 1): (rank-1)/count — IEEE-exact, so the same
    # comparison reproduces bit-for-bit in any engine
    pos = (F.row_number().over(w) - 1).cast("double") / F.count(F.lit(1)).over(n)
    expr = None
    for name, hi in cuts:
        cond = pos < hi
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    return df.withColumn(split_col, expr)


def training_order(
    df: DataFrame,
    id_col: str,
    n_buckets: int = 1024,
    shuffle_col: str = "shuffle_key",
    bucket_col: str = "shuffle_bucket",
) -> DataFrame:
    """Deterministic global shuffle for training-data ordering: each row
    gets a pseudo-random but id-stable sort key (md5 of the id) and a
    range bucket over that key. Writing with
    ``repartitionByRange(bucket).sortWithinPartitions(shuffle_key)``
    materializes a reproducible shuffled corpus — same ids, same order,
    every run — without a global sort: range partitioning samples the
    key distribution, each partition sorts locally, and the md5 key is
    uniform so buckets balance. rand()-based shuffling cannot be
    replayed after a retry; this can.
    """
    key = F.md5(F.col(id_col).cast("string"))
    return df.withColumn(shuffle_col, key).withColumn(
        bucket_col, hash_bucket(F.col(id_col), n_buckets)
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int,
    num_shards: int = 1024,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic per-EPOCH global shuffle: shard assignment and
    in-shard position for every row, re-dealt each epoch.

    ``training_order`` gives ONE reproducible order; multi-epoch
    training wants a *different* but equally reproducible order per
    epoch (so data loaders can resume mid-epoch after a failure and
    every worker agrees on the deal). The key is
    ``md5(epoch ':' id)`` — changing the epoch re-deals both shard
    membership and order; re-running the same epoch replays it exactly.

    Scale shape: one shuffle on ``shard`` (size ``num_shards`` — set it
    to at least the writer parallelism), then a per-shard sort bounded
    by corpus_size / num_shards rows. No global sort, no rand(). A
    production epoch writer follows with
    ``.repartition(num_shards, shard_col)`` +
    ``.sortWithinPartitions(pos_col)`` and writes one file per shard.
    """
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    key = F.md5(
        F.concat_ws(":", F.lit(int(epoch)).cast("string"), F.col(id_col).cast("string"))
    )
    shard = (
        F.conv(F.substring(key, 1, 15), 16, 10).cast("long") % num_shards
    )
    from pyspark.sql import Window

    w = Window.partitionBy(shard_col).orderBy(F.col("_shuffle_key"), F.col(id_col))
    return (
        df.withColumn("_shuffle_key", key)
        .withColumn(shard_col, shard)
        .withColumn(pos_col, F.row_number().over(w).cast("long"))
        .drop("_shuffle_key")
    )


def temperature_budgets(
    df: DataFrame,
    group_col: str,
    token_col: str,
    total_budget: int,
    alpha: float = 0.5,
) -> dict[str, int]:
    """Temperature-scaled mixture budgets: per-group token budget
    ∝ (group token count)^alpha — the multilingual/multi-source
    rebalancing rule from mT5 / XLM-R (alpha < 1 upsamples the tail,
    alpha = 1 is proportional, alpha = 0 is uniform). Feed the result
    straight into :func:`mixture_sample`.

    Exact integer construction so re-runs and engines agree bit-for-bit:
    per-group counts are exact BIGINT sums; the one float op is
    pow(n, alpha), quantized immediately to integer micro-weights
    ``wm = round(n^alpha × 1e6)``; budgets are then pure integer math
    ``total_budget × wm // Σwm`` (arbitrary-precision here; an SQL twin
    needs total_budget × wm to fit int64 — documented bound).

    The collect is one row per GROUP (a mixture spec is human-scale:
    languages/domains, not documents) — metadata-sized by contract, like
    the quality-report collects. The heavy lifting (the admission pass)
    stays fully distributed in :func:`mixture_sample`.

    NULL groups are excluded from the weight mass entirely: a ``None``
    budget key could never match in :func:`mixture_sample` (``col ==
    NULL`` is never true), so including it would both drop those rows
    AND dilute every real group's budget. NULL-group rows fall to
    ``mixture_sample``'s ``default_budget`` like any unlisted group.
    """
    rows = (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.sum(F.col(token_col)).cast("long").alias("__n"))
        .collect()  # one row per group — metadata-scale by contract
    )
    # exact-binary HALF_UP (= half-away for non-negative) via Decimal —
    # bit-for-bit DuckDB's one-arg round() on the identical double in
    # the SQL twin. Neither Python round() (half-to-even) nor
    # int(x + 0.5) matches: the float ADDITION in the latter rounds up
    # for x within half an ulp BELOW a .5 boundary, a window ~1e-6 wide
    # at wm scale
    from decimal import ROUND_HALF_UP, Context, Decimal

    # prec=400 covers the full double range (~1e308): the default
    # 28-digit context makes quantize RAISE InvalidOperation once
    # n^alpha × 1e6 passes 1e28 (reachable at alpha > 1)
    ctx = Context(prec=400, rounding=ROUND_HALF_UP)
    wm = {
        r[group_col]: int(
            ctx.quantize(Decimal(float(r["__n"]) ** alpha * 1_000_000), Decimal(1))
        )
        for r in rows
        if r["__n"] and r["__n"] > 0
    }
    tot = sum(wm.values())
    if tot == 0:
        return {g: 0 for g in wm}
    return {g: int(total_budget) * w // tot for g, w in wm.items()}


def temperature_mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    token_col: str,
    total_budget: int,
    alpha: float = 0.5,
) -> DataFrame:
    """:func:`temperature_budgets` composed with :func:`mixture_sample`:
    rebalance a multi-source corpus to a total token budget with
    temperature alpha, admitting documents per group in deterministic
    id-hash order. Two scans of ``df`` (one metadata-scale rollup for
    the spec, one admission pass)."""
    budgets = temperature_budgets(df, group_col, token_col, total_budget, alpha)
    return mixture_sample(
        df, id_col, group_col, token_col, budgets, default_budget=0
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    token_col: str,
    budgets: dict[str, int],
    default_budget: int = 0,
) -> DataFrame:
    """Token-budget data-mixture construction: per group (domain /
    source / language), keep documents until the group's token budget is
    filled — the step that turns a raw corpus + a mixture spec
    ("so many tokens of web, so many of code, …") into a training set.

    Selection order within a group is the md5 of the id (uniform,
    deterministic, engine-portable — same construction as
    :func:`training_order`), so re-runs, retries, and incremental
    appends admit the same documents; appending new data only ever
    *inserts* candidates into the fixed hash order, it never reshuffles
    prior decisions arbitrarily. A document is kept iff its FIRST token
    lands inside the budget (cumulative-exclusive < budget), so each
    group overshoots by at most one document — the same boundary
    convention as :func:`pack_sequences`. Groups absent from
    ``budgets`` get ``default_budget`` (0 = dropped entirely).

    Scale shape: one shuffle on the group column + a per-group ordered
    cumulative sum (window). Group count is small (domains), so the
    window partitions are few and big — exactly the shape AQE's skew
    handling splits; for extreme single-group corpora, pre-split the
    group upstream or sample with :func:`stratified_sample` first.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_excl = F.sum(F.col(token_col)).over(w) - F.col(token_col)
    budget = F.lit(int(default_budget))
    for value, b in budgets.items():
        budget = F.when(F.col(group_col) == value, F.lit(int(b))).otherwise(budget)
    # window expressions can't appear in WHERE — project, filter, drop
    return (
        df.withColumn("__mix_cum_excl", cum_excl)
        .filter(F.col("__mix_cum_excl") < budget)
        .drop("__mix_cum_excl")
    )


def bernoulli_sample(
    df: DataFrame, id_col: str, prob_col: Column | str
) -> DataFrame:
    """Deterministic per-row-probability sampling: keep each row with
    its OWN probability (``prob_col`` ∈ [0,1], e.g. a quality score
    mapped to a keep-rate — the quality-weighted downsampling step of
    FineWeb/DCLM-style curation), decided by the id's hash bucket
    instead of ``rand()`` so re-runs, retries, and appends keep the
    same rows. The fixed-rate :func:`deterministic_sample` is the
    special case ``prob_col = lit(fraction)``.

    Caveat (inherent to hash-threshold sampling): keep-decisions are
    NESTED across probabilities — a row kept at p=0.3 is also kept at
    p=0.5. That is exactly the property that makes re-curation with a
    raised rate a superset (no churn), but it means two different
    columns sampled this way are correlated; salt the id (concat a
    label) when independent draws are needed.

    Pure expression — a filter, no shuffle, no Python.
    """
    prob = F.col(prob_col) if isinstance(prob_col, str) else prob_col
    return df.filter(
        hash_bucket(F.col(id_col)).cast("double")
        < prob.cast("double") * F.lit(float(_BUCKETS))
    )


def cap_per_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    max_rows: int,
) -> DataFrame:
    """Frequency cap: keep at most ``max_rows`` rows per group (domain /
    source / site) — the standard curation guard against a handful of
    template-heavy domains dominating a web corpus (C4/Dolma-style
    per-domain caps).

    Which rows survive is a deterministic function of the id (md5-hash
    order, same construction as :func:`training_order`), so re-runs and
    incremental appends keep the same documents; new arrivals can only
    displace hash-later rows, never reshuffle prior picks arbitrarily.

    Scale shape: a ``row_number() <= k`` filter, which Spark plans as
    ``WindowGroupLimit`` — each map task pre-limits every group to
    ``max_rows`` BEFORE the shuffle, so a 100M-row boilerplate domain
    ships at most ``max_rows × partitions`` rows into the exchange
    instead of all 100M. One shuffle on the group column.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__cap_rn", F.row_number().over(w))
        .filter(F.col("__cap_rn") <= int(max_rows))
        .drop("__cap_rn")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shards: int = 1024,
    shard_col: str = "shard",
    pack_col: str = "pack_id",
    offset_col: str = "pack_offset",
) -> DataFrame:
    """Assign documents to fixed token-budget PACKS — the
    concat-and-chunk step in front of writing training shards.

    Contiguous-fill packing in the streaming-concatenation sense: docs
    are laid out in a deterministic order and a pack boundary falls
    every ``budget`` tokens; a doc belongs to the pack its first token
    lands in, so a pack overshoots the budget by at most one document
    (the downstream writer truncates or carries the tail — standard
    concat-packing semantics, not bin-packing's hard capacity).

    Scale shape: a GLOBAL greedy packer is a sequential fold — the
    anti-pattern. Instead docs shard by the id's md5 (deterministic,
    engine-portable, uniform), each shard packs independently via one
    window cumsum ordered by id within the shard, and pack identity is
    (shard, index). One shuffle on the shard key; every shard's state
    is a running token count, nothing global. Same construction as
    :func:`training_order` — re-run/replay gives identical packs.

    Emits ``shard``, ``pack_id`` (index within shard), ``offset_col``
    (token offset of the doc inside its pack) alongside the input
    columns.
    """
    from pyspark.sql import Window

    if budget < 1:
        # budget=0 floor-divides by zero into NULL pack ids with no
        # error under non-ANSI SQL (r11 review catch)
        raise ValueError(f"pack_sequences requires budget >= 1, got {budget}")
    shard = hash_bucket(F.col(id_col), shards)
    w = (
        Window.partitionBy(shard_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_incl = F.sum(F.col(token_col)).over(w)
    cum_excl = cum_incl - F.col(token_col)
    return (
        df.withColumn(shard_col, shard)
        .withColumn(pack_col, F.floor(cum_excl / budget).cast("long"))
        .withColumn(
            offset_col, (cum_excl - F.col(pack_col) * budget).cast("long")
        )
    )
