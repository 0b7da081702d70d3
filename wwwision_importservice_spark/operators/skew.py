"""Skew mitigation: deterministic salted joins.

No reference counterpart (the reference is single-process hash maps) —
this is 100 TB plumbing (SURVEY §7.1.8). AQE's skew-join splitting
(enabled in session defaults) handles most skew at runtime; an explicit
salt is for the cases AQE can't fix: a single hot key whose matching
build side also has to replicate, or a shuffle consumer downstream of
the join that inherits the skewed partitioning.

The salt is **deterministic** (hash of the probe row), never random —
re-running a stage after a task failure must re-derive identical salts
or the join drops/duplicates rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``num_salts``
    shuffle partitions.

    The big side derives a salt from its full row hash (deterministic,
    uniform); the small side replicates ``num_salts``× so every
    (key, salt) pair finds its match. Join keys become
    ``on + [salt]`` — one shuffle, hot keys split ~evenly.

    Replication multiplies the small side's shuffle volume by
    ``num_salts``: use only when ``small`` is far below the big side's
    per-key skew, and prefer plain broadcast when ``small`` fits in
    memory (zero shuffle beats salted shuffle).
    """
    salt = F.pmod(
        F.hash(F.struct(*[F.col(c) for c in big.columns])), F.lit(num_salts)
    )
    big_salted = big.withColumn("__salt", salt)
    small_salted = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return big_salted.join(small_salted, [*on, "__salt"], how).drop("__salt")



def hot_key_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    weight_col: str,
    *,
    hot_keys: int = 64,
    how: str = "left",
) -> DataFrame:
    """Zipf-aware equi-join: the ``hot_keys`` heaviest rows of the
    small side (by ``weight_col`` — for count/model tables the weight
    IS the probe-side frequency, e.g. a bigram LM's ``c1`` or a term
    table's ``df``) are broadcast, so the probe rows carrying the head
    keys never shuffle at all; only the Zipf tail takes the shuffle
    join, with its per-key width bounded by the (K+1)-th key.

    The split is exact, not approximate: hot keys come FROM ``small``,
    so the hot path's inner broadcast join is the restriction of a
    left join to keys known to match, and the anti-joined cold path
    cannot match a hot row — the union is row-for-row the plain join
    (pinned by test). The selection is ``hot_keys`` distinct KEYS
    (heaviest by per-key max weight), and the hot frame is ``small``
    SEMI-JOINED on them — never a row limit, which on a multi-row-per-
    key small side could cut mid-key and silently drop that key's
    remaining matches from both paths (the anti-join removes the whole
    key from the cold side). Multi-row keys are exact too, pinned by
    test. Supports ``how`` in {"inner", "left"} (the lookup-join
    shapes; a right/full split would need tail bookkeeping on the
    small side).

    vs the alternatives: AQE skew-split fixes the hot partition only
    at shuffle-read time (the map-side write still funnels the head
    key through one hash bucket per mapper); :func:`salted_join`
    spreads the head but replicates the whole small side
    ``num_salts``×. Broadcasting K count rows costs ~nothing and
    removes the head from the shuffle entirely — use the salted join
    as the fallback when the hot side cannot be enumerated cheaply
    (e.g. the weight lives on neither input).

    ``hot_keys=0`` degrades to the plain join.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"hot_key_broadcast_join: unsupported how={how!r}")
    if hot_keys <= 0:
        return big.join(small, on, how)
    hot_key_set = F.broadcast(
        small.groupBy(*on)
        .agg(F.max(F.col(weight_col)).alias("__w"))
        .orderBy(F.col("__w").desc(), *on)
        .limit(hot_keys)
        .select(*on)
    )
    hot = F.broadcast(small.join(hot_key_set, on, "left_semi"))
    big_hot = big.join(hot, on, "inner")
    big_cold = big.join(hot_key_set, on, "left_anti")
    cold = big_cold.join(small, on, how)
    return big_hot.unionByName(cold)


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 10,
) -> DataFrame:
    """Key-distribution profile for join/aggregation planning: per-key
    row counts summarized as (n_keys, total_rows, max/p99/p50 key size,
    skew_factor = max/p50) plus the ``top_n`` heaviest keys inline.

    Read it before choosing a strategy: skew_factor ≈ 1 → plain shuffle
    join; moderate (< ~20) → AQE's skew split handles it; extreme with a
    small build side → :func:`salted_join`; tiny build side regardless →
    broadcast. One hash aggregate over the keys + a driver-sized
    summary — safe to run on the full table.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__n"))
    key_repr = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    # collect_list does NOT guarantee it preserves the pre-aggregation
    # order, so "heaviest first" is re-established by ranking the (tiny,
    # <= top_n row) limited frame and sort_array-ing on the rank field.
    rank_w = Window.orderBy(F.col("rows").desc(), F.col("key"))
    top = (
        counts.orderBy(F.col("__n").desc(), key_repr)
        .limit(top_n)
        .select(key_repr.alias("key"), F.col("__n").alias("rows"))
        .select(
            F.struct(
                F.row_number().over(rank_w).alias("rank"), "key", "rows"
            ).alias("s")
        )
        .agg(F.sort_array(F.collect_list("s")).alias("top_keys"))
    )
    summary = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__n").alias("total_rows"),
        F.max("__n").alias("max_key_rows"),
        F.expr("percentile(__n, 0.99)").alias("p99_key_rows"),
        F.expr("percentile(__n, 0.5)").alias("p50_key_rows"),
    )
    return summary.crossJoin(top).select(
        "n_keys",
        "total_rows",
        "max_key_rows",
        "p99_key_rows",
        "p50_key_rows",
        (F.col("max_key_rows") / F.greatest(F.col("p50_key_rows"), F.lit(1.0))).alias(
            "skew_factor"
        ),
        "top_keys",
    )
