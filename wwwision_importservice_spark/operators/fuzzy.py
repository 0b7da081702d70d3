"""Fuzzy matching / entity resolution — blocked edit-distance joins.

No reference counterpart (SURVEY §2.9 extension family): the
training-data-pipeline use cases are entity resolution across source
catalogs (the same supplier/customer spelled differently), fuzzy-key
joins between datasets without a shared surrogate key, and typo-class
near-dup detection on short strings — the string-domain sibling of the
shingle/MinHash operators in ``operators/dedup.py`` (those target long
documents; these target names/titles/keys).

Never a cross join. Candidate generation is **positional q-gram
blocking**: a string of length L yields its L-q+1 (gram, position)
pairs; the left side additionally fans each gram out to the positions
``pos-d .. pos+d``. Two strings within edit distance d share at least
one q-gram whose positions differ by at most d (positional q-gram
lemma, Sutinen & Tarhio 1995; the count-filtering bound is Gravano et
al., VLDB 2001 — both public literature), PROVIDED
``max(|s|,|t|) >= q * (d + 1)``: shorter strings can be rewritten gram
by gram with d edits. :func:`fuzzy_join` therefore routes strings
shorter than ``q*(d+1)`` through a tiny exact-length-bucket fallback
block (length difference ≤ d is necessary for ed ≤ d), keeping the
operator COMPLETE — every true match survives blocking — without a
cross join on the long majority.

Why positional (not plain) q-grams: on uniform catalogs
("Supplier#000000042") every pair shares most unpositioned grams and
plain-gram blocking degenerates to the cross join it was meant to
avoid; anchoring grams to positions keeps candidates to genuinely
aligned strings. Candidates are verified with the exact
``levenshtein`` (integer, engine-portable — the oracle runs the same
filter bit-for-bit).

Scale shape: explode (rows × ~L·(2d+1) gram rows) → shuffle on the
(gram, pos) key → distinct pair ids → one hash join back for the
verify columns. The gram shuffle carries ids + q bytes per row, never
payloads; skewed gram keys (stop-grams) behave like any skewed join
key — cap them with ``max_block_size`` (same drop-accounting pattern
as ``lsh_candidate_pairs``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _gram_rows(df: DataFrame, id_col: str, text_col: str, q: int):
    """One row per (id, gram, pos): transform the 1-based index sequence
    into (gram, pos) structs in a single projection, then explode — one
    pass, no self-join. Empty/short strings yield no rows."""
    lowered = F.lower(F.col(text_col))
    n = F.length(lowered) - (q - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(0))),
        lambda i: F.struct(
            lowered.substr(i, F.lit(q)).alias("gram"), i.alias("pos")
        ),
    )
    return df.select(F.col(id_col), F.explode(grams).alias("g")).select(
        id_col, F.col("g.gram").alias("gram"), F.col("g.pos").alias("pos")
    )


def fuzzy_self_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 2,
    q: int = 2,
    max_block_size: int | None = 10_000,
) -> DataFrame:
    """All unordered pairs (id_a < id_b) whose strings are within
    ``max_distance`` edits — typo-class duplicate detection.

    Complete blocking (module header): long strings block on positional
    q-grams with a ±d position fan-out; strings shorter than
    ``q*(d+1)`` block on exact length buckets (len diff ≤ d is implied
    by ed ≤ d, and the short class is tiny). Output columns:
    ``id_a, id_b, name_a, name_b, distance``.
    """
    d = max_distance
    min_long = q * (d + 1)
    lowered = F.lower(F.col(text_col))
    named = df.select(
        F.col(id_col).alias("__fid"), lowered.alias("__ftext")
    )
    long_side = named.filter(F.length("__ftext") >= min_long)
    short_side = named.filter(F.length("__ftext") < min_long)

    grams = _gram_rows(
        long_side.withColumnRenamed("__fid", id_col), id_col, "__ftext", q
    )
    # probe side fans each gram out over the allowed position shifts, so
    # the equi-join key (gram, pos) captures every |Δpos| <= d pair
    probe = grams.select(
        F.col(id_col).alias("__ida"),
        "gram",
        F.explode(
            F.sequence(F.col("pos") - d, F.col("pos") + d)
        ).alias("pos"),
    )
    build = grams.select(F.col(id_col).alias("__idb"), "gram", "pos")
    if max_block_size is not None:
        heavy = (
            build.groupBy("gram", "pos")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_block_size)
            .select("gram", "pos")
        )
        build = build.join(F.broadcast(heavy), ["gram", "pos"], "left_anti")
        probe = probe.join(F.broadcast(heavy), ["gram", "pos"], "left_anti")
    cand_long = (
        probe.join(build, ["gram", "pos"])
        .filter(F.col("__ida") < F.col("__idb"))
        .select("__ida", "__idb")
        .distinct()
    )

    cand_short = (
        short_side.alias("a")
        .join(
            short_side.alias("b"),
            (
                F.abs(
                    F.length(F.col("a.__ftext")) - F.length(F.col("b.__ftext"))
                )
                <= d
            )
            & (F.col("a.__fid") < F.col("b.__fid")),
        )
        .select(
            F.col("a.__fid").alias("__ida"), F.col("b.__fid").alias("__idb")
        )
    )

    cands = cand_long.unionByName(cand_short)
    a = named.select(
        F.col("__fid").alias("__ida"), F.col("__ftext").alias("name_a")
    )
    b = named.select(
        F.col("__fid").alias("__idb"), F.col("__ftext").alias("name_b")
    )
    return (
        cands.join(a, "__ida")
        .join(b, "__idb")
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= d)
        .select(
            F.col("__ida").alias("id_a"),
            F.col("__idb").alias("id_b"),
            "name_a",
            "name_b",
            F.col("distance").cast("int").alias("distance"),
        )
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    max_distance: int = 2,
    q: int = 2,
    max_block_size: int | None = 10_000,
) -> DataFrame:
    """Two-table fuzzy equi-join: every (left, right) row pair whose
    join strings are within ``max_distance`` edits, with the same
    complete positional-q-gram blocking as :func:`fuzzy_self_pairs`.
    Returns all left columns + all right columns + ``distance``
    (ambiguous names must be pre-aliased by the caller)."""
    d = max_distance
    min_long = q * (d + 1)
    lkey = F.lower(F.col(left_on))
    rkey = F.lower(F.col(right_on))
    lft = left.withColumn("__lkey", lkey).withColumn(
        "__lid", F.monotonically_increasing_id()
    )
    rgt = right.withColumn("__rkey", rkey).withColumn(
        "__rid", F.monotonically_increasing_id()
    )

    lg = _gram_rows(
        lft.select("__lid", "__lkey"), "__lid", "__lkey", q
    ).select(
        "__lid",
        "gram",
        F.explode(F.sequence(F.col("pos") - d, F.col("pos") + d)).alias("pos"),
    )
    rg = _gram_rows(rgt.select("__rid", "__rkey"), "__rid", "__rkey", q)
    if max_block_size is not None:
        heavy = (
            rg.groupBy("gram", "pos")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_block_size)
            .select("gram", "pos")
        )
        rg = rg.join(F.broadcast(heavy), ["gram", "pos"], "left_anti")
        lg = lg.join(F.broadcast(heavy), ["gram", "pos"], "left_anti")
    cand_long = lg.join(rg, ["gram", "pos"]).select("__lid", "__rid").distinct()

    l_short = lft.filter(F.length("__lkey") < min_long).select(
        "__lid", "__lkey"
    )
    r_short = rgt.filter(F.length("__rkey") < min_long).select(
        "__rid", "__rkey"
    )
    cand_short = l_short.join(
        r_short,
        F.abs(F.length("__lkey") - F.length("__rkey")) <= d,
    ).select("__lid", "__rid")

    cands = cand_long.unionByName(cand_short).distinct()
    out = (
        cands.join(lft, "__lid")
        .join(rgt, "__rid")
        .withColumn("distance", F.levenshtein(F.col("__lkey"), F.col("__rkey")))
        .filter(F.col("distance") <= d)
    )
    keep = [c for c in left.columns] + [c for c in right.columns] + ["distance"]
    return out.select(*keep)
