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

    Complete blocking (module header): positional q-grams with a ±d
    position fan-out over EVERY row (even strings below the lemma's
    ``q*(d+1)`` floor contribute their grams — they just aren't
    *guaranteed* a shared gram), plus a length-bucket fallback that
    pairs each sub-floor string against every string within length
    difference d (necessary for ed ≤ d). The fallback covers exactly
    the pairs the lemma can't: where the SHORTER side is below the
    floor, the longer side is at most ``q*(d+1)+d-1`` chars, so the
    fallback join stays on two small length-bounded sets — never a
    cross join on the long majority. Output columns:
    ``id_a, id_b, name_a, name_b, distance``.
    """
    d = max_distance
    min_long = q * (d + 1)
    lowered = F.lower(F.col(text_col))
    named = df.select(
        F.col(id_col).alias("__fid"), lowered.alias("__ftext")
    )
    short_side = named.filter(F.length("__ftext") < min_long)
    # every pair with a sub-floor MEMBER goes through the fallback; its
    # partner is then length-bounded by min_long + d
    near_short = named.filter(F.length("__ftext") < min_long + d)

    grams = _gram_rows(
        named.withColumnRenamed("__fid", id_col), id_col, "__ftext", q
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

    # sub-floor strings vs ANY partner within length difference d —
    # pairs where the shorter side can't be guaranteed a shared gram
    cand_short = (
        short_side.alias("a")
        .join(
            near_short.alias("b"),
            (
                F.abs(
                    F.length(F.col("a.__ftext")) - F.length(F.col("b.__ftext"))
                )
                <= d
            )
            & (F.col("a.__fid") != F.col("b.__fid")),
        )
        .select(
            F.least(F.col("a.__fid"), F.col("b.__fid")).alias("__ida"),
            F.greatest(F.col("a.__fid"), F.col("b.__fid")).alias("__idb"),
        )
    )

    cands = cand_long.unionByName(cand_short).distinct()
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
    complete blocking as :func:`fuzzy_self_pairs` (gram candidates from
    every row; length-bucket fallback whenever the shorter string sits
    below the lemma floor). Candidates are keyed by the DISTINCT join
    strings themselves — deterministic under retries and recomputation
    (a row-id stamped with ``monotonically_increasing_id`` would be
    re-evaluated per plan branch and can diverge across them), and rows
    sharing a key are matched once per key, not once per row. Returns
    all left columns + all right columns + ``distance`` (ambiguous
    names must be pre-aliased by the caller)."""
    d = max_distance
    min_long = q * (d + 1)
    lft = left.withColumn("__lkey", F.lower(F.col(left_on)))
    rgt = right.withColumn("__rkey", F.lower(F.col(right_on)))
    lkeys = lft.select("__lkey").distinct()
    rkeys = rgt.select("__rkey").distinct()

    lg = _gram_rows(lkeys, "__lkey", "__lkey", q).select(
        "__lkey",
        "gram",
        F.explode(F.sequence(F.col("pos") - d, F.col("pos") + d)).alias("pos"),
    )
    rg = _gram_rows(rkeys, "__rkey", "__rkey", q)
    if max_block_size is not None:
        heavy = (
            rg.groupBy("gram", "pos")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_block_size)
            .select("gram", "pos")
        )
        rg = rg.join(F.broadcast(heavy), ["gram", "pos"], "left_anti")
        lg = lg.join(F.broadcast(heavy), ["gram", "pos"], "left_anti")
    cand_long = lg.join(rg, ["gram", "pos"]).select("__lkey", "__rkey")

    # fallback wherever the SHORTER side of a pair sits below the floor
    l_short = lkeys.filter(F.length("__lkey") < min_long)
    r_short = rkeys.filter(F.length("__rkey") < min_long)
    l_near = lkeys.filter(F.length("__lkey") < min_long + d)
    r_near = rkeys.filter(F.length("__rkey") < min_long + d)
    len_ok = F.abs(F.length("__lkey") - F.length("__rkey")) <= d
    cand_short = l_short.join(r_near, len_ok).select(
        "__lkey", "__rkey"
    ).unionByName(l_near.join(r_short, len_ok).select("__lkey", "__rkey"))

    cands = (
        cand_long.unionByName(cand_short)
        .distinct()
        .withColumn("distance", F.levenshtein(F.col("__lkey"), F.col("__rkey")))
        .filter(F.col("distance") <= d)
    )
    out = cands.join(lft, "__lkey").join(rgt, "__rkey")
    keep = [c for c in left.columns] + [c for c in right.columns] + ["distance"]
    return out.select(*keep)
