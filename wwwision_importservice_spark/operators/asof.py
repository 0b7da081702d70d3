"""As-of (point-in-time) join — a temporal operator Spark lacks natively.

No reference counterpart (the reference has only keyed equi-joins,
SURVEY §2.4); this is the scale-extension temporal join a time-series /
training-data pipeline needs: for each left row, the latest right row
with ``right.ts <= left.ts`` (inclusive; ``strict=True`` for ``<``) on
matching keys.

Formulation: tag both sides, UNION on (key, ts, side, payload), then a
per-key ordered window forward-fills the most recent right payload onto
each left row. ONE shuffle on the key + a per-key sort — the classic
scalable as-of shape. The naive alternative (range/theta join then
per-left-row max) explodes to |L|×|R| pairs per key before pruning;
this never materializes more than |L|+|R| rows.

Oracle note: DuckDB's native ``ASOF JOIN`` implements the same
semantics, which is what the differential check runs against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_r",
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: every left row, plus the payload of the most
    recent right row at-or-before (``strict``: strictly before) the left
    row's timestamp, per key. Unmatched left rows keep NULL payloads.

    ``right_cols`` are the right-side columns to carry (emitted with
    ``suffix``). Ties inside the right side at an identical (key, ts)
    are broken deterministically by the last ``right_cols`` struct in
    column order.
    """
    # side ordering at equal ts: inclusive → right sorts BEFORE left (its
    # payload is visible); strict → right sorts AFTER left
    right_side = 0 if not strict else 2
    left_fields = [F.col(c) for c in left.columns]
    l_tagged = left.select(
        *[F.col(k) for k in key_cols],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in right_cols]).alias("s"))
            .schema["s"]
            .dataType.simpleString()
        ).alias("__rpay"),
        F.struct(*left_fields).alias("__lrow"),
    )
    r_tagged = right.select(
        *[F.col(k) for k in key_cols],
        F.col(right_ts).alias("__ts"),
        F.lit(right_side).alias("__side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__rpay"),
        F.lit(None)
        .cast(
            left.select(F.struct(*left_fields).alias("s")).schema["s"].dataType.simpleString()
        )
        .alias("__lrow"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # __rpay as the final sort key makes ties among right rows at an
    # identical (key, ts) deterministic (greatest payload struct wins —
    # the documented tiebreak); left rows all carry NULL __rpay, so the
    # key is inert for them
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__rpay").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(F.col("__rpay"), ignorenulls=True).over(w)
    return (
        unioned.withColumn("__carried", carried)
        .filter(F.col("__side") == 1)
        .select(
            *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
            *[F.col("__carried").getField(c).alias(f"{c}{suffix}") for c in right_cols],
        )
    )
