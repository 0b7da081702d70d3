"""The polymorphic version-parse ladder, as one vectorized Spark expression.

Reference semantics (``Classes/ValueObject/DataVersion.php:48-70``):
a version value may be an int, a numeric string, a datetime, a date
string, or a ``{date, timezone}`` struct (Doctrine datetime
serialization); all coerce to a comparable number (datetimes → unix
timestamp). Negative numbers are rejected (``DataVersion.php:25-31``).
The ``NONE = -1`` sentinel for "unversioned" (``DataVersion.php:13``)
maps to SQL ``NULL`` in this engine, so three-valued logic carries the
"unversioned ⇒ always update" rule (``DbalTarget.php:106-116``) for free.

Everything here is a single JVM-side expression (whole-stage codegen) —
no Python per-row cost.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def version_expr(col: Column, dtype: T.DataType | None = None, strict: bool = True) -> Column:
    """Coerce a heterogeneous version column to a nullable LongType.

    ``dtype`` (the column's Spark type, if known) picks the cheapest
    branch; when ``None`` the string ladder is used. ``strict=True``
    raises on negative versions like the reference; ``strict=False``
    nulls them out.
    """
    if dtype is not None and isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        parsed = col.cast("long")
    elif dtype is not None and isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        parsed = F.unix_timestamp(col)
    elif dtype is not None and isinstance(dtype, T.StructType):
        # Doctrine-style {date: "...", timezone: "..."} serialization.
        parsed = F.unix_timestamp(F.try_to_timestamp(col.getField("date")))
    else:
        # Unknown / string: numeric string beats date string, like the
        # reference's is_numeric check before strtotime.
        parsed = F.coalesce(
            col.try_cast(T.LongType()),
            F.unix_timestamp(F.try_to_timestamp(col)),
        )
    if strict:
        parsed = F.when(
            parsed < 0,
            F.raise_error(
                F.concat(F.lit("Invalid negative version value: "), parsed.cast("string"))
            ),
        ).otherwise(parsed)
    else:
        parsed = F.when(parsed < 0, F.lit(None).cast("long")).otherwise(parsed)
    return parsed


def version_sql(column_sql: str) -> str:
    """ANSI-SQL twin of :func:`version_expr`'s string ladder (for oracles)."""
    return (
        f"coalesce(try_cast({column_sql} as bigint), "
        f"cast(epoch(try_cast({column_sql} as timestamp)) as bigint))"
    )
