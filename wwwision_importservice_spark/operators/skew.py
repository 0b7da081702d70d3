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

from pyspark.sql import DataFrame
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
