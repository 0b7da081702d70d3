"""Record-to-many variant expansion — the reference's one UDTF-like operator.

Reference: ``nodeVariantsResolver`` maps each record to an array of
dimension-value sets, and the CR target creates **one node per variant**
(``Classes/DataTarget/ContentRepository/ContentRepositoryTarget.php:173-192``;
resolver wiring ``ContentRepositoryTargetFactory.php:41-45``). The default
(no resolver) is the parent's single dimension set — exactly one output
row.

Spark shape: a column expression producing ``ArrayType`` + ``explode``
(SURVEY §2.8(4)). Row multiplicity changes, so the keyed invariant is
re-established by suffixing the variant discriminator into the id —
mirroring the CR's one-node-per-variant identity (node id stays the
prefixed record id; the dimensions hash distinguishes the rows).

Scale notes: ``explode`` is a Generate — narrow, no shuffle; output
row count is Σ|variants|. A resolver that needs Python logic plugs in as
a UDF/pandas_udf returning the array; everything downstream is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wwwision_importservice_spark.record import ID_COL


def expand_variants(
    df: DataFrame,
    variants: Column,
    *,
    id_col: str = ID_COL,
    variant_col: str = "variant",
    rekey: bool = True,
    sep: str = "#",
) -> DataFrame:
    """Fan each record out to one row per element of ``variants`` (an
    ``ArrayType`` expression evaluated per record).

    With ``rekey`` (default) the output id becomes ``id + sep + variant``
    so the keyed invariant (one row per id) survives the multiplicity
    change; pass ``rekey=False`` to keep the original id on every variant
    row (the CR model, where (id, dimensions) is the real key).
    """
    out = df.withColumn(variant_col, F.explode(variants))
    if rekey:
        out = out.withColumn(
            id_col,
            F.concat(F.col(id_col), F.lit(sep), F.col(variant_col).cast("string")),
        )
    return out
