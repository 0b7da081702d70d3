"""Mapper — per-target-column projection with rename and expressions.

Reference: ``Classes/Mapper.php:24-49`` — for each configured
``targetColumn → rule``, emit either the source attribute named ``rule``
(missing attribute → NULL, the lenient default at ``Mapper.php:39-40``)
or the result of evaluating ``rule`` as an Eel expression against
``record`` + target-provided variables.

Here the whole mapping compiles to a **single narrow select** — one
projection node Catalyst folds into the scan (column pruning reaches the
parquet reader), instead of a per-record PHP loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wwwision_importservice_spark.errors import ConfigurationError
from wwwision_importservice_spark.functions.eel import is_eel_expression, translate_eel


class Mapper:
    """Compile a ``{target_column: rule}`` mapping to Spark columns."""

    def __init__(self, mapping: dict[str, str], variables: dict[str, str] | None = None):
        for name, rule in mapping.items():
            # Mapping rules have to be strings (Mapper.php:17-21).
            if not isinstance(rule, str):
                raise ConfigurationError(
                    f"Mapping rules have to be strings, got {type(rule).__name__} "
                    f'for mapping "{name}"'
                )
        self.mapping = mapping
        self.variables = variables or {}

    def columns_for(self, df: DataFrame) -> list[Column]:
        cols: list[Column] = []
        for target, rule in self.mapping.items():
            if is_eel_expression(rule):
                try:
                    sql = translate_eel(rule, self.variables)
                    col = F.expr(sql)
                except Exception as exc:  # surface which column failed, like Mapper.php:46-48
                    raise ConfigurationError(
                        f'Failed to map column "{target}": {exc}'
                    ) from exc
            else:
                # attribute passthrough; absent attribute → NULL (Mapper.php:39-40)
                col = F.col(rule) if rule in df.columns else F.lit(None)
            cols.append(col.alias(target))
        return cols

    def apply(self, df: DataFrame, keep: list[str] | None = None) -> DataFrame:
        """Project ``df`` to the mapped target columns (K11).

        ``keep`` carries through engine columns (e.g. ``_id``,
        ``change_type``) unmapped.
        """
        extra = [F.col(c) for c in (keep or []) if c in df.columns]
        return df.select(*extra, *self.columns_for(df))
