"""In-memory / callable source — the test seam.

Reference S5: ``Classes/DataSource/Closure/ClosureDataSource.php`` exists
explicitly so tests can inject records via a closure
(``:11-19``), with ``replaceClosure`` to swap datasets mid-scenario
(``:43-46``).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from wwwision_importservice_spark.plans.result import Result
from wwwision_importservice_spark.sources.base import DataSource


class CallableSource(DataSource):
    """Wrap a ``fn(spark, options) → DataFrame`` (or rows+schema)."""

    def __init__(
        self,
        fn: Callable[[SparkSession, dict[str, Any]], Any] | None = None,
        rows: list | None = None,
        schema: str | None = None,
        options: dict[str, Any] | None = None,
    ) -> None:
        self.fn = fn
        self.rows = rows
        self.schema = schema
        self.options = options or {}

    def replace_callable(self, fn: Callable) -> None:
        """``ClosureDataSource::replaceClosure`` (test dataset swap)."""
        self.fn = fn

    def load(self, spark: SparkSession) -> DataFrame:
        if self.fn is not None:
            out = self.fn(spark, self.options)
            if isinstance(out, DataFrame):
                return out
            return spark.createDataFrame(out, schema=self.schema)
        if self.rows is not None:
            return spark.createDataFrame(self.rows, schema=self.schema)
        raise ValueError("CallableSource needs fn or rows")

    def setup(self, spark: SparkSession) -> Result:
        result = Result()
        result.add_notice("In-memory source requires no setup")
        return result
