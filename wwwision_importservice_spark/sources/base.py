"""Source contract (``Classes/DataSource/DataSourceInterface.php:11-17``)."""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from wwwision_importservice_spark.plans.result import Result
from wwwision_importservice_spark.plans.schema import OptionsSchema


class DataSource(ABC):
    """A reader producing the raw record frame for one import run."""

    @classmethod
    def options_schema(cls) -> OptionsSchema:
        """Per-source option validation (``DataSourceInterface::getOptionsSchema``)."""
        return OptionsSchema.create().allow_additional_options()

    @classmethod
    def from_options(cls, options: dict[str, Any]) -> "DataSource":
        cls.options_schema().validate(options)
        return cls(**options)  # type: ignore[call-arg]

    @abstractmethod
    def load(self, spark: SparkSession) -> DataFrame:
        """Extract the full record set (reference ``load(): DataRecords``)."""

    def setup(self, spark: SparkSession) -> Result:
        """Preflight check; override per source (W11)."""
        return Result()
