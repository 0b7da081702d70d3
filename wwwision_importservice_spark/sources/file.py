"""File source: JSON (array-of-objects), parquet, CSV, ORC.

Reference S1: ``Classes/DataSource/File/FileSource.php:37-41`` reads ONE
JSON file containing an array of objects (``json_decode`` of the whole
file), so the Spark reader defaults to ``multiLine`` JSON. Parquet/CSV are
native extensions (the driver testdata is parquet). Setup preflight checks
readability like ``FileSource.php:26-35``.

Scale: a directory/glob of files partitions the scan across executors for
free; a single giant multiLine JSON is driver-unfriendly at 100 TB —
prefer JSONL (``multi_line=False``) or parquet there, both splittable.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from wwwision_importservice_spark.plans.result import Result
from wwwision_importservice_spark.plans.schema import OptionsSchema
from wwwision_importservice_spark.sources.base import DataSource


class FileSource(DataSource):
    def __init__(
        self,
        path: str,
        format: str = "json",
        multi_line: bool = True,
        schema: str | None = None,
        **reader_options: Any,
    ) -> None:
        self.path = path
        self.format = format
        self.multi_line = multi_line
        self.schema = schema
        self.reader_options = reader_options

    @classmethod
    def options_schema(cls) -> OptionsSchema:
        return (
            OptionsSchema.create()
            .requires("path", "string")
            .has("format", "string")
            .has("multi_line", "boolean")
            .has("schema", "string")
            .allow_additional_options()
        )

    def load(self, spark: SparkSession) -> DataFrame:
        reader = spark.read
        if self.schema:
            reader = reader.schema(self.schema)
        if self.format == "json":
            return reader.options(**self.reader_options).option(
                "multiLine", self.multi_line
            ).json(self.path)
        if self.format == "parquet":
            return reader.options(**self.reader_options).parquet(self.path)
        if self.format == "csv":
            return reader.options(header=True, **self.reader_options).csv(self.path)
        if self.format == "orc":
            return reader.options(**self.reader_options).orc(self.path)
        raise ValueError(f"Unsupported file format: {self.format}")

    def setup(self, spark: SparkSession) -> Result:
        result = Result()
        # Glob/dir paths are valid Spark inputs; only flag plainly missing
        # local paths (FileSource.php:26-35 checks is_file/is_readable).
        if "*" not in self.path and not os.path.exists(self.path):
            result.add_error(f'File "{self.path}" does not exist')
        elif os.path.isfile(self.path) and not os.access(self.path, os.R_OK):
            result.add_error(f'File "{self.path}" is not readable')
        else:
            result.add_notice(f'Source path "{self.path}" is readable')
        return result
