"""Pluggable data targets (SURVEY §2.6).

A target exposes the *current state* (the narrow id/version/hidden frame
the diff kernel joins against — reference ``DataTargetInterface::
computeDataChanges`` input) and applies a CDC frame (add/update/remove)
with batched writes, soft-delete mode, and per-row error quarantine.
"""

from wwwision_importservice_spark.sinks.base import ApplyStats, DataTarget
from wwwision_importservice_spark.sinks.bucketed import BucketedParquetTarget
from wwwision_importservice_spark.sinks.parquet import ParquetTarget
from wwwision_importservice_spark.sinks.scd2 import Scd2ParquetTarget
from wwwision_importservice_spark.sinks.dbapi import DbapiTarget
from wwwision_importservice_spark.sinks.jdbc import JdbcTarget

TARGET_TYPES: dict[str, type[DataTarget]] = {
    "parquet": ParquetTarget,
    "bucketed_parquet": BucketedParquetTarget,
    "scd2_parquet": Scd2ParquetTarget,
    "dbapi": DbapiTarget,
    "jdbc": JdbcTarget,
}


def register_target_type(name: str, cls: type[DataTarget]) -> None:
    TARGET_TYPES[name] = cls


__all__ = [
    "ApplyStats",
    "DataTarget",
    "ParquetTarget",
    "BucketedParquetTarget",
    "Scd2ParquetTarget",
    "DbapiTarget",
    "JdbcTarget",
    "TARGET_TYPES",
    "register_target_type",
]
