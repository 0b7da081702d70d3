"""Pluggable data sources (SURVEY §2.1).

Each source is a reader: ``load(spark) → DataFrame`` (raw, pre-keying)
plus a ``setup(spark) → Result`` preflight, mirroring
``Classes/DataSource/DataSourceInterface.php:11-17``. Keying (K1) is the
engine's job, not the source's — the pipeline wraps ``load`` output in
``RecordFrame.from_raw``.

The type registry mirrors the reference's factory-class lookup
(``Classes/Factory/PresetFactory.php:32-40``).
"""

from wwwision_importservice_spark.sources.base import DataSource
from wwwision_importservice_spark.sources.file import FileSource
from wwwision_importservice_spark.sources.http import HttpSource
from wwwision_importservice_spark.sources.jdbc import JdbcSource
from wwwision_importservice_spark.sources.memory import CallableSource

SOURCE_TYPES: dict[str, type[DataSource]] = {
    "file": FileSource,
    "http": HttpSource,
    "jdbc": JdbcSource,
    "callable": CallableSource,
}


def register_source_type(name: str, cls: type[DataSource]) -> None:
    SOURCE_TYPES[name] = cls


__all__ = [
    "DataSource",
    "FileSource",
    "HttpSource",
    "JdbcSource",
    "CallableSource",
    "SOURCE_TYPES",
    "register_source_type",
]
