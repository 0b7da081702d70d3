"""JDBC table source (S3/S4).

Reference: ``Classes/DataSource/Dbal/DbalSource.php:51-80`` — full
``SELECT *`` or, with ``lazyLoading``, a pruned ``SELECT id[, version]``
whose full rows are fetched on demand.

Spark mapping: ``spark.read.jdbc``. The lazy/pruned variant is free —
Catalyst pushes column pruning into the JDBC scan, and the engine's
"late materialization" is a plan shape (diff on the pruned frame, then
join changed ids back to the full scan) rather than per-id point lookups.

Scale: ``partition_column/num_partitions/lower_bound/upper_bound`` split
the table scan into parallel range queries — mandatory for big tables,
otherwise the whole table streams through one executor connection.

Live coverage (r13, VERDICT r12 ask #8): the Spark distribution bundles
Apache Derby (for the Hive metastore), so an embedded-Derby round-trip
runs wherever that jar is on the classpath — the test probes with
:func:`jdbc_driver_available` and skips cleanly otherwise, the same
pattern as the Kafka/TWS classpath probes. The DBAPI path
(sinks/dbapi.py) additionally covers relational round-trips via sqlite.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wwwision_importservice_spark.plans.result import Result
from wwwision_importservice_spark.plans.schema import OptionsSchema
from wwwision_importservice_spark.sources.base import DataSource

#: the embedded driver Spark's own distribution carries (derbytools.jar,
#: shipped for the Hive metastore) — the zero-network live-JDBC endpoint
DERBY_EMBEDDED_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def jdbc_driver_available(spark: SparkSession, driver_class: str) -> bool:
    """True iff ``driver_class`` loads on the session's JVM classpath —
    the runtime probe gating live-JDBC tests (same pattern as the Kafka
    connector probe in ``streaming/``). Loading the class is exactly
    what ``spark.read.jdbc`` will do, so a True here can't false-pass."""
    try:
        spark._jvm.java.lang.Class.forName(driver_class)
        return True
    except Exception:
        return False


class JdbcSource(DataSource):
    def __init__(
        self,
        url: str,
        table: str,
        properties: dict[str, str] | None = None,
        lazy_loading: bool = False,
        id_column: str | None = None,
        version_column: str | None = None,
        partition_column: str | None = None,
        num_partitions: int | None = None,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
    ) -> None:
        self.url = url
        self.table = table
        self.properties = properties or {}
        self.lazy_loading = lazy_loading
        self.id_column = id_column
        self.version_column = version_column
        self.partition_column = partition_column
        self.num_partitions = num_partitions
        self.lower_bound = lower_bound
        self.upper_bound = upper_bound

    @classmethod
    def options_schema(cls) -> OptionsSchema:
        return (
            OptionsSchema.create()
            .requires("url", "string")
            .requires("table", "string")
            .has("properties", "array")
            .has("lazy_loading", "boolean")
            .has("id_column", "string")
            .has("version_column", "string")
            .has("partition_column", "string")
            .has("num_partitions", "integer")
            .has("lower_bound", "integer")
            .has("upper_bound", "integer")
        )

    def _read(self, spark: SparkSession) -> DataFrame:
        kwargs: dict[str, Any] = {
            "url": self.url,
            "table": self.table,
            "properties": self.properties,
        }
        if self.partition_column:
            kwargs.update(
                column=self.partition_column,
                numPartitions=self.num_partitions or 8,
                lowerBound=self.lower_bound or 0,
                upperBound=self.upper_bound or 1_000_000,
            )
        return spark.read.jdbc(**kwargs)

    def load(self, spark: SparkSession) -> DataFrame:
        df = self._read(spark)
        if self.lazy_loading and self.id_column:
            # S4: the pruned scan; full rows re-join post-diff (SURVEY §4
            # "late materialization" plan shape). Catalyst pushes this
            # projection into the JDBC query.
            cols = [self.id_column] + (
                [self.version_column] if self.version_column else []
            )
            return df.select(*[F.col(c) for c in cols])
        return df

    def load_full(self, spark: SparkSession) -> DataFrame:
        """The wide scan to join changed ids back against (S4 step 2)."""
        return self._read(spark)

    def setup(self, spark: SparkSession) -> Result:
        result = Result()
        try:
            self._read(spark).limit(0).schema  # schema probe round-trip
            result.add_notice(f'Source table "{self.table}" is reachable')
        except Exception as exc:
            result.add_error(f'Failed to read source table "{self.table}": {exc}')
        return result
