"""wwwision_importservice_spark — a PySpark-native batch-sync (ETL) engine.

A from-scratch re-expression of the capabilities of
``bwaidelich/Wwwision.ImportService`` (PHP/Neos Flow; see /root/reference)
on Spark DataFrames:

- a keyed record model with last-write-wins dedup and a polymorphic
  version-parse ladder (reference ``Classes/ValueObject/DataRecords.php``,
  ``DataVersion.php``),
- a CDC/diff kernel — added/updated/removed change detection expressed as a
  single full-outer join (reference ``Classes/DataTarget/Dbal/DbalTarget.php``
  ``computeDataChanges``),
- a column-mapping layer whose ``${…}`` expressions compile to Spark SQL
  (reference ``Classes/Mapper.php`` + ``Classes/EelEvaluator.php``),
- pluggable sources (file/HTTP/JDBC/in-memory) and sinks (JDBC
  upsert/delete with soft-delete mode, parquet),
- a preset-driven pipeline runner with template merge, option validation,
  skip guards, events, prune, and setup preflight
  (reference ``Classes/ImportService.php``, ``Classes/Preset.php``),
- scale-oriented extension operators: exact/MinHash-LSH/SimHash/n-gram
  dedup, embedding similarity search, text analysis, multimodal plumbing.

Everything relational is plain DataFrame API so Catalyst optimizes it;
only sources/sinks are hand-written physical code.
"""

from wwwision_importservice_spark.record import RecordFrame
from wwwision_importservice_spark.operators.diff import ChangeType, compute_changes
from wwwision_importservice_spark.mapping import Mapper
from wwwision_importservice_spark.session import get_spark

__all__ = [
    "RecordFrame",
    "ChangeType",
    "compute_changes",
    "Mapper",
    "get_spark",
]

__version__ = "0.1.0"
