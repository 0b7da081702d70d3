"""Engine operators: the diff kernel plus scale-oriented extensions."""

from wwwision_importservice_spark.operators.diff import (
    ChangeType,
    compute_changes,
    changeset_counts,
)

__all__ = ["ChangeType", "compute_changes", "changeset_counts"]
