"""Column-level function helpers: version parsing, Eel→Spark SQL translation."""

from wwwision_importservice_spark.functions.versions import version_expr
from wwwision_importservice_spark.functions.eel import (
    is_eel_expression,
    translate_eel,
)

__all__ = ["version_expr", "is_eel_expression", "translate_eel"]
