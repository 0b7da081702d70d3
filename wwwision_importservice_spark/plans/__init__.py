"""Pipeline plumbing: presets, option schemas, the runner, events, results.

Lazy attribute imports: sinks/sources import ``plans.result`` /
``plans.schema`` at module load, while ``plans.preset`` imports sinks —
eager re-exports here would close that cycle.
"""

from wwwision_importservice_spark.plans.result import Message, Result
from wwwision_importservice_spark.plans.schema import OptionsSchema

__all__ = [
    "Message",
    "Result",
    "OptionsSchema",
    "Preset",
    "PresetRegistry",
    "ImportPipeline",
    "Events",
]


def __getattr__(name: str):
    if name in ("Preset", "PresetRegistry"):
        from wwwision_importservice_spark.plans import preset

        return getattr(preset, name)
    if name in ("ImportPipeline", "Events"):
        from wwwision_importservice_spark.plans import pipeline

        return getattr(pipeline, name)
    raise AttributeError(name)
