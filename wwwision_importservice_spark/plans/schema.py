"""Options schema validation mirroring the reference's OptionsSchema.

Reference: ``Classes/OptionsSchema.php`` — fluent ``requires``/``has``
per-option type checks ('string', 'array', 'boolean', 'integer',
'callable'), unknown options rejected unless ``allowAdditionalOptions``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from wwwision_importservice_spark.errors import ConfigurationError

_TYPES: dict[str, type | tuple[type, ...]] = {
    "string": str,
    "array": (list, dict),
    "boolean": bool,
    "integer": int,
    "float": (int, float),
}


class OptionsSchema:
    """``OptionsSchema.create().requires('x','string').has('y','integer')
    .validate(options)`` — immutable fluent builder like the reference."""

    def __init__(
        self,
        schema: dict[str, dict[str, Any]] | None = None,
        allow_additional: bool = False,
    ) -> None:
        self._schema = dict(schema or {})
        self._allow_additional = allow_additional

    @classmethod
    def create(cls) -> "OptionsSchema":
        return cls()

    def requires(self, name: str, type_: str) -> "OptionsSchema":
        schema = dict(self._schema)
        schema[name] = {"required": True, "type": type_}
        return OptionsSchema(schema, self._allow_additional)

    def has(self, name: str, type_: str) -> "OptionsSchema":
        schema = dict(self._schema)
        schema[name] = {"required": False, "type": type_}
        return OptionsSchema(schema, self._allow_additional)

    def allow_additional_options(self) -> "OptionsSchema":
        return OptionsSchema(self._schema, True)

    def validate(self, options: dict[str, Any]) -> None:
        """Raise ConfigurationError on missing/unknown/wrongly-typed options
        (``OptionsSchema.php:82-106``)."""
        uncovered = dict(options)
        for name, spec in self._schema.items():
            if name not in options or options[name] is None:
                if spec["required"]:
                    raise ConfigurationError(f'Missing required option "{name}"')
                uncovered.pop(name, None)
                continue
            expected = spec.get("type", "string")
            value = options[name]
            if expected == "callable":
                if not callable(value) and not (
                    isinstance(value, str) and value
                ):
                    raise ConfigurationError(
                        f'Option "{name}" must be a callable (or a registered '
                        f"processor name) but got {type(value).__name__}"
                    )
            else:
                pytypes = _TYPES.get(expected)
                if pytypes is None:
                    raise ConfigurationError(
                        f'Unknown schema type "{expected}" for option "{name}"'
                    )
                # bool is an int subclass in Python; keep 'integer' strict.
                if expected == "integer" and isinstance(value, bool):
                    raise ConfigurationError(
                        f'Option "{name}" must be of type integer but it is a boolean'
                    )
                if not isinstance(value, pytypes):
                    raise ConfigurationError(
                        f'Option "{name}" must be of type {expected} but it is a '
                        f"{type(value).__name__}"
                    )
            uncovered.pop(name, None)
        if not self._allow_additional and uncovered:
            names = '", "'.join(sorted(uncovered))
            raise ConfigurationError(
                f'The following option(s) are not supported: "{names}"'
            )
