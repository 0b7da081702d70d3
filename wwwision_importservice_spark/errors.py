"""Engine exception types, mirroring the reference's error taxonomy.

Reference: ``Classes/ImportServiceException.php:7-9`` (fatal run abort)
and the per-record \\Error isolation in ``Classes/ImportService.php:140-150``.
"""

from __future__ import annotations


class ImportServiceError(Exception):
    """Fatal pipeline error — aborts the run (reference: ImportServiceException)."""


class ConfigurationError(ImportServiceError):
    """Invalid preset/source/target configuration.

    Reference: ``Classes/OptionsSchema.php:82-106`` validation failures and
    ``Classes/Factory/PresetFactory.php:45-49`` option rejection.
    """


class DataError(ImportServiceError):
    """Malformed input data — missing id/version attribute, bad version value.

    Reference: ``Classes/ValueObject/DataRecords.php:31-38`` (missing
    attributes) and ``Classes/ValueObject/DataVersion.php:25-31,64-69``
    (negative / unparseable versions).
    """


class QualityCheckFailure(DataError, ValueError):
    """A data-quality constraint evaluated FALSE on real data.

    Distinct from the plain ``ValueError`` that a *misconfigured* check
    suite raises (duplicate names, empty list): callers in skip-the-batch
    mode (``streaming/sync.py``) catch exactly this type, so a config
    error can never be mistaken for a data violation and silently skip
    every batch forever. Subclasses ``ValueError`` for compatibility
    with pre-round-6 callers.
    """
