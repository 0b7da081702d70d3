"""The diff kernel — source-vs-target change detection as ONE full-outer join.

This is the reference's query heart. Both its target implementations share
the algorithm (``Classes/DataTarget/Dbal/DbalTarget.php:66-85`` and
``Classes/DataTarget/ContentRepository/ContentRepositoryTarget.php:85-136``):

- **removed** = local ids ∖ source ids (CR refinement: only *active*,
  i.e. non-hidden, local rows are removal candidates — hidden/soft-deleted
  rows must not re-appear as removals every run,
  ``ContentRepositoryTarget.php:95-107``),
- **added**   = source ids ∖ local ids,
- **updated** = source ∩ local where
  ``forceUpdates OR source.version IS NULL OR local.version IS NULL
  OR source.version > local.version``
  (``DbalTarget.php:106-116``; unversioned ⇒ always update).

The reference runs this as a per-record loop probing in-memory hash maps —
a hand-rolled hash join. Here it is a single **full-outer equi-join on the
key** plus a CASE expression, which gives Catalyst one shuffle (or zero
when the local side broadcasts) for all three change classes at once,
instead of the three separate joins a literal translation would cost.

Output is a CDC frame: all source columns + ``change_type`` ∈
{'add','update','remove'} (like Delta CDF's ``_change_type``). For
removes the source columns are NULL and ``_id`` carries the local id.

Scale notes:
- The local side should be pre-pruned to ``(_id, version[, hidden])`` —
  mirrors the reference's narrow target-state scan
  (``DbalTarget.php:118-128``). :func:`compute_changes` re-prunes
  defensively; Catalyst pushes the projection into the scan.
- ``broadcast_local=True`` hints a broadcast-hash join for small target
  keysets (the PHP assoc array *is* a build-side hash table —
  ``DbalTarget.php:97-103``).
- The DEFAULT single full-outer join can never broadcast, by Spark
  design: ``BroadcastHashJoinExec`` supports inner/left/right/semi/anti
  but not full-outer (the streamed side cannot enumerate the build
  side's unmatched rows), and AQE therefore won't convert it no matter
  how small the pruned local side is — it stays a shuffle join (SMJ, or
  shuffled-hash under AQE). That is exactly why ``broadcast_local=True``
  exists as a *split* plan — add/update as broadcast inner+left joins,
  remove as a broadcast anti join, same ChangeSet (same oracle) — and
  why the bucketed-parquet target removes the *target-side* exchange
  for the large-target shape instead (``sinks/bucketed.py``). Pinned by
  ``test_diff_default_full_outer_stays_shuffle_join``.
- No-op rows (present on both sides, version not newer) are filtered
  before any downstream work — at 100 TB the no-op class is typically
  ~70-95% of rows, so dropping them early keeps the sink stage small.

Divergence note: when ``idPrefix`` is set, the reference probes its
local-version map with *unprefixed* ids against *prefixed* keys
(``ContentRepositoryTarget.php:108-118``), so every intersecting record
looks version-less and updates unconditionally — an apparent bug. This
engine strips the prefix before the join, so version comparison works as
documented.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wwwision_importservice_spark.record import ID_COL, VERSION_COL

CHANGE_TYPE_COL = "change_type"
LOCAL_VERSION_COL = "_local_version"
LOCAL_HIDDEN_COL = "_local_hidden"


class ChangeType:
    ADD = "add"
    UPDATE = "update"
    REMOVE = "remove"


def is_updated_predicate(
    source_version: Column, local_version: Column, force_updates: bool
) -> Column:
    """The four-branch update predicate (``DbalTarget.php:106-116``).

    NULL version = the reference's ``DataVersion::NONE`` (unversioned):
    an unversioned source record always updates, and a record whose local
    counterpart is unversioned always updates.
    """
    if force_updates:
        return F.lit(True)
    return (
        source_version.isNull()
        | local_version.isNull()
        | (source_version > local_version)
    )


def strip_id_prefix(identifier: Column, id_prefix: str | None) -> Column:
    """J6 read-side: target ids are ``idPrefix + sourceId``; strip on read
    (``ContentRepositoryTarget.php:99``: ``substr`` — a plain prefix cut,
    not a pattern match)."""
    if not id_prefix:
        return identifier
    return F.substring(identifier, len(id_prefix) + 1, 2147483647)


def prepend_id_prefix(identifier: Column, id_prefix: str | None) -> Column:
    """J6 write-side (``ContentRepositoryTarget.php:346-349``)."""
    if not id_prefix:
        return identifier
    return F.concat(F.lit(id_prefix), identifier)


def compute_changes(
    source: DataFrame,
    local_state: DataFrame,
    *,
    force_updates: bool = False,
    skip_added: bool = False,
    skip_removed: bool = False,
    local_id_col: str = ID_COL,
    local_version_col: str | None = None,
    local_hidden_col: str | None = None,
    id_prefix: str | None = None,
    broadcast_local: bool = False,
) -> DataFrame:
    """Compute the ChangeSet of ``source`` against ``local_state`` as a CDC frame.

    ``source`` must carry the RecordFrame invariant (unique string ``_id``,
    optional ``_version``). ``local_state`` is any DataFrame exposing the
    target's current keys (``local_id_col``), optionally a version column
    and a soft-delete flag column.

    Returns all source columns + ``change_type`` + ``_local_version`` (+
    ``_local_hidden`` when configured). Rows with no change are dropped.
    """
    # Narrow target-state scan (column pruning like DbalTarget.php:118-128);
    # Catalyst pushes this projection down to the source scan.
    local_cols = [
        strip_id_prefix(F.col(local_id_col).cast("string"), id_prefix).alias(ID_COL),
        (
            F.col(local_version_col).cast("long")
            if local_version_col
            else F.lit(None).cast("long")
        ).alias(LOCAL_VERSION_COL),
        (
            F.col(local_hidden_col).cast("boolean")
            if local_hidden_col
            else F.lit(False)
        ).alias(LOCAL_HIDDEN_COL),
        F.lit(True).alias("__loc_present"),
    ]
    local = local_state.select(*local_cols)

    src_version = (
        F.col(VERSION_COL) if VERSION_COL in source.columns else F.lit(None).cast("long")
    )

    if broadcast_local:
        # Spark cannot broadcast a full-outer join, so for a small target
        # keyset we split into three joins: add/update become *shuffle-free*
        # broadcast-hash joins (the wide source rows never move), and the
        # remove anti-join touches only the two narrow id columns. This is
        # the 100 TB-source/small-target fast path.
        b = F.broadcast(local.drop("__loc_present"))
        attrs = [c for c in source.columns]
        pred = is_updated_predicate(
            src_version, F.col(LOCAL_VERSION_COL), force_updates
        )
        adds = (
            source.join(b.select(ID_COL), ID_COL, "left_anti")
            .withColumn(LOCAL_VERSION_COL, F.lit(None).cast("long"))
            .withColumn(LOCAL_HIDDEN_COL, F.lit(None).cast("boolean"))
            .withColumn(CHANGE_TYPE_COL, F.lit(ChangeType.ADD))
        )
        updates = (
            source.join(b, ID_COL, "inner")
            .filter(pred)
            .withColumn(CHANGE_TYPE_COL, F.lit(ChangeType.UPDATE))
        )
        removes = (
            local.drop("__loc_present")
            .filter(~F.col(LOCAL_HIDDEN_COL))
            .join(source.select(ID_COL), ID_COL, "left_anti")
            .select(
                F.col(ID_COL),
                *[
                    F.lit(None).cast(source.schema[c].dataType).alias(c)
                    for c in attrs
                    if c != ID_COL
                ],
                F.col(LOCAL_VERSION_COL),
                F.col(LOCAL_HIDDEN_COL),
                F.lit(ChangeType.REMOVE).alias(CHANGE_TYPE_COL),
            )
        )
        out = adds.unionByName(updates)
        if not skip_removed:
            out = out.unionByName(removes)
        if skip_added:
            out = out.filter(F.col(CHANGE_TYPE_COL) != ChangeType.ADD)
        keep = list(source.columns)
        projection = [F.col(c) for c in keep] + [
            F.col(LOCAL_VERSION_COL),
            F.col(CHANGE_TYPE_COL),
        ]
        if local_hidden_col:
            projection.insert(-1, F.col(LOCAL_HIDDEN_COL))
        return out.select(*projection)

    src = source.withColumn("__src_present", F.lit(True))

    joined = src.join(local, on=ID_COL, how="full_outer")

    updated_pred = is_updated_predicate(
        src_version, F.col(LOCAL_VERSION_COL), force_updates
    )

    change = (
        F.when(F.col("__loc_present").isNull(), F.lit(ChangeType.ADD))
        .when(
            F.col("__src_present").isNull() & ~F.col(LOCAL_HIDDEN_COL),
            F.lit(ChangeType.REMOVE),
        )
        .when(
            F.col("__src_present").isNotNull()
            & F.col("__loc_present").isNotNull()
            & updated_pred,
            F.lit(ChangeType.UPDATE),
        )
    )

    out = joined.withColumn(CHANGE_TYPE_COL, change).filter(
        F.col(CHANGE_TYPE_COL).isNotNull()
    )
    if skip_added:
        out = out.filter(F.col(CHANGE_TYPE_COL) != ChangeType.ADD)
    if skip_removed:
        out = out.filter(F.col(CHANGE_TYPE_COL) != ChangeType.REMOVE)

    keep = [c for c in source.columns if c != "__src_present"]
    projection = [F.col(c) for c in keep] + [
        F.col(LOCAL_VERSION_COL),
        F.col(CHANGE_TYPE_COL),
    ]
    if local_hidden_col:
        projection.insert(-1, F.col(LOCAL_HIDDEN_COL))
    return out.select(*projection)


def changeset_counts(cdc: DataFrame) -> DataFrame:
    """A1 — per-change-type cardinalities for progress/reporting
    (``Classes/Command/ImportCommandController.php:199-204``). A hash
    aggregate with map-side partial counts."""
    return cdc.groupBy(CHANGE_TYPE_COL).agg(F.count(F.lit(1)).alias("n"))
