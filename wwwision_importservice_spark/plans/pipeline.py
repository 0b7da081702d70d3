"""The pipeline runner — ``ImportService`` re-expressed over DataFrames.

Reference: ``Classes/ImportService.php:71-88`` — load → preComputeChanges
→ diff → preImportData → skip guards → add → update → remove → finalize,
with a 13-event callback bus (``:17-31``) and per-record error isolation
(``:140-150``).

Spark shape: the whole run is ONE lazy DataFrame DAG; jobs trigger at the
guard counts and the sink write. Per-record events become per-phase
events carrying counts (per-item callbacks would force row-at-a-time
execution — the exact anti-pattern this engine replaces); the O3 error
quarantine lives in the sink writers and surfaces through
``ApplyStats.errors`` + the ``error`` event.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wwwision_importservice_spark.errors import ImportServiceError
from wwwision_importservice_spark.operators.diff import (
    CHANGE_TYPE_COL,
    ChangeType,
    compute_changes,
    incremental_changes,
)
from wwwision_importservice_spark.plans.preset import Preset
from wwwision_importservice_spark.plans.result import Result
from wwwision_importservice_spark.record import ID_COL, VERSION_COL


class Events:
    """Event names (``ImportService.php:17-31``)."""

    ERROR = "error"
    PRE_COMPUTE_CHANGES = "preComputeChanges"
    PRE_IMPORT_DATA = "preImportData"
    PRE_ADD_DATA = "preAddData"
    ADD_DATA = "addData"
    POST_ADD_DATA = "postAddData"
    PRE_UPDATE_DATA = "preUpdateData"
    UPDATE_DATA = "updateData"
    POST_UPDATE_DATA = "postUpdateData"
    PRE_REMOVE_DATA = "preRemoveData"
    REMOVE_DATA = "removeData"
    POST_REMOVE_DATA = "postRemoveData"


def replay_changelog(
    spark: SparkSession,
    target,
    changelog_dir: str,
    runs: list[str] | None = None,
) -> dict[str, int]:
    """Apply a changelog's run directories to a target, in order — the
    consumer half of the CDC feed contract: a replica built purely from
    the changelog reproduces the primary's state (pinned by
    ``test_changelog_replay_reproduces_target``).

    ``runs=None`` discovers ``run_id=*`` directories and applies them in
    LEXICOGRAPHIC order — use sortable run ids (zero-padded sequence
    numbers or ISO timestamps) or pass the order explicitly. Staging and
    parked directories (``.staging_*`` / ``.prev_*``) are never replayed
    — only committed runs exist under ``run_id=``.
    """
    if runs is None:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(changelog_dir)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(hpath):
            raise ImportServiceError(
                f'Changelog directory "{changelog_dir}" does not exist'
            )
        names = [
            s.getPath().getName() for s in fs.listStatus(hpath)
        ]
        runs = sorted(
            n.split("=", 1)[1] for n in names if n.startswith("run_id=")
        )
    totals = {"added": 0, "updated": 0, "removed": 0, "errors": 0, "runs": 0}
    base = changelog_dir.rstrip("/")
    for run in runs:
        cdc = spark.read.parquet(f"{base}/run_id={run}")
        stats = target.apply(spark, cdc)
        totals["added"] += stats.added
        totals["updated"] += stats.updated
        totals["removed"] += stats.removed
        totals["errors"] += stats.errors
        totals["runs"] += 1
    return totals


class ImportPipeline:
    def __init__(self, preset: Preset, spark: SparkSession) -> None:
        self.preset = preset
        self.spark = spark
        self._callbacks: dict[str, list[Callable[..., Any]]] = {}

    # -- events (ImportService::on / dispatch) --------------------------- #
    def on(self, event: str, callback: Callable[..., Any]) -> None:
        self._callbacks.setdefault(event, []).append(callback)

    def _dispatch(self, event: str, *args: Any) -> None:
        for cb in self._callbacks.get(event, []):
            cb(*args)

    # -- the run (ImportService::importData) ----------------------------- #
    def compute_changes(self, force_updates: bool = False) -> DataFrame:
        """Extract + key + process + diff → CDC frame (lazy).

        The preset's ``diffStrategy`` picks the physical plan (identical
        ChangeSet): ``full`` = one full-outer join; ``broadcast`` =
        split 3-join plan for small target keysets; ``incremental`` =
        narrow ``(_id,_version)`` diff + broadcast late materialization
        for mostly-unchanged syncs — without a dataProcessor the K1
        dedup is additionally deferred past the changed-id filter, so no
        exchange carries the full wide data; ``auto`` = probe the narrow
        target size (one count job) and pick broadcast vs full."""
        records = self.preset.load(self.spark)
        if self.preset.quality_checks:
            # data-quality preflight (operators/quality_checks.py): the
            # whole declared suite is ONE aggregate job over the keyed
            # frame; any failed constraint aborts before the diff ever
            # plans, with every violation named in the error
            from wwwision_importservice_spark.operators.quality_checks import (
                assert_checks,
            )

            try:
                assert_checks(records.df, self.preset.quality_checks)
            except ValueError as exc:
                raise ImportServiceError(str(exc)) from exc
        self._dispatch(Events.PRE_COMPUTE_CHANGES, records)
        target = self.preset.target
        local = target.current_state(self.spark)
        common = dict(
            force_updates=force_updates,
            skip_added=self.preset.skip_added,
            skip_removed=self.preset.skip_removed,
            local_id_col=target.id_column,
            local_version_col=target.version_column,
            local_hidden_col=target.hidden_column,
            id_prefix=target.id_prefix,
        )
        strategy = self.preset.diff_strategy
        if strategy == "auto":
            # One count job over the NARROW state (id/version/hidden —
            # Catalyst prunes the scan) decides the plan. Worth a probe
            # job because AQE can never broadcast-convert the full-outer
            # plan itself (diff.py header); the guard counts in run()
            # trigger jobs anyway, so a sync was never zero-job.
            n = local.count()
            strategy = (
                "broadcast" if n <= self.preset.auto_broadcast_rows else "full"
            )
        if strategy == "incremental":
            # The deferred-dedup wide branch re-runs last-wins dedup on
            # the changed slice, so its winner must provably match the
            # winner that drove the narrow update decision — only a
            # DETERMINISTIC total order guarantees that. Without an
            # order_attribute both dedups would use independent
            # monotonically_increasing_id instances, which Spark
            # re-evaluates per plan branch (review finding: a duplicate
            # id could update on v=9 but write the v=5 attributes), so
            # fall back to re-joining the already-deduped frame.
            wide = worder = None
            if (
                self.preset.data_processor is None
                and self.preset.order_attribute
            ):
                wide = self.preset.load(self.spark, dedup=False).df
                worder = F.col(self.preset.order_attribute)
            return incremental_changes(
                records.df,
                local,
                wide_source=wide,
                wide_order_by=worder,
                **common,
            )
        return compute_changes(
            records.df,
            local,
            broadcast_local=(
                strategy == "broadcast" or self.preset.force_broadcast_state
            ),
            **common,
        )

    def explain(self, force_updates: bool = False) -> str:
        """Formatted physical plan of the diff, without executing it —
        the preflight a pipeline operator reads before pointing a new
        preset at a 100 TB target (are the scans pruned? which side
        shuffles? did the broadcast hint take?)."""
        cdc = self._apply_mapping(self.compute_changes(force_updates))
        mode = self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        return cdc._jdf.queryExecution().explainString(mode)

    def run(
        self,
        force_updates: bool = False,
        changelog_dir: str | None = None,
        run_id: str | None = None,
    ) -> dict[str, int]:
        """Execute the sync; ``changelog_dir`` additionally persists the
        mapped CDC frame as parquet under ``<dir>/run_id=<id>/``
        partitioned by change_type — the audit/incremental-consumer feed
        (Delta CDF shape) downstream jobs read instead of re-diffing.

        Changelog consistency contract: the CDC frame is STAGED to a
        hidden sibling directory before ``target.apply`` (it must be
        materialized pre-apply — its lineage reads the target's current
        state, which apply rewrites) and COMMITTED to ``run_id=<id>/``
        by a filesystem rename only after apply succeeds. A failed sync
        leaves no changelog entries to replay-diverge from the primary,
        and re-running a run id replaces its directory — idempotent,
        never append-duplicating CDC rows. Records quarantined by the
        sink (``ApplyStats.errors``) still appear in the changelog: it
        documents the computed change set, not per-record sink
        outcomes."""
        cdc = self.compute_changes(force_updates).cache()
        try:
            self._dispatch(Events.PRE_IMPORT_DATA, cdc)

            counts = {
                row[CHANGE_TYPE_COL]: row["n"]
                for row in cdc.groupBy(CHANGE_TYPE_COL)
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            added = counts.get(ChangeType.ADD, 0)
            updated = counts.get(ChangeType.UPDATE, 0)
            removed = counts.get(ChangeType.REMOVE, 0)

            # Skip guards (ImportService.php:77-82): with a conforming
            # target these can't fire (compute_changes already suppressed
            # the branches); they protect against targets that ignore the
            # flags.
            if self.preset.skip_added and added:
                raise ImportServiceError(
                    "This preset is configured to skip added records, but the "
                    "data target returned new records. Check your configuration "
                    "and consider executing migrations"
                )
            if self.preset.skip_removed and removed:
                raise ImportServiceError(
                    "This preset is configured to skip removed records, but the "
                    "data target returned removed records. Check your "
                    "configuration and consider executing migrations"
                )

            mapped = self._apply_mapping(cdc)

            # stage the changelog BEFORE apply (see docstring contract)
            staging = run_dir = None
            if changelog_dir is not None:
                base = changelog_dir.rstrip("/")
                sub = f"run_id={run_id}" if run_id else "run_id=unlabeled"
                run_dir = f"{base}/{sub}"
                staging = f"{base}/.staging_{sub}"
                if sum(counts.values()):
                    (
                        mapped.write.partitionBy(CHANGE_TYPE_COL)
                        .mode("overwrite")
                        .parquet(staging)
                    )
                else:
                    # an all-noop run writes an EMPTY frame: partitionBy
                    # would emit no part files (directory unreadable —
                    # no schema to infer). Write the empty frame into an
                    # explicit hive-style partition dir instead, so the
                    # leaf-file DEPTH stays uniform with partitioned
                    # runs and a consumer reading the changelog ROOT
                    # (partition discovery over run_id=/change_type=)
                    # never sees conflicting directory structures.
                    (
                        mapped.drop(CHANGE_TYPE_COL)
                        .write.mode("overwrite")
                        .parquet(f"{staging}/{CHANGE_TYPE_COL}=__none__")
                    )

            if added:
                self._dispatch(Events.PRE_ADD_DATA, added)
            if updated:
                self._dispatch(Events.PRE_UPDATE_DATA, updated, force_updates)
            if removed:
                self._dispatch(Events.PRE_REMOVE_DATA, removed)

            try:
                stats = self.preset.target.apply(self.spark, mapped)
            except BaseException:
                if staging is not None:
                    self._fs_delete(staging)
                raise

            # commit: rename staging -> run_id dir (replace on re-run)
            if staging is not None:
                self._fs_commit(staging, run_dir)

            if stats.errors:
                self._dispatch(
                    Events.ERROR,
                    f"{stats.errors} record(s) failed to apply and were quarantined",
                )
            if added:
                self._dispatch(Events.POST_ADD_DATA)
            if updated:
                self._dispatch(Events.POST_UPDATE_DATA)
            if removed:
                self._dispatch(Events.POST_REMOVE_DATA)

            self.preset.target.finalize(self.spark)
            return {
                "added": stats.added,
                "updated": stats.updated,
                "removed": stats.removed,
                "errors": stats.errors,
            }
        finally:
            cdc.unpersist()

    # -- changelog staging commit (Hadoop FS — any scheme Spark writes) -- #
    def _hadoop_fs(self, path: str):
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        return hpath.getFileSystem(self.spark._jsc.hadoopConfiguration()), hpath

    def _fs_delete(self, path: str) -> None:
        fs, hpath = self._hadoop_fs(path)
        if fs.exists(hpath):
            fs.delete(hpath, True)

    def _fs_commit(self, staging: str, final: str) -> None:
        """Promote the staged run directory via a rename shuffle that
        never deletes data before its replacement is in place: any
        previous run dir is first RENAMED aside (to a dot-prefixed
        sibling, hidden from partition discovery), then staging renames
        into the final name, then the parked previous dir is deleted. A
        crash between the renames leaves the run dir briefly absent but
        BOTH generations intact on disk (the next run's commit clears
        the parked dir) — strictly better than the delete-then-rename
        window, where a crash destroyed the previous entries with the
        new ones stranded in staging. Renames are atomic on HDFS/local;
        on object stores they degrade to copy+delete — the standard
        job-commit trade-off, acceptable because each run_id directory
        is single-writer."""
        base, name = final.rsplit("/", 1)
        parked = f"{base}/.prev_{name}"
        fs, final_p = self._hadoop_fs(final)
        _, staging_p = self._hadoop_fs(staging)
        _, parked_p = self._hadoop_fs(parked)
        if fs.exists(parked_p):
            fs.delete(parked_p, True)
        had_prev = fs.exists(final_p)
        if had_prev and not fs.rename(final_p, parked_p):
            raise ImportServiceError(
                f"Failed to park previous changelog {final}"
            )
        if not fs.rename(staging_p, final_p):
            if had_prev:
                fs.rename(parked_p, final_p)  # restore the previous run
            raise ImportServiceError(
                f"Failed to commit changelog {staging} -> {final}"
            )
        if had_prev:
            fs.delete(parked_p, True)

    def _apply_mapping(self, cdc: DataFrame) -> DataFrame:
        """K11 at the set level: map attribute columns, carry engine columns."""
        mapper = self.preset.mapper
        if mapper is None:
            return cdc
        keep = [c for c in (ID_COL, VERSION_COL, CHANGE_TYPE_COL) if c in cdc.columns]
        keep += [c for c in cdc.columns if c.startswith("_local_")]
        return mapper.apply(cdc, keep=keep)

    # -- prune (ImportService::removeAllData) ---------------------------- #
    def remove_all(self) -> int:
        if self.preset.skip_added or self.preset.skip_removed:
            raise ImportServiceError(
                "This preset is configured to skip added/removed records, so "
                "no local records must be removed."
            )
        try:
            return self.preset.target.remove_all(self.spark)
        except ImportServiceError:
            raise
        except Exception as exc:
            raise ImportServiceError(
                f"Exception while removing all local records: {exc}"
            ) from exc

    # -- setup (ImportService::setup) ------------------------------------ #
    def setup(self) -> Result:
        result = Result()
        result.merge(self.preset.source.setup(self.spark))
        result.merge(self.preset.target.setup(self.spark))
        return result
