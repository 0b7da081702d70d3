"""CLI — run / prune / compact / presets / preset / setup.

Reference: ``Classes/Command/ImportCommandController.php`` —
``import:run`` (``--quiet --force-updates --from-fixture
--override-source-options --override-target-options``), ``import:prune``
(confirmation unless ``--assume-yes``), ``import:presets``,
``import:preset`` (config dump), ``import:setup``.

Usage::

    python -m wwwision_importservice_spark.cli run <preset> \
        --presets-file presets.yaml [--force-updates] [--quiet] \
        [--from-fixture] [--override-source-options '{"path": "..."}'] \
        [--explain] [--changelog-dir DIR --run-id ID]

Engine extensions beyond the reference CLI: ``run --explain`` prints the
diff's physical plan without executing (scan-pruning / shuffle / broadcast
preflight), ``run --changelog-dir`` persists the CDC frame partitioned by
change_type (Delta-CDF-shaped audit/incremental feed), and ``compact``
bin-packs file-target snapshots.
"""

from __future__ import annotations

import argparse
import json
import sys

from wwwision_importservice_spark.errors import ImportServiceError
from wwwision_importservice_spark.plans.pipeline import Events, ImportPipeline
from wwwision_importservice_spark.plans.preset import PresetRegistry
from wwwision_importservice_spark.session import get_spark


def _registry(args: argparse.Namespace) -> PresetRegistry:
    return PresetRegistry.from_yaml(args.presets_file)


def _pipeline(args: argparse.Namespace) -> ImportPipeline:
    registry = _registry(args)
    preset = registry.build(
        args.preset,
        source_option_overrides=(
            json.loads(args.override_source_options)
            if getattr(args, "override_source_options", None)
            else None
        ),
        target_option_overrides=(
            json.loads(args.override_target_options)
            if getattr(args, "override_target_options", None)
            else None
        ),
        from_fixture=getattr(args, "from_fixture", False),
    )
    return ImportPipeline(preset, get_spark(app_name=f"import:{args.preset}"))


def cmd_run(args: argparse.Namespace) -> int:
    pipeline = _pipeline(args)
    if args.explain:
        print(pipeline.explain(force_updates=args.force_updates))
        return 0
    quiet = args.quiet
    if not quiet:
        pipeline.on(
            Events.PRE_ADD_DATA, lambda n: print(f"Adding {n} record(s)...")
        )
        pipeline.on(
            Events.PRE_UPDATE_DATA,
            lambda n, force: print(f"Updating {n} record(s)..."),
        )
        pipeline.on(
            Events.PRE_REMOVE_DATA, lambda n: print(f"Removing {n} record(s)...")
        )
        pipeline.on(Events.ERROR, lambda msg: print(f"ERROR: {msg}", file=sys.stderr))
    try:
        stats = pipeline.run(
            force_updates=args.force_updates,
            changelog_dir=args.changelog_dir,
            run_id=args.run_id,
        )
    except ImportServiceError as exc:
        print(f"Import failed: {exc}", file=sys.stderr)
        return 1
    if not quiet:
        print(
            f"Done. added={stats['added']} updated={stats['updated']} "
            f"removed={stats['removed']} errors={stats['errors']}"
        )
    return 0


def cmd_check(args: argparse.Namespace) -> int:
    """Run ONLY the preset's qualityChecks preflight and print the
    per-constraint report — the dry-run for a gated sync (exit 1 when
    any constraint fails, 2 when the preset declares none)."""
    pipeline = _pipeline(args)
    checks = pipeline.preset.quality_checks
    if not checks:
        print(
            f'Preset "{args.preset}" declares no qualityChecks.',
            file=sys.stderr,
        )
        return 2
    from wwwision_importservice_spark.operators.quality_checks import check_suite

    records = pipeline.preset.load(pipeline.spark)
    rows = check_suite(records.df, checks).collect()
    failed = 0
    for r in rows:
        mark = "PASS" if r["passed"] else "FAIL"
        failed += 0 if r["passed"] else 1
        print(
            f"{mark}  {r['check']:<40} metric={r['metric']:<14g} "
            f"band=[{r['lo']:g}, {r['hi']:g}]"
        )
    print(f"{len(rows) - failed}/{len(rows)} checks passed")
    return 1 if failed else 0


def cmd_prune(args: argparse.Namespace) -> int:
    if not args.assume_yes:
        answer = input(
            f'Are you sure you want to prune the preset "{args.preset}"? (y/N) '
        )
        if answer.strip().lower() not in ("y", "yes"):
            print("Aborted.")
            return 0
    pipeline = _pipeline(args)
    try:
        count = pipeline.remove_all()
    except ImportServiceError as exc:
        print(f"Prune failed: {exc}", file=sys.stderr)
        return 1
    print(f"Removed {count} record(s).")
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    pipeline = _pipeline(args)
    target = pipeline.preset.target
    if not hasattr(target, "compact"):
        print(
            f'Target of preset "{args.preset}" does not support compaction.',
            file=sys.stderr,
        )
        return 1
    n_files = target.compact(
        pipeline.spark, target_file_bytes=args.target_file_mb * 1024 * 1024
    )
    print(f"Compacted to {n_files} file(s).")
    return 0


def cmd_replay(args: argparse.Namespace) -> int:
    """Engine extension: rebuild/catch-up the preset's target purely
    from a CDC changelog (the consumer half of ``run --changelog-dir``).
    Replays committed ``run_id=*`` directories in lexicographic order
    unless ``--runs`` pins an explicit comma-separated order."""
    from wwwision_importservice_spark.plans.pipeline import replay_changelog

    pipeline = _pipeline(args)
    runs = args.runs.split(",") if args.runs else None
    try:
        totals = replay_changelog(
            pipeline.spark, pipeline.preset.target, args.changelog_dir, runs
        )
    except ImportServiceError as exc:
        print(f"Replay failed: {exc}", file=sys.stderr)
        return 1
    print(
        f"Replayed {totals['runs']} run(s): added={totals['added']} "
        f"updated={totals['updated']} removed={totals['removed']} "
        f"errors={totals['errors']}"
    )
    return 0


def cmd_presets(args: argparse.Namespace) -> int:
    for name in _registry(args).preset_names():
        print(name)
    return 0


def cmd_preset(args: argparse.Namespace) -> int:
    config = _registry(args).preset_configuration(args.preset)
    print(json.dumps(config, indent=2, default=str))
    return 0


def cmd_setup(args: argparse.Namespace) -> int:
    pipeline = _pipeline(args)
    result = pipeline.setup()
    print(result.render())
    # exit 1 on error or warning (ImportCommandController.php:168-173)
    return 1 if (result.has_errors or result.has_warnings) else 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="spark-import")
    parser.add_argument("--presets-file", default="presets.yaml")
    sub = parser.add_subparsers(dest="command", required=True)

    p_run = sub.add_parser("run", help="run an import preset")
    p_run.add_argument("preset")
    p_run.add_argument("--force-updates", action="store_true")
    p_run.add_argument("--quiet", action="store_true")
    p_run.add_argument("--from-fixture", action="store_true")
    p_run.add_argument("--override-source-options")
    p_run.add_argument("--override-target-options")
    p_run.add_argument(
        "--explain",
        action="store_true",
        help="print the diff's physical plan instead of executing",
    )
    p_run.add_argument(
        "--changelog-dir",
        default=None,
        help="also persist the CDC frame as parquet under this directory",
    )
    p_run.add_argument("--run-id", default=None)
    p_run.set_defaults(fn=cmd_run)

    p_check = sub.add_parser(
        "check", help="run only the preset's qualityChecks and print the report"
    )
    p_check.add_argument("preset")
    p_check.set_defaults(fn=cmd_check)

    p_prune = sub.add_parser("prune", help="remove all records of a preset")
    p_prune.add_argument("preset")
    p_prune.add_argument("--assume-yes", action="store_true")
    p_prune.set_defaults(fn=cmd_prune)

    p_compact = sub.add_parser(
        "compact", help="bin-pack a file target's snapshot (small-files cleanup)"
    )
    p_compact.add_argument("preset")
    p_compact.add_argument("--target-file-mb", type=int, default=128)
    p_compact.set_defaults(fn=cmd_compact)

    p_replay = sub.add_parser(
        "replay",
        help="apply a CDC changelog to the preset's target (catch-up/replica)",
    )
    p_replay.add_argument("preset")
    p_replay.add_argument("--changelog-dir", required=True)
    p_replay.add_argument(
        "--runs", help="comma-separated run ids in apply order (default: all, sorted)"
    )
    p_replay.set_defaults(fn=cmd_replay)

    p_presets = sub.add_parser("presets", help="list configured presets")
    p_presets.set_defaults(fn=cmd_presets)

    p_preset = sub.add_parser("preset", help="dump one preset's configuration")
    p_preset.add_argument("preset")
    p_preset.set_defaults(fn=cmd_preset)

    p_setup = sub.add_parser("setup", help="preflight source and target")
    p_setup.add_argument("preset")
    p_setup.set_defaults(fn=cmd_setup)

    args = parser.parse_args(argv)
    try:
        return args.fn(args)
    except FileNotFoundError as exc:
        print(f"Error: {exc}", file=sys.stderr)
        return 1
    except ImportServiceError as exc:  # ConfigurationError is a subclass
        print(f"Error: {exc}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
