"""Diff-kernel tests: every version-predicate branch, skip flags, soft
delete, idPrefix (SURVEY §5 sync-semantics list)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wwwision_importservice_spark.operators.diff import (
    ChangeType,
    changeset_counts,
    compute_changes,
)
from wwwision_importservice_spark.record import RecordFrame


def source(spark, rows):
    df = spark.createDataFrame(rows, "id string, v long, payload string, _ord long")
    return RecordFrame.from_raw(df, "id", version_attribute="v", order_by="_ord").df


def local(spark, rows, schema="id string, version long, hidden boolean"):
    return spark.createDataFrame(rows, schema)


def by_type(cdc):
    out = {}
    for row in cdc.collect():
        out.setdefault(row["change_type"], set()).add(row["_id"])
    return out


def test_add_update_remove_noop(spark):
    src = source(
        spark,
        [
            ("new", 5, "p", 1),        # absent locally → add
            ("stale", 9, "p", 2),      # local older → update
            ("same", 7, "p", 3),       # equal versions → no-op
            ("older", 3, "p", 4),      # local newer → no-op
        ],
    )
    loc = local(
        spark,
        [("stale", 5, False), ("same", 7, False), ("older", 9, False), ("gone", 1, False)],
    )
    got = by_type(
        compute_changes(src, loc, local_id_col="id", local_version_col="version")
    )
    assert got == {
        ChangeType.ADD: {"new"},
        ChangeType.UPDATE: {"stale"},
        ChangeType.REMOVE: {"gone"},
    }


def test_unversioned_always_updates(spark):
    # DbalTarget.php:106-110 — NULL source or local version ⇒ update
    src = source(spark, [("a", None, "p", 1), ("b", 5, "p", 2)])
    loc = local(spark, [("a", 99, False), ("b", None, False)])
    got = by_type(
        compute_changes(src, loc, local_id_col="id", local_version_col="version")
    )
    assert got[ChangeType.UPDATE] == {"a", "b"}


def test_no_version_column_always_updates(spark):
    # versionColumn === null → localVersion NONE → every intersect updates
    src = source(spark, [("a", 1, "p", 1)])
    loc = local(spark, [("a", 999, False)])
    got = by_type(compute_changes(src, loc, local_id_col="id"))
    assert got[ChangeType.UPDATE] == {"a"}


def test_force_updates(spark):
    src = source(spark, [("older", 3, "p", 1)])
    loc = local(spark, [("older", 9, False)])
    got = by_type(
        compute_changes(
            src, loc, local_id_col="id", local_version_col="version", force_updates=True
        )
    )
    assert got[ChangeType.UPDATE] == {"older"}


def test_skip_flags(spark):
    src = source(spark, [("new", 1, "p", 1)])
    loc = local(spark, [("gone", 1, False)])
    cdc = compute_changes(
        src, loc, local_id_col="id", local_version_col="version",
        skip_added=True, skip_removed=True,
    )
    assert cdc.count() == 0


def test_soft_delete_hidden_not_removed_again(spark):
    # ContentRepositoryTarget.php:95-107 — hidden rows are not removal
    # candidates, but re-appearing hidden rows update (un-hide), not add.
    src = source(spark, [("reappears", 9, "p", 1)])
    loc = local(
        spark,
        [("reappears", 1, True), ("hidden_gone", 1, True), ("active_gone", 1, False)],
    )
    got = by_type(
        compute_changes(
            src, loc,
            local_id_col="id", local_version_col="version", local_hidden_col="hidden",
        )
    )
    assert got == {
        ChangeType.UPDATE: {"reappears"},
        ChangeType.REMOVE: {"active_gone"},
    }


def test_id_prefix_strip(spark):
    # ContentRepositoryTarget.php:99 — local ids carry idPrefix
    src = source(spark, [("a", 9, "p", 1), ("b", 9, "p", 2)])
    loc = local(spark, [("pfx-a", 1, False), ("pfx-zzz", 1, False)])
    got = by_type(
        compute_changes(
            src, loc, local_id_col="id", local_version_col="version", id_prefix="pfx-"
        )
    )
    assert got == {
        ChangeType.ADD: {"b"},
        ChangeType.UPDATE: {"a"},
        ChangeType.REMOVE: {"zzz"},
    }


def test_changeset_counts(spark):
    src = source(spark, [("new", 1, "p", 1), ("stale", 9, "p", 2)])
    loc = local(spark, [("stale", 1, False), ("gone", 1, False)])
    cdc = compute_changes(src, loc, local_id_col="id", local_version_col="version")
    got = {r["change_type"]: r["n"] for r in changeset_counts(cdc).collect()}
    assert got == {"add": 1, "update": 1, "remove": 1}


def test_broadcast_split_path_matches_full_outer(spark):
    # broadcast_local=True uses the split three-join plan; results must
    # match the full-outer formulation exactly.
    rows = [
        ("new", 5, "p", 1),
        ("stale", 9, "p", 2),
        ("same", 7, "p", 3),
        ("unversioned", None, "p", 4),
    ]
    loc_rows = [
        ("stale", 5, False),
        ("same", 7, False),
        ("unversioned", 1, False),
        ("gone", 1, False),
        ("hidden_gone", 1, True),
    ]
    src = source(spark, rows)
    loc = local(spark, loc_rows)
    kwargs = dict(
        local_id_col="id", local_version_col="version", local_hidden_col="hidden"
    )
    default = by_type(compute_changes(src, loc, **kwargs))
    split = by_type(compute_changes(src, loc, broadcast_local=True, **kwargs))
    assert split == default == {
        ChangeType.ADD: {"new"},
        ChangeType.UPDATE: {"stale", "unversioned"},
        ChangeType.REMOVE: {"gone"},
    }
    cdc = compute_changes(src, loc, broadcast_local=True, **kwargs)
    plan = cdc._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


# --------------------------------------------------------------------------- #
# incremental_changes — narrow-diff / late-materialization replan
# --------------------------------------------------------------------------- #

def _cdc_rows(cdc):
    cols = sorted(cdc.columns)
    return sorted(
        tuple((c, row[c]) for c in cols) for row in cdc.collect()
    )


def test_incremental_matches_compute_changes(spark):
    """Assumption-free mode (no watermark) is row-identical to the wide
    full-outer plan across every change class, incl. duplicates resolved
    by K1 last-wins upstream."""
    from wwwision_importservice_spark.operators.diff import incremental_changes

    rows = [
        ("new", 5, "p1", 1),
        ("stale", 9, "p2", 2),
        ("same", 7, "p3", 3),
        ("older", 3, "p4", 4),
        ("unv", None, "p5", 5),
        ("dup", 1, "first", 6),
        ("dup", 2, "last", 7),   # last-wins upstream dedup
    ]
    src = source(spark, rows)
    loc = local(
        spark,
        [
            ("stale", 5, False),
            ("same", 7, False),
            ("older", 9, False),
            ("gone", 1, False),
            ("hidden-gone", 1, True),
            ("unv", 3, False),
        ],
    )
    kw = dict(local_id_col="id", local_version_col="version",
              local_hidden_col="hidden")
    expected = compute_changes(src, loc, **kw)
    got = incremental_changes(src, loc, **kw)
    assert _cdc_rows(got) == _cdc_rows(expected)
    # and with the shuffle fallback for the changed-slice re-join
    got_shuffle = incremental_changes(src, loc, broadcast_changed=False, **kw)
    assert _cdc_rows(got_shuffle) == _cdc_rows(expected)


def test_incremental_wide_source_defers_dedup(spark):
    """wide_source: the keyed-raw (dedup=False) frame re-materializes
    attributes after the broadcast id-filter; the winning duplicate must
    match the upstream K1 winner."""
    from wwwision_importservice_spark.operators.diff import incremental_changes

    raw = spark.createDataFrame(
        [
            ("stale", 9, "loser", 1),
            ("stale", 9, "winner", 2),   # last-wins by _ord
            ("new", 5, "p", 3),
        ],
        "id string, v long, payload string, _ord long",
    )
    keyed_raw = RecordFrame.from_raw(
        raw, "id", version_attribute="v", order_by="_ord", dedup=False
    ).df
    src = RecordFrame.from_raw(
        raw, "id", version_attribute="v", order_by="_ord"
    ).df
    loc = local(spark, [("stale", 5, False), ("gone", 1, False)])
    kw = dict(local_id_col="id", local_version_col="version")
    expected = compute_changes(src, loc, **kw)
    got = incremental_changes(
        src, loc, wide_source=keyed_raw, wide_order_by=F.col("_ord"), **kw
    )
    assert _cdc_rows(got) == _cdc_rows(expected)
    payloads = {r["_id"]: r["payload"] for r in got.collect()
                if r["change_type"] != ChangeType.REMOVE}
    assert payloads["stale"] == "winner"


def test_incremental_watermark_narrows_updates_only(spark):
    """version_watermark: intersecting rows at-or-below W are proven
    no-ops (the CDC monotone-version contract); adds/removes unaffected."""
    from wwwision_importservice_spark.operators.diff import incremental_changes

    src = source(
        spark,
        [
            ("recent", 100, "p", 1),   # > W, local older → update
            ("old-touch", 40, "p", 2),  # <= W, local older → assumed no-op
            ("unv", None, "p", 3),      # NULL version → always update
            ("new", 10, "p", 4),        # add regardless of W
        ],
    )
    loc = local(
        spark,
        [("recent", 50, False), ("old-touch", 20, False),
         ("unv", 7, False), ("gone", 1, False)],
    )
    got = by_type(
        incremental_changes(
            src, loc, local_id_col="id", local_version_col="version",
            version_watermark=50,
        )
    )
    assert got == {
        ChangeType.ADD: {"new"},
        ChangeType.UPDATE: {"recent", "unv"},
        ChangeType.REMOVE: {"gone"},
    }


def test_empty_source_yields_removes_only(spark):
    """Empty source frame → every active local row removes, hidden rows
    excluded (the verify-recipe probe); both physical plans agree."""
    from wwwision_importservice_spark.operators.diff import incremental_changes

    src = source(spark, []).limit(0)
    loc = local(spark, [("a", 1, False), ("b", 2, True), ("c", 3, False)])
    kw = dict(local_id_col="id", local_version_col="version",
              local_hidden_col="hidden")
    for fn in (compute_changes, incremental_changes):
        got = by_type(fn(src, loc, **kw))
        assert got == {ChangeType.REMOVE: {"a", "c"}}, fn.__name__


def test_empty_local_state_yields_adds_only(spark):
    from wwwision_importservice_spark.operators.diff import incremental_changes

    src = source(spark, [("a", 1, "p", 1), ("b", 2, "p", 2)])
    loc = local(spark, []).limit(0)
    kw = dict(local_id_col="id", local_version_col="version")
    for fn in (compute_changes, incremental_changes):
        got = by_type(fn(src, loc, **kw))
        assert got == {ChangeType.ADD: {"a", "b"}}, fn.__name__


def test_broadcast_source_matches_full_outer_sans_removes(spark):
    """broadcast_source (the streaming micro-batch plan): identical
    add/update classification to the full-outer plan with skip_removed,
    across every predicate branch."""
    src = source(
        spark,
        [
            ("new", 5, "p", 1),
            ("stale", 9, "p", 2),
            ("same", 7, "p", 3),
            ("older", 3, "p", 4),
            ("unv", None, "p", 5),
        ],
    )
    loc = local(
        spark,
        [("stale", 5, False), ("same", 7, False), ("older", 9, False),
         ("gone", 1, False), ("unv", 3, False)],
    )
    kw = dict(local_id_col="id", local_version_col="version",
              local_hidden_col="hidden", skip_removed=True)
    expected = by_type(compute_changes(src, loc, **kw))
    got = by_type(compute_changes(src, loc, broadcast_source=True, **kw))
    assert got == expected == {
        ChangeType.ADD: {"new"},
        ChangeType.UPDATE: {"stale", "unv"},
    }
    # requires skip_removed — remove detection needs the full local set
    import pytest as _pytest

    with _pytest.raises(ValueError, match="skip_removed"):
        compute_changes(
            src, loc, broadcast_source=True,
            local_id_col="id", local_version_col="version",
        )
