"""Property-based differential tests for the temporal joins.

The as-of and interval joins are hand-built operator compositions
(union+forward-fill, bucketed equi-join) — exactly the kind of code
where an off-by-one in boundary or tie handling survives example-based
tests. Hypothesis drives both against brute-force Python models.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from wwwision_importservice_spark.operators.asof import as_of_join
from wwwision_importservice_spark.operators.ranges import interval_join

KEYS = st.sampled_from(["u", "v"])
TS = st.integers(min_value=0, max_value=40)

LEFTS = st.lists(st.tuples(KEYS, TS), max_size=8)
# duplicates allowed: right rows sharing (key, ts) exercise the
# deterministic payload tiebreak
RIGHTS = st.lists(st.tuples(KEYS, TS), max_size=8)
INTERVALS = st.lists(
    st.tuples(KEYS, TS, st.integers(min_value=1, max_value=15)), max_size=6
)


def _frames(spark, lefts, rights):
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lefts)] or [(0, "z", 0)],
        "lid long, k string, ts long",
    )
    if not lefts:
        left = left.filter("false")
    right = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(rights)] or [(0, "z", 0)],
        "rid long, k string, ts long",
    )
    if not rights:
        right = right.filter("false")
    return left, right


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    derandomize=True,
)
@given(LEFTS, RIGHTS, st.booleans())
def test_as_of_join_matches_bruteforce(spark, lefts, rights, strict):
    left, right = _frames(spark, lefts, rights)
    got = {
        r["lid"]: r["rid_r"]
        for r in as_of_join(
            left, right, ["k"], "ts", "ts", ["rid"], strict=strict
        ).collect()
    }
    want = {}
    for lid, (lk, lt) in enumerate(lefts):
        best = None  # (ts, rid)
        for rid, (rk, rt) in enumerate(rights):
            visible = rt < lt if strict else rt <= lt
            if rk == lk and visible and (best is None or (rt, rid) > best):
                best = (rt, rid)
        want[lid] = best[1] if best else None
    assert got == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    derandomize=True,
)
@given(LEFTS, INTERVALS, st.integers(min_value=1, max_value=20))
def test_interval_join_matches_bruteforce(spark, points, intervals, width):
    pts = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(points)] or [(0, "z", 0)],
        "pid long, k string, ts long",
    )
    if not points:
        pts = pts.filter("false")
    ivs = spark.createDataFrame(
        [(i, k, s, s + ln) for i, (k, s, ln) in enumerate(intervals)]
        or [(0, "z", 0, 1)],
        "iid long, k string, start long, end long",
    )
    if not intervals:
        ivs = ivs.filter("false")
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            pts, ivs, ["k"], "ts", "start", "end", bucket_width=width
        ).collect()
    }
    want = {
        (pid, iid)
        for pid, (pk, pt) in enumerate(points)
        for iid, (ik, s, ln) in enumerate(intervals)
        if pk == ik and s <= pt < s + ln
    }
    assert got == want


# --------------------------------------------------------------------- #
# Sessionize: gaps-and-islands vs a Python reference model
# --------------------------------------------------------------------- #

EVENTS = st.lists(
    st.tuples(KEYS, st.integers(min_value=0, max_value=30)), max_size=10
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    derandomize=True,
)
@given(EVENTS, st.integers(min_value=1, max_value=6))
def test_sessionize_matches_model(spark, events, gap):
    """Per-event session labels vs a literal Python gaps-and-islands
    model. The ts range [0, 30] with gaps of 1-6 puts many diffs
    EXACTLY at the gap boundary — the half-open >= rule (an event
    exactly `gap` after its predecessor starts a NEW session) is the
    edge that diverged at driver scale in round 3; duplicates exercise
    tie handling (same-ts events always share a session)."""
    from wwwision_importservice_spark.streaming.sessionize import sessionize

    df = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(events)] or [(0, "z", 0)],
        "event_id long, user_id string, ts long",
    )
    if not events:
        df = df.filter("false")
    got = {
        r["event_id"]: (r["user_id"], r["session_seq"], r["session_start"])
        for r in sessionize(df, ["user_id"], "ts", gap=gap).collect()
    }

    # reference model: per key, sort by ts; new session iff diff >= gap
    want = {}
    by_key: dict[str, list[tuple[int, int]]] = {}
    for i, (k, t) in enumerate(events):
        by_key.setdefault(k, []).append((t, i))
    for k, rows in by_key.items():
        rows.sort()
        seq, prev, start = 0, None, None
        for t, i in rows:
            if prev is None or t - prev >= gap:
                seq += 1
                start = t
            prev = t
            want[i] = (k, seq, start)
    assert got == want
