"""Property-based testing of the driver-side sketch kernels.

Pure-Python invariants of the deterministic MRL/KLL compactor
(``features.py:_make_mrl_collapse``) and the Misra-Gries fold
(``features.py:_make_mg_fold``) — no SparkSession, so hypothesis can
run thousands of cases: weight preservation, level-capacity bounds,
the deterministic rank-error bound, merge associativity, and the MG
one-sided guarantee under arbitrary merge trees. The Spark-side
integration (shuffles, Arrow, schemas) is pinned in
``test_extensions.py``; these pin the MATH.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from wwwision_importservice_spark.operators.features import (
    _make_mg_fold,
    _mrl_collapse,
)

VALUES = st.lists(
    st.integers(min_value=-1000, max_value=1000), min_size=0, max_size=400
)
KS = st.sampled_from([2, 4, 8, 16])


def sketch_of(values, k):
    vals = np.asarray(values, dtype="float64")
    lvls = np.zeros(len(vals), dtype="int32")
    return _mrl_collapse(vals, lvls, k)


def weight(levels):
    return int(sum(1 << int(lv) for lv in levels))


def rank_of(sketch_vals, sketch_lvls, q):
    """The sketch_quantile_values rule in pure python: smallest value
    whose cumulative weight reaches ceil(q * W)."""
    order = np.argsort(sketch_vals, kind="stable")
    w = np.array([1 << int(lv) for lv in sketch_lvls])[order]
    cw = np.cumsum(w)
    target = math.ceil(q * cw[-1])
    idx = int(np.searchsorted(cw, target))
    return float(sketch_vals[order][idx])


@given(VALUES, KS)
@settings(max_examples=300, deadline=None)
def test_mrl_weight_preserved_and_levels_bounded(values, k):
    vals, lvls = sketch_of(values, k)
    assert weight(lvls) == len(values)
    # post-collapse, every level holds < k items (the compactor fires
    # at >= k), plus at most one odd leftover accumulated per collapse
    for lv in set(int(x) for x in lvls):
        assert (lvls == lv).sum() < k + math.ceil(
            math.log2(max(len(values), 1) + 1)
        )


@given(VALUES, KS)
@settings(max_examples=300, deadline=None)
def test_mrl_rank_error_within_deterministic_bound(values, k):
    if not values:
        return
    vals, lvls = sketch_of(values, k)
    n = len(values)
    # the compactor fires at >= k items, so exactness holds only for
    # n < k; at n >= k each level's collapses contribute <= n/k error
    bound = (
        n * math.ceil(math.log2(max(n / k, 1)) + 1) / k if n >= k else 0
    )
    hi = sorted(values)
    for q in (0.1, 0.5, 0.9, 1.0):
        got = rank_of(vals, lvls, q)
        target = math.ceil(q * n)
        # rank window the answer may legally come from
        lo_i = max(0, int(target - bound) - 1)
        hi_i = min(n - 1, int(target + bound) - 1 + 1)
        assert hi[lo_i] <= got <= hi[hi_i], (q, got, bound)


@given(VALUES, VALUES, KS)
@settings(max_examples=200, deadline=None)
def test_mrl_merge_weight_and_determinism(a, b, k):
    """Merging two sketches (concat buffers, re-collapse) preserves the
    union's exact weight, and the whole pipeline is deterministic:
    same inputs → identical sketch, bit for bit."""
    va, la = sketch_of(a, k)
    vb, lb = sketch_of(b, k)
    mv, ml = _mrl_collapse(
        np.concatenate([va, vb]), np.concatenate([la, lb]), k
    )
    assert weight(ml) == len(a) + len(b)
    mv2, ml2 = _mrl_collapse(
        np.concatenate([va, vb]), np.concatenate([la, lb]), k
    )
    assert np.array_equal(mv, mv2) and np.array_equal(ml, ml2)


ITEMS = st.lists(
    st.sampled_from([f"w{i}" for i in range(30)]), min_size=0, max_size=300
)
CAPS = st.sampled_from([1, 2, 4, 8])


def fold_frames(frames, cap):
    """Run the MG fold exactly as merge_heavy_hitter_summaries does:
    tag each input summary, concat, fold."""
    fold = _make_mg_fold([], "item", cap)
    tagged = []
    for i, f in enumerate(frames):
        f = f.copy()
        f["__src"] = str(i)
        tagged.append(f)
    return fold(pd.concat(tagged, ignore_index=True))


def summary_of(items, cap):
    """A valid MG summary of a stream, in the production schema: real
    items plus the NULL-item carrier row that keeps n alive even when
    the decrement empties the counters."""
    c = Counter(items)
    df = pd.DataFrame(
        {"item": list(c), "c": [int(v) for v in c.values()],
         "n": len(items)}
    )
    if len(df) > cap:
        thresh = int(df["c"].nlargest(cap + 1).iloc[-1])
        df = df.loc[df["c"] > thresh].copy()
        df["c"] -= thresh
    carrier = pd.DataFrame({"item": [None], "c": [0], "n": [len(items)]})
    return pd.concat([df, carrier], ignore_index=True)


@given(ITEMS, ITEMS, CAPS)
@settings(max_examples=300, deadline=None)
def test_mg_fold_guarantee_over_merge(sa, sb, cap):
    """c <= true <= c + N_total // (cap+1) for every REPORTED item
    after merging two valid MG summaries, and the merged summary stays
    within cap items (Agarwal et al. 2012)."""
    fa, fb = summary_of(sa, cap), summary_of(sb, cap)
    merged = fold_frames([fa, fb], cap)
    true = Counter(sa + sb)
    n_tot = len(sa) + len(sb)
    err = n_tot // (cap + 1)
    real = merged[merged["item"].notna()]
    assert len(real) <= cap
    for _, r in real.iterrows():
        assert r["n"] == n_tot
        assert r["c"] <= true[r["item"]] <= r["c"] + err, (
            r["item"], int(r["c"]), true[r["item"]], err)
    # and every UNREPORTED item's true count is within the bound too
    reported = set(real["item"])
    for item, t in true.items():
        if item not in reported:
            assert t <= err, (item, t, err)


@given(ITEMS, ITEMS, ITEMS, CAPS)
@settings(max_examples=150, deadline=None)
def test_mg_fold_associative_bound(sa, sb, sc, cap):
    """Any merge tree keeps the guarantee: fold(fold(a,b),c) must obey
    the same one-sided bound over a+b+c as a flat fold."""
    left = fold_frames([summary_of(sa, cap), summary_of(sb, cap)], cap)
    lt = left.copy()
    nested = fold_frames([lt, summary_of(sc, cap)], cap)
    true = Counter(sa + sb + sc)
    n_tot = len(sa) + len(sb) + len(sc)
    err = n_tot // (cap + 1)
    real = nested[nested["item"].notna()]
    assert set(nested["n"]) == {n_tot}  # carrier keeps N exact end to end
    for _, r in real.iterrows():
        assert r["n"] == n_tot
        assert r["c"] <= true[r["item"]] <= r["c"] + err
