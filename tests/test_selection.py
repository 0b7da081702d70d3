"""DSIR data selection (operators/selection.py).

Tiers mirror the module's exactness claims:

- differential: the whole Spark pipeline (models, weights, Gumbel keys,
  selection) equals a pure-Python reimplementation EXACTLY — same md5
  hashing via hashlib, same micro-nat quantization via math.log/round;
- properties: model merge is exact, resampling is seed-deterministic
  and monotone in the weight, top-k degenerates correctly;
- margin guard: the determinism argument ("a rounded ln term can only
  flip cross-engine within ~1e-9 of a .5 boundary") is CHECKED on the
  fixtures, not just asserted in prose;
- plan pins: model joins broadcast, the top-k is TakeOrderedAndProject
  (no global sort); the raw corpus is exploded once (p_raw is a rollup
  of the checkpointed per-doc counts scoring probes — the rollup
  equality test is the semantic half of that pin).

The DuckDB oracle itself runs in tests/test_oracle_parity.py
(x6_dsir_select iterates with the registry).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from wwwision_importservice_spark.operators.selection import (
    DEFAULT_BUCKETS,
    dsir_log_weights,
    dsir_resample,
    dsir_select,
    gumbel_micro,
    hashed_ngram_counts,
    hashed_ngram_model,
    merge_hashed_ngram_models,
)

# --------------------------------------------------------------------------- #
# pure-Python reference model (hashlib md5 == Spark md5 == DuckDB md5)
# --------------------------------------------------------------------------- #


def _bucket(s: str, buckets: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % buckets


def _feats(text: str, ngram: int = 2) -> list[str]:
    toks = [t for t in text.lower().split(" ") if t]
    if ngram == 1:
        return toks
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_model(texts: list[str], buckets: int, ngram: int = 2) -> Counter:
    m: Counter = Counter()
    for t in texts:
        m.update(_bucket(f, buckets) for f in _feats(t, ngram))
    return m


def _py_logw(
    text: str, tgt: Counter, raw: Counter, buckets: int, ngram: int = 2
) -> tuple[int, int]:
    tt, tr = sum(tgt.values()), sum(raw.values())
    n, s = 0, 0
    for b, c in Counter(
        _bucket(f, buckets) for f in _feats(text, ngram)
    ).items():
        term = round(
            1e6
            * math.log(
                ((tgt.get(b, 0) + 1) * (tr + buckets))
                / ((raw.get(b, 0) + 1) * (tt + buckets))
            )
        )
        n += c
        s += c * term
    return n, s


def _py_gumbel(doc_id, seed: int = 0) -> int:
    h = int(hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:15], 16)
    u = (h + 0.5) / float(1 << 60)
    return round(1e6 * -math.log(-math.log(u)))


# --------------------------------------------------------------------------- #
# fixtures
# --------------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def corpus(spark):
    """Tiny two-dialect corpus: 'alpha'-docs speak mostly a/b/c,
    'beta'-docs mostly x/y/z — so a target fit on alpha must up-weight
    alpha-like raw docs (the selection-shift property)."""
    rows = []
    for i in range(40):
        rows.append((i, "a b c a b c a " + ("b c" if i % 2 else "c a"), "alpha"))
    for i in range(40, 80):
        rows.append((i, "x y z x y z x " + ("y z" if i % 2 else "z x"), "beta"))
    # a few mixed + degenerate docs: single-token (unigram only, no
    # bigram), and empty (no features at all — must emit NO weight row)
    rows += [(80, "a b x y", "mixed"), (81, "q", "single"), (82, "", "empty")]
    return spark.createDataFrame(rows, "doc_id long, text string, kind string")


# --------------------------------------------------------------------------- #
# differential: Spark == pure Python, exactly
# --------------------------------------------------------------------------- #


def test_weights_match_pure_python_exactly(spark, corpus):
    buckets = 512
    tgt_df = corpus.filter(F.col("kind") == "alpha")
    tgt = hashed_ngram_model(tgt_df, buckets=buckets)
    raw = hashed_ngram_model(corpus, buckets=buckets)
    got = {
        r["doc_id"]: (r["n_feats"], r["logw_micro"])
        for r in dsir_log_weights(
            corpus, tgt, raw, buckets=buckets
        ).collect()
    }
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    py_tgt = _py_model([r["text"] for r in tgt_df.collect()], buckets)
    py_raw = _py_model([t for _, t in rows], buckets)
    for doc_id, text in rows:
        if not _feats(text):
            assert doc_id not in got  # featureless docs emit nothing
            continue
        assert got[doc_id] == _py_logw(text, py_tgt, py_raw, buckets)


def test_gumbel_and_selection_match_pure_python(spark, corpus):
    buckets = 512
    sel = dsir_select(
        corpus,
        corpus.filter(F.col("kind") == "alpha"),
        k=10,
        buckets=buckets,
        seed=7,
    ).collect()
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    py_tgt = _py_model(
        [r["text"] for r in corpus.filter(F.col("kind") == "alpha").collect()],
        buckets,
    )
    py_raw = _py_model([t for _, t in rows], buckets)
    py_keys = sorted(
        (
            (_py_logw(t, py_tgt, py_raw, buckets)[1] + _py_gumbel(d, 7), d)
            for d, t in rows
            if _feats(t)
        ),
        key=lambda x: (-x[0], x[1]),
    )[:10]
    got = sorted(
        ((r["key_micro"], r["doc_id"]) for r in sel),
        key=lambda x: (-x[0], x[1]),
    )
    assert got == py_keys


def test_fixture_corpus_matches_pure_python(spark, sf_dir):
    """The driver-row configuration (documents, lang='en' target,
    10k buckets) against the Python model — the same comparison the
    DuckDB oracle makes, through an independent third implementation."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sel = dsir_select(
        docs, docs.filter(F.col("lang") == "en"), k=25
    ).collect()
    rows = [(r["doc_id"], r["text"], r["lang"]) for r in docs.collect()]
    py_tgt = _py_model([t for _, t, l in rows if l == "en"], DEFAULT_BUCKETS)
    py_raw = _py_model([t for _, t, _ in rows], DEFAULT_BUCKETS)
    py = sorted(
        (
            (
                _py_logw(t, py_tgt, py_raw, DEFAULT_BUCKETS)[1]
                + _py_gumbel(d),
                d,
            )
            # featureless docs emit no Spark row, so the reference must
            # exclude them too (today's fixtures have none; a future
            # regeneration landing a whitespace-only text must not flip
            # this differential test — same guard as the sibling above)
            for d, t, _ in rows
            if _feats(t)
        ),
        key=lambda x: (-x[0], x[1]),
    )[:25]
    got = sorted(
        ((r["key_micro"], r["doc_id"]) for r in sel),
        key=lambda x: (-x[0], x[1]),
    )
    assert got == py


# --------------------------------------------------------------------------- #
# properties
# --------------------------------------------------------------------------- #


def test_model_merge_is_exact(spark, corpus):
    """merge(model(A), model(B)) == model(A ∪ B) — counts additive."""
    a = corpus.filter(F.col("doc_id") < 40)
    b = corpus.filter(F.col("doc_id") >= 40)
    merged = {
        r["bucket"]: r["c"]
        for r in merge_hashed_ngram_models(
            hashed_ngram_model(a, buckets=512),
            hashed_ngram_model(b, buckets=512),
        ).collect()
    }
    full = {
        r["bucket"]: r["c"]
        for r in hashed_ngram_model(corpus, buckets=512).collect()
    }
    assert merged == full


def test_raw_model_rollup_equals_direct_fit(spark, corpus):
    """The single-scan seam dsir_select stands on: rolling the per-doc
    bucket counts up to (bucket, c) equals fitting the model straight
    from the corpus — count additivity over docs (featureless docs
    emit nothing on either path)."""
    rolled = {
        r["bucket"]: r["c"]
        for r in hashed_ngram_counts(corpus, buckets=512)
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("c"))
        .collect()
    }
    direct = {
        r["bucket"]: r["c"]
        for r in hashed_ngram_model(corpus, buckets=512).collect()
    }
    assert rolled == direct


def test_dsir_select_target_predicate_identical(spark, corpus):
    """r14 optimization pin: the single-pass predicate form (both
    models rolled up from ONE doc-counts pass) must be row-identical
    to the two-frame form on the full output frame (ids, n_feats,
    micro-nat weights, keys) — the count-additivity argument, checked
    end to end. Also: predicate+target_df together must raise."""
    two_frame = dsir_select(
        corpus, corpus.filter(F.col("kind") == "alpha"), 25, buckets=512
    )
    one_pass = dsir_select(
        corpus, None, 25, buckets=512,
        target_predicate=F.col("kind") == "alpha",
    )
    a = sorted(tuple(r) for r in two_frame.collect())
    b = sorted(tuple(r) for r in one_pass.collect())
    assert a == b
    with pytest.raises(ValueError, match="not both"):
        dsir_select(
            corpus, corpus, 5, target_predicate=F.col("kind") == "alpha"
        )


def test_selection_shifts_toward_target(spark, corpus):
    """Fitting the target on the alpha dialect must overwhelmingly
    select alpha docs from the 50/50 raw mix (the point of DSIR)."""
    sel = dsir_select(
        corpus, corpus.filter(F.col("kind") == "alpha"), k=20, buckets=512
    )
    kinds = [
        r["kind"]
        for r in sel.join(corpus.select("doc_id", "kind"), "doc_id").collect()
    ]
    assert sum(k == "alpha" for k in kinds) >= 18


def test_topk_mode_and_seed_determinism(spark, corpus):
    tgt = corpus.filter(F.col("kind") == "alpha")
    hard = dsir_select(corpus, tgt, k=5, buckets=512, gumbel=False)
    w = dsir_log_weights(
        corpus,
        hashed_ngram_model(tgt, buckets=512),
        hashed_ngram_model(corpus, buckets=512),
        buckets=512,
    ).collect()
    best = sorted(w, key=lambda r: (-r["logw_micro"], r["doc_id"]))[:5]
    assert sorted(r["doc_id"] for r in hard.collect()) == sorted(
        r["doc_id"] for r in best
    )
    # gumbel=False keys are the weights themselves
    assert all(
        r["key_micro"] == r["logw_micro"] for r in hard.collect()
    )
    # same seed replays; different seed re-deals (at least sometimes)
    s1 = sorted(r["doc_id"] for r in dsir_select(corpus, tgt, 10, buckets=512, seed=3).collect())
    s2 = sorted(r["doc_id"] for r in dsir_select(corpus, tgt, 10, buckets=512, seed=3).collect())
    s3 = sorted(r["doc_id"] for r in dsir_select(corpus, tgt, 10, buckets=512, seed=4).collect())
    assert s1 == s2
    assert s1 != s3


def test_ngram_validation_and_unigram_mode(spark, corpus):
    with pytest.raises(ValueError, match="ngram"):
        hashed_ngram_counts(corpus, ngram=3)
    got = {
        (r["doc_id"], r["bucket"]): r["cnt"]
        for r in hashed_ngram_counts(
            corpus.filter(F.col("doc_id") == 80), buckets=512, ngram=1
        ).collect()
    }
    exp = Counter(_bucket(t, 512) for t in ["a", "b", "x", "y"])
    assert got == {(80, b): c for b, c in exp.items()}


# --------------------------------------------------------------------------- #
# margin guard: the cross-engine determinism argument, checked
# --------------------------------------------------------------------------- #


def test_ln_rounding_margins_on_fixtures(spark):
    """Every quantized transcendental in the driver row — per-bucket ln
    terms and per-doc Gumbel draws at BOTH parity SFs — sits at least
    1e-3 micro-units away from its rounding boundary, dwarfing the
    ~1e-9 ulp wobble between engines' ln. If a future fixture
    regeneration lands a value near a boundary, this fails before the
    driver gate does."""
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = [
            (r["doc_id"], r["text"], r["lang"])
            for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
        ]
        tgt = _py_model([t for _, t, l in docs if l == "en"], DEFAULT_BUCKETS)
        raw = _py_model([t for _, t, _ in docs], DEFAULT_BUCKETS)
        tt, tr = sum(tgt.values()), sum(raw.values())
        for b in raw:
            v = 1e6 * math.log(
                ((tgt.get(b, 0) + 1) * (tr + DEFAULT_BUCKETS))
                / ((raw.get(b, 0) + 1) * (tt + DEFAULT_BUCKETS))
            )
            frac = abs(v - math.floor(v) - 0.5)
            assert frac > 1e-3, (sf, b, v)
        for d, _, _ in docs:
            h = int(hashlib.md5(f"0:{d}".encode()).hexdigest()[:15], 16)
            v = 1e6 * -math.log(-math.log((h + 0.5) / float(1 << 60)))
            frac = abs(v - math.floor(v) - 0.5)
            assert frac > 1e-3, (sf, d, v)


# --------------------------------------------------------------------------- #
# plan pins
# --------------------------------------------------------------------------- #


def test_plan_models_broadcast_and_topk_is_take_ordered(spark, corpus):
    """Scale pins: (1) both model joins broadcast — the corpus is never
    shuffled to meet the ≤-buckets-row models; (2) the resample plans
    as TakeOrderedAndProject — per-partition top-k, no global sort
    Exchange."""
    tgt = hashed_ngram_model(
        corpus.filter(F.col("kind") == "alpha"), buckets=512
    )
    raw = hashed_ngram_model(corpus, buckets=512)
    w = dsir_log_weights(corpus, tgt, raw, buckets=512)
    sel = dsir_resample(w, 10)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    # exactly the per-doc aggregation exchanges survive — no exchange
    # introduced by the selection itself (TakeOrderedAndProject merges
    # partition-local top-ks on the driver)
    assert "rangepartitioning" not in plan.lower()
