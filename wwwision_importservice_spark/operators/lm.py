"""N-gram language-model perplexity scoring over the document corpus.

The training-data-pipeline use case (no reference counterpart — the PHP
reference has no text surface, SURVEY §1.4): CCNet (Wenzek et al. 2020)
and Gopher/MassiveText both rank/filter web documents by the perplexity
of a small LM; a corpus-trained add-k-smoothed bigram model (textbook —
Jurafsky & Martin ch. 3) is the distributed-friendly version of that
signal: training IS one hash aggregate, scoring IS two joins.

Design (same exactness strategy as :mod:`operators/retrieval`'s BM25):

- **Training = counting.** The model is two count tables —
  ``c(w1,w2)`` and its margin ``c(w1)`` — plus the vocab size ``V``.
  All LONG, order-independent, engine-exact, map-side-combinable: the
  bigram/context tables come from one explode + two hash aggregates,
  the vocab from a SECOND corpus explode (single-token docs carry no
  bigram, so the vocab cannot derive from the bigram table — two
  corpus scans total, stated honestly per the r11 review), and two
  epochs never disagree.
- **Probabilities are rational.** ``p(w2|w1) = (c12 + k) / (c1 + k·V)``
  — with counts exact, the per-bigram probability is one double
  division. The one transcendental (``ln p``) is isolated in
  :func:`lm_perplexity` and differential-tested against a
  single-process model; :func:`lm_doc_stats` emits the integer
  sufficient statistics only and is DuckDB-oracle-exact.
- **Scoring joins, not lookups.** Doc bigrams join the count tables on
  their natural keys — shuffles on (w1,w2) then w1, both
  map-side-combinable pre-aggregated per doc first. Nothing is
  collected to the driver; the model tables can exceed driver memory.

Zipf skew note: the hot contexts (``the``, ``of`` …) concentrate the
(w1) join key. Three defenses stack: the per-doc pre-aggregation
(distinct doc-bigrams with multiplicity) bounds per-key rows by the
doc count; the model-table joins split through
:func:`~wwwision_importservice_spark.operators.skew.hot_key_broadcast_join`
(the top-``hot_keys`` count rows — which BY their counts are the
probe-side head — broadcast, so head-key probe rows never shuffle and
the shuffled tail's per-key width is bounded by the (K+1)-th count);
and AQE skew-join handles any residue. Results are row-identical to
the plain join (pinned by the oracle and by test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


from wwwision_importservice_spark.operators.text import (
    corpus_tokens as _tokens,
)


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per bigram occurrence: ``(id, w1, w2)``. Docs with < 2
    tokens contribute nothing (no bigram events — scored as NULL
    perplexity downstream, not zero)."""
    toks = _tokens(F.col(text_col))
    # slice length must be non-negative — an empty/one-token doc yields
    # empty slices, not an error
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(toks, 1, n).alias("w1"),
        F.slice(toks, 2, n).alias("w2"),
    )
    return (
        df.select(F.col(id_col), pairs.alias("__bg"))
        .select(F.col(id_col), F.explode("__bg").alias("b"))
        .select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )


def bigram_model(
    train: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the bigram LM: returns ``(bigrams, contexts, vocab)`` —
    ``bigrams = (w1, w2, c12)``, ``contexts = (w1, c1)`` with
    ``c1 = Σ_w2 c12`` (the bigram-context margin, so probabilities sum
    to 1 per context), ``vocab = (w)`` the distinct-token table. Three LONG count tables; the margin derives from the
    bigram table (tiny second aggregate), so training reads the corpus
    once — and each table is cut with a lazy localCheckpoint so a
    scoring action reuses the materialized counts instead of
    re-exploding the training corpus once per consumer subtree (Spark
    does not dedupe common lineage).

    ``vocab`` is kept as the distinct TOKEN TABLE, not a pre-counted
    scalar — tokens union exactly under model merge
    (:func:`merge_bigram_models`) where a distinct COUNT cannot (a
    single-token doc contributes vocabulary but no bigram, so V is not
    derivable from the count tables alone)."""
    bg = _doc_bigrams(train, id_col, text_col)
    bigrams = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    ).localCheckpoint(eager=False)
    contexts = bigrams.groupBy("w1").agg(
        F.sum("c12").alias("c1")
    ).localCheckpoint(eager=False)
    vocab = (
        train.select(F.explode(_tokens(F.col(text_col))).alias("w"))
        .distinct()
    ).localCheckpoint(eager=False)
    return bigrams, contexts, vocab


def merge_bigram_models(
    a: tuple[DataFrame, DataFrame, DataFrame],
    b: tuple[DataFrame, DataFrame, DataFrame],
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Merge two trained models: ``merge(model(A), model(B)) ==
    model(A ∪ B)`` **exactly** (pinned by test) — counts are additive
    and the vocab token tables union — so incremental corpus growth is
    a count-table merge (one shuffle over the SMALL model tables), not
    a retrain over the raw corpus. The streaming complement: fold each
    micro-batch's model into the running one."""
    a_bg, a_ctx, a_v = a
    b_bg, b_ctx, b_v = b
    bigrams = (
        a_bg.unionByName(b_bg)
        .groupBy("w1", "w2")
        .agg(F.sum("c12").alias("c12"))
        .localCheckpoint(eager=False)
    )
    contexts = (
        a_ctx.unionByName(b_ctx)
        .groupBy("w1")
        .agg(F.sum("c1").alias("c1"))
        .localCheckpoint(eager=False)
    )
    vocab = a_v.unionByName(b_v).distinct().localCheckpoint(eager=False)
    return bigrams, contexts, vocab


def lm_doc_stats(
    df: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    hot_keys: int = 64,
) -> DataFrame:
    """Integer-exact per-document LM sufficient statistics —
    ``(id, n_bigrams, n_distinct_bigrams, sum_bigram_count,
    sum_context_count)`` where the sums run over the doc's bigram
    OCCURRENCES (so a repeated bigram counts its model frequency each
    time). Engine-exact (all LONG) — this is the DuckDB-oracle face of
    the LM; the perplexity itself (one ln per bigram) lives in
    :func:`lm_perplexity` under a differential test."""
    from wwwision_importservice_spark.operators.skew import (
        hot_key_broadcast_join,
    )

    bigrams, contexts, _ = model
    per_doc = (
        _doc_bigrams(df, id_col, text_col)
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    joined = hot_key_broadcast_join(
        hot_key_broadcast_join(
            per_doc, bigrams, ["w1", "w2"], "c12", hot_keys=hot_keys
        ),
        contexts,
        ["w1"],
        "c1",
        hot_keys=hot_keys,
    ).select(
        F.col(id_col),
        F.col("n"),
        F.coalesce(F.col("c12"), F.lit(0)).alias("c12"),
        F.coalesce(F.col("c1"), F.lit(0)).alias("c1"),
    )
    return joined.groupBy(id_col).agg(
        F.sum("n").alias("n_bigrams"),
        F.count(F.lit(1)).alias("n_distinct_bigrams"),
        F.sum(F.col("n") * F.col("c12")).alias("sum_bigram_count"),
        F.sum(F.col("n") * F.col("c1")).alias("sum_context_count"),
    )


def lm_perplexity(
    df: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 0.5,
    hot_keys: int = 64,
) -> DataFrame:
    """Per-document bigram perplexity under the add-k model:
    ``ppl = exp(-(1/n) Σ ln p(w2|w1))`` with
    ``p = (c12 + k) / (c1 + k·V)``; unseen bigrams/contexts fall back
    to the smoothed floor (c → 0). Emits ``(id, n_bigrams,
    avg_logprob, perplexity)``; docs with < 2 tokens emit nothing.

    Low perplexity = looks like the training corpus; the CCNet-style
    filter keeps the low/middle band and drops the high tail
    (gibberish) and optionally the extreme low tail (boilerplate).
    The ln is the one engine-inexact op — differential-tested in
    tests/test_extensions.py, not oracle-hashed."""
    bigrams, contexts, vocab = model
    v_count = vocab.agg(F.count(F.lit(1)).alias("v"))
    per_doc = (
        _doc_bigrams(df, id_col, text_col)
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    p = (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(add_k)) / (
        F.coalesce(F.col("c1"), F.lit(0)) + F.lit(add_k) * F.col("v")
    )
    from wwwision_importservice_spark.operators.skew import (
        hot_key_broadcast_join,
    )

    scored = (
        hot_key_broadcast_join(
            hot_key_broadcast_join(
                per_doc, bigrams, ["w1", "w2"], "c12", hot_keys=hot_keys
            ),
            contexts,
            ["w1"],
            "c1",
            hot_keys=hot_keys,
        )
        .crossJoin(F.broadcast(v_count))
        .select(
            F.col(id_col),
            F.col("n"),
            (F.col("n") * F.log(p)).alias("__lp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.sum("n").alias("n_bigrams"),
        (F.sum("__lp") / F.sum("n")).alias("avg_logprob"),
    )
    return agg.select(
        id_col,
        "n_bigrams",
        "avg_logprob",
        F.exp(-F.col("avg_logprob")).alias("perplexity"),
    )
