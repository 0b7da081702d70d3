"""Distributed multinomial Naive Bayes over the document corpus.

The training-data-pipeline use case (no reference counterpart — the PHP
reference has no text surface, SURVEY §1.4): corpus-scale document
classification — language ID beyond the heuristic in
``operators/text.py``, source/domain attribution, fasttext-style
quality-classifier scoring — where the model must be TRAINED on cluster
data, not shipped in.

Multinomial NB is the distributed-native classifier: **training is one
counting pass** (explode tokens → hash aggregate per (label, token) with
map-side partial counts — the same shape that makes the bigram LM and
BM25 one-pass), and **scoring is a join**, not a model broadcast of
unbounded size:

    score(d, y) = ln P(y) + Σ_w n_dw · ln( (c_yw + α) / (n_y + α·V) )

- all sufficient statistics (c_yw, n_y, doc counts, V) are exact LONGs
  — order-independent, engine-exact, two epochs never disagree;
- per-token label counts fold to a ``map<label, count>`` per token, so
  the scoring join is one shuffle on the token key and the per-doc ×
  per-label expansion happens AFTER the per-doc token aggregate (rows =
  doc-distinct-tokens × |labels|, never corpus-tokens × |labels|);
- the label table (priors + denominators) is tiny and broadcast;
- the one engine-inexact op (ln) is isolated in :func:`nb_predict`
  (differential-tested), while :func:`nb_doc_stats` emits the
  integer-exact face for the DuckDB oracle — the same split as
  ``operators/retrieval.py`` (BM25) and ``operators/lm.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


from wwwision_importservice_spark.operators.text import (
    corpus_tokens as _tokens,
)


def nb_train(
    train: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train: returns ``(token_counts, labels, vocab)`` —
    ``token_counts = (w, counts: map<label, long>)`` (per-token label
    histogram, folded so the scoring join is keyed on ``w`` alone),
    ``labels = (label, n_docs, n_tokens)`` (priors + denominators, tiny,
    broadcast at scoring), ``vocab = (w)`` (distinct-token table —
    mergeable by union, see :func:`merge_nb_models`).
    One corpus read feeds all three (each table is cut with a lazy
    localCheckpoint so scoring actions reuse the materialized counts
    instead of re-tokenizing the training corpus per consumer).

    Unlabeled rows (NULL label) are EXCLUDED from training — a NULL
    label is not a class (and would blow up the per-token label map
    with a NULL key deep inside the first scoring action)."""
    toks = train.filter(F.col(label_col).isNotNull()).select(
        F.col(id_col),
        F.col(label_col).alias("label"),
        F.explode(_tokens(F.col(text_col))).alias("w"),
    )
    per_label = toks.groupBy("label", "w").agg(
        F.count(F.lit(1)).alias("c")
    )
    token_counts = per_label.groupBy("w").agg(
        F.map_from_entries(
            F.collect_list(F.struct("label", "c"))
        ).alias("counts")
    ).localCheckpoint(eager=False)
    labels = (
        toks.groupBy("label")
        .agg(
            F.count_distinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    ).localCheckpoint(eager=False)
    vocab = toks.select("w").distinct().localCheckpoint(eager=False)
    return token_counts, labels, vocab


def merge_nb_models(
    a: tuple[DataFrame, DataFrame, DataFrame],
    b: tuple[DataFrame, DataFrame, DataFrame],
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Merge two trained models over DISJOINT document sets:
    ``merge(model(A), model(B)) == model(A ∪ B)`` exactly (pinned by
    test) — per-token label maps re-aggregate additively, label
    priors/denominators sum, vocab token tables union. Incremental
    corpus growth is a merge over the SMALL model tables, not a
    retrain; the disjointness precondition exists because n_docs is a
    distinct count (a doc present in both halves would double-count)."""
    from pyspark.sql import functions as FF

    a_tc, a_lab, a_v = a
    b_tc, b_lab, b_v = b
    entries = FF.explode(FF.map_entries("counts")).alias("e")
    token_counts = (
        a_tc.unionByName(b_tc)
        .select("w", entries)
        .groupBy("w", FF.col("e.key").alias("label"))
        .agg(FF.sum("e.value").alias("c"))
        .groupBy("w")
        .agg(
            FF.map_from_entries(
                FF.collect_list(FF.struct("label", "c"))
            ).alias("counts")
        )
        .localCheckpoint(eager=False)
    )
    labels = (
        a_lab.unionByName(b_lab)
        .groupBy("label")
        .agg(
            FF.sum("n_docs").alias("n_docs"),
            FF.sum("n_tokens").alias("n_tokens"),
        )
        .localCheckpoint(eager=False)
    )
    vocab = a_v.unionByName(b_v).distinct().localCheckpoint(eager=False)
    return token_counts, labels, vocab


def _doc_label_counts(
    df: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame],
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Shared scoring skeleton: one row per (doc, label) with the exact
    LONG sums — ``n_tokens`` (doc length) and ``sum_token_count``
    (Σ over the doc's token occurrences of the label's training count
    for that token; unseen tokens count 0). The per-label expansion
    happens after the per-doc token aggregate."""
    token_counts, labels, _ = model
    doc_toks = (
        df.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    with_counts = doc_toks.join(token_counts, "w", "left")
    expanded = with_counts.crossJoin(
        F.broadcast(labels.select(F.col("label").alias("__y")))
    ).select(
        F.col(id_col),
        F.col("__y").alias("label"),
        F.col("n"),
        F.coalesce(
            F.element_at(F.col("counts"), F.col("__y")), F.lit(0)
        ).alias("c"),
    )
    return expanded.groupBy(id_col, "label").agg(
        F.sum("n").alias("n_tokens"),
        F.sum(F.col("n") * F.col("c")).alias("sum_token_count"),
    )


def nb_doc_stats(
    df: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Integer-exact per-(doc, label) sufficient statistics —
    ``(id, label, n_tokens, sum_token_count)``. The DuckDB-oracle face
    of the classifier; the ln-based posterior lives in
    :func:`nb_predict` under a differential test."""
    return _doc_label_counts(df, model, id_col, text_col)


def nb_predict(
    df: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Posterior argmax per document: ``(id, label, log_score)`` with
    the winning label (ties break to the lexicographically smallest —
    deterministic under parallel evaluation). Docs with zero tokens are
    absent (no evidence, no prediction).

    Add-α likelihoods over the map-joined counts; the per-doc argmax is
    a rank window (partial WindowGroupLimit — ≤1 row per doc per task
    enters the shuffle)."""
    token_counts, labels, vocab = model
    v_count = vocab.agg(F.count(F.lit(1)).alias("v"))
    doc_toks = (
        df.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    lab = F.broadcast(
        labels.crossJoin(labels.select(F.sum("n_docs").alias("__total")))
        .select(
            F.col("label").alias("__y"),
            F.log(F.col("n_docs") / F.col("__total")).alias("__prior"),
            F.col("n_tokens").alias("__ny"),
        )
    )
    scored = (
        doc_toks.join(token_counts, "w", "left")
        .crossJoin(lab)
        .crossJoin(F.broadcast(v_count))
        .select(
            F.col(id_col),
            F.col("__y").alias("label"),
            F.col("__prior"),
            (
                F.col("n")
                * F.log(
                    (
                        F.coalesce(
                            F.element_at(F.col("counts"), F.col("__y")),
                            F.lit(0),
                        )
                        + F.lit(alpha)
                    )
                    / (F.col("__ny") + F.lit(alpha) * F.col("v"))
                )
            ).alias("__ll"),
        )
    )
    per_label = scored.groupBy(id_col, "label", "__prior").agg(
        F.sum("__ll").alias("__sll")
    ).select(
        F.col(id_col),
        F.col("label"),
        (F.col("__prior") + F.col("__sll")).alias("log_score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("log_score").desc(), F.col("label").asc()
    )
    return (
        per_label.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .drop("__r")
    )
