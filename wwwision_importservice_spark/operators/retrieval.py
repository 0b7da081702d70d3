"""Keyword retrieval over the document corpus — exact BM25, Spark-first.

No reference counterpart (the reference has no search surface;
SURVEY §2.9 driver-mandated extension family): this is the
training-data-pipeline use case of scoring/filtering a 100 TB corpus
against a fixed keyword query set (topic mining, contamination probes,
targeted subset extraction), not an online search engine.

Design:

- **The query side is tiny and broadcast.** Terms are filtered
  *before* any aggregation — the per-(doc, term) state only ever exists
  for query terms, so corpus-wide cost is one token explode + two hash
  aggregates regardless of vocabulary size.
- **Exact integer sufficient statistics.** tf, dl, df, N, total_tokens
  are all LONGs — order-independent, engine-exact. The one
  transcendental (the idf's ln) is isolated in :func:`bm25_scores`;
  :func:`query_term_stats` and the rational saturation term are
  bit-identical in any engine (the oracle strategy — ln differs in the
  last ulp between libm implementations, measured ~5% of inputs here).
- **Lucene/BM25 formula** (public: Robertson & Zaragoza 2009, "The
  Probabilistic Relevance Framework: BM25 and Beyond"):

      idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
      sat(d,t) = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
      score(d) = Σ_t idf(t) · sat(d,t)

  With the default k1 = 1.2 = 6/5 and b = 0.75 = 3/4 and
  avgdl = T/N (T = total corpus tokens), sat reduces to the integer
  ratio  22·T·tf / (10·T·tf + 3·T + 9·dl·N)  — one double division at
  the end. Overflow bound: T ≤ 1e13 tokens (a 100 TB corpus) with
  tf ≤ 4e4 keeps 10·T·tf < 4e18 < 2^63.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Column  # noqa: F401 — nested helper annotations
from pyspark.sql import functions as F


from wwwision_importservice_spark.operators.text import (
    corpus_tokens as _tokens,
)


def query_term_stats(
    df: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact per-(doc, query-term) sufficient statistics for BM25.

    Emits one row per (doc, term) with tf > 0:
    ``(id, term, tf, dl, df, n_docs, total_tokens)`` — all LONG.

    Plan: genuinely ONE corpus scan (r11 review catch — the earlier
    explode+filter form re-tokenized the whole corpus a second time for
    the totals aggregate): a single projection computes per-doc
    ``(dl, tf per query term)`` as pure array expressions — per-term
    ``size(filter(tokens, = t))``, |terms|·|tokens| comparisons, cheap
    for query-sized term lists and NO shuffle of exploded token rows —
    and that narrow frame is localCheckpoint'd so the totals aggregate
    and the per-term unpivot both read the materialized rows instead of
    re-running the scan. df (docs-per-term) and the corpus totals are
    tiny and broadcast back.
    """
    # Dedupe AFTER lowercasing: one tf column is built per entry, so
    # ['Foo', 'foo'] collapsing to the same term would emit duplicate
    # (doc, term) rows and double df — the pre-r11 explode+groupBy form
    # was idempotent to duplicates and this form must stay so (r12
    # advisor catch). dict.fromkeys keeps first-seen order.
    terms = list(dict.fromkeys(t.lower() for t in terms))
    toks = _tokens(F.col(text_col))

    def _eq(term: str):
        # MUST stay a ONE-argument lambda: F.filter dispatches on lambda
        # arity, and a default-arg second parameter would be bound to
        # the array INDEX (the text.py marker_filter convention)
        return lambda x: x == F.lit(term)

    tf_cols = [
        F.size(F.filter(toks, _eq(t))).alias(f"__tf_{i}")
        for i, t in enumerate(terms)
    ]
    per_doc = df.select(
        F.col(id_col), F.size(toks).alias("dl"), *tf_cols
    ).localCheckpoint(eager=False)
    pairs = F.array(*[
        F.struct(
            F.lit(t).alias("term"), F.col(f"__tf_{i}").alias("tf")
        )
        for i, t in enumerate(terms)
    ])
    tf = (
        per_doc.select(F.col(id_col), F.col("dl"), F.explode(pairs).alias("p"))
        .select(F.col(id_col), "dl", F.col("p.term").alias("term"),
                F.col("p.tf").alias("tf"))
        .filter(F.col("tf") > 0)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    totals = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            "term",
            F.col("tf").cast("long"),
            F.col("dl").cast("long"),
            F.col("df").cast("long"),
            F.col("n_docs").cast("long"),
            F.col("total_tokens").cast("long"),
        )
    )


def saturation(tf, dl, n_docs, total_tokens):
    """The k1=1.2, b=0.75 BM25 tf-saturation as an exact integer ratio
    (see module header): 22·T·tf / (10·T·tf + 3·T + 9·dl·N)."""
    t = F.col(total_tokens) if isinstance(total_tokens, str) else total_tokens
    n = F.col(n_docs) if isinstance(n_docs, str) else n_docs
    tf_c = F.col(tf) if isinstance(tf, str) else tf
    dl_c = F.col(dl) if isinstance(dl, str) else dl
    num = (F.lit(22) * t * tf_c).cast("double")
    den = (F.lit(10) * t * tf_c + F.lit(3) * t + F.lit(9) * dl_c * n).cast(
        "double"
    )
    return num / den


def bm25_scores(
    df: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BM25 score for a fixed term set (k1=1.2, b=0.75).

    The ln-based idf makes the score engine-approximate (last-ulp libm
    divergence) — differential-tested against a NumPy model in pytest
    rather than oracle-hashed. The per-term products are summed in
    sorted-term order (sorted array + ``F.aggregate``) so the result is
    at least *run*-deterministic: a plain SQL sum would add floats in
    partition arrival order.
    """
    stats = query_term_stats(df, terms, id_col=id_col, text_col=text_col)
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    contrib = (idf * saturation("tf", "dl", "n_docs", "total_tokens")).alias(
        "__contrib"
    )
    per_term = stats.select(F.col(id_col), F.col("term"), contrib)
    return (
        per_term.groupBy(id_col)
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("term", "__contrib"))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["__contrib"],
            ).alias("bm25"),
            F.count(F.lit(1)).alias("n_matched_terms"),
        )
    )


def bm25_topk(
    df: DataFrame,
    terms: Sequence[str],
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Global top-k by BM25 with a deterministic (score desc, id asc)
    tie-break. Plans as TakeOrderedAndProject — per-partition heads then
    one driver-side merge of k rows per partition, never a global sort."""
    scored = bm25_scores(df, terms, id_col=id_col, text_col=text_col)
    return scored.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(k)


def ranking_metrics(
    predictions: DataFrame,
    relevant: DataFrame,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Retrieval-quality evaluation over a predictions table: one output
    row with ``recall_at_k`` (macro-averaged over queries), ``mrr``
    (mean reciprocal rank of the FIRST relevant hit, 0 when none is
    retrieved), ``ndcg_at_k`` (binary-relevance normalized discounted
    cumulative gain), and ``n_queries`` — the eval harness for any of
    the top-k operators (BM25, ANN, PQ) against a relevance-judgment
    table.

    ``predictions``: (query, doc, rank) with rank 1 = best;
    ``relevant``: (query, doc) ground truth. Queries present only in
    ``relevant`` count as zero-recall/zero-MRR/zero-nDCG rows — an eval
    must not silently drop queries the retriever returned nothing for.

    nDCG numerics: each DCG term 1/log2(rank+1) is quantized to BIGINT
    micro-units (×1e9) BEFORE summation, so per-query DCG/IDCG are exact
    integer sums — independent of aggregation order and engine-portable
    (the g1_pagerank fixed-point convention); the macro average goes
    through a decimal-exact sum for the same reason.

    Scale shape: one equi-join on (query, doc) + two hash aggregates —
    no window, no per-query loop; metrics stream out of partial
    aggregation like any other rollup. IDCG folds a ≤k-element sequence
    per query — constant work, no join.
    """

    def dcg_micro_term(rank: Column) -> Column:
        return F.round(F.lit(1e9) / F.log2(rank.cast("double") + F.lit(1.0))).cast(
            "long"
        )

    preds = predictions.select(
        F.col(query_col).alias("__q"),
        F.col(doc_col).alias("__d"),
        F.col(rank_col).alias("__r"),
    )
    truth = relevant.select(
        F.col(query_col).alias("__q"), F.col(doc_col).alias("__d")
    )
    hits = preds.join(truth, ["__q", "__d"], "inner")
    per_query = (
        truth.groupBy("__q")
        .agg(F.count(F.lit(1)).alias("__n_rel"))
        .join(
            hits.groupBy("__q").agg(
                F.sum((F.col("__r") <= k).cast("long")).alias("__hits_at_k"),
                F.min("__r").alias("__first_rank"),
                F.sum(
                    F.when(F.col("__r") <= k, dcg_micro_term(F.col("__r"))).otherwise(
                        F.lit(0).cast("long")
                    )
                ).alias("__dcg_micro"),
            ),
            "__q",
            "left",
        )
    )
    idcg_micro = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("__n_rel"), F.lit(k)).cast("int")),
        F.lit(0).cast("long"),
        lambda acc, i: acc + dcg_micro_term(i),
    )
    ndcg = F.coalesce(F.col("__dcg_micro"), F.lit(0).cast("long")).cast(
        "double"
    ) / idcg_micro.cast("double")
    # macro averages go through decimal-exact sums (the corpus_report
    # convention): each per-query ratio is a bit-identical double on any
    # engine (integer÷integer), the 12dp quantization of it is therefore
    # identical too, and the sum is then order-independent — avg() of raw
    # doubles would drift with aggregation order at large n_queries.
    def exact_avg(ratio: Column) -> Column:
        return F.round(
            F.sum(ratio.cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1)),
            9,
        )

    recall = F.coalesce(F.col("__hits_at_k"), F.lit(0)).cast("double") / F.least(
        F.col("__n_rel"), F.lit(k)
    ).cast("double")
    rr = F.coalesce(F.lit(1.0) / F.col("__first_rank").cast("double"), F.lit(0.0))
    return per_query.agg(
        exact_avg(recall).alias("recall_at_k"),
        exact_avg(rr).alias("mrr"),
        exact_avg(ndcg).alias("ndcg_at_k"),
        F.count(F.lit(1)).alias("n_queries"),
    )


def hard_negatives(
    predictions: DataFrame,
    relevant: DataFrame,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Mine HARD NEGATIVES for contrastive/reranker training: per query,
    the top-``k`` retrieved documents that are NOT relevance-judged —
    the high-scoring confusables a trained ranker most needs to push
    down (random negatives are trivially separable; these aren't).

    One anti join against the judgments + a rank filter; ranks keep
    their retrieval order (gaps where a relevant doc was interleaved —
    downstream negative-sampling usually wants the original retrieval
    rank, so it is NOT re-densified here).
    """
    neg = predictions.join(
        relevant.select(query_col, doc_col), [query_col, doc_col], "left_anti"
    )
    return neg.filter(F.col(rank_col) <= k)
