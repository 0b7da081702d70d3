"""Data selection via importance resampling (DSIR).

Xie et al., "Data Selection for Language Models via Importance
Resampling" (NeurIPS 2023, arXiv:2302.03169): choose pretraining
documents from a huge raw corpus so the selected set's distribution
matches a small trusted target corpus (Wikipedia/books), using bag-of-
hashed-n-gram multinomial models — the standard data-selection step in
front of LLM pretraining. No reference counterpart (the PHP reference
has no text surface — SURVEY §1.4); this is pipeline-extension surface
alongside :mod:`operators/sampling` and :mod:`operators/lm`.

The three DSIR steps, Spark-first:

1. **Fit** — two multinomial bucket models ``p_target`` / ``p_raw``
   over md5-hashed unigram+bigram features. A model is ONE BIGINT
   count table ``(bucket, c)`` with at most ``buckets`` rows: training
   is an explode + hash aggregate (map-side combinable, one corpus
   read), and models merge additively (:func:`merge_hashed_ngram_models`
   — incremental corpus growth is a count-table fold, never a retrain).
2. **Weigh** — per-document log importance weight
   ``log w(x) = Σ_features log(p_target(b)/p_raw(b))`` (add-1
   smoothing). Docs join the models on ``bucket`` — both models are
   ≤ ``buckets`` rows, so both joins BROADCAST; per-doc aggregation is
   the only shuffle. Cost: one corpus scan regardless of corpus size.
3. **Resample** — sample ``k`` docs without replacement ∝ ``w`` via
   the Gumbel-top-k trick: ``argtop_k(log w_i + g_i)`` with ``g_i``
   standard Gumbel. Planned as ``TakeOrderedAndProject`` (per-partition
   top-k, merge on the driver) — no global sort, ever.

Exactness discipline (cross-engine hash-parity, the same playbook as
``operators/graph.py``'s BIGINT micro-unit PageRank and
``operators/lm.py``'s count-table LM):

- Counts, totals, and buckets are BIGINT / md5-derived — DuckDB
  reproduces the bucket byte-for-byte
  (``CAST('0x'||substr(md5(f),1,15) AS BIGINT) % buckets``).
- The one transcendental (``ln`` of the smoothed probability ratio) is
  quantized to 1e-6 "micro-nats" per BUCKET immediately after the
  ``ln``; per-doc weights are then integer SUMS of micro-terms —
  order-independent, associativity-free, engine-exact. The only
  cross-engine wobble left is the last ulp of ``ln`` itself, which can
  flip a rounded term only when ``1e6·ln(...)`` lands within ~1e-9 of
  a ``.5`` boundary (odds ~1e-5 across a 10k-bucket model;
  ``tests/test_selection.py`` asserts a 1e-3 margin on the fixtures).
- Gumbel noise is deterministic: ``u`` from ``md5(seed ':' id)``
  mapped into (0,1), ``g = -ln(-ln(u))``, micro-quantized the same
  way. Re-runs, retries, and both engines agree on every draw; a new
  ``seed`` re-deals the randomness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wwwision_importservice_spark.operators.sampling import hash_bucket, md5_long
from wwwision_importservice_spark.operators.text import corpus_tokens

DEFAULT_BUCKETS = 10_000

#: one micro-nat = 1e-6 nats — the ln-quantization unit (see module doc)
_MICRO = 1e6

#: 2^60 — the md5-prefix hash range of :func:`hash_bucket`'s construction
_HASH_RANGE = float(1 << 60)


def _feature_array(text_col: Column, ngram: int) -> Column:
    """Unigram (+ bigram) feature strings of one document: the
    lowercased whitespace tokens themselves, plus space-joined adjacent
    pairs for ``ngram=2`` (the DSIR paper's default feature map).
    Empty/one-token docs yield the unigrams they have (possibly none).
    """
    if ngram not in (1, 2):
        raise ValueError(f"ngram must be 1 or 2, got {ngram}")
    toks = corpus_tokens(text_col)
    if ngram == 1:
        return toks
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n),
        F.slice(toks, 2, n),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.concat(toks, bigrams)


def hashed_ngram_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    ngram: int = 2,
) -> DataFrame:
    """Per-document hashed feature counts ``(id, bucket, cnt)`` —
    explode + one map-side-combinable aggregate. ``bucket`` is the
    engine-portable md5 bucket of the feature string
    (:func:`~operators.sampling.hash_bucket`), so DuckDB restates the
    whole feature map declaratively. Docs with no tokens emit nothing
    (scored as absent downstream, not zero — the lm.py convention)."""
    feat = F.explode(_feature_array(F.col(text_col), ngram)).alias("__feat")
    return (
        df.select(F.col(id_col), feat)
        .select(
            F.col(id_col),
            hash_bucket(F.col("__feat"), buckets).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hashed_ngram_model(
    df: DataFrame,
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    ngram: int = 2,
) -> DataFrame:
    """Fit the multinomial bucket model: ``(bucket, c)``, at most
    ``buckets`` rows, all BIGINT. One explode + hash aggregate over the
    corpus; lazily localCheckpoint'ed so multiple scoring consumers
    reuse the counts instead of re-exploding the corpus per subtree
    (the bigram_model discipline, ``operators/lm.py:70``)."""
    feat = F.explode(_feature_array(F.col(text_col), ngram)).alias("__feat")
    return (
        df.select(feat)
        .select(hash_bucket(F.col("__feat"), buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )


def merge_hashed_ngram_models(a: DataFrame, b: DataFrame) -> DataFrame:
    """``merge(model(A), model(B)) == model(A ∪ B)`` exactly (pinned by
    test) — counts are additive, so incremental corpus growth and
    streaming micro-batch folds are count-table merges over ≤ 2·buckets
    rows, never a retrain."""
    return (
        a.unionByName(b)
        .groupBy("bucket")
        .agg(F.sum("c").alias("c"))
        .localCheckpoint(eager=False)
    )


def _model_total(model: DataFrame, name: str) -> DataFrame:
    """1-row total-feature-count frame (broadcast into the scoring
    plan; collecting a scalar would work too but keeps a job out of
    the lazy plan)."""
    return model.agg(F.coalesce(F.sum("c"), F.lit(0)).alias(name))


def dsir_log_weights(
    df: DataFrame,
    target_model: DataFrame,
    raw_model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    ngram: int = 2,
) -> DataFrame:
    """Per-document DSIR log importance weight in integer micro-nats:
    ``(id, n_feats, logw_micro)`` where

    ``logw_micro = Σ_buckets cnt(b) · round(1e6 · ln( (ct(b)+1)·(Tr+B)
    / ((cr(b)+1)·(Tt+B)) ))``

    — the add-1-smoothed multinomial log-likelihood ratio, quantized
    per bucket (see module doc for why this is hash-exact
    cross-engine). ``n_feats`` is the doc's total feature count (its
    multinomial length). Docs with zero features emit no row.

    Scale shape: the doc side is one explode + per-(id,bucket)
    map-side-combinable aggregate; both model joins broadcast (models
    are ≤ ``buckets`` rows by construction); the final per-doc sum is
    the only shuffle, keyed by the (unique) id — no skew. One corpus
    scan total, model size independent of corpus size."""
    doc = hashed_ngram_counts(df, id_col, text_col, buckets, ngram)
    return dsir_log_weights_from_counts(
        doc, target_model, raw_model, id_col, buckets
    )


def dsir_log_weights_from_counts(
    doc_counts: DataFrame,
    target_model: DataFrame,
    raw_model: DataFrame,
    id_col: str = "doc_id",
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """:func:`dsir_log_weights` from PRE-COMPUTED per-doc bucket counts
    (``(id, bucket, cnt)`` — :func:`hashed_ngram_counts`). This is the
    seam that lets :func:`dsir_select` explode the raw corpus exactly
    once: the raw model is a rollup of the same counts frame that
    scoring probes (equal to a direct fit by count additivity — pinned
    by test)."""
    tgt = target_model.select("bucket", F.col("c").alias("__ct"))
    raw = raw_model.select("bucket", F.col("c").alias("__cr"))
    totals = (
        _model_total(target_model, "__tt")
        .crossJoin(_model_total(raw_model, "__tr"))
    )
    b = F.lit(float(buckets))
    num = (F.coalesce(F.col("__ct"), F.lit(0)) + F.lit(1)).cast("double") * (
        F.col("__tr").cast("double") + b
    )
    den = (F.coalesce(F.col("__cr"), F.lit(0)) + F.lit(1)).cast("double") * (
        F.col("__tt").cast("double") + b
    )
    term = F.round(F.lit(_MICRO) * F.log(num / den)).cast("long")
    return (
        doc_counts.join(F.broadcast(tgt), "bucket", "left")
        .join(F.broadcast(raw), "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_feats"),
            F.sum(F.col("cnt") * term).alias("logw_micro"),
        )
    )


def gumbel_micro(id_col: Column, seed: int = 0) -> Column:
    """Deterministic standard-Gumbel draw per id, in integer
    micro-units: ``u`` is the md5 bucket of ``seed ':' id`` mapped to
    the open unit interval (``(h + 0.5) / 2^60`` — never exactly 0 or
    1, so both ``ln`` calls are finite), ``g = -ln(-ln(u))``, rounded
    to 1e-6. The md5 construction is the engine-portable one every
    sampler in :mod:`operators/sampling` uses; a different ``seed``
    re-deals every draw, the same seed replays them exactly."""
    h = md5_long(
        F.concat_ws(":", F.lit(str(int(seed))), id_col.cast("string"))
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(_HASH_RANGE)
    return F.round(F.lit(_MICRO) * -F.log(-F.log(u))).cast("long")


def dsir_resample(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "logw_micro",
    seed: int = 0,
    gumbel: bool = True,
    key_col: str = "key_micro",
) -> DataFrame:
    """Select ``k`` documents from the weighted frame. With
    ``gumbel=True`` (the DSIR paper's sampler) this draws WITHOUT
    replacement ∝ ``w`` via Gumbel-top-k: keep the ``k`` largest
    ``logw_micro + gumbel_micro(id)`` — one expression, deterministic
    per seed. ``gumbel=False`` degenerates to hard top-k by weight
    (deterministic "most target-like" selection). Ties (possible:
    integer keys) break by id.

    Scale shape: ``orderBy(...).limit(k)`` plans as
    ``TakeOrderedAndProject`` — each partition keeps its local top-k
    and the driver merges k·partitions candidate rows; no global sort,
    no shuffle of the corpus. k is a training-set size knob (≤ low
    millions); for larger k switch to a threshold filter on the key.
    """
    key = F.col(weight_col) + (
        gumbel_micro(F.col(id_col), seed) if gumbel else F.lit(0)
    )
    return (
        weights.withColumn(key_col, key.cast("long"))
        .orderBy(F.col(key_col).desc(), F.col(id_col).asc())
        .limit(int(k))
    )


def dsir_select(
    raw_df: DataFrame,
    target_df: DataFrame | None,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    ngram: int = 2,
    seed: int = 0,
    gumbel: bool = True,
    target_predicate: Column | None = None,
) -> DataFrame:
    """The whole DSIR pipeline in one call: fit ``p_target`` on
    ``target_df`` and ``p_raw`` on ``raw_df``, weigh every raw doc,
    Gumbel-resample ``k`` — returns ``(id, n_feats, logw_micro,
    key_micro)``.

    The RAW corpus — the huge side — is exploded exactly ONCE: its
    per-doc bucket counts are lazily localCheckpoint'ed, ``p_raw`` is
    a ≤ ``buckets``-row rollup of that same counts frame (equal to a
    direct fit by count additivity — pinned by test), and scoring
    probes the checkpointed counts instead of re-exploding the text.
    (An earlier form fit ``p_raw`` straight from ``raw_df`` and
    re-exploded the corpus for scoring — the model's checkpoint caches
    only the model, not the scan; r8 code-review finding.) The
    checkpoint materializes doc-bucket counts — rows ∝ corpus
    token-diversity, written once to executor-local disk right after
    the shuffle that produced them — in exchange for dropping a full
    text scan + explode + feature-hash pass; only the small trusted
    ``target_df`` gets a dedicated fit scan.

    ``target_predicate`` (r14): when the trusted corpus is a PREDICATE
    SLICE of ``raw_df`` itself (the common in-corpus setup — "docs
    whose lang/source/license marks them trusted"), pass the predicate
    instead of a ``target_df`` (which must then be None) and the
    target model is rolled up from the SAME single doc-counts pass
    that already feeds scoring and ``p_raw`` — the dedicated target
    fit scan (a second explode + feature-hash over the target slice)
    disappears. Bit-identical to the two-frame form by count
    additivity: ``model(filter(df, p)) == rollup(counts(df) where p)``
    — pinned by ``test_dsir_select_target_predicate_identical``. The
    predicate must be a row-level function of ``raw_df``'s columns
    (evaluated once per doc before the explode)."""
    if target_predicate is not None:
        if target_df is not None:
            raise ValueError(
                "dsir_select: pass either target_df or target_predicate, "
                "not both (the predicate form fits the target on "
                "raw_df.filter(predicate) from the shared counts pass)"
            )
        feat = F.explode(_feature_array(F.col(text_col), ngram)).alias("__feat")
        doc_t = (
            raw_df.select(
                F.col(id_col), target_predicate.alias("__tgt"), feat
            )
            .select(
                F.col(id_col),
                F.col("__tgt"),
                hash_bucket(F.col("__feat"), buckets).alias("bucket"),
            )
            .groupBy(id_col, "bucket")
            # __tgt is constant per doc (a row-level predicate), so max
            # is just "the value", deterministically
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.max("__tgt").alias("__tgt"),
            )
            .localCheckpoint(eager=False)
        )
        tgt = (
            doc_t.filter(F.col("__tgt"))
            .groupBy("bucket")
            .agg(F.sum("cnt").alias("c"))
        )
        doc = doc_t.drop("__tgt")
    else:
        tgt = hashed_ngram_model(target_df, text_col, buckets, ngram)
        doc = hashed_ngram_counts(
            raw_df, id_col, text_col, buckets, ngram
        ).localCheckpoint(eager=False)
    raw = doc.groupBy("bucket").agg(F.sum("cnt").alias("c"))
    w = dsir_log_weights_from_counts(doc, tgt, raw, id_col, buckets)
    return dsir_resample(w, k, id_col, seed=seed, gumbel=gumbel)
