"""End-to-end training-corpus curation — the X-operator families composed.

The pipeline a pretraining data team actually runs, expressed with this
repo's operators over the driver testdata:

    raw documents
      → exact dedup            (X1: drop byte-identical bodies)
      → decontamination trio   (X2/X3: exact-key at Bloom cost via
                                bloom_verified_anti_join; 13-gram
                                overlap via ngram_decontaminate; and —
                                when an embedding side-table is given —
                                semantic near-matches via
                                semantic_contaminated_ids, catching the
                                paraphrases the lexical forms miss)
      → near-dup canonicals    (X2: MinHash-LSH → connected components,
                                keep one doc per cluster)
      → span dedup             (X2: strip corpus-wide repeated 4-word
                                tiles out of otherwise-unique docs and
                                stitch the survivors back — ExactSubstr
                                boilerplate removal)
      → semantic dedup         (X3: hashed-TF vectors → k-means clusters
                                → drop members cosine-≥τ to a more
                                central one — SemDeDup, no external
                                embedding model needed)
      → quality gates          (X5: C4-style score, then the full
                                Gopher repetition suite — 20 metrics,
                                one projection)
      → LM perplexity gate     (X5: corpus-trained bigram LM; drop the
                                high-perplexity gibberish tail —
                                CCNet-style)
      → PII scrub              (X5: emails/phones/IPs → typed masks)
      → language ID            (X5: n-gram heuristic; drops docs the
                                detector can't place — 'und')
      → DSIR selection         (X6: importance-resample the docs whose
                                hashed-n-gram profile matches the
                                trusted target corpus — Xie et al. 2023)
      → per-domain cap         (X6: at most N docs per source — no
                                template-heavy domain dominates)
      → mixture sampling       (X6: per-SOURCE token budgets — an
                                explicit spec, or temperature-scaled
                                budgets ∝ sqrt(source mass))
      → leakage-safe split     (X6: near-dup clusters over the FINAL
                                texts are the split unit — no twin
                                straddles train/val)
      → sequence packing       (X6: token-budget packs per shard)
      → partitioned parquet    (split/lang-partitioned, pruned reads)

Run::

    python examples/corpus_pipeline.py [sf_dir] [out_dir]

Every stage is deterministic (id-hash ordering, no rand()), so re-runs
produce the identical corpus — the property that makes incremental
re-curation and retry-safe backfills possible.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from wwwision_importservice_spark.operators.clustering import (  # noqa: E402
    semantic_dedup,
)
from wwwision_importservice_spark.operators.dedup import (  # noqa: E402
    bloom_verified_anti_join,
    build_bloom_filter,
    connected_components,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures_inline,
    ngram_decontaminate,
)
from wwwision_importservice_spark.operators.similarity import (  # noqa: E402
    semantic_contaminated_ids,
)
from wwwision_importservice_spark.operators.bpe import (  # noqa: E402
    bpe_encode,
)
from wwwision_importservice_spark.operators.selection import (  # noqa: E402
    dsir_select,
)
from wwwision_importservice_spark.operators.features import (  # noqa: E402
    hashing_tf_vectors,
)
from wwwision_importservice_spark.operators.lm import (  # noqa: E402
    bigram_model,
    lm_perplexity,
)
from wwwision_importservice_spark.operators.sampling import (  # noqa: E402
    cap_per_group,
    leakage_safe_split,
    mixture_sample,
    pack_sequences,
    temperature_budgets,
)
from wwwision_importservice_spark.operators.text import (  # noqa: E402
    dedup_spans,
    detected_language,
    gopher_quality_pandas,
    quality_filter,
    scrub_pii,
    token_count,
)
from wwwision_importservice_spark.operators.bpe import (  # noqa: E402
    PINNED_MERGES,
)
from wwwision_importservice_spark.session import get_spark  # noqa: E402


def curate(
    spark,
    sf_dir: str,
    eval_df=None,
    dsir_target=None,
    dsir_k=420,
    budgets=None,
    total_budget=4000,
    bpe_merges=None,
    eval_ngram_n=None,
    embeddings_df=None,
    semantic_threshold=0.9,
):
    """``eval_df`` (optional): documents-shaped frame whose TEXTS are
    scrubbed from the corpus (benchmark decontamination).
    ``eval_ngram_n`` (optional, needs ``eval_df``): additionally drop
    docs sharing any word n-gram with the eval set — the GPT-3-style
    fragment-level filter the exact-key form can't express.
    ``embeddings_df`` (optional, needs ``eval_df``): an embedding side
    table keyed ``(vec_id == doc_id, embedding)``; docs whose vector
    has cosine ≥ ``semantic_threshold`` to any eval doc's vector under
    the sign-LSH candidate rule are dropped too — the paraphrase case
    neither lexical form catches. ``dsir_target``
    (optional): documents-shaped trusted corpus; when given, the
    language-gated corpus is importance-resampled down to ``dsir_k``
    docs whose hashed-n-gram profile matches it before mixing.
    ``budgets`` (optional): explicit per-source token budgets; when
    None, temperature-scaled budgets (alpha=0.5 over ``total_budget``
    tokens) rebalance the sources automatically — the mT5 rule.
    ``bpe_merges`` (optional): a frozen BPE merge table; when given,
    ``n_tokens`` is the TRAINED tokenizer's count (``bpe_encode`` in one
    Arrow pass, the merge dict broadcast by value), so the temperature
    budgets, mixture admission, and sequence packs are all spent in the
    tokens a training run actually consumes — whitespace counts can
    misprice a budget by the full subword blow-up factor."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # X1 — exact dedup: keep the smallest doc_id per identical body
    survivors = exact_dedup(docs, ["text"], "doc_id").select("doc_id")
    deduped = docs.join(survivors, "doc_id", "left_semi")

    # X2e — eval-set decontamination, exact at Bloom cost: the bitmap
    # clears ~(1-fpp) of the corpus without a join; only the maybes
    # meet the eval texts in a broadcast anti-join
    if eval_df is not None:
        bloom = build_bloom_filter(eval_df, "text", fpp=0.01)
        deduped = bloom_verified_anti_join(deduped, bloom, eval_df, "text")
        # X2n — fragment-level: any shared word n-gram disqualifies
        if eval_ngram_n is not None:
            deduped = ngram_decontaminate(
                deduped, eval_df, "doc_id", "text", n=eval_ngram_n
            )
        # X3 — semantic: embedding near-matches to eval items (vectors
        # live in a side table keyed by the doc id, so the contaminated
        # ID SET anti-joins the document frame directly — docs without
        # a vector are unaffected)
        if embeddings_df is not None:
            eval_vecs = embeddings_df.join(
                eval_df.select(F.col("doc_id").alias("vec_id")),
                "vec_id",
                "left_semi",
            )
            sem_ids = semantic_contaminated_ids(
                embeddings_df, eval_vecs, "vec_id", "embedding",
                threshold=semantic_threshold,
            ).withColumnRenamed("vec_id", "doc_id")
            deduped = deduped.join(sem_ids, "doc_id", "left_anti")

    # X2 — near-dup canonicals: LSH pairs → components → keep cluster min
    sig = minhash_signatures_inline(deduped, "doc_id", "text", n=3, num_hashes=16)
    pairs = lsh_candidate_pairs(sig, "doc_id", num_hashes=16, bands=4)
    clusters = connected_components(
        deduped.select("doc_id"), pairs, id_col="doc_id"
    )
    canonical = deduped.join(
        clusters.filter(F.col("id") == F.col("cluster_id")).select(
            F.col("id").alias("doc_id")
        ),
        "doc_id",
        "left_semi",
    )

    # X2b — span dedup: strip corpus-wide repeated 4-word tiles (headers,
    # license blocks, navigation chrome) out of otherwise-unique docs;
    # the rewritten text replaces the original (n_chars is stale after
    # the rewrite, so it's dropped — downstream uses token counts)
    rewritten = dedup_spans(canonical, "doc_id", "text", span_words=4)
    canonical = canonical.drop("text", "n_chars").join(
        rewritten.select("doc_id", "text"), "doc_id"
    )

    # X3 — semantic dedup on hashed-TF vectors (vocabulary-free: no
    # external embedding model): cluster, then drop members
    # cosine-similar to a more central one. τ=0.9 on l2-TF cosine ≈
    # heavy token-multiset overlap the shingle LSH can miss when word
    # ORDER differs.
    vecs = hashing_tf_vectors(canonical, "doc_id")
    sem = semantic_dedup(
        vecs, "doc_id", n_clusters=8, threshold=0.9, iterations=2
    )
    sem_kept = canonical.join(
        sem.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    )

    # X5 — quality gates: the light C4-style score first, then the full
    # Gopher repetition suite (r8: 20 metrics, one projection, no
    # shuffle) with stopwords/floors tuned to the fixture's 31-word
    # vocabulary, then the CCNet-style LM gate: train the bigram LM on
    # the surviving corpus, drop the high-perplexity tail (fixed
    # ceiling — deterministic, no quantile job)
    # barrier before the gate: the semi-join's two branches (gated and
    # the scorer output derived FROM gated) are different subtrees, so
    # without it one action executes the whole upstream curation lineage
    # (MinHash dedup, semantic dedup, span rewrite) twice
    gated = quality_filter(
        sem_kept, "text", min_score=0.3, min_tokens=5
    ).localCheckpoint()
    gq = gopher_quality_pandas(
        gated,
        "doc_id",
        "text",
        stopwords=["the", "a", "value", "table", "key", "row", "scan", "data"],
        thresholds={"min_words": 20},
    )
    gated = gated.join(
        gq.filter(F.col("gopher_keep")).select("doc_id"), "doc_id", "left_semi"
    ).localCheckpoint()
    # ^ barrier after the gate: downstream runs several independent
    # actions (LM fit, DSIR model collects, packing prefix sums), each
    # of which would otherwise re-execute the whole curation lineage.
    # (The Arrow scorer also keeps the gate out of Catalyst's analysis
    # hot path — the expression twin's folds, left in a deep lineage,
    # cost minutes of repeated driver-side plan time: measured 459s at
    # sf0.001.)
    model = bigram_model(gated, id_col="doc_id")
    ppl = lm_perplexity(gated, model, id_col="doc_id")
    lm_ok = gated.join(
        ppl.filter(F.round("perplexity", 6) <= 40.0).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    cleaned = lm_ok.withColumn("text", scrub_pii(F.col("text")))
    tagged = cleaned.withColumn(
        "detected_lang", detected_language(F.col("text"))
    )
    if bpe_merges is not None:
        # tokenizer-true budgets: every downstream n_tokens consumer
        # (temperature_budgets → mixture_sample → pack_sequences) now
        # spends BPE tokens, not whitespace words
        tagged = bpe_encode(tagged, bpe_merges, "text").withColumn(
            "n_tokens", F.size("bpe_tokens").cast("long")
        ).drop("bpe_tokens")
    else:
        tagged = tagged.withColumn(
            "n_tokens", token_count(F.col("text")).cast("long")
        )

    # language-ID gate: docs the detector can't place are dropped (on
    # this synthetic fixture the text is English-ish regardless of the
    # ground-truth lang column, so detection honestly yields en/und —
    # the gate is the stage a real crawl needs)
    identified = tagged.filter(F.col("detected_lang") != "und")

    # X6b — DSIR: keep the dsir_k docs (sampled without replacement
    # ∝ importance weight) whose hashed-n-gram distribution looks like
    # the trusted target corpus — the data-selection step in front of
    # the mixture spec. Deterministic per seed; models broadcast.
    if dsir_target is not None:
        picked = dsir_select(
            identified, dsir_target, k=dsir_k, id_col="doc_id"
        ).select("doc_id")
        identified = identified.join(picked, "doc_id", "left_semi")

    # X6 — DOMAIN mixture: token budgets per crawl source; sources
    # without an explicit budget get the default (here: admitted at a
    # smaller budget, exercising both paths)
    # per-domain frequency cap BEFORE the token-budget mixture: a
    # template-heavy source can't crowd the budget with its first
    # hash-ordered docs
    capped = cap_per_group(identified, "doc_id", "source", max_rows=400)

    # explicit spec when given; else temperature rebalancing (r8):
    # budget per source ∝ sqrt(source token mass) over total_budget
    if budgets is None:
        # barrier: the spec rollup (a collect) and the admission pass
        # both consume `capped` — checkpoint so the curation lineage
        # executes once, not twice
        capped = capped.localCheckpoint()
        budgets = temperature_budgets(
            capped, "source", "n_tokens", total_budget, alpha=0.5
        )
        default_budget = 0  # temperature covers every observed source
    else:
        default_budget = 300
    mixed = mixture_sample(
        capped,
        "doc_id",
        "source",
        "n_tokens",
        budgets=budgets,
        default_budget=default_budget,
    )

    # X6c — leakage-safe split (r8): re-sign the POST-curation texts
    # (span rewriting can converge two previously-distinct docs into
    # near-twins the original pair set never saw) and split on the
    # resulting clusters, so no surviving near-dup pair straddles
    # train/val. The mixed frame is localCheckpoint'ed first: the split
    # runs iterative connected components, and WITHOUT the barrier every
    # CC round re-executes the entire curation lineage (LM fit, k-means,
    # DSIR model fits) from the scan — a real pipeline persists between
    # curation and split anyway.
    mixed = mixed.localCheckpoint()
    sig2 = minhash_signatures_inline(mixed, "doc_id", "text", n=3, num_hashes=16)
    pairs2 = lsh_candidate_pairs(sig2, "doc_id", num_hashes=16, bands=4)
    split = leakage_safe_split(
        mixed, "doc_id", pairs2, {"train": 0.9, "val": 0.1},
        edges_within_nodes=True,  # pairs2 derives from mixed itself
    )
    return pack_sequences(
        split, "doc_id", "n_tokens", budget=512, shards=16
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    spark = get_spark(app_name="corpus-pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    packed = curate(
        spark,
        sf_dir,
        # demo eval set: a deterministic ~1% id-hash slice plays the
        # held-out benchmark whose texts must not leak into training
        eval_df=docs.filter(F.col("doc_id") % 97 == 0),
        # demo trusted target: the ground-truth-English slice
        dsir_target=docs.filter(F.col("lang") == "en"),
        # tokenizer-true budgets: the frozen merge table the x6_bpe_pack
        # oracle row pins (a production run would pass its own trained
        # tokenizer's merges)
        bpe_merges=PINNED_MERGES,
    )
    (
        packed.write.mode("overwrite")
        .partitionBy("split", "source")
        .parquet(out_dir)
    )
    back = spark.read.parquet(out_dir)
    stats = (
        back.groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").alias("tokens"),
            F.countDistinct("shard", "pack_id").alias("packs"),
        )
        .orderBy("split", "source")
    )
    print(f"curated corpus at {out_dir}:")
    for r in stats.collect():
        print(
            f"  {r['split']:5s} {r['source']:6s}: {r['docs']:4d} docs, "
            f"{r['tokens']:7d} tokens, {r['packs']:4d} packs"
        )


if __name__ == "__main__":
    main()
