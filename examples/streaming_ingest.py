"""Continuous corpus ingestion — the streaming counterpart of
``corpus_pipeline.py``, composing the round-5 ingest guards:

    crawl feed (file stream, one parquet per micro-batch)
      → quality gate      (quality_checks: a poisoned batch is skipped,
                           reported, and never retried — the offset
                           still advances)
      → near-dup gate     (streaming/neardup.py: each batch dedups
                           against the persisted LSH index of every
                           previously admitted document; per-batch cost
                           ∝ batch + touched buckets, not corpus size)
      → corpus append     (admitted docs land in the curated parquet
                           corpus; only THEIR bucket rows join the index)
      → sketch store      (operators/sketchstore.py: each admitted
                           batch appends its bounded summaries — per-
                           source token heads + length quantiles — so
                           "what does the curated corpus look like" is
                           answered any time from kilobytes of
                           summaries, and store_drift compares crawl
                           windows without rescanning)

State lives in parquet (the LSH index + the corpus + the stats store)
plus the stream checkpoint, so a restart resumes exactly where it
stopped; re-delivered batches re-admit nothing (the gate anti-joins
already-indexed ids) and re-land identical summary slices (batch-keyed
overwrite).

Run::

    python examples/streaming_ingest.py [in_dir] [out_dir]

where ``in_dir`` receives parquet files with ``documents``-shaped rows
(doc_id long, text string, lang string, source string, n_chars long).
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from wwwision_importservice_spark.operators import quality_checks as qc  # noqa: E402
from wwwision_importservice_spark.operators.sketchstore import (  # noqa: E402
    SketchStoreSpec,
    append_batch,
)
from wwwision_importservice_spark.operators.text import corpus_tokens  # noqa: E402
from wwwision_importservice_spark.streaming.neardup import near_dup_gate  # noqa: E402

INGEST_CHECKS = [
    qc.not_null("text"),
    qc.unique("doc_id"),
    qc.row_count(1),
]


#: what the stats store tracks about the CURATED corpus (admitted docs).
#: One combined spec for READERS (merged_heads / store_drift take the
#: whole-store view); the writer appends each family from its own frame
#: below — heads from exploded tokens, quantiles from one row per doc —
#: because a single exploded frame would weight the length quantiles by
#: token count (every doc's len appended once PER TOKEN), biasing
#: p50/p90 toward long documents (review finding, r7 ADVICE).
STATS_SPEC = SketchStoreSpec(
    group_cols=("source",), item_col="tok", value_col="len",
    counters=512, k=256,
)
#: writer-side per-family views of the same spec / same store_dir (each
#: family lands under its own kind directory, so splitting the append
#: is invisible to readers)
HEADS_SPEC = SketchStoreSpec(
    group_cols=STATS_SPEC.group_cols, item_col=STATS_SPEC.item_col,
    counters=STATS_SPEC.counters,
)
LEN_SPEC = SketchStoreSpec(
    group_cols=STATS_SPEC.group_cols, value_col=STATS_SPEC.value_col,
    k=STATS_SPEC.k,
)


def build_processor(
    index_dir: str,
    corpus_dir: str,
    stats: list | None = None,
    stats_store_dir: str | None = None,
):
    """The foreachBatch processor: quality gate wrapped around the
    near-dup gate, with the admitted docs' summaries landing in the
    sketch store. ``stats`` (optional list) collects per-batch
    ``(batch_id, outcome, n_admitted)`` tuples for observability."""

    def admit(survivors: DataFrame, batch_id: int) -> None:
        n = survivors.count()
        survivors.write.mode("append").parquet(corpus_dir)
        if stats_store_dir is not None:
            # summaries of what was ADMITTED, per engine batch id —
            # a replayed batch overwrites its identical slice. Two
            # appends from two frames: token heads from the exploded
            # frame, length quantiles from ONE row per doc (an exploded
            # len would be token-weighted — r7 ADVICE finding)
            append_batch(
                survivors.select(
                    "source",
                    # the repo-wide tokenizer (lowercase, empties
                    # filtered) — same statistics the oracles state
                    F.explode(corpus_tokens(F.col("text"))).alias("tok"),
                ),
                stats_store_dir,
                batch_id,
                HEADS_SPEC,
            )
            append_batch(
                survivors.select(
                    "source",
                    F.length("text").cast("double").alias("len"),
                ),
                stats_store_dir,
                batch_id,
                LEN_SPEC,
            )
        if stats is not None:
            stats.append((batch_id, "admitted", n))

    gate = near_dup_gate(index_dir, admit, n=3)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        report = qc.check_suite(batch_df, INGEST_CHECKS)
        failed = [r["check"] for r in report.collect() if not r["passed"]]
        if failed:
            # skip, don't fail: a poisoned crawl batch must not stall the
            # feed; the checkpoint advances, the batch is reported
            if stats is not None:
                stats.append((batch_id, f"quality_skipped:{','.join(failed)}", 0))
            return
        gate(batch_df, batch_id)

    return process


def main() -> None:
    from wwwision_importservice_spark.session import get_spark

    in_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/crawl_in"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_stream"
    spark = get_spark(app_name="streaming-ingest")
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    stats: list = []
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .writeStream.foreachBatch(build_processor(
            f"{out}/lsh_index", f"{out}/corpus", stats, f"{out}/stats"
        ))
        .option("checkpointLocation", f"{out}/checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    for batch_id, outcome, n in stats:
        print(f"batch {batch_id}: {outcome} ({n} docs)")


if __name__ == "__main__":
    main()
