"""Sequence packing for LLM training batches (X6 extension).

The last step of a training-data pipeline: documents are laid end to
end in a deterministic order and the concatenated token stream is cut
every ``seq_len`` tokens ("concat-and-cut" packing, the standard
pretraining batch layout — each training sequence is exactly full, and
a document crossing a boundary is split across two sequences). The
output is the SPAN TABLE that a loader materializes: one row per
(document, sequence) overlap with the half-open token ranges on both
the document side and the sequence side.

No reference-repo counterpart (the reference is a record import
service); this module exists for the training-data mandate alongside
dedup/similarity/text analysis.

Three packing modes, one family:

- :func:`pack_token_spans` (here) — EXACT token-level concat-and-cut
  with global-order semantics: docs are split at sequence boundaries,
  every sequence exactly full. The pretraining layout.
- ``sampling.pack_sequences`` — sharded doc-granularity budget packs
  (a doc belongs to the pack its first token lands in; packs overshoot
  by ≤ 1 doc). The shard-writer layout, one window per shard.
- :func:`greedy_pack_bins` (here) — boundary-preserving first-fit-
  decreasing bins: docs never split, bins never overflow. The
  fine-tuning/instruction-data layout.

Scale shape — the interesting part: the naive formulation is a global
ordered cumulative sum (``SUM(n_tokens) OVER (ORDER BY id)``), which
Spark plans as a SINGLE-PARTITION window — one task consumes the whole
corpus, a guaranteed 100 TB bottleneck. Instead the offsets come from a
two-level prefix sum:

1. docs are range-bucketed by id (``n_buckets`` deterministic buckets);
2. one small aggregate computes each bucket's token total;
3. the driver prefix-sums the ~``n_buckets`` totals (KBs, not data);
4. a broadcast of the bucket base offsets joins back, and the per-doc
   offset is the bucket base + an intra-bucket window cumsum
   (``partitionBy(bucket) orderBy(id)`` — parallel across buckets).

Every stage is distributed; the only serial work is the driver-side
scan of bucket totals. Equivalence to the global window is exact (same
total order), which is what the DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_token_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    seq_len: int = 2048,
    n_buckets: int = 64,
) -> DataFrame:
    """Concat-and-cut packing span table.

    ``df`` must carry ``id_col`` (unique, orderable — the packing
    order) and ``n_tokens_col`` (tokens per document; rows with
    ``n_tokens <= 0`` are dropped — they occupy no tokens). Returns one
    row per (document, sequence) overlap:

    - ``seq_id``          — 0-based index of the training sequence
    - ``id_col``          — the document
    - ``doc_tok_start`` / ``doc_tok_end`` — half-open token range of
      the document's contribution (``end - start`` tokens)
    - ``seq_tok_start``   — where that contribution lands inside the
      sequence (its end is ``seq_tok_start + doc_tok_end -
      doc_tok_start``)

    Every sequence except the last is exactly ``seq_len`` tokens; no
    padding rows are emitted (the loader pads/drops the tail).

    The bucket count trades driver work (one ``n_buckets``-row collect)
    against intra-bucket window width; at production scale pick
    ``n_buckets`` ≈ cluster cores × small constant so each bucket's
    ordered cumsum is one sane task.
    """
    if seq_len < 1:
        raise ValueError("pack_token_spans requires seq_len >= 1")
    if n_buckets < 1:
        raise ValueError("pack_token_spans requires n_buckets >= 1")
    docs = (
        df.select(
            F.col(id_col), F.col(n_tokens_col).cast("long").alias("__n")
        )
        .filter(F.col("__n") > 0)
        # Materialize the thin (id, n_tokens) projection ONCE (r14,
        # guide §2.4/§5): this frame is consumed three times below —
        # the bounds scalar, the per-bucket totals, and the final span
        # frame — and n_tokens_col is typically an EXPENSIVE derivation
        # (tokenize + count over the text column); without the
        # checkpoint each consumer re-ran the full upstream pass
        # (measured 3× the tokenize cost for x6_sequence_pack). Two
        # longs per doc: executor-local storage ∝ corpus row count,
        # the same order as the shuffle this operator already pays.
        # LAZY: the bounds .first() below materializes it — an eager
        # checkpoint would spend a fourth driver action on a frame the
        # very next line forces anyway (measured +0.3s at sf0.1).
        .localCheckpoint(eager=False)
    )
    # deterministic range buckets over the id domain: ntile would need a
    # global window (the bottleneck we're avoiding), so bucket on the
    # id's value range instead — id-distribution skew only skews BUCKET
    # SIZES, not correctness, and the intra-bucket window absorbs it
    bounds = docs.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).first()
    if bounds["lo"] is None:
        id_type = docs.schema[id_col].dataType.simpleString()
        return docs.sparkSession.createDataFrame(
            [],
            f"seq_id long, {id_col} {id_type}, doc_tok_start long, "
            "doc_tok_end long, seq_tok_start long",
        )
    try:
        lo, hi = int(bounds["lo"]), int(bounds["hi"])
    except (TypeError, ValueError):
        # loud, typed, and early (r11 review catch): the range-bucket
        # arithmetic needs a NUMERIC id domain; a string id crashed here
        # with a bare ValueError mid-driver. greedy_pack_bins handles
        # arbitrary id types (xxhash64 bucketing) — point callers there.
        raise TypeError(
            f"pack_token_spans requires a numeric {id_col!r} for its "
            "range buckets (got "
            f"{df.schema[id_col].dataType.simpleString()}); use "
            "greedy_pack_bins for non-numeric ids"
        ) from None
    span = max(hi - lo + 1, 1)
    # bucket arithmetic runs ENTIRELY in doubles: both (id - lo) and
    # (id-lo)*n_buckets overflow long for hash-sized id domains (e.g.
    # xxhash64 ids spanning the full long range) — wrapping (or ANSI
    # erroring) would break the monotonicity the prefix sum depends
    # on. long→double conversion, subtracting/dividing by constants,
    # and floor are each monotone, so bucket stays non-decreasing in
    # id even where doubles lose integer precision (ties only widen
    # buckets, never reorder them).
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(
            F.lit(0),
            (
                (F.col(id_col).cast("double") - F.lit(float(lo)))
                / F.lit(float(span))
                * F.lit(n_buckets)
            ).cast("long"),
        ),
    )
    bucketed = docs.withColumn("__b", bucket)
    # level 1: per-bucket totals -> driver prefix sum (n_buckets rows)
    totals = {
        r["__b"]: r["t"]
        for r in bucketed.groupBy("__b").agg(F.sum("__n").alias("t")).collect()
    }
    base, acc = {}, 0
    for b in range(n_buckets):
        base[b] = acc
        acc += totals.get(b, 0)
    spark = df.sparkSession
    base_df = F.broadcast(
        spark.createDataFrame(
            [(b, base[b]) for b in sorted(base)], "__b long, __base long"
        )
    )
    # level 2: intra-bucket exclusive cumsum, parallel across buckets
    w = (
        Window.partitionBy("__b")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        bucketed.withColumn("__intra", F.coalesce(F.sum("__n").over(w), F.lit(0)))
        .join(base_df, "__b")
        .select(
            F.col(id_col),
            F.col("__n"),
            (F.col("__base") + F.col("__intra")).alias("__off"),
        )
    )
    # a doc spanning [off, off+n) overlaps sequences floor(off/L) ..
    # floor((off+n-1)/L); explode that (usually 1-2 element) range
    L = F.lit(int(seq_len))
    first_seq = (F.col("__off") / L).cast("long")
    last_seq = ((F.col("__off") + F.col("__n") - 1) / L).cast("long")
    out = offsets.select(
        F.col(id_col),
        F.col("__n"),
        F.col("__off"),
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * L
    doc_tok_start = F.greatest(F.lit(0), seq_start - F.col("__off"))
    doc_tok_end = F.least(F.col("__n"), seq_start + L - F.col("__off"))
    return out.select(
        F.col("seq_id"),
        F.col(id_col),
        doc_tok_start.alias("doc_tok_start"),
        doc_tok_end.alias("doc_tok_end"),
        F.greatest(F.lit(0), F.col("__off") - seq_start).alias(
            "seq_tok_start"
        ),
    )


def greedy_pack_bins(
    df: DataFrame,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    seq_len: int = 2048,
    n_buckets: int = 64,
) -> DataFrame:
    """Boundary-preserving greedy packing (best-fit-decreasing): each
    document goes WHOLE into exactly one bin of capacity ``seq_len`` —
    the packing mode for fine-tuning / instruction data, where splitting
    an example across sequences is wrong. Documents longer than
    ``seq_len`` get a singleton bin with ``truncated = true`` (the
    loader decides whether to cut or drop them); zero/negative-token
    docs are dropped like :func:`pack_token_spans`.

    Returns ``(bin_id, id, n_tokens, bin_fill, truncated)`` where
    ``bin_fill`` is the bin's total token count (≤ ``seq_len`` unless
    the bin is a truncated singleton).

    Scale shape: greedy packing is inherently sequential, so it runs
    per BUCKET — docs are deterministically id-hash-bucketed, each
    bucket packs independently in one Arrow ``applyInPandas`` task, and
    bin ids are namespaced by bucket (``bucket * 2^40 + local``).
    Within a bucket the placement is BEST-fit-decreasing over a
    bisect-indexed capacity list — O(docs log bins) per bucket, where
    first-fit's linear bin scan would go quadratic on million-doc
    buckets. Ties (equal capacities) resolve to the lowest bin id, so
    placement stays deterministic. Cross-bucket
    packing could pack marginally tighter, but per-bucket waste is at
    most one non-full bin per bucket — bounded by ``n_buckets ×
    seq_len`` tokens corpus-wide, vanishing at scale — and bucketing is
    what makes the operator data-parallel with NO driver involvement.
    Deterministic: the bucket hash, the FFD order (tokens desc, id
    asc), and first-fit placement are all input-order-independent.

    Memory bound: each bucket materializes as ONE Arrow/pandas frame of
    ``(id, n_tokens)`` rows (~16 bytes/doc) in its task — size
    ``n_buckets`` so corpus_docs / n_buckets stays in the low millions
    (a 1B-doc corpus at 4096 buckets is ~4 MB per task). The default 64
    suits bench-scale corpora, not a full crawl.
    """
    if seq_len < 1:
        raise ValueError("greedy_pack_bins requires seq_len >= 1")
    if n_buckets < 1:
        raise ValueError("greedy_pack_bins requires n_buckets >= 1")
    docs = (
        df.select(
            F.col(id_col), F.col(n_tokens_col).cast("long").alias("__n")
        )
        .filter(F.col("__n") > 0)
        .withColumn(
            "__b", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
        )
    )
    L = int(seq_len)

    def pack(pdf):
        from bisect import bisect_left, insort

        import pandas as pd

        b = int(pdf["__b"].iloc[0])
        pdf = pdf.sort_values(
            ["__n", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        # open bins as a sorted list of (remaining_capacity, bin_idx):
        # best fit = smallest capacity >= n, lowest bin id on ties
        caps: list[tuple[int, int]] = []
        n_bins = 0
        out_bin = []
        for n in pdf["__n"]:
            n = int(n)
            if n >= L:
                out_bin.append(n_bins)  # full singleton, never reopened
                n_bins += 1
                continue
            i = bisect_left(caps, (n, -1))
            if i < len(caps):
                cap, idx = caps.pop(i)
                if cap - n > 0:
                    insort(caps, (cap - n, idx))
                out_bin.append(idx)
            else:
                out_bin.append(n_bins)
                if L - n > 0:
                    insort(caps, (L - n, n_bins))
                n_bins += 1
        fills = [0] * n_bins
        for i, n in zip(out_bin, pdf["__n"]):
            fills[i] += int(n)
        return pd.DataFrame(
            {
                "bin_id": [(b << 40) + i for i in out_bin],
                id_col: pdf[id_col],
                "n_tokens": pdf["__n"],
                "bin_fill": [fills[i] for i in out_bin],
                "truncated": [int(n) > L for n in pdf["__n"]],
            }
        )

    id_type = df.schema[id_col].dataType.simpleString()
    return docs.groupBy("__b").applyInPandas(
        pack,
        schema=(
            f"bin_id long, {id_col} {id_type}, n_tokens long, "
            "bin_fill long, truncated boolean"
        ),
    )


# --- training-shard materialization (r8) --------------------------------


def _row_sig(
    id_col: str, token_col: str, pack_col: str, offset_col: str
):
    """Order-independent per-row content signature: md5 of the packed
    row's identity fields, folded to a BIGINT via the repo's standard
    15-hex-digit construction (engine-portable: DuckDB reproduces it
    byte-for-byte; xxhash64 would not). Aggregated with bit_xor —
    commutative, associative, overflow-free (safe under ANSI mode,
    unlike a sum of hashes)."""
    from wwwision_importservice_spark.operators.sampling import md5_long

    sig = F.concat_ws(
        "|",
        F.col(id_col).cast("string"),
        F.col(pack_col).cast("string"),
        F.col(offset_col).cast("string"),
        F.col(token_col).cast("string"),
    )
    return md5_long(sig)


def _shard_manifest(
    data: DataFrame,
    id_col: str,
    token_col: str,
    shard_col: str,
    pack_col: str,
    offset_col: str,
) -> DataFrame:
    return data.groupBy(F.col(shard_col).cast("long").alias(shard_col)).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.col(pack_col)).alias("n_packs"),
        F.sum(F.col(token_col)).cast("long").alias("n_tokens"),
        F.bit_xor(_row_sig(id_col, token_col, pack_col, offset_col)).alias(
            "content_hash"
        ),
    )


def write_packed_shards(
    packed: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    shard_col: str = "shard",
    pack_col: str = "pack_id",
    offset_col: str = "pack_offset",
) -> DataFrame:
    """Materialize a packed corpus (``sampling.pack_sequences`` output)
    as training shards plus a content manifest — the handoff artifact a
    training job consumes and the transfer-integrity record ops teams
    audit.

    Layout::

        <out_dir>/data/shard=N/*.parquet   one file per shard
        <out_dir>/manifest/*.parquet       one row per shard:
            shard, n_docs, n_packs, n_tokens, content_hash

    One file per shard via a hash ``repartition`` on the shard column
    (equal keys land in one task, so each shard directory gets exactly
    one file regardless of shard count — no small-file explosion, and
    loaders stream one file per shard sequentially). Hash, not
    ``repartitionByRange``: range partitioning adds a sampling JOB that
    would execute the whole packing lineage a second time for no extra
    guarantee.

    The manifest is computed from the STAGED FILES READ BACK, not from
    the input frame — it certifies what is on disk. Both directories
    ride the repo's crash-safe backup-rename swap (``fsutil``): data
    first, manifest second, so every crash window leaves either the old
    generation or new-data+old-manifest — the latter is exactly what
    :func:`verify_shards` flags. Re-running on identical input yields a
    byte-identical manifest (hashes are content-derived and
    order-independent).
    """
    from wwwision_importservice_spark import fsutil

    spark = packed.sparkSession
    data_dir = f"{out_dir}/data"
    man_dir = f"{out_dir}/manifest"
    stage_data = f"{out_dir}/__stage_data"
    stage_man = f"{out_dir}/__stage_manifest"
    fsutil.recover_dir(spark, data_dir)
    fsutil.recover_dir(spark, man_dir)
    fsutil.delete_dir(spark, stage_data)
    fsutil.delete_dir(spark, stage_man)

    (
        packed.repartition(F.col(shard_col))
        .write.mode("overwrite")
        .partitionBy(shard_col)
        .parquet(stage_data)
    )
    # explicit schema (r11 review catch): an EMPTY corpus stages only a
    # _SUCCESS marker and schema inference would raise — a legitimately
    # empty input must yield an empty manifest, not a crash
    staged_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in packed.schema.fields
    )
    staged = spark.read.schema(staged_schema).parquet(stage_data)
    manifest = _shard_manifest(
        staged, id_col, token_col, shard_col, pack_col, offset_col
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(stage_man)

    fsutil.replace_dir(spark, stage_data, data_dir)
    fsutil.replace_dir(spark, stage_man, man_dir)
    return spark.read.parquet(man_dir)


def verify_shards(
    spark,
    out_dir: str,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    shard_col: str = "shard",
    pack_col: str = "pack_id",
    offset_col: str = "pack_offset",
) -> DataFrame:
    """Recompute every shard's manifest row from the data files and
    compare against the stored manifest: one row per shard with the
    stored/actual values and an ``ok`` verdict. Full-outer on the shard
    id, so a shard missing from either side (lost directory, stale
    manifest after a crash between the two swaps) surfaces as
    ``ok = false`` rather than silently vanishing. Cost: one scan of
    the shard data — run it after transfers, not per read."""
    from wwwision_importservice_spark import fsutil

    fsutil.recover_dir(spark, f"{out_dir}/data")
    fsutil.recover_dir(spark, f"{out_dir}/manifest")
    # a wholly-missing (or file-less) side must surface as ok=false
    # rows through the full-outer join, not raise (r11 review catch) —
    # the crash window between the two swaps leaves exactly
    # new-data + old/absent-manifest, and this function is the tool
    # documented to FLAG that state
    man_schema = (
        f"{shard_col} long, n_docs long, n_packs long, "
        "n_tokens long, content_hash long"
    )
    try:
        actual_src = spark.read.parquet(f"{out_dir}/data")
    except Exception:
        actual_src = None
    if actual_src is not None:
        actual = _shard_manifest(
            actual_src, id_col, token_col, shard_col, pack_col, offset_col
        )
    else:
        actual = spark.createDataFrame([], man_schema)
    actual = actual.select(
        shard_col,
        F.col("n_docs").alias("actual_n_docs"),
        F.col("n_packs").alias("actual_n_packs"),
        F.col("n_tokens").alias("actual_n_tokens"),
        F.col("content_hash").alias("actual_hash"),
    )
    try:
        stored = spark.read.schema(man_schema).parquet(f"{out_dir}/manifest")
    except Exception:
        stored = spark.createDataFrame([], man_schema)
    joined = stored.join(actual, shard_col, "full_outer")
    ok = (
        (F.col("n_docs") == F.col("actual_n_docs"))
        & (F.col("n_packs") == F.col("actual_n_packs"))
        & (F.col("n_tokens") == F.col("actual_n_tokens"))
        & (F.col("content_hash") == F.col("actual_hash"))
    )
    return joined.select(
        shard_col, "n_docs", "n_packs", "n_tokens", "content_hash",
        "actual_n_docs", "actual_n_packs", "actual_n_tokens", "actual_hash",
        F.coalesce(ok, F.lit(False)).alias("ok"),
    )


def append_packed_shards(
    batch: DataFrame,
    out_dir: str,
    batch_id: int,
    budget: int,
    shards: int = 1024,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Incrementally pack ONE crawl batch into an existing shard store —
    the per-batch ``admit`` step of a continuously-fed corpus, where
    :func:`write_packed_shards`'s whole-corpus swap would re-write 100 TB
    per micro-batch.

    Each doc lands in shard ``md5(id) % shards`` and continues that
    shard's RUNNING token stream: the shard's cursor (tokens packed by
    all strictly-older batches) seeds the batch's per-shard window
    cumsum, so ``pack_id``/``pack_offset`` are exactly what a one-shot
    ``sampling.pack_sequences`` over the concatenation of all batches
    (ordered by ``(batch_id, id)`` within shard) would assign — packs
    keep filling across batch boundaries, no padding gaps at the seams.

    Idempotence (the sketchstore batch-dir protocol): the batch's rows
    OVERWRITE their own ``data/batch_id=N/`` directory, so a retried
    batch reproduces byte-identical packs even after its own
    half-write. The manifest (same schema/signatures as
    :func:`write_packed_shards` — one row per shard over ALL batches so
    far) is swapped crash-safe after the data write.

    Scale shape — steady state is O(batch), never O(corpus): a
    strictly-new batch (its id above the store's watermark, no
    uncovered batch directories on disk) reads its per-shard cursors
    from the MANIFEST (≤ ``shards`` rows — the manifest's ``n_tokens``
    IS the cursor), packs with one per-shard window (parallel across
    shards, no global order), writes only its own rows, reads only
    those rows back, and MERGES the resulting delta-manifest into the
    stored one: ``n_docs``/``n_tokens`` add, ``content_hash`` XORs
    (disjoint row sets), and ``n_packs`` adds minus a boundary overlap
    — the batch's first pack in a shard can only coincide with the
    store's LAST pack there (every delta pack id ≥ floor(cursor /
    budget) ≥ the old max pack id), so ``countDistinct`` semantics
    merge exactly as ``old + delta - (min_delta_pack == old_max_pack)``.
    The old max pack per shard rides in a small state table
    (``manifest/_state`` — underscore-hidden from the manifest read,
    swapped in the SAME rename as the manifest, so the two can never
    diverge) together with the per-shard last-covered batch id whose
    max is the watermark.

    The full data-scan recompute survives ONLY as the crash-recovery /
    replay path, taken when the watermark doesn't match the batch
    directories on disk (a prior append crashed between its data write
    and its manifest swap), when the state table is missing, or when
    ``batch_id`` is not strictly newer (a verbatim retry after the
    admit-succeeded/checkpoint-lost window): cursors re-derive from
    ``data/batch_id < N`` pruned to two columns, and the manifest and
    state recompute from all files read back — byte-identical to what
    the incremental merges would have produced, which the recovery
    tests pin. If the fast path's manifest/state read itself fails
    (corrupted files), the append raises mid-write and the RETRY lands
    in the recovery path (the half-written batch directory raises the
    on-disk max above the watermark).
    """
    from wwwision_importservice_spark import fsutil
    from wwwision_importservice_spark.operators.sampling import hash_bucket

    if budget < 1:
        # budget=0 would floor-divide by zero into NULL pack ids and
        # write a nonsense store with no error (r11 review catch); the
        # sibling packers validate their capacity args the same way
        raise ValueError(f"append_packed_shards requires budget >= 1, got {budget}")
    spark = batch.sparkSession
    b = int(batch_id)
    data_dir = f"{out_dir}/data"
    man_dir = f"{out_dir}/manifest"
    state_dir = f"{man_dir}/_state"
    fsutil.recover_dir(spark, data_dir)
    fsutil.recover_dir(spark, man_dir)

    # crash-window probe: names only, one listStatus call — no data read
    batch_ids = [
        int(name.split("=", 1)[1])
        for name in fsutil.list_child_dirs(spark, data_dir)
        if name.startswith("batch_id=")
    ]
    watermark = None
    if fsutil.path_exists(spark, state_dir):
        try:
            watermark = (
                spark.read.parquet(state_dir)
                .agg(F.max("last_batch_id"))
                .first()[0]
            )
        except Exception:
            # unreadable state (truncated/corrupt file): the state table
            # is DERIVED — fall through to the recovery path, which
            # recomputes and overwrites it rather than bricking the store
            watermark = None
    fast = (
        watermark is not None
        and bool(batch_ids)
        and watermark == max(batch_ids)
        and b > watermark
    )

    sharded = batch.select(
        F.col(id_col),
        F.col(token_col).cast("long").alias(token_col),
        hash_bucket(F.col(id_col), shards).alias("shard"),
    )
    cursors = None
    if fast:
        try:
            # steady state: the manifest's n_tokens is the shard cursor
            cursors = spark.read.parquet(man_dir).select(
                F.col("shard").cast("long").alias("shard"),
                F.col("n_tokens").alias("_base"),
            )
        except Exception:
            # unreadable manifest (schema inference reads the footer, so
            # corruption surfaces HERE): recompute from data instead of
            # failing every retry identically
            fast = False
    # explicit schema for every data_dir read below (r11 review catch):
    # an empty FIRST batch leaves data/batch_id=0/ holding only a
    # _SUCCESS marker, and schema inference over a file-less store
    # raises — permanently wedging every retry and follow-up batch
    id_type = batch.schema[id_col].dataType.simpleString()
    data_schema = (
        f"{id_col} {id_type}, {token_col} long, pack_id long, "
        "pack_offset long, shard long, batch_id long"
    )
    if not fast and batch_ids:
        # recovery / replay: re-derive from strictly-older batches on
        # disk, pruned to two columns (the r10 behavior, now exceptional)
        cursors = (
            spark.read.schema(data_schema).parquet(data_dir)
            .filter(F.col("batch_id") < b)
            .groupBy(F.col("shard").cast("long").alias("shard"))
            .agg(F.sum(token_col).cast("long").alias("_base"))
        )
    if cursors is not None:
        sharded = sharded.join(F.broadcast(cursors), "shard", "left").withColumn(
            "_base", F.coalesce(F.col("_base"), F.lit(0).cast("long"))
        )
    else:
        sharded = sharded.withColumn("_base", F.lit(0).cast("long"))

    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_excl = (
        F.col("_base") + F.sum(F.col(token_col)).over(w) - F.col(token_col)
    )
    packed = (
        sharded.withColumn("pack_id", F.floor(cum_excl / budget).cast("long"))
        .withColumn(
            "pack_offset", (cum_excl - F.col("pack_id") * budget).cast("long")
        )
        .drop("_base")
    )
    (
        packed.repartition(F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(f"{data_dir}/batch_id={b}")
    )

    if fast:
        manifest, state = _merged_manifest_and_state(
            spark, man_dir, state_dir,
            f"{data_dir}/batch_id={b}",
            # explicit schema so an EMPTY batch directory reads as zero
            # rows instead of failing schema inference
            f"{id_col} {id_type}, {token_col} long, pack_id long, "
            "pack_offset long, shard long",
            b, id_col, token_col,
        )
    else:
        full = spark.read.schema(data_schema).parquet(data_dir)
        manifest = _shard_manifest(
            full, id_col, token_col, "shard", "pack_id", "pack_offset"
        )
        state = full.groupBy(
            F.col("shard").cast("long").alias("shard")
        ).agg(
            F.max("pack_id").alias("max_pack"),
            F.max("batch_id").cast("long").alias("last_batch_id"),
        )
        state = state.unionByName(
            _state_sentinel(spark, max([b] + batch_ids))
        )

    stage_man = f"{out_dir}/__stage_manifest"
    fsutil.delete_dir(spark, stage_man)
    manifest.coalesce(1).write.mode("overwrite").parquet(stage_man)
    state.coalesce(1).write.mode("overwrite").parquet(f"{stage_man}/_state")
    fsutil.replace_dir(spark, stage_man, man_dir)
    return spark.read.parquet(man_dir)


def _state_sentinel(spark, watermark: int) -> DataFrame:
    """One ``shard = -1`` watermark row for the state table. Per-shard
    ``last_batch_id`` alone can't record a batch that touched NO shard
    (an empty batch still writes its ``batch_id=N`` directory), and a
    watermark stuck below the directory listing would trap every later
    append in the recovery path — the sentinel always carries the true
    high-water mark. It joins nothing (no shard is -1) and the
    watermark probe takes ``max(last_batch_id)`` over all rows."""
    return spark.createDataFrame(
        [(-1, None, int(watermark))],
        "shard long, max_pack long, last_batch_id long",
    )


def _merged_manifest_and_state(
    spark,
    man_dir: str,
    state_dir: str,
    batch_data_dir: str,
    batch_schema: str,
    batch_id: int,
    id_col: str,
    token_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Steady-state manifest update: merge the stored manifest (+ state)
    with the just-written batch's delta-manifest, computed from the
    batch directory READ BACK (the manifest certifies disk, never the
    input frame). Every aggregate is mergeable — see
    :func:`append_packed_shards` for the ``n_packs`` boundary-overlap
    argument. Cost: two ≤``shards``-row reads plus one scan of the
    batch's own files."""
    delta = (
        spark.read.schema(batch_schema)
        .parquet(batch_data_dir)
        .groupBy(F.col("shard").cast("long").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs_d"),
            F.countDistinct(F.col("pack_id")).alias("n_packs_d"),
            F.sum(F.col(token_col)).cast("long").alias("n_tokens_d"),
            F.bit_xor(
                _row_sig(id_col, token_col, "pack_id", "pack_offset")
            ).alias("hash_d"),
            F.max("pack_id").alias("max_pack_d"),
            F.min("pack_id").alias("min_pack_d"),
        )
    )
    old = (
        spark.read.parquet(man_dir)
        .select(
            F.col("shard").cast("long").alias("shard"),
            "n_docs", "n_packs", "n_tokens", "content_hash",
        )
        .join(
            spark.read.parquet(state_dir).select(
                F.col("shard").cast("long").alias("shard"),
                "max_pack", "last_batch_id",
            ),
            "shard",
            "left",
        )
    )
    m = old.join(delta, "shard", "full_outer")
    # the batch's lowest pack in a shard coincides with the store's
    # highest iff it continues a partially-filled pack; -1 sentinel on a
    # missing state row (structurally impossible — manifest and state
    # swap together — but never subtract on corrupt input)
    overlap = F.when(
        F.col("n_packs").isNotNull()
        & F.col("n_packs_d").isNotNull()
        & (F.col("min_pack_d") == F.coalesce(F.col("max_pack"), F.lit(-1))),
        F.lit(1),
    ).otherwise(F.lit(0))
    zero = F.lit(0).cast("long")
    manifest = m.select(
        F.col("shard"),
        (F.coalesce(F.col("n_docs"), zero)
         + F.coalesce(F.col("n_docs_d"), zero)).alias("n_docs"),
        (F.coalesce(F.col("n_packs"), zero)
         + F.coalesce(F.col("n_packs_d"), zero) - overlap).alias("n_packs"),
        (F.coalesce(F.col("n_tokens"), zero)
         + F.coalesce(F.col("n_tokens_d"), zero)).alias("n_tokens"),
        F.coalesce(F.col("content_hash"), zero).bitwiseXOR(
            F.coalesce(F.col("hash_d"), zero)
        ).alias("content_hash"),
    )
    state = m.select(
        F.col("shard"),
        F.coalesce(F.col("max_pack_d"), F.col("max_pack")).alias("max_pack"),
        F.when(
            F.col("n_docs_d").isNotNull(), F.lit(int(batch_id)).cast("long")
        ).otherwise(F.col("last_batch_id")).alias("last_batch_id"),
    ).unionByName(_state_sentinel(spark, batch_id))
    return manifest, state
