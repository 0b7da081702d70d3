"""Text-analysis operators (SURVEY §2.9 X5).

Driver-mandated extensions over the ``documents`` table: language ID
(n-gram/stopword heuristic), quality scoring, token counting, document
fingerprinting. All pure ``pyspark.sql.functions`` expressions —
whole-stage codegen, no Python in the hot path, and each has an exact
DuckDB-SQL twin for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the heuristic language ID.
# (A real pipeline would use fastText/cld3 via a Pandas UDF — this is the
# portable, dependency-free n-gram-style heuristic.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "que", "los", "es"],
}

TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"  # BPE-ish word/number/punct split


def tokens(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda t: t != "")


def corpus_tokens(text_col: Column) -> Column:
    """THE corpus-wide tokenizer — lowercased whitespace tokens, empties
    dropped — shared by retrieval (BM25), lm, nbayes, and features so
    tf/df/count statistics agree across operators (one definition, not
    four copies that could drift)."""
    return tokens(F.lower(text_col))


def token_count(text: Column, pattern: str = TOKEN_PATTERN) -> Column:
    """Regex token count (portable: the pattern stays in the RE2 ∩ Java
    regex common subset)."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def stopword_ratio(text: Column, stopwords: list[str]) -> Column:
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(stopwords)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column) -> Column:
    punct = F.length(text) - F.length(
        F.regexp_replace(text, "[^A-Za-z0-9 ]", "")
    )
    return punct / F.greatest(F.length(text), F.lit(1))


def quality_score_expr(n_tokens, sw_ratio, p_ratio):
    """THE composite quality score, one definition (r11 review catch:
    the identical expression was copy-pasted into text_stats,
    quality_condition, and annotate_documents — a weight tweak had to
    land three times or the stats/filter/annotate paths silently
    disagreed). ``least(n_tokens/64, 1)·0.5 + stopword_ratio·0.3 +
    (1 − punct_ratio)·0.2``."""
    return (
        F.least(n_tokens / F.lit(64.0), F.lit(1.0)) * F.lit(0.5)
        + sw_ratio * F.lit(0.3)
        + (F.lit(1.0) - p_ratio) * F.lit(0.2)
    )


def normalized_text_expr(text):
    """Lowercase, strip non-alphanumerics, collapse whitespace — the
    normalization both :func:`fingerprint` and
    :func:`annotate_documents` key on (one definition, same reason)."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(text), "[^a-z0-9 ]", ""), " +", " "
        )
    )


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Quality-scoring feature frame: lengths, token stats, ratios, and a
    composite quality score (length-normalized, punctuation-penalized,
    stopword-informed) — one narrow projection.

    Outputs are raw doubles, deliberately unrounded: both engines
    evaluate the identical IEEE expression tree, so values are
    bit-identical, while ``round()`` implementations disagree on exact
    half cases (observed: 0.5046875 at 6 digits)."""
    text = F.col(text_col)
    toks = tokens(text)
    n_tokens = F.size(toks)
    mean_len = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t)
    ) / F.greatest(n_tokens, F.lit(1))
    sw_ratio = stopword_ratio(text, LANG_MARKERS["en"])
    p_ratio = punct_ratio(text)
    quality = quality_score_expr(n_tokens, sw_ratio, p_ratio)
    return df.select(
        F.col(id_col),
        F.length(text).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        sw_ratio.alias("stopword_ratio"),
        p_ratio.alias("punct_ratio"),
        quality.alias("quality_score"),
    )


def quality_condition(
    text: Column,
    min_score: float = 0.5,
    min_tokens: int = 5,
    max_punct_ratio: float = 0.3,
    max_repetition: float | None = None,
) -> Column:
    """Boolean quality gate over a text column: composite score plus
    hard floors/ceilings (the shape of a C4/Gopher-style rule filter).
    A single expression — composable into any ``.filter`` with no extra
    scan or join. ``max_repetition`` (when set) adds the Gopher
    duplicate-3-gram ceiling (:func:`repetition_ratio`) to the gate."""
    n_tokens = F.size(tokens(text))
    sw_ratio = stopword_ratio(text, LANG_MARKERS["en"])
    p_ratio = punct_ratio(text)
    quality = quality_score_expr(n_tokens, sw_ratio, p_ratio)
    cond = (
        (quality >= min_score)
        & (n_tokens >= min_tokens)
        & (p_ratio <= max_punct_ratio)
    )
    if max_repetition is not None:
        cond = cond & (repetition_ratio(text) <= max_repetition)
    return cond


def quality_filter(
    df: DataFrame,
    text_col: str,
    min_score: float = 0.5,
    min_tokens: int = 5,
    max_punct_ratio: float = 0.3,
    max_repetition: float | None = None,
) -> DataFrame:
    """Keep documents passing :func:`quality_condition` — one scan, the
    filter runs inside the scan stage's codegen."""
    return df.filter(
        quality_condition(
            F.col(text_col),
            min_score,
            min_tokens,
            max_punct_ratio,
            max_repetition,
        )
    )


def _language_best(text: Column) -> Column:
    """struct(s = marker hits, l = language) of the argmax language,
    alphabetical tiebreak."""
    toks = tokens(F.lower(text))

    def marker_filter(markers: list[str]):
        # NB: must stay a ONE-argument lambda — F.filter dispatches on
        # lambda arity, and a second parameter would be bound to the
        # array index, not the captured marker list.
        return lambda t: t.isin(markers)

    scores = {
        lang: F.size(F.filter(toks, marker_filter(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best = None
    for lang in sorted(scores):  # alphabetical iteration = tiebreak order
        score = scores[lang]
        if best is None:
            best = F.struct(score.alias("s"), F.lit(lang).alias("l"))
        else:
            best = F.when(
                scores[lang] > best.getField("s"),
                F.struct(score.alias("s"), F.lit(lang).alias("l")),
            ).otherwise(best)
    return best


def detected_language(text: Column) -> Column:
    best = _language_best(text)
    return F.when(best.getField("s") > 0, best.getField("l")).otherwise(
        F.lit("und")
    )


def detect_language(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Heuristic language ID: per-language stopword hit counts, argmax with
    deterministic (alphabetical) tiebreak; 'und' (undetermined) when no
    marker hits."""
    best = _language_best(F.col(text_col))
    return df.select(
        F.col(id_col),
        detected_language(F.col(text_col)).alias("detected_lang"),
        best.getField("s").alias("marker_hits"),
    )


def fingerprint(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Document fingerprint: md5 of the normalized text (lowercase,
    punctuation stripped, whitespace collapsed) — the key for
    normalized-exact dup clustering."""
    normalized = normalized_text_expr(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.md5(normalized).alias("fingerprint"),
    )


# PII patterns in the Java-regex ∩ RE2 common subset (no backrefs, no
# lookaround) so the DuckDB oracle can run the identical expressions.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9 ()-]{6,}[0-9]", "<PHONE>"),
    (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
]


def scrub_pii(text: Column, patterns: list[tuple[str, str]] | None = None) -> Column:
    """Mask PII spans (emails, phone-like digit runs, IPv4) with typed
    placeholders — the standard pre-training scrub pass. A chain of
    JVM-side ``regexp_replace`` calls (order matters: emails first so
    their digits don't half-match as phones); at 100 TB this runs inside
    the scan's codegen like every other X5 expression."""
    out = text
    for pattern, replacement in patterns or PII_PATTERNS:
        out = F.regexp_replace(out, pattern, replacement)
    return out


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token windows — the chunking
    stage in front of embedding/indexing. One row per chunk:
    ``(id, chunk_index, n_tokens, chunk_text)``, where chunk i covers
    whitespace tokens ``[i*stride, i*stride + chunk_tokens)`` and
    ``stride = chunk_tokens - overlap``. Pure expressions: the token
    array is built once, window starts come from ``sequence``, and the
    explode fans out rows — no UDF, no shuffle (chunking is a
    projection; whatever partitioning the scan has is preserved).

    Every document yields at least one chunk (short docs → one partial
    chunk), and the last window is the only one allowed to be short —
    matching the usual tokenizer-window semantics.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("chunk_documents requires 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # last start s.t. start <= n (1-based); short/empty docs get start 1
    n_chunks = F.greatest(
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)) + 1, F.lit(1)
    ).cast("int")
    starts = F.sequence(F.lit(0), n_chunks - 1)
    chunk = F.explode(
        F.transform(
            starts,
            lambda i: F.struct(
                i.alias("chunk_index"),
                F.slice(toks, i * stride + 1, chunk_tokens).alias("__toks"),
            ),
        )
    )
    return (
        df.select(F.col(id_col), chunk.alias("__c"))
        .select(
            F.col(id_col),
            F.col("__c.chunk_index").alias("chunk_index"),
            F.size("__c.__toks").alias("n_tokens"),
            F.array_join("__c.__toks", " ").alias("chunk_text"),
        )
    )


def _word_ngrams(text: Column, n: int) -> Column:
    toks = F.filter(F.split(F.lower(text), " "), lambda t: t != "")
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + F.lit(k)) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_ratio(text: Column, n: int = 3) -> Column:
    """Column form of the repetition rule — the fraction of word
    ``n``-grams that duplicate an earlier one. Composable into any
    filter (see :func:`quality_condition`'s ``max_repetition``)."""
    grams = _word_ngrams(text, n)
    total = F.size(grams)
    return F.when(
        total > 0,
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / total, 6
        ),
    ).otherwise(F.lit(0.0))


def dedup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 8,
) -> DataFrame:
    """CORPUS-WIDE exact-span dedup with text reassembly — the
    ExactSubstr idea (Lee et al., "Deduplicating Training Data Makes
    Language Models Better") simplified to fixed, non-overlapping word
    tiles: the text is cut into consecutive ``span_words``-word tiles,
    a tile that already occurred anywhere earlier in the corpus (first
    occurrence = lowest ``(doc, tile_index)``) is REMOVED, and each
    document's surviving tiles are stitched back together in order.
    Complements :func:`x1 <…dedup.exact_dedup>`/X2 document-level dedup:
    those drop whole near-identical documents; this strips repeated
    boilerplate *regions* (headers, license blocks, navigation chrome)
    out of otherwise-unique documents. The profiling twin is
    ``duplicated_spans`` (report, no rewrite); this one rewrites.

    Returns ``(id, text, n_spans, n_spans_kept)`` — documents whose
    every tile was dropped disappear from the output (their text would
    be empty), which downstream treats like any other filtered doc.

    Scale shape: tiles fan out ~tokens/span_words rows but each row is
    one short string; first-occurrence-wins is ``row_number()=1`` over
    the tile hash, which Spark plans as ``WindowGroupLimit`` (map-side
    partial limit before the exchange — a boilerplate tile occurring
    100M times ships once per input partition, not 100M times).
    Reassembly is one hash aggregate on the doc id with an in-agg
    ``array_sort``; no Python, no driver loop. Two uniform-key
    shuffles total.
    """
    from pyspark.sql import Window

    if span_words < 1:
        raise ValueError("dedup_spans requires span_words >= 1")
    toks = tokens(F.col(text_col))
    n_tiles = F.ceil(F.size(toks) / F.lit(span_words)).cast("int")
    tiles = F.transform(
        F.sequence(F.lit(0), F.greatest(n_tiles, F.lit(1)) - 1),
        lambda i: F.struct(
            i.alias("tile_idx"),
            F.array_join(
                F.slice(toks, i * span_words + 1, span_words), " "
            ).alias("tile"),
        ),
    )
    exploded = df.select(
        F.col(id_col),
        n_tiles.cast("long").alias("__n_spans"),
        F.posexplode_outer(tiles).alias("__pos", "__t"),
    ).select(
        F.col(id_col),
        F.col("__n_spans"),
        F.col("__t.tile_idx").alias("tile_idx"),
        F.col("__t.tile").alias("tile"),
    )
    w = Window.partitionBy(F.md5(F.col("tile"))).orderBy(
        F.col(id_col).asc(), F.col("tile_idx").asc()
    )
    survivors = (
        exploded.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("tile") != ""))
        .drop("__rn")
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("tile_idx"), F.col("tile")))
    )
    return survivors.groupBy(id_col).agg(
        F.array_join(F.transform(ordered, lambda s: s.tile), " ").alias(
            text_col
        ),
        F.first(F.col("__n_spans")).alias("n_spans"),
        F.count(F.lit(1)).cast("long").alias("n_spans_kept"),
    )


def repetition_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Within-document repetition: the fraction of word ``n``-grams that
    are duplicates of an earlier one — the Gopher-style quality rule
    that catches boilerplate, keyword stuffing, and decode loops, which
    length/stopword stats miss.

    Pure expression level: the gram array, its distinct form, and the
    ratio all evaluate inside whole-stage codegen per row — no explode,
    no shuffle, no Python. Cost is O(tokens) per document; at 100 TB the
    operator is scan-bound like the other X5 stats.
    """
    return df.select(
        F.col(id_col),
        F.size(_word_ngrams(F.col(text_col), n)).alias("n_grams"),
        repetition_ratio(F.col(text_col), n).alias("rep_score"),
    )


def corpus_report(
    df: DataFrame,
    group_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-group corpus health rollup — the dashboard a training-data
    pipeline publishes after ingest: document volume, exact-duplicate
    count (full-text hash), mean within-document repetition, and mean
    whitespace-token length.

    One hash aggregate (the distinct-count adds its own expand — the
    standard Spark distinct-agg plan); means go through decimal-exact
    sums so results are independent of accumulation order, per the
    oracle convention.
    """
    toks = F.size(F.filter(F.split(F.col(text_col), " "), lambda t: t != ""))
    rep = repetition_ratio(F.col(text_col))
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5(F.col(text_col)))).alias(
            "n_exact_dups"
        ),
        (
            F.sum(rep.cast("decimal(18,6)")).cast("double") / F.count(F.lit(1))
        ).alias("mean_repetition"),
        (F.sum(toks).cast("double") / F.count(F.lit(1))).alias("mean_tokens"),
    )


def corpus_frequency_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram corpus-typicality score — the integer-exact stand-in for
    a unigram-LM perplexity filter: a document's score is the mean
    corpus frequency of its tokens,

        score = Σ_t count(t) / (n_tokens(doc) · total_tokens(corpus)),

    low for gibberish/rare-token documents, high for stopword soup; both
    tails are filter candidates. All aggregation is over LONG counts
    (exact, order-independent) with ONE double division at the end, so
    the value is bit-identical in any engine — no log(), whose rounding
    differs across math libraries.

    Shape at scale: token explode → one hash aggregate for the vocab →
    broadcast join (the vocab is Zipf-small next to the corpus) → one
    hash aggregate back per document.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
    exploded = df.select(F.col(id_col), F.explode(toks).alias("__tok"))
    vocab = exploded.groupBy("__tok").agg(F.count(F.lit(1)).alias("__cnt"))
    total = vocab.agg(F.sum("__cnt").alias("__total"))
    scored = (
        exploded.join(F.broadcast(vocab), "__tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__cnt").alias("__freq_sum"),
        )
        .crossJoin(F.broadcast(total))
    )
    return scored.select(
        F.col(id_col),
        F.col("n_tokens"),
        (
            F.col("__freq_sum").cast("double")
            # n_tokens cast to double BEFORE the multiply (r11 review
            # catch): at the advertised corpus scale (~2e13 total
            # tokens) a megatoken document pushes the long×long product
            # past Long.MAX — ANSI aborts, non-ANSI silently wraps
            # negative. The double product is exact for every plausible
            # magnitude (< 2^53) and matches the oracle's CAST.
            / (F.col("n_tokens").cast("double") * F.col("__total"))
        ).alias("freq_score"),
    )


def annotate_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ONE-SCAN annotation: every per-document X5 signal appended as a
    column in a single projection — length/token stats, composite
    quality score, heuristic language, repetition ratio, normalized
    fingerprint. Real pipelines run exactly this "annotate once, filter
    many times downstream" stage: at 100 TB, five separate signal passes
    cost five scans; this costs one, and every expression lives in the
    same whole-stage-codegen region.
    """
    text = F.col(text_col)
    toks = tokens(text)
    n_tokens = F.size(toks)
    sw_ratio = stopword_ratio(text, LANG_MARKERS["en"])
    p_ratio = punct_ratio(text)
    quality = quality_score_expr(n_tokens, sw_ratio, p_ratio)
    normalized = normalized_text_expr(text)
    return df.select(
        *df.columns,
        F.length(text).alias("ann_n_chars"),
        n_tokens.alias("ann_n_tokens"),
        quality.alias("ann_quality_score"),
        detected_language(text).alias("ann_lang"),
        repetition_ratio(text).alias("ann_repetition"),
        F.md5(normalized).alias("ann_fingerprint"),
    )


# --- Gopher repetition / quality rules (Rae et al. 2021, arXiv:2112.11446,
# Table A1) -------------------------------------------------------------
#
# The published heuristic-filter suite most large text pipelines start
# from. Every metric below is a pure column expression — per-document
# cost is O(tokens log tokens) (one sort_array + one linear fold per
# n-gram size), independent of corpus size, zero shuffle, zero Python —
# so at 100 TB the filter is scan-bound like the rest of X5.

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# (metric, threshold) pairs from Rae et al. Table A1; `gopher_keep` is
# the conjunction. Overridable per-call for corpora with different
# baseline statistics (the synthetic fixture has a 31-word vocabulary).
GOPHER_THRESHOLDS: dict[str, float] = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "max_bullet_line_frac": 0.9,
    "max_ellipsis_line_frac": 0.3,
    "min_alpha_word_frac": 0.8,
    "min_stopword_hits": 2,
    "max_dup_line_frac": 0.30,
    "max_dup_para_frac": 0.30,
    "max_dup_line_char_frac": 0.20,
    "max_dup_para_char_frac": 0.20,
    "max_top_2gram_char_frac": 0.20,
    "max_top_3gram_char_frac": 0.18,
    "max_top_4gram_char_frac": 0.16,
    "max_dup_5gram_char_frac": 0.15,
    "max_dup_6gram_char_frac": 0.14,
    "max_dup_7gram_char_frac": 0.13,
    "max_dup_8gram_char_frac": 0.12,
    "max_dup_9gram_char_frac": 0.11,
    "max_dup_10gram_char_frac": 0.10,
}


def _ws_tokens(text: Column) -> Column:
    """Whitespace tokens (regex split — documents may contain newlines,
    unlike the single-space :func:`tokens` used by the X5 stats)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def _sum_len(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + F.length(x))


def _nonempty_lines(text: Column, sep: str) -> Column:
    return F.filter(
        F.transform(F.split(text, sep), lambda s: F.trim(s)), lambda s: s != ""
    )


def _dup_fracs(arr: Column) -> tuple[Column, Column]:
    """(duplicate-element fraction, duplicate-character fraction) of an
    array — the line/paragraph form of the Gopher dup rules. 1 minus the
    distinct share, by count and by characters."""
    n = F.size(arr)
    distinct = F.array_distinct(arr)
    frac = F.when(
        n > 0, F.round(F.lit(1.0) - F.size(distinct).cast("double") / n, 6)
    ).otherwise(F.lit(0.0))
    chars = _sum_len(arr)
    char_frac = F.when(
        chars > 0,
        F.round(F.lit(1.0) - _sum_len(distinct).cast("double") / chars, 6),
    ).otherwise(F.lit(0.0))
    return frac, char_frac


def _ngram_runs(grams: Column) -> Column:
    """One linear fold over the SORTED n-gram array, producing
    ``struct(best_c, best_ch, dup_ch, tot_ch)``:

    - ``best_c``  — occurrence count of the most frequent n-gram
    - ``best_ch`` — count × strlen of that n-gram (ties: max chars),
                    i.e. the characters its repetitions cover
    - ``dup_ch``  — Σ count × strlen over n-grams occurring > 1 time
    - ``tot_ch``  — Σ strlen over all n-gram occurrences

    Equal n-grams are adjacent after ``sort_array``, so per-gram counts
    are run lengths — O(T log T) total per document instead of the
    O(distinct × T) nested-scan form (which the DuckDB oracle uses; the
    two are equal by definition). A run is folded into the summary when
    the gram changes, and the final run in the finish lambda.
    """

    def flush(acc):
        run_ch = acc["run"] * F.length(acc["cur"])
        best_c = F.when(acc["run"] > acc["best_c"], acc["run"]).otherwise(
            acc["best_c"]
        )
        best_ch = (
            F.when(acc["run"] > acc["best_c"], run_ch)
            .when(
                acc["run"] == acc["best_c"], F.greatest(acc["best_ch"], run_ch)
            )
            .otherwise(acc["best_ch"])
        )
        dup_ch = acc["dup_ch"] + F.when(acc["run"] > 1, run_ch).otherwise(
            F.lit(0)
        )
        return best_c, best_ch, dup_ch

    def merge(acc, x):
        same = x == acc["cur"]
        best_c, best_ch, dup_ch = flush(acc)
        return F.struct(
            F.when(same, acc["cur"]).otherwise(x).alias("cur"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.when(same, acc["best_c"]).otherwise(best_c).alias("best_c"),
            F.when(same, acc["best_ch"]).otherwise(best_ch).alias("best_ch"),
            F.when(same, acc["dup_ch"]).otherwise(dup_ch).alias("dup_ch"),
            (acc["tot_ch"] + F.length(x)).alias("tot_ch"),
        )

    def finish(acc):
        best_c, best_ch, dup_ch = flush(acc)
        has = acc["run"] > 0
        return F.struct(
            F.when(has, best_c).otherwise(F.lit(0)).alias("best_c"),
            F.when(has, best_ch).otherwise(F.lit(0)).alias("best_ch"),
            F.when(has, dup_ch).otherwise(F.lit(0).cast("long")).alias("dup_ch"),
            acc["tot_ch"].alias("tot_ch"),
        )

    init = F.struct(
        F.lit("").alias("cur"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best_c"),
        F.lit(0).alias("best_ch"),
        F.lit(0).cast("long").alias("dup_ch"),
        F.lit(0).cast("long").alias("tot_ch"),
    )
    return F.aggregate(F.sort_array(grams), init, merge, finish)


def gopher_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """Per-document Gopher quality metrics + the keep/drop verdict.

    Implements the Rae et al. 2021 Table A1 rule suite (the filter set
    C4/MassiveText-descended pipelines start from), with the exact
    semantics pinned here so the DuckDB oracle can replicate them:

    - words = whitespace tokens; n-grams over lowercased words.
    - ``top_{2,3,4}gram_char_frac``: chars covered by the most frequent
      n-gram (count × strlen, ties broken toward more chars) ÷ strlen of
      the document; 0.0 when the max count is 1 (a gram seen once is not
      repetition).
    - ``dup_{5..10}gram_char_frac``: Σ count × strlen over n-grams with
      count > 1 ÷ Σ strlen over all n-gram occurrences.
    - ``dup_line/para[_char]_frac``: 1 − distinct share of trimmed
      non-empty lines (split ``\\n``) / paragraphs (split ``\\n{2,}``),
      by count and by characters.
    - symbol/bullet/ellipsis/alpha/stopword gates as in Table A1;
      ``#``/``…``/``...`` are the counted symbols, ``•``/``-``/``*`` the
      bullet prefixes.

    All fractions rounded to 6dp BEFORE thresholding, so ``gopher_keep``
    is bit-stable across engines (the oracle convention).
    """
    stopwords = GOPHER_STOPWORDS if stopwords is None else stopwords
    th = dict(GOPHER_THRESHOLDS)
    th.update(thresholds or {})

    # Staged projections, deliberately: every n-gram fold / token array
    # is materialized ONCE as a named column and referenced (≥2×) from
    # the next projection. CollapseProject refuses to merge projections
    # when a non-cheap alias is referenced more than once, so Catalyst
    # keeps one copy of each fold — inlining everything into one select
    # re-expands each fold per reference (the keep conjunction alone
    # references every metric), blowing generated code past the JIT
    # method limit and dropping the whole operator into interpreted
    # evaluation (measured: 57s → sub-second at sf0.1).
    text = F.col(text_col)
    s0 = df.select(
        F.col(id_col),
        text.alias("__gq_text"),
        _ws_tokens(text).alias("__gq_w"),
        _nonempty_lines(text, "\n").alias("__gq_l"),
        _nonempty_lines(text, "\n{2,}").alias("__gq_p"),
    )
    s0 = s0.select(
        "*", F.transform(F.col("__gq_w"), F.lower).alias("__gq_low")
    )
    low_text = F.concat_ws(" ", F.col("__gq_low"))
    s1 = s0.select(
        "*",
        *[
            _ngram_runs(_word_ngrams(low_text, n)).alias(f"__gq_runs_{n}")
            for n in range(2, 11)
        ],
    )

    text = F.col("__gq_text")
    words = F.col("__gq_w")
    n_words = F.size(words)
    word_chars = _sum_len(words)
    mean_word_len = F.when(
        n_words > 0, F.round(word_chars.cast("double") / n_words, 6)
    ).otherwise(F.lit(0.0))

    def occurrences(pat: str) -> Column:
        return (F.length(text) - F.length(F.replace(text, F.lit(pat)))) / len(pat)

    symbol_ratio = F.when(
        n_words > 0,
        F.round(
            (occurrences("#") + occurrences("…") + occurrences("..."))
            / n_words.cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))

    lines = F.col("__gq_l")
    paras = F.col("__gq_p")
    n_lines = F.size(lines)

    def line_frac(pred) -> Column:
        return F.when(
            n_lines > 0,
            F.round(F.size(F.filter(lines, pred)).cast("double") / n_lines, 6),
        ).otherwise(F.lit(0.0))

    bullet_frac = line_frac(
        lambda l: l.startswith("•") | l.startswith("-") | l.startswith("*")
    )
    ellipsis_frac = line_frac(lambda l: l.endswith("...") | l.endswith("…"))
    alpha_frac = F.when(
        n_words > 0,
        F.round(
            F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("double")
            / n_words,
            6,
        ),
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.col("__gq_low")),
            F.array([F.lit(s) for s in stopwords]),
        )
    )

    dup_line_frac, dup_line_char_frac = _dup_fracs(lines)
    dup_para_frac, dup_para_char_frac = _dup_fracs(paras)

    text_chars = F.length(text)

    cols = [
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_word_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.cast("long").alias("stopword_hits"),
        dup_line_frac.alias("dup_line_frac"),
        dup_line_char_frac.alias("dup_line_char_frac"),
        dup_para_frac.alias("dup_para_frac"),
        dup_para_char_frac.alias("dup_para_char_frac"),
    ]
    for n in (2, 3, 4):
        runs = F.col(f"__gq_runs_{n}")
        cols.append(
            F.when(
                (runs["best_c"] >= 2) & (text_chars > 0),
                F.round(runs["best_ch"].cast("double") / text_chars, 6),
            )
            .otherwise(F.lit(0.0))
            .alias(f"top_{n}gram_char_frac")
        )
    for n in range(5, 11):
        runs = F.col(f"__gq_runs_{n}")
        cols.append(
            F.when(
                runs["tot_ch"] > 0,
                F.round(runs["dup_ch"].cast("double") / runs["tot_ch"], 6),
            )
            .otherwise(F.lit(0.0))
            .alias(f"dup_{n}gram_char_frac")
        )

    out = s1.select(*cols)
    keep = (
        (F.col("n_words") >= th["min_words"])
        & (F.col("n_words") <= th["max_words"])
        & (F.col("mean_word_len") >= th["min_mean_word_len"])
        & (F.col("mean_word_len") <= th["max_mean_word_len"])
        & (F.col("symbol_word_ratio") <= th["max_symbol_word_ratio"])
        & (F.col("bullet_line_frac") <= th["max_bullet_line_frac"])
        & (F.col("ellipsis_line_frac") <= th["max_ellipsis_line_frac"])
        & (F.col("alpha_word_frac") >= th["min_alpha_word_frac"])
        & (F.col("stopword_hits") >= th["min_stopword_hits"])
        & (F.col("dup_line_frac") <= th["max_dup_line_frac"])
        & (F.col("dup_para_frac") <= th["max_dup_para_frac"])
        & (F.col("dup_line_char_frac") <= th["max_dup_line_char_frac"])
        & (F.col("dup_para_char_frac") <= th["max_dup_para_char_frac"])
    )
    for n in (2, 3, 4):
        keep = keep & (
            F.col(f"top_{n}gram_char_frac") <= th[f"max_top_{n}gram_char_frac"]
        )
    for n in range(5, 11):
        keep = keep & (
            F.col(f"dup_{n}gram_char_frac") <= th[f"max_dup_{n}gram_char_frac"]
        )
    return out.select(*out.columns, keep.alias("gopher_keep"))


def gopher_quality_pandas(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """Arrow-batched twin of :func:`gopher_quality` — identical output
    (same 20 metrics, same rounding, same keep verdict; pinned by a
    differential test and by sharing the driver oracle), different
    execution strategy.

    Why it exists: the expression form's higher-order functions
    (``aggregate``/``transform``/``filter``) are CodegenFallback in
    Spark — they evaluate interpreted, one expression-tree walk per
    array element, so the 9 n-gram folds cost ~1.6 ms/doc. Here each
    Arrow batch is scored by linear ``Counter`` passes (~20x less work
    per doc), which is the right trade at 100 TB: still embarrassingly
    scan-parallel, no shuffle, and the Python cost is amortized over
    Arrow batches, not rows. The expression form remains the
    zero-dependency reference implementation.

    Numerics: fractions round through ``decimal.Decimal`` HALF_UP on the
    SHORTEST-REPR decimal of the double (``Decimal(repr(x))``) —
    bit-for-bit the semantics of Spark's ``round()``
    (``BigDecimal.valueOf``, which also rounds the shortest
    representation) and DuckDB's, used by the expression form and the
    oracle. Rounding the exact binary expansion instead diverges on
    half-boundary fractions (7/640 → 0.010937 vs 0.010938).

    Closure note: everything the executor needs is constructed INSIDE
    the factory below (workers do not have this repo on sys.path — the
    ``_make_mrl_collapse`` convention).
    """
    stopwords_v = list(GOPHER_STOPWORDS if stopwords is None else stopwords)
    th = dict(GOPHER_THRESHOLDS)
    th.update(thresholds or {})

    id_type = df.schema[id_col].dataType.simpleString()
    metric_names = (
        ["n_words", "mean_word_len", "symbol_word_ratio", "bullet_line_frac",
         "ellipsis_line_frac", "alpha_word_frac", "stopword_hits",
         "dup_line_frac", "dup_line_char_frac", "dup_para_frac",
         "dup_para_char_frac"]
        + [f"top_{n}gram_char_frac" for n in (2, 3, 4)]
        + [f"dup_{n}gram_char_frac" for n in range(5, 11)]
    )
    # schema derives from metric_names so the column order has exactly
    # one definition shared with score()'s positional output
    types = {"n_words": "long", "stopword_hits": "long"}
    schema = ", ".join(
        [f"{id_col} {id_type}"]
        + [f"{m} {types.get(m, 'double')}" for m in metric_names]
        + ["gopher_keep boolean"]
    )

    def make_scorer(stop_list: list[str], th: dict):
        import re
        from collections import Counter
        from decimal import ROUND_HALF_UP, Decimal

        # mirror the JVM exactly: Java \s is [ \t\n\x0B\f\r] (not the
        # wider Python \s), Spark trim() strips SPACES only
        ws_re = re.compile(r"[ \t\n\x0b\f\r]+")
        para_re = re.compile(r"\n{2,}")
        alpha_re = re.compile(r"[A-Za-z]")
        stop_set = set(stop_list)
        q6 = Decimal("0.000001")

        def r6(x: float) -> float:
            # repr(x) = shortest round-trip decimal — the SAME value
            # Java's BigDecimal.valueOf(double) (Spark round()) and
            # DuckDB round on; Decimal(x) directly would round the
            # exact binary expansion and diverge on half-boundary
            # fractions like 7/640 (0.010937 vs 0.010938)
            return float(Decimal(repr(x)).quantize(q6, rounding=ROUND_HALF_UP))

        def dup_fracs(items: list[str]) -> tuple[float, float]:
            if not items:
                return 0.0, 0.0
            distinct = set(items)
            frac = r6(1.0 - len(distinct) / len(items))
            chars = sum(map(len, items))
            if chars == 0:
                return frac, 0.0
            return frac, r6(1.0 - sum(map(len, distinct)) / chars)

        def score(text: str) -> list:
            words = [w for w in ws_re.split(text) if w]
            n_words = len(words)
            word_chars = sum(map(len, words))
            mean_wl = r6(word_chars / n_words) if n_words else 0.0
            symbols = (
                text.count("#") + text.count("…") + text.count("...")
            )
            sym_ratio = r6(symbols / n_words) if n_words else 0.0
            lines = [s for s in (x.strip(" ") for x in text.split("\n")) if s]
            paras = [s for s in (x.strip(" ") for x in para_re.split(text)) if s]
            n_lines = len(lines)
            bullet = (
                r6(sum(s.startswith(("•", "-", "*")) for s in lines) / n_lines)
                if n_lines else 0.0
            )
            ellip = (
                r6(sum(s.endswith(("...", "…")) for s in lines) / n_lines)
                if n_lines else 0.0
            )
            alpha = (
                r6(sum(bool(alpha_re.search(w)) for w in words) / n_words)
                if n_words else 0.0
            )
            low = [w.lower() for w in words]
            stop_hits = len(set(low) & stop_set)
            dlf, dlcf = dup_fracs(lines)
            dpf, dpcf = dup_fracs(paras)
            text_chars = len(text)

            tops, dups = [], []
            for n in range(2, 11):
                if len(low) < n:
                    grams = []
                else:
                    grams = [" ".join(low[i:i + n]) for i in range(len(low) - n + 1)]
                counts = Counter(grams)
                if n <= 4:
                    best_c, best_ch = 0, 0
                    for g, c in counts.items():
                        ch = c * len(g)
                        if c > best_c or (c == best_c and ch > best_ch):
                            best_c, best_ch = c, ch
                    tops.append(
                        r6(best_ch / text_chars)
                        if best_c >= 2 and text_chars > 0 else 0.0
                    )
                else:
                    tot_ch = sum(map(len, grams))
                    dup_ch = sum(
                        c * len(g) for g, c in counts.items() if c > 1
                    )
                    dups.append(r6(dup_ch / tot_ch) if tot_ch > 0 else 0.0)

            m = [n_words, mean_wl, sym_ratio, bullet, ellip, alpha,
                 stop_hits, dlf, dlcf, dpf, dpcf] + tops + dups
            keep = (
                th["min_words"] <= n_words <= th["max_words"]
                and th["min_mean_word_len"] <= mean_wl <= th["max_mean_word_len"]
                and sym_ratio <= th["max_symbol_word_ratio"]
                and bullet <= th["max_bullet_line_frac"]
                and ellip <= th["max_ellipsis_line_frac"]
                and alpha >= th["min_alpha_word_frac"]
                and stop_hits >= th["min_stopword_hits"]
                and dlf <= th["max_dup_line_frac"]
                and dpf <= th["max_dup_para_frac"]
                and dlcf <= th["max_dup_line_char_frac"]
                and dpcf <= th["max_dup_para_char_frac"]
                and all(
                    tops[i] <= th[f"max_top_{n}gram_char_frac"]
                    for i, n in enumerate((2, 3, 4))
                )
                and all(
                    dups[i] <= th[f"max_dup_{n}gram_char_frac"]
                    for i, n in enumerate(range(5, 11))
                )
            )
            return m + [bool(keep)]

        def run(batches):
            import pandas as pd

            for pdf in batches:
                scored = [score(t if t is not None else "") for t in pdf[text_col]]
                out = pd.DataFrame(
                    scored, columns=metric_names + ["gopher_keep"]
                )
                out.insert(0, id_col, pdf[id_col].values)
                yield out

        return run

    return df.select(id_col, text_col).mapInPandas(
        make_scorer(stopwords_v, th), schema
    )
