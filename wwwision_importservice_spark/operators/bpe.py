"""Distributed BPE tokenizer training + encoding.

The token-counting operators in ``operators/text.py`` use whitespace /
regex heuristics; this module provides the real thing — a byte-pair-
encoding vocabulary TRAINED on the corpus (algorithm: Sennrich, Haddow
& Birch, "Neural Machine Translation of Rare Words with Subword Units",
ACL 2016 — public literature), so token budgets, packing, and mixture
sampling can be computed against the tokenizer that will actually train
the model.

Why this parallelizes cleanly (the classic trainer design): merges are
learned from the **word-frequency table**, not the corpus. The corpus
collapses to one ``(word, freq)`` row per DISTINCT word (Zipf: even a
100 TB corpus has a word table orders of magnitude smaller), and every
merge round runs two small jobs over that table:

1. pair counting — explode each word's adjacent symbol pairs weighted
   by word frequency, one hash aggregate, take the global argmax with a
   deterministic (count desc, pair asc) tiebreak;
2. pair merging — rewrite each word's symbol array, collapsing every
   non-overlapping occurrence of the winning pair left-to-right.

The driver loop holds only the merge list (``num_merges`` small rows);
lineage is cut per round with ``localCheckpoint`` exactly like
``connected_components`` / ``train_ivf_centroids``. Training is fully
deterministic — same corpus, same merges, any cluster size.

Encoding (:func:`bpe_encode`) applies the learned merges to new text
with the standard lowest-rank-first loop. That inner loop is inherently
sequential per word, so it runs as an Arrow-batched ``mapInPandas``
with the merge table broadcast as a plain dict — the documented
"Python is unavoidable" shape (per-row JVM expressions cannot express
an unbounded fixpoint), amortized over Arrow batches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "▁"  # sentencepiece-style marker, appended per word

#: A FROZEN merge table — ``train_bpe(documents sf0.01, num_merges=24)``
#: run once and committed, because a tokenizer is an artifact: the whole
#: point is that the SAME merges apply to any future text. Consumed by
#: the x6_bpe_pack oracle row (entry_queries), the corpus-pipeline demo,
#: and the BPE differential tests. All 24 merged-symbol strings are
#: distinct, which is the premise the oracle's rank-order sequential
#: restatement of the encode loop rests on (see entry_queries).
PINNED_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("e", "▁"), ("n", "▁"), ("er", "▁"), ("o", "w"),
    ("ow", "▁"), ("o", "r"), ("s", "t"), ("h", "▁"), ("a", "t"),
    ("l", "u"), ("i", "n"), ("a", "▁"), ("g", "▁"), ("y", "▁"),
    ("a", "r"), ("p", "ar"), ("t", "▁"), ("i", "n▁"), ("j", "o"),
    ("jo", "in▁"), ("a", "s"), ("as", "h▁"), ("h", "ash▁"),
]


def word_frequencies(
    corpus: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The (word, freq) table BPE trains on: lowercased whitespace words,
    one row per distinct word. The only corpus-sized job in training."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "\\s+"), lambda t: t != "")
    return (
        corpus.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_pair_expr(symbols: Column, left: str, right: str) -> Column:
    """Collapse every non-overlapping (left, right) bigram in ``symbols``
    left-to-right — one pass, expressed as an ``aggregate`` fold whose
    accumulator is (output array, pending symbol)."""
    merged = left + right
    folded = F.aggregate(
        symbols,
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(None).cast("string").alias("pend"),
        ),
        lambda acc, s: F.when(
            acc["pend"].isNull(), F.struct(acc["out"].alias("out"), s.alias("pend"))
        )
        .when(
            (acc["pend"] == F.lit(left)) & (s == F.lit(right)),
            # the pair closes: emit the merged symbol, nothing pending
            F.struct(
                F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                F.lit(None).cast("string").alias("pend"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                s.alias("pend"),
            )
        ),
        lambda acc: F.when(
            acc["pend"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pend"]))),
    )
    return folded


def train_bpe(
    corpus: DataFrame,
    text_col: str = "text",
    num_merges: int = 50,
    min_pair_freq: int = 2,
    batch_merges: int = 8,
    exact: bool = True,
    stats: dict | None = None,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ordered merge list ``[(left, right), ...]`` (rank = position).

    Stops early when no remaining pair reaches ``min_pair_freq``.
    Deterministic: ties on pair count break on the (left, right) pair
    lexicographically.

    ``batch_merges`` accepts up to that many merges per Spark round —
    the answer to one-job-per-merge being a driver-side bottleneck at
    real 32k-vocab scale (32k sequential rounds). The batch is chosen
    so the merge LIST is **provably identical** to the ``batch_merges=1``
    sequential path (equivalence pinned in tests on real documents):

    - the batch is a CONSECUTIVE prefix of the (count desc, pair asc)
      ranking that is mutually symbol-disjoint — so every pair ranked
      above an accepted ``p_i`` is itself an earlier accepted pair;
    - merging a pair leaves the count of every symbol-disjoint pair
      unchanged (no adjacency involving other symbols is created or
      destroyed), and can only DECREASE counts of existing overlapping
      pairs — so no existing pair can climb past ``p_i`` mid-batch;
    - the only threat is a NEW pair involving a merged symbol, but
      every occurrence of ``(x, ab)`` was an ``(x, a)`` adjacency (and
      ``(ab, y)`` a ``(b, y)`` one), so new-pair counts are bounded by
      the max count of existing non-accepted pairs sharing a symbol
      with the batch (the "threat bound", one small filtered max over
      the pair table). Accepting ``p_i`` (i ≥ 2) only while
      ``count(p_i) > threat`` guarantees the sequential argmax at each
      intermediate step is exactly ``p_i`` (strict ``>`` also dodges
      lexicographic ties against never-materialized new symbols).

    Per round this costs one pair-count aggregate (as before), a
    driver collect of the top ``3×batch`` rows instead of 1, one
    filtered-max job, and ONE words rewrite applying the whole batch
    (the fold exprs compose in order inside a single projection) —
    rounds shrink by the accepted-batch factor. ``stats["rounds"]``
    exposes the achieved factor.

    Honest limit of the exact mode: on character-level merge heads the
    top-ranked pairs usually SHARE a symbol ('e', 't', the word
    marker), the consecutive prefix stops at the first conflict, and
    the measured factor is only ~1.1-1.3× — and that overlap is
    precisely the case where any skip-and-continue batching CHANGES
    the sequential merge list (the skipped pair keeps its count and
    remains the true next argmax). So the provable factor is
    corpus-bound, not an implementation artifact. ``exact=False``
    switches to the classic greedy batch (top-``batch_merges``
    mutually-disjoint pairs, skipping conflicts): still fully
    deterministic and a valid BPE vocabulary, rounds cut by ~the full
    factor, but the merge list may deviate from sequential where the
    head overlaps — the documented trade for 32k-vocab training runs.
    """
    words = word_frequencies(corpus, text_col).select(
        F.split(F.concat(F.col("word"), F.lit(END_OF_WORD)), "(?!$)").alias(
            "symbols"
        ),
        F.col("freq"),
    )
    words = words.localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    rounds = 0
    while len(merges) < num_merges:
        rounds += 1
        pairs = (
            words.select(
                F.col("freq"),
                # zip symbols[0:n-1] with symbols[1:n] — naturally empty
                # for 1-symbol words (F.sequence(1, 0) would yield a
                # DESCENDING [1, 0], not an empty range)
                F.slice(F.col("symbols"), 1, F.size("symbols") - 1).alias("__l"),
                F.slice(F.col("symbols"), 2, F.size("symbols") - 1).alias("__r"),
            )
            .select(
                F.col("freq"),
                F.explode(F.arrays_zip("__l", "__r")).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("freq").alias("n"))
        )
        budget = min(batch_merges, num_merges - len(merges))
        top = (
            pairs.orderBy(
                F.col("n").desc(), F.col("p.__l").asc(), F.col("p.__r").asc()
            )
            .limit(max(3 * budget, 1))
            .collect()
        )
        if not top or top[0]["n"] < min_pair_freq:
            break
        # consecutive, mutually symbol-disjoint prefix of the ranking
        accepted: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for row in top:
            left, right, n = row["p"]["__l"], row["p"]["__r"], row["n"]
            if n < min_pair_freq or len(accepted) >= budget:
                break
            if accepted and (left in used or right in used):
                if exact:
                    break  # prefix must stay consecutive — stop, don't skip
                continue  # greedy: skip the conflict, keep batching
            accepted.append((left, right, n))
            used.update((left, right))
            if exact and left == right:
                # A SELF-pair conflicts with everything after it: merging
                # (a,a) inside an "aaa…" run creates (aa,a)/(aa,aa) pairs
                # whose counts are bounded only by count(a,a) ITSELF —
                # which the threat max excludes as an accepted pair — so
                # aggregated run-derived counts can silently beat the
                # next sequential argmax (e.g. 'xaaay'+'zaaaw': (aa,a)
                # counts 2N, every flank N). End the batch here; the
                # threat bound below stays sound for what's accepted.
                break
        if exact and len(accepted) > 1:
            # threat bound: max count of any existing non-accepted pair
            # sharing a symbol with the batch (bounds every new pair a
            # batch merge can create — see docstring)
            overlap = F.col("p.__l").isin(*used) | F.col("p.__r").isin(*used)
            is_accepted = None
            for left, right, _ in accepted:
                c = (F.col("p.__l") == left) & (F.col("p.__r") == right)
                is_accepted = c if is_accepted is None else (is_accepted | c)
            threat = (
                pairs.filter(overlap & ~is_accepted).agg(F.max("n")).first()[0]
                or 0
            )
            kept = [accepted[0]]
            for left, right, n in accepted[1:]:
                if n > threat:
                    kept.append((left, right, n))
                else:
                    break  # keep the prefix consecutive
            accepted = kept
        merges.extend((left, right) for left, right, _ in accepted)
        # one projection applies the whole batch in sequential order
        expr = F.col("symbols")
        for left, right, _ in accepted:
            expr = _merge_pair_expr(expr, left, right)
        words = words.select(
            expr.alias("symbols"), F.col("freq")
        ).localCheckpoint(eager=True)
    if stats is not None:
        stats["rounds"] = rounds
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    tokens_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: per word, apply
    the lowest-rank applicable merge until none applies (the standard
    BPE encode loop), then emit the concatenated subword sequence.

    Arrow-batched ``mapInPandas``; the merge table rides along as a
    broadcast-sized plain dict (``num_merges`` entries)."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{fields}, {tokens_col} array<string>"

    def encode_word(word: str) -> list[str]:
        # char split + trailing marker symbol — identical to training's
        # split(concat(word, marker), "(?!$)")
        syms = list(word + END_OF_WORD)
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, i)
            if best is None:
                break
            _, i = best
            left, right = syms[i], syms[i + 1]
            pair = left + right
            # merge every non-overlapping occurrence of this pair,
            # left-to-right — mirrors _merge_pair_expr
            out = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == left and syms[j + 1] == right:
                    out.append(pair)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        return syms

    import re

    # EXACTLY the training tokenizer: Spark's split("\\s+") is Java \s =
    # ASCII [ \t\n\x0B\f\r] only. Python's str.split() splits on Unicode
    # whitespace (NBSP, thin space, ideographic space …), which would
    # tokenize HTML-derived text differently from the table the merges
    # were learned on.
    _ws = re.compile("[ \t\n\x0b\f\r]+")

    def run(batches):
        for pdf in batches:
            toks = []
            for text in pdf[text_col].astype(str):
                words = [w for w in _ws.split(text.lower()) if w]
                seq: list[str] = []
                for w in words:
                    seq.extend(encode_word(w))
                toks.append(seq)
            pdf = pdf.copy()
            pdf[tokens_col] = pd.Series(toks, index=pdf.index, dtype=object)
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Per-document token count under the TRAINED tokenizer — the count
    that token budgets (mixture_sample / pack_sequences) should use when
    tokenizer fidelity matters more than the heuristic regex count."""
    enc = bpe_encode(df, merges, text_col)
    return enc.select(
        F.col(id_col), F.size("bpe_tokens").alias("n_bpe_tokens")
    )
