"""Distributed BPE merge discovery — tokenizer "training" as aggregation.

Classic byte-pair-encoding training (Sennrich et al. 2016) loops: count
adjacent symbol pairs, merge the most frequent pair everywhere, repeat.
The Spark-first shape follows the standard scalable formulation: train on
the VOCABULARY-frequency table, not the raw corpus — the corpus is touched
exactly once (one shuffle to build ``(word, count)``), and every round then
runs over the vocabulary relation (distinct words, orders of magnitude
smaller than 100 TB of text):

- pair counting: one explode + one weighted hash aggregate per round,
- argmax merge selection: a 1-row bounded collect (like a MAX watermark —
  model-sized, not data-sized),
- merge application: a map-only ``replace`` over the vocabulary.

Determinism: ties break (count desc, pair asc); symbol strings are space-
separated, the merged pair joins with ``~``; ``replace`` scans left-to-right
non-overlapping with consumed boundaries — the same single-pass greedy both
Spark and the DuckDB oracle implement, so the learned merge table is
bit-reproducible by an external SQL engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERGE_MARKER = "~"


def _spaced_chars(word: Column) -> Column:
    """' h e l l o ' — one symbol per character, space-separated, padded so
    every pair occurrence carries both boundary spaces."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(" "))


def _adjacent_pairs(sym: Column) -> Column:
    """Array of adjacent symbol pairs ('x y') of a spaced symbol string."""
    t = F.split(F.trim(sym), " ")
    n = F.size(t)
    pairs = F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.when(n >= 2, pairs).otherwise(F.array().cast("array<string>"))


def word_vocabulary(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, n) frequency table — the one corpus-sized aggregation."""
    toks = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
    )
    return toks.groupBy("w").agg(F.count(F.lit(1)).alias("n"))


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 3,
) -> tuple[list[tuple[int, str, int]], DataFrame]:
    """Learn ``rounds`` BPE merges from the corpus.

    Returns ``(merges, vocab)``: the merge table as a driver-side list of
    ``(round, pair, weight)`` (model-sized — the analog of collecting IVF
    centroids) and the final symbolized vocabulary DataFrame
    ``(w, sym, n)`` for inspection.
    """
    vocab = word_vocabulary(df, text_col)
    cur = vocab.select(
        "w", _spaced_chars(F.col("w")).alias("sym"), "n"
    ).localCheckpoint()  # materialize the (small) vocab once; each round
    # would otherwise re-scan and re-aggregate the full corpus
    merges: list[tuple[int, str, int]] = []
    for r in range(1, rounds + 1):
        counts = (
            cur.select(F.explode(_adjacent_pairs(F.col("sym"))).alias("p"), "n")
            .groupBy("p")
            .agg(F.sum("n").alias("c"))
        )
        top = counts.orderBy(F.desc("c"), F.col("p")).limit(1).collect()
        if not top:
            break
        pair, weight = top[0]["p"], int(top[0]["c"])
        merges.append((r, pair, weight))
        x, y = pair.split(" ")
        cur = cur.withColumn(
            "sym",
            F.replace(
                F.col("sym"),
                F.lit(f" {x} {y} "),
                F.lit(f" {x}{MERGE_MARKER}{y} "),
            ),
        )
    return merges, cur


def bpe_segment(word: Column, merges: list[tuple[int, str, int]]) -> Column:
    """Apply a learned merge table to a word column: spaced characters, then
    each merge's replace in training order.  Map-only."""
    sym = _spaced_chars(word)
    for _, pair, _ in merges:
        x, y = pair.split(" ")
        sym = F.replace(
            sym, F.lit(f" {x} {y} "), F.lit(f" {x}{MERGE_MARKER}{y} ")
        )
    return F.trim(sym)


# Encoding separator: each symbol is wrapped ·sym·, symbols joined so the
# string is ·s1··s2··s3·.  Every symbol occurrence owns BOTH its boundary
# markers, so a left-to-right non-overlapping replace of ·a··b· -> ·ab·
# merges runs correctly (' a a a ' single-space padding would consume the
# shared boundary and skip the second merge — the documented quirk of the
# training-side representation above, which the oracle reproduces there).
ENC_SEP = "·"


def _enc_spaced(word: Column) -> Column:
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.concat(
        F.lit(ENC_SEP), F.array_join(chars, ENC_SEP * 2), F.lit(ENC_SEP)
    )


def bpe_encode(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply a learned merge table to a word, textbook-BPE-complete: one
    left-to-right replace pass per rank, in rank order.

    One pass per rank IS the fixpoint: a rank's replace cannot create a new
    adjacency of its own pair (the merged symbol differs from both halves),
    and later ranks cannot create earlier pairs (an earlier rule never
    references a symbol that did not exist when it was learned).  Pure
    expression — ``len(merges)`` chained ``replace`` calls inside codegen,
    map-only, no Python boundary; the DuckDB oracle nests the identical
    replaces.  Returns the symbol array.  Symbols must not contain U+00B7."""
    s = _enc_spaced(word)
    for a, b in merges:
        s = F.replace(
            s,
            F.lit(f"{ENC_SEP}{a}{ENC_SEP}{ENC_SEP}{b}{ENC_SEP}"),
            F.lit(f"{ENC_SEP}{a}{b}{ENC_SEP}"),
        )
    return F.split(F.btrim(s, F.lit(ENC_SEP)), ENC_SEP * 2)


def bpe_encode_vocab(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Encode the corpus VOCABULARY: ``(word, bpe_tokens, n_toks)`` over
    distinct words — the 100 TB shape: the corpus is aggregated to its
    (much smaller) vocabulary once, each distinct word is encoded exactly
    once, and per-document numbers come from a broadcast join back
    (:func:`bpe_token_counts`) instead of re-encoding every occurrence."""
    vocab = (
        df.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    toks = bpe_encode(F.col("word"), merges)
    return vocab.select(
        "word", toks.alias("bpe_tokens"), F.size(toks).alias("n_toks")
    )


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE token counts under a learned merge table:
    ``(id, n_words, n_bpe_tokens)``.  The vocabulary encode broadcasts onto
    the exploded corpus (vocab is model-sized), so the only corpus-sized
    shuffle is the final per-document aggregation."""
    words = df.select(
        id_col,
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    enc = bpe_encode_vocab(df, merges, text_col).select("word", "n_toks")
    return (
        words.join(F.broadcast(enc), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_toks").alias("n_bpe_tokens"),
        )
    )
